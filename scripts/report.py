#!/usr/bin/env python
"""Render the evaluation CSVs into RESULTS.md — mechanically.

The reference's `fig_parser.py` consumes its `stat_*.csv` files into
figures; here the same CSVs (scripts/evaluate.py jobs) become the
RESULTS.md summary tables.  RESULTS.md is GENERATED, not hand-edited:
rounds 3 and 4 both shipped a RESULTS.md that lagged the newest CSVs
(VERDICT r3/r4), so this script is now the single source — it merges
every `--indirs` directory in order (later directories supersede
earlier per config key, and within a file the harness appends so the
last row per key wins) and rewrites the whole document.

Usage: python scripts/report.py --indirs results_r3 results_r4 results_r5
"""
from __future__ import annotations

import argparse
import csv
import glob
import json
import os


def read_rows(path):
    """Rows of one stat CSV keyed for dedup (last row per key wins)."""
    with open(path) as f:
        rows = list(csv.reader(f))
    if not rows:
        return None, {}
    header, body = rows[0], rows[1:]
    n_key = 0
    for v in body[0] if body else []:
        try:
            float(v)
            break
        except ValueError:
            n_key += 1
    n_key = max(n_key, 1)
    # fig18's key includes the numeric layers/hidden columns
    if "layers" in header:
        n_key = 3
    if "fraction" in header:
        n_key = 2
    # scaling rows key on (devices, mode, halo)
    if "devices" in header and "mode" in header:
        n_key = 3
    return header, {tuple(r[:n_key]): r for r in body if r}


def merged(indirs, name):
    """Merge one stat CSV across result dirs; later dirs supersede."""
    header, dedup = None, {}
    for d in indirs:
        p = os.path.join(d, name)
        if not os.path.exists(p):
            continue
        h, rows = read_rows(p)
        if h is None:
            continue
        if header is None:
            header = h
        if h == header:
            dedup.update(rows)
    return header, list(dedup.values())


def md_table(header, rows, fmt=None):
    def cell(i, v):
        if fmt and i in fmt:
            try:
                return fmt[i] % float(v)
            except ValueError:
                return v
        return v

    out = ["| " + " | ".join(header) + " |",
           "|" + "---|" * len(header)]
    for r in rows:
        out.append("| " + " | ".join(cell(i, v) for i, v in enumerate(r)) + " |")
    return "\n".join(out) + "\n"


def newest_bench(indirs):
    """Last contract-valid JSON line from the newest bench log."""
    best = None
    for d in indirs:
        # bench.json / bench<N>.txt only — experiment-tagged logs
        # (bench_packall etc.) are A/B arms, not the headline
        paths = sorted(
            glob.glob(os.path.join(d, "bench.json"))
            + glob.glob(os.path.join(d, "bench[0-9]*"))
        )
        for p in paths:
            try:
                with open(p) as f:
                    for line in f:
                        line = line.strip()
                        if line.startswith("{") and '"metric"' in line:
                            best = json.loads(line)
            except (OSError, json.JSONDecodeError):
                continue
    return best


SECTIONS = [
    ("stat_fig16.csv", "Fig 16/17 — per-epoch time + accuracy (models x datasets)",
     {2: "%.4f", 3: "%.4f", 4: "%.3f"}),
    ("stat_fig18.csv", "Fig 18 — scalability (layers x hidden, GCN)",
     {3: "%.4f", 4: "%.4f"}),
    ("stat_fig19.csv", "Fig 19 — memory vs time schedules",
     {2: "%.1f", 3: "%.4f", 4: "%.4f"}),
    ("stat_fig20.csv", "Fig 20 — input-aware vs hand-tuned schedules",
     {2: "%.4f", 3: "%.4f"}),
    ("stat_table5.csv", "Table 5 — CIR-vs-DIR optimization breakdown",
     {2: "%.4f", 3: "%.4f"}),
    ("stat_table6.csv", "Table 6 — graph-size scaling (sampled fractions)",
     {2: "%.4f", 3: "%.4f"}),
    ("stat_table7.csv", "Table 7 — sampling modes (time + accuracy)",
     {2: "%.4f", 3: "%.3f"}),
    ("stat_baseline_flax.csv",
     "Ecosystem baseline — stock flax.linen + segment_sum",
     {3: "%.4f", 4: "%.4f"}),
    ("stat_scaling.csv", "Multi-chip scaling harness (virtual CPU mesh)",
     {3: "%.4f", 4: "%.3f"}),
    ("stat_papers_multichip.csv",
     "Papers100M through the multi-chip path (virtual-mesh dryrun)", {}),
]

NOTES = {
    "stat_fig16.csv": (
        "Accuracy column: synthetic stand-in data (planted homophilous\n"
        "communities) unless the row says `data=real`.  `_noauto` rows\n"
        "run with `GALA_PALLAS_AUTO=0` (diagnosis variants)."),
    "stat_table5.csv": (
        "`dir` runs under `GALA_FORCE_COL_TILE=1` (the compiler's budget\n"
        "gate otherwise drops hand chunking as a measured loss); `all`\n"
        "reports what a user's all-optimizations schedule actually\n"
        "executes (gate active), so all ~= cir on TPU by design."),
    "stat_scaling.csv": (
        "HARNESS-ONLY numbers: virtual CPU mesh (one host), measuring\n"
        "that the sharded step compiles/executes and how the collective\n"
        "pattern scales the partitioned work — NOT ICI performance.\n"
        "Only real-chip rows are publishable as TPU scaling."),
    "stat_papers_multichip.csv": (
        "Papers100M node-partitioned over an 8-device mesh\n"
        "(scripts/dryrun_papers_multichip.py; virtual CPU mesh —\n"
        "epoch_s_cpu_harness is a harness number, not TPU time).\n"
        "0.02 trains with a finite loss.  The 0.05 config — the one a\n"
        "single v5e cannot hold (runtime ResourceExhausted 26.09G of\n"
        "15.75G, results_r5/papers005.txt) — shards and COMPILES, but\n"
        "its execution exceeds the 125G EMULATING HOST (OOM-killed at\n"
        "~130G RSS at 8 AND 4 devices, results_r5/papers_multichip*),\n"
        "because one host must hold every shard's halo+temps at once\n"
        "with XLA:CPU widening bf16 to f32; the implied per-REAL-chip\n"
        "footprint, 130G / 8 shards / 2 (bf16), is ~8.1G < 15.75G HBM —\n"
        "the config fits an actual 8-chip mesh, which this image does\n"
        "not have."),
    "stat_baseline_flax.csv": (
        "Stock flax.linen + jax.ops.segment_sum GNNs on the same graphs\n"
        "and timing protocol (scripts/baseline_flax.py).  `oom` = the\n"
        "stock path exceeds one v5e's 15.75G HBM (Reddit-0.25 layer-1\n"
        "messages are 27.4M x 256 f32 = 26.1G; bf16 GAT dies on the\n"
        "autodiff residuals)."),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--indirs", nargs="+", default=None,
                    help="result dirs in chronological order (later "
                         "supersedes); default: results_r3..r5")
    ap.add_argument("--out", default="RESULTS.md")
    args = ap.parse_args()
    indirs = args.indirs or [
        d for d in ("results_r3", "results_r4", "results_r5")
        if os.path.isdir(d)
    ]

    parts = [
        "# Results — TPU v5e (single chip), fetch-fenced per-epoch means\n",
        "GENERATED by `scripts/report.py` from "
        + ", ".join(f"`{d}/`" for d in indirs)
        + " (newest row per config wins). Do not hand-edit.\n",
        "Produced by `scripts/evaluate.py` jobs on the real chip; datasets\n"
        "are registry-shaped synthetic stand-ins unless a `--data-root`\n"
        "with real npy exports was given (this image has no egress).\n"
        "Schema and protocol match the reference's evaluation harness\n"
        "(reference: scripts/Evaluations/*.py; 5-epoch warmup skipped,\n"
        "mean seconds/epoch).  Graph scales: Cora/Pubmed/Arxiv/CoraFull\n"
        "at full registry shape; Reddit and Products at 0.25 of theirs;\n"
        "Papers100M by sampled fraction as in the reference's Table 6.\n"
        "f32 activations unless noted (bench.py reports the bf16 fast\n"
        "path).\n",
    ]

    bench = newest_bench(indirs)
    if bench:
        parts.append("\n## bench.py headline (bf16 fast path)\n")
        parts.append("```json\n" + json.dumps(bench, indent=1) + "\n```\n")

    for name, title, fmt in SECTIONS:
        header, rows = merged(indirs, name)
        if header is None:
            continue
        parts.append(f"\n## {title}\n")
        if name in NOTES:
            parts.append(NOTES[name] + "\n")
        parts.append(md_table(header, rows, fmt))
    text = "\n".join(parts)
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {args.out} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
