#!/usr/bin/env python
"""Render the evaluation CSVs into one markdown report.

The reference's `fig_parser.py` consumes its `stat_*.csv` files into
figures; here the same CSVs (scripts/evaluate.py jobs) become a
RESULTS.md summary table set.

Usage: python scripts/report.py [--indir results_r1] [--out RESULTS.md]
"""
from __future__ import annotations

import argparse
import csv
import os


def read(path):
    """Read a stat CSV; re-run rows supersede older ones (the harness
    appends, so the LAST row per config key wins)."""
    if not os.path.exists(path):
        return None, []
    with open(path) as f:
        rows = list(csv.reader(f))
    header, body = rows[0], rows[1:]
    # key = leading non-numeric columns (dataset/model/variant/...)
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
    dedup = {}
    for r in body:
        dedup[tuple(r[:n_key])] = r
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
    ("stat_table6.csv", "Table 6 — graph-size scaling (Products fractions)",
     {2: "%.4f", 3: "%.4f"}),
    ("stat_table7.csv", "Table 7 — sampling modes (time + accuracy)",
     {2: "%.4f", 3: "%.3f"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--indir", default="results_r1")
    ap.add_argument("--out", default="RESULTS.md")
    args = ap.parse_args()

    parts = [
        "# Results — TPU v5e (single chip), fetch-fenced per-epoch means\n",
        "Produced by `scripts/evaluate.py` jobs on the real chip; datasets\n"
        "are registry-shaped synthetic stand-ins unless a `--data-root`\n"
        "with real npy exports was given (this image has no egress).\n"
        "Schema and protocol match the reference's evaluation harness\n"
        "(reference: scripts/Evaluations/*.py; 5-epoch warmup skipped,\n"
        "mean seconds/epoch).  Graph scales: Cora/Pubmed/Arxiv/CoraFull\n"
        "at full registry shape; Reddit and Products at 0.25 of theirs\n"
        "(27.4M / 30.9M edges — single v5e chip); Papers100M by sampled\n"
        "fraction as in the reference's Table 6.  f32 activations unless\n"
        "noted (bench.py reports the bf16 fast path).\n",
    ]
    for name, title, fmt in SECTIONS:
        header, rows = read(os.path.join(args.indir, name))
        if header is None:
            continue
        parts.append(f"\n## {title}\n")
        parts.append(md_table(header, rows, fmt))
    text = "\n".join(parts)
    with open(args.out, "w") as f:
        f.write(text)
    print(f"wrote {args.out} ({len(text)} bytes)")


if __name__ == "__main__":
    main()
