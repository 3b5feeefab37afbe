#!/usr/bin/env python
"""Why is table5 `all` slower than `cir` on Reddit-0.25? (VERDICT r5)

`all` (reorder+sparse on) sweeps 32+32-wide aggregations; `cir` sweeps
256+32 — yet `all` measures 1.7x slower on the forward (r5 chip:
inference 0.405 vs 0.237 s).  This times the pieces: the raw spmm
sweep at width 256 vs 32 on the same bell layout, and the two
variants' compiled forwards, fetch-fenced.  Device arrays ride as jit
arguments (closure rule).

Usage: python scripts/diag_table5_all.py [--scale 0.25]
"""
from __future__ import annotations

import argparse
import importlib.util
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_SPEC = importlib.util.spec_from_file_location(
    "evaluate",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "evaluate.py"),
)
ev = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ev)

OFF4 = ("operator_reordering(false);\nsparse_rewrites(false);\n"
        "training_subgraph(false);\ntrain_code_motion(false);\n")
OFF2 = "training_subgraph(false);\ntrain_code_motion(false);\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="Reddit")
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from gala_tpu.data.datasets import load_dataset
    from gala_tpu.dsl.parser import parse_source
    from gala_tpu.lowering.lower import lower
    from gala_tpu.ops.graph import Graph
    from gala_tpu.ops.spmm import spmm
    from gala_tpu.utils.timing import timeit

    data = load_dataset(args.dataset, scale=args.scale)
    gh = data[0]
    print(f"{args.dataset} x{args.scale}: {gh.n_rows} nodes {gh.n_edges} edges")

    g = Graph.from_host(gh, strategy="bell")
    key = jax.random.key(0)
    sweep = jax.jit(lambda g_, x_: spmm(g_, x_[: g_.c_pad]).sum())
    for w in (32, 64, 128, 256):
        xw = jax.random.normal(key, (g.c_pad, w), jnp.float32)
        t = timeit(sweep, g, xw, iters=args.iters)
        s = int(g.bell.flat_cols.shape[0])
        print(f"spmm fwd f={w:4d}: {t*1e3:8.2f} ms ({s/t/1e6:6.0f} M slots/s)")

    for label, sched, strat in (
        ("cir", "aggrFn=aggrFn.coarsen(2);\n" + OFF4, "bell"),
        ("all", "aggrFn=aggrFn.coarsen(2);\nG=G.col_tile(37000);\n" + OFF2,
         "bell"),
    ):
        src = ev.make_dsl("gcn", args.dataset, schedule=sched)
        cm = lower(parse_source(src), mode="inference", data=data,
                   strategy=strat)
        params = cm.make_params(0)
        x_inv = jax.jit(cm.invariant)(cm.full_graphs, cm.x)
        fwd = jax.jit(cm.forward)
        t = timeit(fwd, params, cm.full_graphs, x_inv, iters=args.iters)
        print(f"{label} forward: {t*1e3:8.2f} ms  loop="
              f"{[n.op.name for n in cm.program.loop.nodes]}")


if __name__ == "__main__":
    main()
