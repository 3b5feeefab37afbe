#!/usr/bin/env python
"""On-chip component profile of the fused GAT attention op.

Times the pieces of one GAT layer separately (forward attention, its
backward, the surrounding FFNs, and a same-shape GCN aggregation as the
floor) so the epoch time decomposes into explainable parts.  Run with
the chip idle; fetch-fenced timing per docs/PERF_NOTES.md.

Usage: python scripts/profile_gat.py [--scale 1.0] [--hidden 32]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--dataset", default="Arxiv")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platform_name", args.platform)

    from gala_tpu.data.datasets import load_dataset
    from gala_tpu.ops.attention import AttnBell, attention_aggregate
    from gala_tpu.ops.graph import NODE_PAD, Graph
    from gala_tpu.utils.timing import timeit

    g, feats, labels, masks = load_dataset(args.dataset, scale=args.scale)
    n_pad = g.n_rows + NODE_PAD
    c_pad = g.n_cols + NODE_PAD
    h = args.hidden
    print(f"graph: {g.n_rows} nodes, {g.n_edges} edges; hidden={h}")

    key = jax.random.key(0)
    x = jax.random.normal(key, (c_pad, h), jnp.bfloat16)
    vl = jax.random.normal(key, (c_pad, 1), jnp.float32)
    vr = jax.random.normal(key, (n_pad, 1), jnp.float32)
    dout = jax.random.normal(key, (n_pad, h), jnp.bfloat16)

    ab = AttnBell.from_host(g, n_pad, c_pad)
    slot_f = int(ab.fwd.flat_cols.shape[0])
    slot_t = int(ab.t.flat_cols.shape[0])
    print(f"slots: fwd={slot_f} t={slot_t} (pad overhead "
          f"{slot_f / max(g.n_edges, 1):.2f}x)")

    fwd = jax.jit(lambda x, vl, vr: attention_aggregate(
        n_pad, c_pad, 0.01, ab, x, vl, vr))

    def loss(x, vl, vr):
        out = attention_aggregate(n_pad, c_pad, 0.01, ab, x, vl, vr)
        return jnp.sum((out * dout).astype(jnp.float32))

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    # GCN-aggregation floor at the same width (bell layout, same graph)
    gg = Graph.from_host(g, strategy="bell")
    from gala_tpu.ops.spmm import spmm

    gcn_fwd = jax.jit(lambda x: spmm(gg, x[: gg.c_pad]))

    t_fwd = timeit(fwd, x, vl, vr, iters=args.iters)
    t_bwd = timeit(grad, x, vl, vr, iters=args.iters)
    t_gcn = timeit(gcn_fwd, x, iters=args.iters)
    print(f"attention fwd:       {t_fwd * 1e3:8.2f} ms "
          f"({slot_f / t_fwd / 1e6:7.1f} M slots/s)")
    print(f"attention fwd+bwd:   {t_bwd * 1e3:8.2f} ms")
    print(f"gcn spmm fwd floor:  {t_gcn * 1e3:8.2f} ms "
          f"({slot_f / t_gcn / 1e6:7.1f} M slots/s)")


if __name__ == "__main__":
    main()
