#!/usr/bin/env python
"""On-chip component profile of the fused GAT attention op.

Times the pieces of one GAT layer separately (inference forward —
the no-flash custom_vjp primal, training forward — the flash-stat
accumulating vjp fwd, the full backward, and a same-shape GCN
aggregation as the floor) so the epoch time decomposes into
explainable parts.  Run with the chip idle; fetch-fenced timing per
docs/PERF_NOTES.md.

All device arrays (the AttnBell/Graph index tables, the cotangent)
ride as jit ARGUMENTS — a closed-over device array is embedded in the
lowered module as a literal, and at Reddit scale that exceeded the
axon remote-compile request limit (HTTP 413; the closure-constant rule
in docs/PERF_NOTES.md, round-4 failure queue_followup.log:28).

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
    from gala_tpu.ops.attention import (
        AttnBell, _attn_fwd, attention_aggregate,
    )
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

    # inference forward: the custom_vjp PRIMAL (need_flash=False —
    # skips the pos-stat accumulation, commit 1541e22)
    fwd_inf = jax.jit(lambda ab, x, vl, vr: attention_aggregate(
        n_pad, c_pad, 0.01, ab, x, vl, vr))
    # training forward: the vjp fwd (flash stats accumulated)
    fwd_train = jax.jit(lambda ab, x, vl, vr: _attn_fwd(
        n_pad, c_pad, 0.01, ab, x, vl, vr)[0])

    def loss(ab, x, vl, vr, dout):
        out = attention_aggregate(n_pad, c_pad, 0.01, ab, x, vl, vr)
        return jnp.sum((out * dout).astype(jnp.float32))

    grad = jax.jit(jax.grad(loss, argnums=(1, 2, 3)))

    # GCN-aggregation floor at the same width (bell layout, same graph)
    gg = Graph.from_host(g, strategy="bell")
    from gala_tpu.ops.spmm import spmm

    gcn_fwd = jax.jit(lambda gg, x: spmm(gg, x[: gg.c_pad]))

    t_inf = timeit(fwd_inf, ab, x, vl, vr, iters=args.iters)
    t_fwd = timeit(fwd_train, ab, x, vl, vr, iters=args.iters)
    t_bwd = timeit(grad, ab, x, vl, vr, dout, iters=args.iters)
    t_gcn = timeit(gcn_fwd, gg, x, iters=args.iters)
    print(f"attention fwd (inference, no-flash): {t_inf * 1e3:8.2f} ms "
          f"({slot_f / t_inf / 1e6:7.1f} M slots/s)")
    print(f"attention fwd (train, flash stats):  {t_fwd * 1e3:8.2f} ms "
          f"({slot_f / t_fwd / 1e6:7.1f} M slots/s)")
    print(f"attention fwd+bwd:                   {t_bwd * 1e3:8.2f} ms")
    print(f"gcn spmm fwd floor:                  {t_gcn * 1e3:8.2f} ms "
          f"({slot_f / t_gcn / 1e6:7.1f} M slots/s)")


if __name__ == "__main__":
    main()
