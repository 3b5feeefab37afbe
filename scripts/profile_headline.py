#!/usr/bin/env python
"""Decompose the arxiv headline epoch (VERDICT r5 task 6 groundwork).

The headline has sat at 185-200M edges/s for four rounds while kernel
microbenches claim 3.8x — this script times the epoch's constituent
executables individually (fetch-fenced, single dispatch each) so the
gap between the slot-gather floor and the measured epoch decomposes
into named parts: flat gather, fwd aggregation sweep, transpose sweep,
FFNs, loss+grad, optimizer, scan fusion benefit.

Every device array rides as a jit ARGUMENT (closure-constant rule,
docs/PERF_NOTES.md).

Usage: python scripts/profile_headline.py [--dataset Arxiv] [--iters 30]
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
    ap.add_argument("--dataset", default="Arxiv")
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    act_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    import gala_tpu
    from gala_tpu.ops.spmm import spmm
    from gala_tpu.train import make_optimizer, masked_cross_entropy
    from gala_tpu.utils.timing import timeit
    from __graft_entry__ import GCN_DSL

    src = GCN_DSL.replace('load_dataset("Arxiv")',
                          f'load_dataset("{args.dataset}")')
    cm = gala_tpu.compile_source(
        src, mode="train", scale=args.scale, dtype=act_dtype
    )
    g = cm.full_graphs[0]
    gh = cm.host_graph
    n_edges = gh.n_edges
    s_f = int(g.bell.flat_cols.shape[0]) if g.bell is not None else 0
    s_b = int(g.t_bell.flat_cols.shape[0]) if g.t_bell is not None else 0
    print(f"{args.dataset} x{args.scale}: {gh.n_rows} nodes {n_edges} edges "
          f"slots fwd={s_f} t={s_b} strategy={g.strategy}")

    params = cm.make_params(0)
    tx = make_optimizer()
    opt_state = tx.init(params)
    x0 = cm.x
    x_inv = jax.jit(cm.invariant)(cm.full_graphs, cm.x)
    y, tm = cm.labels, cm.train_mask

    it = args.iters
    h32 = jnp.zeros((g.c_pad, 32), act_dtype)

    # 1. raw flat gather of the fwd layout (the theorized hot op)
    flat_cols = g.bell.flat_cols if g.bell is not None else None
    if flat_cols is not None:
        t = timeit(jax.jit(lambda x_, c_: x_[c_].sum(axis=0)),
                   h32, flat_cols, iters=it)
        print(f"flat gather (S,32):      {t*1e3:7.2f} ms "
              f"({s_f/t/1e6:6.0f} M slots/s)")

    # 2. one forward aggregation sweep at hidden width
    t_spmm = timeit(jax.jit(lambda g_, x_: spmm(g_, x_[: g_.c_pad])),
                    g, h32, iters=it)
    print(f"spmm fwd sweep (f=32):   {t_spmm*1e3:7.2f} ms "
          f"({s_f/t_spmm/1e6:6.0f} M slots/s)")

    # 3. full model forward (post-invariant)
    fwd = jax.jit(cm.forward)
    t_fwd = timeit(fwd, params, cm.full_graphs, x_inv, iters=it)
    print(f"model forward:           {t_fwd*1e3:7.2f} ms")

    # 4. invariant (hoisted; NOT part of the epoch loop)
    t_inv = timeit(jax.jit(cm.invariant), cm.full_graphs, x0, iters=it)
    print(f"invariant (hoisted):     {t_inv*1e3:7.2f} ms")

    # 5. loss + grad, no optimizer
    def loss_fn(p, graphs, xc, y_, tm_):
        return masked_cross_entropy(cm.forward(p, graphs, xc), y_, tm_)

    vg = jax.jit(lambda p, g_, xc, y_, tm_: jax.value_and_grad(loss_fn)(
        p, g_, xc, y_, tm_))
    t_vg = timeit(vg, params, cm.full_graphs, x_inv, y, tm, iters=it)
    print(f"loss+grad:               {t_vg*1e3:7.2f} ms")

    # 6. full train step (loss+grad+adam)
    @jax.jit
    def step(p, o, graphs, xc, y_, tm_):
        loss, grads = jax.value_and_grad(loss_fn)(p, graphs, xc, y_, tm_)
        up, o2 = tx.update(grads, o, p)
        import optax
        return optax.apply_updates(p, up), o2, loss

    t_step = timeit(
        lambda *a: step(*a)[2], params, opt_state, cm.full_graphs,
        x_inv, y, tm, iters=it,
    )
    print(f"train step (1 dispatch): {t_step*1e3:7.2f} ms")

    # 7. the actual protocol epoch (scan-fused, row-selected)
    res = cm.train(iters=15, warmup=3)
    print(f"protocol epoch:          {res.total_time*1e3:7.2f} ms "
          f"({n_edges/res.total_time/1e6:6.0f} M edges/s)")
    print(f"protocol inference:      {res.inference_time*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
