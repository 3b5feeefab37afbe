#!/usr/bin/env python
"""Diagnose inference_time > total_time on hub-heavy graphs.

Times the four executables of the training protocol individually
(single-epoch dispatches, fetch-fenced): step on subgraphs, step on the
full graph, forward on subgraphs, forward on the full graph, plus the
scan-fused variants — so the phase means in train() decompose.

Usage: python scripts/diag_fwd_vs_step.py [--dataset Reddit --scale 0.25]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import importlib.util

import jax
import jax.numpy as jnp

_SPEC = importlib.util.spec_from_file_location(
    "evaluate", os.path.join(os.path.dirname(os.path.abspath(__file__)), "evaluate.py")
)
ev = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ev)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="Reddit")
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--model", default="gcn")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platform_name", args.platform)

    import gala_tpu
    from gala_tpu.train import make_optimizer, masked_cross_entropy
    from gala_tpu.utils.timing import timeit

    src = ev.make_dsl(args.model, args.dataset)
    cm = gala_tpu.compile_source(src, mode="train", scale=args.scale)
    g = cm.host_graph
    print(f"{args.dataset} x{args.scale}: {g.n_rows} nodes {g.n_edges} edges; "
          f"strategy={cm.full_graphs[0].strategy}")
    if cm.host_train_graphs:
        for i, s in enumerate(cm.host_train_graphs):
            print(f"  train subgraph L{i}: {s.n_edges} edges")

    params = cm.make_params(0)
    tx = make_optimizer()
    opt_state = tx.init(params)
    x_full = jax.jit(cm.invariant)(cm.full_graphs, cm.x)
    gs_train = cm.train_graphs if cm.train_graphs is not None else cm.full_graphs
    x_train = (
        jax.jit(cm.invariant)(gs_train, cm.x)
        if cm.train_graphs is not None else x_full
    )

    @jax.jit
    def fwd(params, graphs, xc):
        return cm.forward(params, graphs, xc)

    def loss_fn(params, graphs, xc):
        return masked_cross_entropy(
            cm.forward(params, graphs, xc), cm.labels, cm.train_mask
        )

    @jax.jit
    def step(params, opt_state, graphs, xc):
        loss, grads = jax.value_and_grad(loss_fn)(params, graphs, xc)
        u, o = tx.update(grads, opt_state, params)
        import optax

        return optax.apply_updates(params, u), o, loss

    @jax.jit
    def grad_only(params, graphs, xc):
        return jax.grad(loss_fn)(params, graphs, xc)

    it = args.iters
    t_fwd_tr = timeit(lambda: fwd(params, gs_train, x_train), iters=it)
    t_fwd_fl = timeit(lambda: fwd(params, cm.full_graphs, x_full), iters=it)
    t_grad_tr = timeit(lambda: grad_only(params, gs_train, x_train), iters=it)
    t_step_tr = timeit(lambda: step(params, opt_state, gs_train, x_train), iters=it)
    t_step_fl = timeit(lambda: step(params, opt_state, cm.full_graphs, x_full), iters=it)
    print(f"forward  train-graphs: {t_fwd_tr * 1e3:8.2f} ms")
    print(f"forward  full-graph  : {t_fwd_fl * 1e3:8.2f} ms")
    print(f"grad     train-graphs: {t_grad_tr * 1e3:8.2f} ms")
    print(f"step     train-graphs: {t_step_tr * 1e3:8.2f} ms")
    print(f"step     full-graph  : {t_step_fl * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
