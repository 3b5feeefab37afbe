#!/usr/bin/env python
"""Compile-only HBM probe for the staged bell reduce inside a training
loop at table5-cir Products-0.25 scale (the config that OOMed on chip:
21.48G needed / 15.75G HBM, results_r4/queue.log).

AOT-compiles (TpuAotCompiler, chipless — never touches the running
chip) a value_and_grad bell-SpMM step wrapped in a fori epoch loop —
the liveness context that defeated the unrolled barrier chain — and
prints the compiler's memory analysis.  Pass --no-stage to measure the
unstaged fallback for comparison.
"""
import argparse
import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-stage", action="store_true")
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--feats", type=int, default=100)
    args = ap.parse_args()

    from gala_tpu.data.datasets import load_dataset
    from gala_tpu.ops.graph import Graph
    from gala_tpu.ops.spmm import spmm

    g_host, feats, labels, masks = load_dataset("Products", scale=args.scale)
    g = Graph.from_host(g_host, strategy="bell")
    print("stage chunks:",
          len(g.bell.stage) if g.bell.stage is not None else None,
          "uniq_frac:", g.bell.uniq_frac)
    if args.no_stage:
        g = dataclasses.replace(
            g,
            bell=dataclasses.replace(g.bell, stage=None),
            t_bell=dataclasses.replace(g.t_bell, stage=None),
        )

    f = args.feats
    n_pad = g.n_pad

    def step(w, g_, x_):
        def loss(w_):
            h = x_ @ w_
            z = spmm(g_, h)
            return jnp.sum(z * z)

        l, dw = jax.value_and_grad(loss)(w)
        return w - 1e-3 * dw, l

    def epochs(w, g_, x_):
        def body(_, carry):
            w_, _l = carry
            return step(w_, g_, x_)

        return jax.lax.fori_loop(0, 5, body, (w, jnp.float32(0.0)))

    w = jax.ShapeDtypeStruct((f, f), jnp.float32)
    x = jax.ShapeDtypeStruct((n_pad, f), jnp.float32)
    lowered = jax.jit(epochs).lower(w, g, x)
    print("lowered; compiling (AOT, chipless)...")
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1 << 30
    print(f"temp:   {ma.temp_size_in_bytes / gb:.2f} GiB")
    print(f"args:   {ma.argument_size_in_bytes / gb:.2f} GiB")
    print(f"output: {ma.output_size_in_bytes / gb:.2f} GiB")
    print(f"total:  {(ma.temp_size_in_bytes + ma.argument_size_in_bytes) / gb:.2f} GiB")


if __name__ == "__main__":
    main()
