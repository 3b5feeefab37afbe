"""Chip microbench: fused Pallas bell-SpMM vs the XLA bell reduce.

Run on the real TPU (axon).  Compares, on small and cliff-sized tables:
  - XLA one-shot gather+einsum (the current _bell_bin_reduce core)
  - XLA staged two-level gather (stage tables)
  - Pallas block-DMA kernel, gather form and one-hot form

VERDICT r1 #1 'done' bar: Pallas >= XLA gather on a <100MB table AND
>= 3x XLA on a Products-scale (>500MB physical) table.
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gala_tpu.ops.pallas.bell_spmm import bell_spmm_pallas


def fence(x):
    np.asarray(jax.device_get(x.reshape(-1)[:1]))  # axon: host fetch fences


def timeit(fn, iters=20, warmup=3):
    for _ in range(warmup):
        fence(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    fence(out)
    return (time.perf_counter() - t0) / iters


def timeit_args(fn, *args, iters=20, warmup=3):
    """jit fn and time jf(*args): operands ride as jit ARGUMENTS —
    a closed-over device array embeds in the lowered module and blows
    the remote-compile request limit (HTTP 413) at big-table sizes."""
    jf = jax.jit(fn)
    for _ in range(warmup):
        fence(jf(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    fence(out)
    return (time.perf_counter() - t0) / iters


def xla_reduce(cols_dev, vals, x, nb, k):
    seg = x[cols_dev].reshape(nb, k, x.shape[1])
    return jnp.einsum("vk,vkf->vf", vals, seg,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=600_000)     # table rows
    ap.add_argument("--f", type=int, default=128)
    ap.add_argument("--nb", type=int, default=1_000_000)  # output rows
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--rows-per-chunk", type=int, default=256)
    ap.add_argument("--sddmm", action="store_true",
                    help="also bench the Pallas SDDMM vs XLA two-gather")
    ap.add_argument("--attn", action="store_true",
                    help="bench the fused Pallas attention forward vs the "
                         "XLA gather + per-head softmax + reduce chain")
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--locality", type=float, default=0.0,
                    help="0 = uniform random cols; >0 = cols clustered "
                         "in windows of this fraction of the table")
    args = ap.parse_args()
    interp = jax.default_backend() != "tpu"  # CPU smoke runs use interpret
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng = np.random.default_rng(0)
    n, f, nb, k = args.n, args.f, args.nb, args.k
    if args.locality > 0:
        # sorted per-row windows: consecutive output rows draw from
        # overlapping table windows, the access pattern an RCM/degree
        # reorder produces — block reuse ACROSS rows is what the bell
        # planner converts into fewer DMAs (unsorted bases give every
        # row a disjoint window: reuse < 1, nothing to stage)
        w = max(int(n * args.locality), 1)
        base = np.sort(rng.integers(0, max(n - w, 1), nb))[:, None]
        cols = (base + rng.integers(0, w, (nb, k))).reshape(-1).astype(np.int32)
    else:
        cols = rng.integers(0, n, nb * k).astype(np.int32)
    vals = jnp.asarray(rng.normal(size=(nb, k)).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32)).astype(dt)
    phys_mb = n * ((f + 127) // 128 * 128) * jnp.dtype(dt).itemsize / 1e6
    print(f"table {phys_mb:.0f} MB physical, {nb*k/1e6:.1f}M slots, k={k}")

    cols_dev = jnp.asarray(cols)
    t = timeit_args(functools.partial(xla_reduce, nb=nb, k=k),
                    cols_dev, vals, x)
    print(f"xla one-shot: {t*1e3:8.2f} ms  {nb*k/t/1e6:8.1f}M slots/s")

    from gala_tpu.ops.pallas.bell_spmm import (
        bell_spmm_planned, make_plan as _mk,
    )

    # same VMEM budget build_segment_plans uses (staging + one-hot
    # transients); unbudgeted plans overflow VMEM at these sizes
    itemsize = jnp.dtype(dt).itemsize
    row_bytes = 2 * max(f, 128) * itemsize + 12 * args.rows_per_chunk
    budget_rows = max(min(int(8 << 20) // row_bytes, 8192), 8)
    bplan = _mk(cols, k, args.rows_per_chunk, max_staged_rows=budget_rows)
    if bplan is None:
        print("pallas bell: NO PLAN (staging cannot fit VMEM)")
    else:
        print(f"plan: r={bplan.r} u8={bplan.u*8} C={bplan.c_chunks} "
              f"(staged {2*bplan.u*8*max(f,128)*itemsize/1e6:.1f} MB)")
    prec = jax.lax.Precision.HIGHEST
    for form, label in ((None, "pallas bell fast"),
                        (prec, "pallas bell f32 ")):
        if bplan is None:
            break
        try:
            t = timeit_args(
                functools.partial(bell_spmm_planned, precision=form,
                                  interpret=interp),
                bplan, x, vals)
            print(f"{label}: {t*1e3:8.2f} ms  {nb*k/t/1e6:8.1f}M slots/s")
        except Exception as e:  # noqa: BLE001 — report which form fails to lower
            print(f"{label}: FAILED — {type(e).__name__}: {str(e)[:200]}")

    if args.attn:
        from gala_tpu.ops.pallas.attn_bell import attn_fwd_planned
        from gala_tpu.ops.pallas.bell_spmm import make_plan

        nh, slope = args.heads, 0.2
        hf = f  # features; kernel input is [x | vl] in one 128-lane table
        f_pad = ((hf + nh + 127) // 128) * 128
        xx = jnp.zeros((n, f_pad), dt).at[:, :hf].set(x.astype(dt))
        xx = xx.at[:, hf : hf + nh].set(
            jnp.asarray(rng.normal(size=(n, nh)).astype(np.float32)).astype(dt)
        )
        vr = jnp.asarray(rng.normal(size=(nb, nh)).astype(np.float32))
        w = jnp.asarray(
            (rng.random((nb, k)) > 0.1).astype(np.float32)
        ).at[:, 0].set(1.0)

        def xla_attn(xx, cols_dev, vr, w):
            seg = xx[cols_dev].reshape(nb, k, f_pad)
            outs = []
            fh = hf // nh
            for h in range(nh):
                z = seg[..., hf + h].astype(jnp.float32) + vr[:, h][:, None]
                z = jnp.where(z > 0, z, slope * z)
                z = jnp.where(w != 0, z, -1e30)
                m = jnp.max(z, axis=1)
                p = jnp.where(w != 0, jnp.exp(z - m[:, None]), 0.0)
                p = p / jnp.maximum(jnp.sum(p, axis=1), 1e-30)[:, None]
                outs.append(jnp.einsum(
                    "vk,vkf->vf", p.astype(dt), seg[..., h * fh : (h + 1) * fh],
                    preferred_element_type=jnp.float32))
            return jnp.concatenate(outs, axis=1).astype(dt)

        t = timeit_args(xla_attn, xx, cols_dev, vr, w)
        print(f"xla attn:     {t*1e3:8.2f} ms  {nb*k/t/1e6:8.1f}M slots/s")
        itemsize = jnp.dtype(dt).itemsize
        # budget staging for the WIDEST table any attention pass gathers
        # (backward pass-2 stages the hf+4H-wide destination table);
        # per-row bytes include the table-shaped int32 index matrix the
        # in-kernel gather passes broadcast
        wt_budget = ((hf + 4 * nh + 127) // 128) * 128
        fb = max(f_pad, wt_budget)
        budget_rows = max(min((10 << 20) // (2 * fb * itemsize), 8192), 8)
        # r=128: the library's attention plan cap (VMEM stack budget,
        # ops/attention._plans)
        plan = make_plan(cols, k, rows_per_chunk=128,
                         max_staged_rows=budget_rows,
                         f_budget=max(f_pad, wt_budget))
        if plan is None:
            print("pallas attn:  no feasible plan (staging exceeds VMEM)")
        else:
            xxp = xx
            if plan.n_need > n:
                xxp = jnp.concatenate(
                    [xx, jnp.zeros((plan.n_need - n, f_pad), dt)], axis=0)
            try:
                t = timeit_args(
                    lambda p_, xxp_, w_, vr_: attn_fwd_planned(
                        p_, xxp_, w_, vr_, hf, nh, slope,
                        interpret=interp)[0],
                    plan, xxp, w, vr)
                print(f"pallas attn:  {t*1e3:8.2f} ms  "
                      f"{nb*k/t/1e6:8.1f}M slots/s")
            except Exception as ex:  # noqa: BLE001
                print(f"pallas attn:  FAILED — "
                      f"{type(ex).__name__}: {str(ex)[:200]}")

            # backward pass-1 (stats on the same [x | vl] table)
            from gala_tpu.ops.pallas.attn_bell import (
                attn_bwd1_planned, attn_bwd2_planned,
            )

            do_rows = jnp.asarray(
                rng.normal(size=(nb, hf)).astype(np.float32))
            m_rows = jnp.asarray(rng.normal(size=(nb, nh)).astype(np.float32))
            s_rows = jnp.asarray(
                (rng.random((nb, nh)) + 0.5).astype(np.float32))
            try:
                t = timeit_args(
                    lambda p_, xxp_, w_, vr_, do_, m_, s_: attn_bwd1_planned(
                        p_, xxp_, w_, vr_, do_, m_, s_, hf, nh,
                        slope, interpret=interp)[0],
                    plan, xxp, w, vr, do_rows, m_rows, s_rows)
                print(f"pallas bwd1:  {t*1e3:8.2f} ms  "
                      f"{nb*k/t/1e6:8.1f}M slots/s")
            except Exception as ex:  # noqa: BLE001
                print(f"pallas bwd1:  FAILED — "
                      f"{type(ex).__name__}: {str(ex)[:200]}")

            # backward pass-2 (slot grads on the hf+4H-wide dst table)
            wt = hf + 4 * nh
            wt_pad = ((wt + 127) // 128) * 128
            wtab = jnp.asarray(
                rng.normal(size=(max(n, plan.n_need), wt_pad))
                .astype(np.float32))
            x_rows = jnp.asarray(
                rng.normal(size=(nb, hf)).astype(np.float32))
            vl_rows = jnp.asarray(
                rng.normal(size=(nb, nh)).astype(np.float32))
            try:
                t = timeit_args(
                    lambda p_, wt_, w_, x_, vl_: attn_bwd2_planned(
                        p_, wt_, w_, x_, vl_, hf, nh, slope,
                        interpret=interp),
                    plan, wtab, w, x_rows, vl_rows)
                print(f"pallas bwd2:  {t*1e3:8.2f} ms  "
                      f"{nb*k/t/1e6:8.1f}M slots/s")
            except Exception as ex:  # noqa: BLE001
                print(f"pallas bwd2:  FAILED — "
                      f"{type(ex).__name__}: {str(ex)[:200]}")

    if args.sddmm:
        from gala_tpu.ops.pallas.sddmm import sddmm_pallas

        e = nb * k
        dst = rng.integers(0, n, e).astype(np.int32)
        srcv = cols
        a = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32)).astype(dt)
        dst_dev, src_dev = jnp.asarray(dst), jnp.asarray(srcv)
        t = timeit_args(
            lambda a_, x_, d_, s_: jnp.sum(a_[d_] * x_[s_], axis=1),
            a, x, dst_dev, src_dev)
        print(f"xla sddmm:    {t*1e3:8.2f} ms  {e/t/1e6:8.1f}M edges/s")
        try:
            t = timeit_args(
                lambda a_, x_: sddmm_pallas(a_, x_, dst, srcv,
                                            interpret=interp),
                a, x)
            print(f"pallas sddmm: {t*1e3:8.2f} ms  {e/t/1e6:8.1f}M edges/s")
        except Exception as ex:  # noqa: BLE001
            print(f"pallas sddmm: FAILED — {type(ex).__name__}: {str(ex)[:200]}")


if __name__ == "__main__":
    main()
