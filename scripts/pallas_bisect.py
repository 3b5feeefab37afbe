"""Bisect the Mosaic compile failure of the fused bell-SpMM kernels.

As of r3 the TRIVIAL Pallas kernel compiles on the real toolchain
(queue gate: 'mosaic ok') while bell_spmm_pallas still gets
HTTP 500 / tpu_compile_helper exit 1 — so the failure is a specific
kernel feature, not the environment.  This script runs a ladder of
kernels, each adding one feature of the real kernel, every stage in
its OWN subprocess (a compiler crash must not poison later stages).

Usage: python scripts/pallas_bisect.py [--stage N]   (no stage = all)
"""
import argparse
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

COMMON = """
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK, U, R, K, F = 8, 4, 8, 4, 128
C = 3  # grid chunks
rng = np.random.default_rng(0)
N = U * BLK * 4
x = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
blocks = jnp.asarray(rng.integers(0, N // BLK, (C, U)).astype(np.int32))
locals_ = jnp.asarray(rng.integers(0, U * BLK, (C, R, K)).astype(np.int32))
vals = jnp.asarray(rng.normal(size=(C, R, K)).astype(np.float32))
"""

STAGES = {
    1: ("trivial elementwise", COMMON + """
def kern(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0
out = pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(
    jnp.ones((128, 128)))
out.block_until_ready()
"""),
    2: ("grid + BlockSpec", COMMON + """
def kern(x_ref, o_ref):
    o_ref[...] = x_ref[0] + 1.0
out = pl.pallas_call(
    kern,
    grid=(C,),
    in_specs=[pl.BlockSpec((1, R, K), lambda c: (c, 0, 0))],
    out_specs=pl.BlockSpec((R, K), lambda c: (c, 0)),
    out_shape=jax.ShapeDtypeStruct((C * R, K), jnp.float32),
)(vals)
out.block_until_ready()
"""),
    3: ("PrefetchScalarGridSpec scalar arg", COMMON + """
def kern(blocks_ref, v_ref, o_ref):
    o_ref[...] = v_ref[0] + blocks_ref[0, 0].astype(jnp.float32)
gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(C,),
    in_specs=[pl.BlockSpec((1, R, K), lambda c, b: (c, 0, 0))],
    out_specs=pl.BlockSpec((R, K), lambda c, b: (c, 0)),
)
out = pl.pallas_call(kern, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((C * R, K), jnp.float32))(blocks, vals)
out.block_until_ready()
"""),
    4: ("static DMA HBM->VMEM + wait", COMMON + """
def kern(blocks_ref, v_ref, x_hbm, o_ref, staged, sem):
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(0, BLK), :], staged.at[pl.ds(0, BLK), :], sem)
    cp.start(); cp.wait()
    o_ref[...] = jnp.broadcast_to(staged[0:1, :], o_ref.shape)
gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(C,),
    in_specs=[pl.BlockSpec((1, R, K), lambda c, b: (c, 0, 0)),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((R, F), lambda c, b: (c, 0)),
    scratch_shapes=[pltpu.VMEM((U * BLK, F), jnp.float32),
                    pltpu.SemaphoreType.DMA],
)
out = pl.pallas_call(kern, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((C * R, F), jnp.float32))(blocks, vals, x)
out.block_until_ready()
"""),
    5: ("dynamic-offset DMA from prefetched scalar", COMMON + """
def kern(blocks_ref, v_ref, x_hbm, o_ref, staged, sem):
    c = pl.program_id(0)
    cp = pltpu.make_async_copy(
        x_hbm.at[pl.ds(blocks_ref[c, 0] * BLK, BLK), :],
        staged.at[pl.ds(0, BLK), :], sem)
    cp.start(); cp.wait()
    o_ref[...] = jnp.broadcast_to(staged[0:1, :], o_ref.shape)
gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(C,),
    in_specs=[pl.BlockSpec((1, R, K), lambda c, b: (c, 0, 0)),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((R, F), lambda c, b: (c, 0)),
    scratch_shapes=[pltpu.VMEM((U * BLK, F), jnp.float32),
                    pltpu.SemaphoreType.DMA],
)
out = pl.pallas_call(kern, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((C * R, F), jnp.float32))(blocks, vals, x)
out.block_until_ready()
"""),
    6: ("fori_loop of DMA issues + wait loop (1 slot)", COMMON + """
def kern(blocks_ref, v_ref, x_hbm, o_ref, staged, sem):
    c = pl.program_id(0)
    def issue(i, _):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(blocks_ref[c, i] * BLK, BLK), :],
            staged.at[pl.ds(i * BLK, BLK), :], sem).start()
        return 0
    jax.lax.fori_loop(0, U, issue, 0)
    def wait(i, _):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, BLK), :],
            staged.at[pl.ds(i * BLK, BLK), :], sem).wait()
        return 0
    jax.lax.fori_loop(0, U, wait, 0)
    o_ref[...] = jnp.broadcast_to(staged[0:1, :], o_ref.shape)
gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(C,),
    in_specs=[pl.BlockSpec((1, R, K), lambda c, b: (c, 0, 0)),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((R, F), lambda c, b: (c, 0)),
    scratch_shapes=[pltpu.VMEM((U * BLK, F), jnp.float32),
                    pltpu.SemaphoreType.DMA],
)
out = pl.pallas_call(kern, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((C * R, F), jnp.float32))(blocks, vals, x)
out.block_until_ready()
"""),
    7: ("double-buffered DMA across grid steps", COMMON + """
def kern(blocks_ref, v_ref, x_hbm, o_ref, staged, sems):
    pid = pl.program_id(0)
    n_chunks = pl.num_programs(0)
    def issue_chunk(c, slot):
        def issue(i, _):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(blocks_ref[c, i] * BLK, BLK), :],
                staged.at[slot, pl.ds(i * BLK, BLK), :], sems.at[slot]).start()
            return 0
        jax.lax.fori_loop(0, U, issue, 0)
    def wait_chunk(slot):
        def wait(i, _):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, BLK), :],
                staged.at[slot, pl.ds(i * BLK, BLK), :], sems.at[slot]).wait()
            return 0
        jax.lax.fori_loop(0, U, wait, 0)
    @pl.when(pid == 0)
    def _():
        issue_chunk(0, 0)
    @pl.when(pid + 1 < n_chunks)
    def _():
        issue_chunk(pid + 1, (pid + 1) % 2)
    wait_chunk(pid % 2)
    o_ref[...] = jnp.broadcast_to(staged[pid % 2, 0:1, :], o_ref.shape)
gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(C,),
    in_specs=[pl.BlockSpec((1, R, K), lambda c, b: (c, 0, 0)),
              pl.BlockSpec(memory_space=pl.ANY)],
    out_specs=pl.BlockSpec((R, F), lambda c, b: (c, 0)),
    scratch_shapes=[pltpu.VMEM((2, U * BLK, F), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,))],
)
out = pl.pallas_call(kern, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((C * R, F), jnp.float32))(blocks, vals, x)
out.block_until_ready()
"""),
    8: ("in-VMEM take_along_axis gather", COMMON + """
import sys; sys.path.insert(0, r"%s")
from gala_tpu.ops.pallas.bell_spmm import _vmem_gather
def kern(l_ref, v_ref, x_ref, o_ref):
    tab = x_ref[...]
    seg = _vmem_gather(tab, l_ref[0].reshape(-1)).reshape(R, K, F)
    o_ref[...] = jnp.sum(v_ref[0][..., None] * seg, axis=1)
out = pl.pallas_call(
    kern,
    grid=(C,),
    in_specs=[pl.BlockSpec((1, R, K), lambda c: (c, 0, 0)),
              pl.BlockSpec((1, R, K), lambda c: (c, 0, 0)),
              pl.BlockSpec((U * BLK, F), lambda c: (0, 0))],
    out_specs=pl.BlockSpec((R, F), lambda c: (c, 0)),
    out_shape=jax.ShapeDtypeStruct((C * R, F), jnp.float32),
)(locals_, vals, x[: U * BLK])
out.block_until_ready()
""" % os.path.dirname(HERE)),
    # --- r3 fix candidates: stage 8 isolated the failure to the in-kernel
    # (R,k)->(rk,) index reshape (tpu.reshape vector<1x8x4xi32> ->
    # vector<32xi32>), NOT the dynamic gather itself.  These stages feed
    # the indices already in (rk,1) sublane-major layout from the host so
    # the kernel never reshapes across lanes/sublanes.
    81: ("gather, host-shaped (rk,1) idx, table-shaped bcast", COMMON + """
def kern(l_ref, v_ref, x_ref, o_ref):
    tab = x_ref[...]
    u8, f = tab.shape
    idx = l_ref[0]                                  # (u8, 1) already
    g = jnp.take_along_axis(tab, jnp.broadcast_to(idx, (u8, f)), axis=0)
    w = g * v_ref[0]                                # (u8, f) * (u8, 1)
    ri = jax.lax.broadcasted_iota(jnp.int32, (R, u8), 0)
    si = jax.lax.broadcasted_iota(jnp.int32, (R, u8), 1)
    A = ((si // K) == ri).astype(jnp.float32)
    o_ref[...] = jnp.dot(A, w, preferred_element_type=jnp.float32)
u8 = U * BLK
lflat = jnp.zeros((C, u8, 1), jnp.int32).at[:, : R * K, 0].set(
    locals_.reshape(C, R * K))
vflat = jnp.zeros((C, u8, 1), jnp.float32).at[:, : R * K, 0].set(
    vals.reshape(C, R * K))
out = pl.pallas_call(
    kern,
    grid=(C,),
    in_specs=[pl.BlockSpec((1, u8, 1), lambda c: (c, 0, 0)),
              pl.BlockSpec((1, u8, 1), lambda c: (c, 0, 0)),
              pl.BlockSpec((u8, F), lambda c: (0, 0))],
    out_specs=pl.BlockSpec((R, F), lambda c: (c, 0)),
    out_shape=jax.ShapeDtypeStruct((C * R, F), jnp.float32),
)(lflat, vflat, x[:u8])
ref = jnp.einsum('crk,crkf->crf', vals,
                 x[:u8][locals_]).reshape(C * R, F)
assert jnp.allclose(out, ref, atol=1e-4), 'WRONG RESULT'
out.block_until_ready()
"""),
    82: ("gather, (g8,f) output-shaped idx smaller than table", COMMON + """
def kern(l_ref, x_ref, o_ref):
    tab = x_ref[...]          # (u8, F)
    g8 = R                    # gather fewer rows than the table has
    idx = l_ref[0][:g8]       # (g8, 1)
    g = jnp.take_along_axis(tab, jnp.broadcast_to(idx, (g8, F)), axis=0)
    o_ref[...] = g
u8 = U * BLK
lflat = jnp.zeros((C, u8, 1), jnp.int32).at[:, : R * K, 0].set(
    locals_.reshape(C, R * K))
out = pl.pallas_call(
    kern,
    grid=(C,),
    in_specs=[pl.BlockSpec((1, u8, 1), lambda c: (c, 0, 0)),
              pl.BlockSpec((u8, F), lambda c: (0, 0))],
    out_specs=pl.BlockSpec((R, F), lambda c: (c, 0)),
    out_shape=jax.ShapeDtypeStruct((C * R, F), jnp.float32),
)(lflat, x[:u8])
out.block_until_ready()
"""),
    9: ("one-hot MXU distribute", COMMON + """
def kern(l_ref, v_ref, x_ref, o_ref):
    tab = x_ref[...]
    u8 = U * BLK
    iota = jax.lax.broadcasted_iota(jnp.int32, (R, u8), 1)
    w = jnp.zeros((R, u8), jnp.float32)
    loc = l_ref[0]
    vv = v_ref[0]
    for j in range(K):
        hit = (loc[:, j][:, None] == iota).astype(jnp.float32)
        w = w + vv[:, j][:, None] * hit
    o_ref[...] = jnp.dot(w, tab, preferred_element_type=jnp.float32)
out = pl.pallas_call(
    kern,
    grid=(C,),
    in_specs=[pl.BlockSpec((1, R, K), lambda c: (c, 0, 0)),
              pl.BlockSpec((1, R, K), lambda c: (c, 0, 0)),
              pl.BlockSpec((U * BLK, F), lambda c: (0, 0))],
    out_specs=pl.BlockSpec((R, F), lambda c: (c, 0)),
    out_shape=jax.ShapeDtypeStruct((C * R, F), jnp.float32),
)(locals_, vals, x[: U * BLK])
out.block_until_ready()
"""),
    10: ("full bell_spmm_pallas (tiny)", COMMON + """
import sys; sys.path.insert(0, r"%s")
from gala_tpu.ops.pallas.bell_spmm import bell_spmm_pallas
cols = rng.integers(0, N, 4096 * K).astype(np.int32)
vv = jnp.asarray(rng.normal(size=(4096, K)).astype(np.float32))
out = bell_spmm_pallas(x, cols, vv, K, rows_per_chunk=R)
out.block_until_ready()
""" % os.path.dirname(HERE)),
    11: ("full bell_spmm_pallas ONE-HOT (tiny) + parity", COMMON + """
import sys; sys.path.insert(0, r"%s")
from gala_tpu.ops.pallas.bell_spmm import bell_spmm_pallas
cols = rng.integers(0, N, 4096 * K).astype(np.int32)
vv = jnp.asarray(rng.normal(size=(4096, K)).astype(np.float32))
out = bell_spmm_pallas(x, cols, vv, K, rows_per_chunk=R, use_gather=False)
out.block_until_ready()
ref = jnp.einsum('bk,bkf->bf', vv, x[cols].reshape(4096, K, -1))
assert jnp.allclose(out, ref, atol=1e-3), 'WRONG RESULT'
""" % os.path.dirname(HERE)),
}


def run_stage(n: int, timeout: float) -> tuple[bool, str]:
    name, code = STAGES[n]
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code + "\nprint('STAGE_OK')\n"],
            timeout=timeout, capture_output=True, text=True,
        )
        ok = proc.returncode == 0 and "STAGE_OK" in proc.stdout
        err = "" if ok else (proc.stderr or proc.stdout)[-1200:]
    except subprocess.TimeoutExpired:
        ok, err = False, f"TIMEOUT {timeout}s"
    return ok, err


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=0)
    ap.add_argument("--timeout", type=float, default=240.0)
    args = ap.parse_args()
    stages = [args.stage] if args.stage else sorted(STAGES)
    for n in stages:
        ok, err = run_stage(n, args.timeout)
        name = STAGES[n][0]
        print(f"stage {n:2d} [{name}]: {'PASS' if ok else 'FAIL'}", flush=True)
        if not ok:
            for line in err.splitlines()[-8:]:
                print(f"    {line}", flush=True)


if __name__ == "__main__":
    main()
