"""Pallas SDDMM: per-edge dot products with block-DMA staged operands.

dvals[e] = < a[dst[e]], b[src[e]] >  —  the sampled dense-dense matmul
of the GAT backward (dvals = sum(dz[dst] * x[src], -1), see
ops/spmm._spmm_ev_seg_bwd) and of the reference's
`node_spmv_backward_of_sddmm_*` CUDA kernels
(reference: src/codegen/cuda.h:658-760).

Same staging machinery as ops/pallas/bell_spmm: the host planner groups
each edge-chunk's unique a-rows and b-rows into 8-row blocks, the
kernel DMAs whole blocks into VMEM (multiple rows per descriptor,
double-buffered across grid steps), resolves both operands from the
staged tables, and reduces the feature dot.

r3: the staged-row resolution is a ONE-HOT MXU matmul (rows =
OneHot(locals) @ stage), not a dynamic gather — v5e Mosaic cannot
compile in-VMEM gathers over >8-row tables, and scalar-prefetched
block tables overflow the 1MB SMEM at real graph sizes; block ids ride
in SMEM-windowed BlockSpecs instead (see bell_spmm's module
docstring).  NOTE the one-hot form inflates per-edge work by ~u8x
MXU FLOPs — it exists so the chip can MEASURE the fused form against
the XLA two-gather SDDMM (scripts/bench_pallas_bell.py --sddmm); the
XLA form stays the production path unless the numbers say otherwise.

Correctness: interpret mode (tests/test_pallas_bell.py).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gala_tpu.ops.pallas.bell_spmm import BLK, block_specs


def _plan_side(ids2: np.ndarray):
    """ids2: (C, E_c) row ids per chunk -> (blocks (C, U), locals (C, E_c))."""
    c_chunks, ec = ids2.shape
    blocks_l, locals_l = [], []
    for c in range(c_chunks):
        blk = np.unique(ids2[c] // BLK)
        loc = np.searchsorted(blk, ids2[c] // BLK) * BLK + ids2[c] % BLK
        blocks_l.append(blk)
        locals_l.append(loc)
    u = max(b.shape[0] for b in blocks_l)
    blocks = np.zeros((c_chunks, u), np.int32)
    for c, b in enumerate(blocks_l):
        blocks[c, : b.shape[0]] = b
        if b.shape[0] < u:
            blocks[c, b.shape[0]:] = b[0]
    return blocks, np.stack(locals_l).astype(np.int32), u


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class SddmmPlan:
    a_blocks: jax.Array   # (C, Ua)
    a_locals: jax.Array   # (C, Ec)
    b_blocks: jax.Array   # (C, Ec)
    b_locals: jax.Array   # (C, Ec)
    e_real: int
    c_chunks: int
    ec: int
    ua: int
    ub: int
    a_need: int
    b_need: int

    def tree_flatten(self):
        return ((self.a_blocks, self.a_locals, self.b_blocks, self.b_locals),
                (self.e_real, self.c_chunks, self.ec, self.ua, self.ub,
                 self.a_need, self.b_need))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def make_sddmm_plan(dst: np.ndarray, src: np.ndarray,
                    edges_per_chunk: int = 1024) -> SddmmPlan:
    e = dst.shape[0]
    ec = edges_per_chunk
    c_chunks = -(-e // ec)
    e_pad = c_chunks * ec
    d2 = np.zeros(e_pad, np.int64)
    s2 = np.zeros(e_pad, np.int64)
    d2[:e] = dst
    s2[:e] = src
    a_blocks, a_locals, ua = _plan_side(d2.reshape(c_chunks, ec))
    b_blocks, b_locals, ub = _plan_side(s2.reshape(c_chunks, ec))
    return SddmmPlan(
        a_blocks=jnp.asarray(a_blocks), a_locals=jnp.asarray(a_locals),
        b_blocks=jnp.asarray(b_blocks), b_locals=jnp.asarray(b_locals),
        e_real=e, c_chunks=c_chunks, ec=ec, ua=ua, ub=ub,
        a_need=int(a_blocks.max() + 1) * BLK,
        b_need=int(b_blocks.max() + 1) * BLK,
    )


# column-tile width for the one-hot resolution matmul: bounds the
# (Ec, tile) one-hot transient to ~2MB at Ec=1024
_OH_TILE = 2048


def _onehot_rows(loc2d, stage):
    """rows (Ec, f) = stage[loc2d[:, 0]] as a tiled OneHot @ stage MXU
    matmul (loc2d is (Ec, 1) sublane-major; bell_spmm docstring for why
    dynamic gathers cannot compile).  bf16 stages multiply natively."""
    u8, f = stage.shape
    ec = loc2d.shape[0]
    mul_dt = jnp.bfloat16 if stage.dtype == jnp.bfloat16 else jnp.float32
    acc = jnp.zeros((ec, f), jnp.float32)
    for off in range(0, u8, _OH_TILE):
        t = min(_OH_TILE, u8 - off)
        iota = off + jax.lax.broadcasted_iota(jnp.int32, (ec, t), 1)
        oh = (loc2d == iota).astype(mul_dt)
        acc = acc + jnp.dot(oh, stage[off : off + t].astype(mul_dt),
                            preferred_element_type=jnp.float32)
    return acc


def _kernel(sc_ref, sn_ref, a_loc_ref, b_loc_ref, a_hbm, b_hbm, out_ref,
            a_stage, b_stage, sems, *, ua, ub, f):
    """sc/sn pack [a_blocks | b_blocks] (1, 1, Ua+Ub) SMEM windows for
    the current and next chunk.  Staging double-buffers across grid
    steps like bell_spmm."""
    pid = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    def issue_chunk(s_ref, slot):
        def ia(i, _):
            pltpu.make_async_copy(
                a_hbm.at[pl.ds(s_ref[0, 0, i] * BLK, BLK), :],
                a_stage.at[slot, pl.ds(i * BLK, BLK), :],
                sems.at[slot],
            ).start()
            return 0

        jax.lax.fori_loop(0, ua, ia, 0)

        def ib(i, _):
            pltpu.make_async_copy(
                b_hbm.at[pl.ds(s_ref[0, 0, ua + i] * BLK, BLK), :],
                b_stage.at[slot, pl.ds(i * BLK, BLK), :],
                sems.at[slot],
            ).start()
            return 0

        jax.lax.fori_loop(0, ub, ib, 0)

    def wait_chunk(slot):
        def w(i, _):
            pltpu.make_async_copy(
                a_hbm.at[pl.ds(0, BLK), :],
                a_stage.at[slot, pl.ds(0, BLK), :],
                sems.at[slot],
            ).wait()
            return 0

        jax.lax.fori_loop(0, ua + ub, w, 0)

    @pl.when(pid == 0)
    def _():
        issue_chunk(sc_ref, 0)

    @pl.when(pid + 1 < n_chunks)
    def _():
        issue_chunk(sn_ref, (pid + 1) % 2)

    wait_chunk(pid % 2)

    a_rows = _onehot_rows(a_loc_ref[0], a_stage[pid % 2])    # (Ec, f)
    b_rows = _onehot_rows(b_loc_ref[0], b_stage[pid % 2])
    dots = jnp.sum(a_rows * b_rows, axis=1, keepdims=True)   # (Ec, 1)
    out_ref[...] = dots[None].astype(out_ref.dtype)


def sddmm_planned(plan: SddmmPlan, a, b, interpret: bool = False):
    """dvals (E,) = rowwise dots of a[dst] and b[src] per the plan."""
    f = a.shape[1]
    assert f % 128 == 0 and b.shape[1] == f
    # the wait loop counts semaphore bytes with one descriptor shape for
    # both operands — equal dtypes keep every BLK-row copy the same size
    assert a.dtype == b.dtype, (a.dtype, b.dtype)

    def pad_to(x, rows):
        if rows > x.shape[0]:
            return jnp.concatenate(
                [x, jnp.zeros((rows - x.shape[0], f), x.dtype)], axis=0
            )
        return x

    a = pad_to(a, plan.a_need)
    b = pad_to(b, plan.b_need)
    c_chunks, ec = plan.c_chunks, plan.ec
    scalars = jnp.concatenate(
        [plan.a_blocks, plan.b_blocks], axis=1
    ).reshape(c_chunks, 1, plan.ua + plan.ub)

    kern = functools.partial(_kernel, ua=plan.ua, ub=plan.ub, f=f)
    out = pl.pallas_call(
        kern,
        grid=(c_chunks,),
        in_specs=block_specs(c_chunks, plan.ua + plan.ub) + [
            # (C, Ec, 1): sublane-major locals — [:, None]-free layout
            pl.BlockSpec((1, ec, 1), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, ec, 1), lambda c: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, ec, 1), lambda c: (c, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, plan.ua * BLK, f), a.dtype),
            pltpu.VMEM((2, plan.ub * BLK, f), b.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((c_chunks, ec, 1), jnp.float32),
        interpret=interpret,
    )(
        scalars, scalars,
        plan.a_locals.reshape(c_chunks, ec, 1),
        plan.b_locals.reshape(c_chunks, ec, 1),
        a, b,
    )
    return out.reshape(-1)[: plan.e_real]


def sddmm_pallas(a, b, dst: np.ndarray, src: np.ndarray,
                 edges_per_chunk: int = 1024, interpret: bool = False):
    plan = make_sddmm_plan(np.asarray(dst), np.asarray(src), edges_per_chunk)
    return sddmm_planned(plan, a, b, interpret=interpret)
