"""Pallas TPU row-gather via double-buffered per-row DMA.

Candidate replacement for XLA's dynamic-gather in the ELL aggregation
path (gala_tpu/ops/spmm.py): `x` stays in HBM, each kernel block copies
its index rows into VMEM with async DMAs (two chunk buffers in flight)
and writes them to the output block.  This is the TPU analog of the
reference's coalesced row loads in its coarsened CUDA SpMM
(reference: src/codegen/cuda.h:282-436, one warp streaming a row of B
per neighbor).

Use `scripts/microbench.py` to compare against the XLA gather before
selecting this path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid block / per DMA chunk (two chunks in flight)
BM = 2048
CHUNK = 256


def _kernel(idx_ref, x_hbm, out_ref, scratch, sems):
    n_chunks = BM // CHUNK

    def start_chunk(slot, c):
        base = c * CHUNK

        def issue(r, carry):
            i = idx_ref[base + r]
            # all CHUNK copies signal the same per-slot semaphore (the
            # chip has only ~2KB of semaphore space — one per row blows it)
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(i, 1), :],
                scratch.at[slot, pl.ds(r, 1), :],
                sems.at[slot],
            ).start()
            return carry

        jax.lax.fori_loop(0, CHUNK, issue, 0)

    def wait_chunk(slot):
        def w(r, carry):
            # each wait consumes one row-copy's completion on the shared sem
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, 1), :],
                scratch.at[slot, pl.ds(r, 1), :],
                sems.at[slot],
            ).wait()
            return carry

        jax.lax.fori_loop(0, CHUNK, w, 0)

    start_chunk(0, 0)

    def body(c, carry):
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < n_chunks)
        def _():
            start_chunk(nxt, c + 1)

        wait_chunk(slot)
        out_ref[pl.ds(c * CHUNK, CHUNK), :] = scratch[slot]
        return carry

    jax.lax.fori_loop(0, n_chunks, body, 0)


@functools.partial(jax.jit, static_argnames=())
def gather_rows(x: jax.Array, idx: jax.Array) -> jax.Array:
    """out[i] = x[idx[i]].  idx length must be a multiple of BM."""
    m = idx.shape[0]
    f = x.shape[1]
    assert m % BM == 0, m
    grid = (m // BM,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BM,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((BM, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, CHUNK, f), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(idx, x)
