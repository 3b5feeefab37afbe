"""Sparse-dense matrix multiplication (node aggregation) on TPU.

TPU-native replacement for the reference's generated CUDA SpMM kernels
(`aggregate_node_mul_sum_coarseN_kernel*`, reference: src/codegen/cuda.h:282-436)
and its cuSPARSE fallback (reference: src/codegen/cuda.h:211-279), together
with their `torch::autograd::Function` wrappers that run the backward pass
on the transpose graph (reference: src/codegen/common.h:630-1084).

Semantics:  out[d] = sum over edges e with dst[e]==d of vals[e] * x[src[e]]

Three strategies (selected per graph in gala_tpu.ops.graph.choose_strategy):

- dense:        A @ x on the MXU.  The adjacency is densified once
                (structural vals) or re-scattered per call (learned edge
                values).  For small graphs this is the speed-of-light path.
- segment:      weighted gather then `segment_sum` over dst-sorted edges.
- segment_scan: the same, chunked with `lax.scan` + scatter-add into an
                (N, F) accumulator, bounding the (E, F) intermediate — the
                TPU analog of the reference's ordered column tiling
                (reference: src/ops/tiling.h:222-284).

Backward: dx = SpMM(A^T, dZ) uses the pre-sorted transpose edge list
(`t_src/t_dst`), never an unsorted scatter; when edge values are learned
(GAT), dvals = SDDMM(dZ, X) computed gather-only in forward edge order —
the same split as the reference's backward kernels
(reference: src/codegen/cuda.h:658-760 node_spmv_backward_of_sddmm_*).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from gala_tpu.ops.graph import Graph

# edges processed per scan chunk in the segment_scan strategy
SCAN_CHUNK = 1 << 17


def _float0_like(x):
    return np.zeros(x.shape, jax.dtypes.float0)


# --------------------------------------------------------------------------- #
# raw segment kernels (no autodiff)
# --------------------------------------------------------------------------- #
def _seg_oneshot(src, dst, vals, x, n_out):
    msg = vals[:, None] * x[src]
    return jax.ops.segment_sum(msg, dst, num_segments=n_out, indices_are_sorted=True)


def _seg_scan(src, dst, vals, x, n_out):
    e = src.shape[0]
    n_chunks = max(e // SCAN_CHUNK, 1)
    chunk = e // n_chunks
    # e is padded to a multiple of 128; pick a chunking that divides exactly,
    # falling back to one shot if it does not.
    if chunk * n_chunks != e:
        return _seg_oneshot(src, dst, vals, x, n_out)
    srcs = src.reshape(n_chunks, chunk)
    dsts = dst.reshape(n_chunks, chunk)
    valss = vals.reshape(n_chunks, chunk)

    def body(acc, sdv):
        s, d, v = sdv
        msg = v[:, None] * x[s]
        acc = acc.at[d].add(msg, indices_are_sorted=True, unique_indices=False)
        return acc, None

    acc0 = jnp.zeros((n_out, x.shape[1]), x.dtype)
    acc, _ = jax.lax.scan(body, acc0, (srcs, dsts, valss))
    return acc


def _seg_dispatch(src, dst, vals, x, n_out, scan: bool):
    return (_seg_scan if scan else _seg_oneshot)(src, dst, vals, x, n_out)


# --------------------------------------------------------------------------- #
# custom-vjp segment SpMM: structural edge values (not differentiated)
# --------------------------------------------------------------------------- #
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_seg(n_out, c_out, scan, src, dst, t_src, t_dst, vals, t_vals, x):
    return _seg_dispatch(src, dst, vals, x, n_out, scan)


def _spmm_seg_fwd(n_out, c_out, scan, src, dst, t_src, t_dst, vals, t_vals, x):
    out = _seg_dispatch(src, dst, vals, x, n_out, scan)
    return out, (t_src, t_dst, t_vals, src, dst, vals)


def _spmm_seg_bwd(n_out, c_out, scan, res, dz):
    t_src, t_dst, t_vals, src, dst, vals = res
    dx = _seg_dispatch(t_src, t_dst, t_vals, dz, c_out, scan)
    return (
        _float0_like(src), _float0_like(dst),
        _float0_like(t_src), _float0_like(t_dst),
        jnp.zeros_like(vals), jnp.zeros_like(t_vals),
        dx,
    )


_spmm_seg.defvjp(_spmm_seg_fwd, _spmm_seg_bwd)


# --------------------------------------------------------------------------- #
# custom-vjp segment SpMM with learned edge values (GAT path)
# --------------------------------------------------------------------------- #
@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _spmm_ev_seg(n_out, c_out, scan, src, dst, t_src, t_dst, t_perm, vals, x):
    return _seg_dispatch(src, dst, vals, x, n_out, scan)


def _spmm_ev_seg_fwd(n_out, c_out, scan, src, dst, t_src, t_dst, t_perm, vals, x):
    out = _seg_dispatch(src, dst, vals, x, n_out, scan)
    return out, (src, dst, t_src, t_dst, t_perm, vals, x)


def _spmm_ev_seg_bwd(n_out, c_out, scan, res, dz):
    src, dst, t_src, t_dst, t_perm, vals, x = res
    # dx on the transpose graph with the per-edge values permuted into
    # transpose order (the 2*layer+1 graph of the reference).
    dx = _seg_dispatch(t_src, t_dst, vals[t_perm], dz, c_out, scan)
    # dvals: SDDMM(dz, x) in forward edge order (gathers only).
    dvals = jnp.sum(dz[dst] * x[src], axis=-1)
    return (
        _float0_like(src), _float0_like(dst),
        _float0_like(t_src), _float0_like(t_dst), _float0_like(t_perm),
        dvals, dx,
    )


_spmm_ev_seg.defvjp(_spmm_ev_seg_fwd, _spmm_ev_seg_bwd)


# --------------------------------------------------------------------------- #
# public API
# --------------------------------------------------------------------------- #
def spmm(g: Graph, x: jax.Array) -> jax.Array:
    """Aggregate node features over the graph: out = A @ x.

    Structural edge values (g.vals); gradient flows to `x` only, via the
    transpose graph.  `x` is (n_pad_src, F); returns (n_pad_dst, F).
    """
    if g.strategy == "dense":
        return jnp.dot(
            g.a_dense, x,
            preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    scan = g.strategy == "segment_scan"
    return _spmm_seg(
        g.n_pad, g.c_pad, scan,
        g.src, g.dst, g.t_src, g.t_dst, g.vals, g.t_vals, x,
    )


def spmm_ev(g: Graph, vals: jax.Array, x: jax.Array) -> jax.Array:
    """Aggregate with *learned* per-edge values (forward edge order).

    Gradient flows to both `vals` (SDDMM) and `x` (transpose SpMM) — the
    autograd contract of the reference's SpMM-with-edge-values wrapper
    (reference: src/codegen/common.h:863-892).
    """
    if g.strategy == "dense":
        a = jnp.zeros((g.n_pad, g.c_pad), x.dtype)
        a = a.at[g.dst, g.src].add(vals, indices_are_sorted=True)
        return jnp.dot(
            a, x,
            preferred_element_type=x.dtype,
            precision=jax.lax.Precision.HIGHEST,
        )
    scan = g.strategy == "segment_scan"
    return _spmm_ev_seg(
        g.n_pad, g.c_pad, scan,
        g.src, g.dst, g.t_src, g.t_dst, g.t_perm, vals, x,
    )


def spmm_direct(g: Graph, x: jax.Array) -> jax.Array:
    """Non-differentiable aggregation (AGGREGATE_MUL_SUM_DIRECT,
    reference: src/ir/compute.h:41) — e.g. the degree computation
    A @ ones used for normalization; always detached."""
    return jax.lax.stop_gradient(spmm(g, x))


def degrees(g: Graph) -> jax.Array:
    """In-degree column vector (n_pad, 1) — precomputed at graph build,
    matching SpMM(A, ones) on the padded graph."""
    return g.deg
