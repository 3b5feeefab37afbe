"""Row-split ELL layout: the TPU-native sparse format for aggregation.

Measured on TPU v5e (see SURVEY.md §6 targets): XLA's row gather runs at
180-320M rows/s but scatter (segment_sum) is row-rate-bound at ~98M
rows/s *independent of row width* — so the structure that wins is one
that keeps the gather (which is wide and partially bandwidth-bound) and
shrinks the scatter.  Row-split ELL does exactly that:

- every destination row is split into ceil(deg/K) *virtual rows* of
  exactly K source slots (phantom slots padded with val=0),
- pass 1 is fully regular: partial[v] = sum_k vals[v,k] * x[cols[v,k]]
  (a gather of V*K rows + a dense K-reduction, no scatter),
- pass 2 scatters only V = N + E/K rows (sorted segment_sum).

This is the TPU answer to the reference's register-coarsened CUDA SpMM
(reference: src/codegen/cuda.h:282-436): the K slots play the role of
the warp's per-thread neighbor loop, virtual-row splitting plays the
role of its `_offset` remainder kernels, and the layout doubles as the
blocked input a future fused Pallas kernel consumes.

K is chosen per graph from the mean degree (the coarsening analog of the
input-aware schedule, reference: tests/gala_inference.cpp:127).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from gala_tpu.data.csr import HostCSR


@dataclasses.dataclass
class HostEll:
    cols: np.ndarray   # (V_pad, K) int32 source ids; phantom col on padding
    vals: np.ndarray   # (V_pad, K) f32; 0 on padding
    vrow: np.ndarray   # (V_pad,) int32 real destination row, sorted
    perm: np.ndarray   # (V_pad, K) int32 forward-edge id of each slot
                       # (E_pad-1, a guaranteed zero-val padded edge, on padding)
    n_virtual: int     # V (before padding to V_pad)
    k: int


# measured TPU v5e row-op rates (rows/s): gather is ~2x the scatter rate
_GATHER_RATE = 180e6
_SCATTER_RATE = 98e6


def choose_k(g: HostCSR, k_min: int = 4, k_max: int = 128) -> int:
    """Pick K minimizing modeled cost: padded-slot gathers at the gather
    rate plus V virtual-row scatters at the scatter rate.  Exact O(E)
    evaluation per candidate — the input-aware coarsening decision
    (analog of reference: tests/gala_inference.cpp:127 coarsen choice)."""
    deg = np.diff(g.row_ptr).astype(np.int64)
    best_k, best_cost = k_min, np.inf
    k = k_min
    while k <= k_max:
        nv = np.maximum((deg + k - 1) // k, 1)
        slots = int((nv * k).sum())
        v = int(nv.sum())
        cost = slots / _GATHER_RATE + v / _SCATTER_RATE
        if cost < best_cost:
            best_cost, best_k = cost, k
        k *= 2
    return best_k


def build_ell(
    g: HostCSR,
    k: int | None = None,
    phantom_col: int | None = None,
    phantom_row: int | None = None,
    pad_edge_id: int | None = None,
) -> HostEll:
    """Vectorized O(E) construction from a dst-sorted HostCSR."""
    if k is None:
        k = choose_k(g)
    n = g.n_rows
    e = g.n_edges
    phantom_col = g.n_cols if phantom_col is None else phantom_col
    phantom_row = n if phantom_row is None else phantom_row
    pad_edge_id = e if pad_edge_id is None else pad_edge_id

    deg = np.diff(g.row_ptr)
    nvirt = np.maximum((deg + k - 1) // k, 1).astype(np.int64)
    vstart = np.zeros(n + 1, np.int64)
    np.cumsum(nvirt, out=vstart[1:])
    v = int(vstart[-1])
    v_pad = ((v + 127) // 128) * 128

    cols = np.full((v_pad, k), phantom_col, np.int32)
    vals = np.zeros((v_pad, k), np.float32)
    perm = np.full((v_pad, k), pad_edge_id, np.int32)
    vrow = np.full(v_pad, phantom_row, np.int32)

    filled = False
    if e > 1_000_000:
        from gala_tpu import native

        src32 = np.ascontiguousarray(g.src, dtype=np.int32)
        vals32 = np.ascontiguousarray(g.vals, dtype=np.float32)
        rp = np.ascontiguousarray(g.row_ptr, dtype=np.int64)
        filled = native.fill_ell_native(
            n, k, rp, src32, vals32, vstart, cols, vals, perm, vrow
        )
    if not filled:
        # slot of each edge: position within its destination row
        t = np.arange(e, dtype=np.int64) - g.row_ptr[g.dst]
        vidx = vstart[g.dst] + t // k
        slot = t % k
        cols[vidx, slot] = g.src
        vals[vidx, slot] = g.vals
        perm[vidx, slot] = np.arange(e, dtype=np.int32)
        vrow[:v] = np.repeat(np.arange(n, dtype=np.int32), nvirt)

    return HostEll(cols=cols, vals=vals, vrow=vrow, perm=perm, n_virtual=v, k=k)


def inflation(ell: HostEll, n_edges: int) -> float:
    """Padded-slot inflation factor (1.0 = no padding overhead)."""
    return ell.cols.shape[0] * ell.k / max(n_edges, 1)
