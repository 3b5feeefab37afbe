"""Neighbor sampling (host / NumPy).

Clean-room equivalents of the reference's samplers:
- `inplace_sample_graph` (reference: src/ops/tiling.h:389-453): true
  random choice of `k` incoming neighbors per node, CSR rebuilt.
- `inplace_sample_graph_ab` (reference: src/ops/tiling.h:454-512): the
  deterministic LCG pick j = (ra*i + rb) % deg, chosen to agree with the
  in-kernel sampling formula so data-level and kernel-level sampling
  select identical neighbors.

Kernel-level sampling on TPU is realized the same way — as an index
transform producing a fixed-degree edge list — because a fixed k per
node yields exactly the rectangular, static-shape layout TPUs want
(it is literally an ELL format).
"""
from __future__ import annotations

import numpy as np

from gala_tpu.data.csr import HostCSR, coo_to_csr


def sample_graph_random(g: HostCSR, k: int, seed: int = 0) -> HostCSR:
    """Keep up to k random incoming neighbors per destination node."""
    rng = np.random.default_rng(seed)
    keep_idx = []
    for r in range(g.n_rows):
        lo, hi = g.row_ptr[r], g.row_ptr[r + 1]
        deg = hi - lo
        if deg <= k:
            keep_idx.append(np.arange(lo, hi))
        else:
            keep_idx.append(lo + rng.choice(deg, size=k, replace=False))
    idx = np.concatenate(keep_idx) if keep_idx else np.zeros(0, np.int64)
    return coo_to_csr(g.src[idx], g.dst[idx], g.vals[idx], g.n_rows, g.n_cols)


def sample_graph_ab(g: HostCSR, k: int, ra: int = 5, rb: int = 7) -> HostCSR:
    """Deterministic LCG sampling: the i-th sample of a row with degree d
    is neighbor (ra*i + rb) % d (reference: tiling.h:454 and the in-kernel
    formula cuda.h:313-320).  Duplicate picks are kept, as in the
    reference (sum aggregation then weights repeated neighbors)."""
    deg = np.diff(g.row_ptr)
    keep = []
    for r in range(g.n_rows):
        d = deg[r]
        if d == 0:
            continue
        lo = g.row_ptr[r]
        n_pick = min(d, k)
        i = np.arange(n_pick)
        keep.append(lo + (ra * i + rb) % d)
    idx = np.concatenate(keep) if keep else np.zeros(0, np.int64)
    return coo_to_csr(g.src[idx], g.dst[idx], g.vals[idx], g.n_rows, g.n_cols)


def dynamic_sample_params(epoch: int, seed: int = 0) -> tuple[int, int]:
    """Per-epoch (ra, rb) for dynamic kernel sampling (the reference draws
    fresh random ra/rb each epoch, src/codegen/common.h:822-833)."""
    rng = np.random.default_rng(seed + epoch)
    return int(rng.integers(1, 97)), int(rng.integers(0, 97))
