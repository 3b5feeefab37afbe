"""Input statistics for input-aware scheduling and analysis.

Clean-room equivalents of the reference's "approx" statistics
(reference: src/ops/approx.h) and matrix-property analysis
(reference: src/formats/matrix_prop.h MtxStats/DistStats).
"""
from __future__ import annotations

import dataclasses

import numpy as np

from gala_tpu.data.csr import HostCSR


def approx_range(g: HostCSR, n_tiles: int = 16) -> np.ndarray:
    """Per-row-tile (min, max) of source ids — the column-span signal the
    reference computes per tile (reference: src/ops/approx.h:11)."""
    bounds = np.linspace(0, g.n_rows, n_tiles + 1).astype(np.int64)
    out = np.zeros((n_tiles, 2), np.int64)
    for t in range(n_tiles):
        lo = g.row_ptr[bounds[t]]
        hi = g.row_ptr[bounds[t + 1]]
        seg = g.src[lo:hi]
        if seg.size:
            out[t] = (seg.min(), seg.max())
    return out


def approx_reorder_metric(g: HostCSR, sample: int = 100_000) -> dict:
    """Average |src - dst| distance and mean closest-neighbor distance —
    reorder quality (reference: src/ops/approx.h:122 approx_reord_met)."""
    e = g.n_edges
    if e == 0:
        return {"avg_distance": 0.0, "closest_neighbor": 0.0}
    idx = np.linspace(0, e - 1, min(sample, e)).astype(np.int64)
    dist = np.abs(g.src[idx].astype(np.int64) - g.dst[idx].astype(np.int64))
    closest = np.zeros(0)
    rows = np.unique(g.dst[idx])[:1000]
    mins = []
    for r in rows:
        lo, hi = g.row_ptr[r], g.row_ptr[r + 1]
        if hi > lo:
            mins.append(np.abs(g.src[lo:hi].astype(np.int64) - r).min())
    return {
        "avg_distance": float(dist.mean()),
        "closest_neighbor": float(np.mean(mins)) if mins else 0.0,
    }


def degree_entropy(g: HostCSR, frac: float = 0.1) -> float:
    """Entropy of the degree distribution of the first `frac` rows
    (reference: src/ops/approx.h:188 approx_vert_entr)."""
    n = max(int(g.n_rows * frac), 1)
    deg = np.diff(g.row_ptr[: n + 1]).astype(np.float64)
    total = deg.sum()
    if total <= 0:
        return 0.0
    p = deg[deg > 0] / total
    return float(-(p * np.log2(p)).sum())


@dataclasses.dataclass
class MtxStats:
    """Row/degree-distribution summary (reference: matrix_prop.h MtxStats)."""

    n_rows: int
    n_cols: int
    n_edges: int
    density: float
    mean_degree: float
    max_degree: int
    std_degree: float
    empty_rows: int
    degree_entropy: float

    @classmethod
    def of(cls, g: HostCSR) -> "MtxStats":
        deg = g.degrees.astype(np.float64)
        return cls(
            n_rows=g.n_rows,
            n_cols=g.n_cols,
            n_edges=g.n_edges,
            density=g.density(),
            mean_degree=float(deg.mean()) if deg.size else 0.0,
            max_degree=int(deg.max()) if deg.size else 0,
            std_degree=float(deg.std()) if deg.size else 0.0,
            empty_rows=int((deg == 0).sum()),
            degree_entropy=degree_entropy(g, frac=1.0),
        )
