"""Regenerate tests/fixtures/RealSample — a checked-in dataset in the
EXACT on-disk layout the reference's export script produces
(reference: scripts/Data/gala_export_npy.py:60-160): header-prefixed
uint32 adjacency npys, f32 features, (N,1) i64 labels, (N,1) i32 masks,
self-loops normalized (removed then re-added).

The fixture stands in for a real downloaded dataset in CI: it validates
the offline real-data flow (scripts/export_npy.py -> rsync ->
evaluate.py --data-root) for format fidelity without egress, and is
sized so test accuracy is MEANINGFUL (1500 nodes, 7 classes, 20% noise
edges, feature signal-to-noise tuned so a 2-layer GCN separates classes
but a constant predictor cannot): the accuracy-parity-vs-dense-oracle
test (test_real_layout.py) and RESULTS.md's real-layout accuracy row
run on it.  Run me from the repo root to refresh the files.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from gala_tpu.data.csr import coo_to_csr
from gala_tpu.data.io import save_gala_npy

N, F, C = 1500, 32, 7


def main():
    rng = np.random.default_rng(42)
    n, f, c = N, F, C
    labels = rng.integers(0, c, n, dtype=np.int64)
    # homophilous edges + 20% cross-class noise + normalized self loops
    src, dst = [], []
    for u in range(n):
        peers = np.flatnonzero(labels == labels[u])
        nbrs = rng.choice(peers, size=min(6, peers.size), replace=False)
        noise = rng.integers(0, n, 2)
        nbrs = np.concatenate([nbrs, noise])
        src.extend([u] * len(nbrs))
        dst.extend(nbrs.tolist())
    src, dst = np.asarray(src), np.asarray(dst)
    keep = src != dst  # remove self loops ...
    src, dst = src[keep], dst[keep]
    both = np.concatenate  # ... symmetrize ...
    src, dst = both([src, dst]), both([dst, src])
    uniq = np.unique(src * n + dst)
    src, dst = uniq // n, uniq % n
    loops = np.arange(n)  # ... then re-add self loops
    src, dst = both([src, loops]), both([dst, loops])

    # weak per-class feature signal: raw features alone give a mediocre
    # classifier; aggregation over the homophilous graph is what lifts
    # accuracy (so the row actually measures the pipeline)
    centers = rng.normal(size=(c, f)) * 0.8
    feats = (rng.normal(size=(n, f)) + centers[labels]).astype(np.float32)
    order = rng.permutation(n)
    n_tr, n_vl = int(0.4 * n), int(0.2 * n)
    masks = {
        "train": np.isin(np.arange(n), order[:n_tr]),
        "val": np.isin(np.arange(n), order[n_tr : n_tr + n_vl]),
        "test": np.isin(np.arange(n), order[n_tr + n_vl :]),
    }
    g = coo_to_csr(src=src, dst=dst, vals=None, n_rows=n, n_cols=n)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RealSample")
    save_gala_npy(out, g, feats, labels, masks)
    print(f"wrote {out}: {n} nodes, {g.n_edges} edges, {c} classes")


if __name__ == "__main__":
    main()
