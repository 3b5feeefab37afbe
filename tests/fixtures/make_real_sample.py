"""Regenerate tests/fixtures/RealSample — a 100-node dataset checked in
in the EXACT on-disk layout the reference's export script produces
(reference: scripts/Data/gala_export_npy.py:60-160): header-prefixed
uint32 adjacency npys, f32 features, (N,1) i64 labels, (N,1) i32 masks,
self-loops normalized (removed then re-added).

The fixture stands in for a real downloaded dataset in CI: it validates
the offline real-data flow (scripts/export_npy.py -> rsync ->
evaluate.py --data-root) for format fidelity without egress.
Run me from the repo root to refresh the files.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from gala_tpu.data.csr import coo_to_csr
from gala_tpu.data.io import save_gala_npy


def main():
    rng = np.random.default_rng(42)
    n, f, c = 100, 8, 3
    labels = rng.integers(0, c, n, dtype=np.int64)
    # homophilous edges + normalized self loops (the export convention)
    src, dst = [], []
    for u in range(n):
        peers = np.flatnonzero(labels == labels[u])
        nbrs = rng.choice(peers, size=min(4, peers.size), replace=False)
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

    feats = (rng.normal(size=(n, f)) + labels[:, None]).astype(np.float32)
    order = rng.permutation(n)
    masks = {
        "train": np.isin(np.arange(n), order[:60]),
        "val": np.isin(np.arange(n), order[60:80]),
        "test": np.isin(np.arange(n), order[80:]),
    }
    g = coo_to_csr(src=src, dst=dst, vals=None, n_rows=n, n_cols=n)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "RealSample")
    save_gala_npy(out, g, feats, labels, masks)
    print(f"wrote {out}: {n} nodes, {g.n_edges} edges")


if __name__ == "__main__":
    main()
