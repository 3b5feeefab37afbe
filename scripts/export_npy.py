"""Export datasets to the GALA npy layout.

The reference's data prep (reference: scripts/Data/gala_export_npy.py:60-160)
downloads DGL/OGB datasets and writes:

    Adj_src.npy   uint32 [n_rows, n_cols, src_ids...]
    Adj_dst.npy   uint32 [n_rows, n_cols, dst_ids...]
    Feat.npy      float32 (N, F)
    Lab.npy       int64   (N, 1)
    TnMsk.npy / VlMsk.npy / TsMsk.npy   int32 (N, 1)

with self loops normalized (remove-then-add).  This exporter produces
the same layout from sources available without network egress:

  --from synthetic : the registered synthetic stand-ins (any name)
  --from mtx       : a MatrixMarket graph + random features/labels
  --from npz       : an .npz with src/dst/feat/label/masks arrays
  --from ogb       : ogb.nodeproppred (requires the ogb package + data)

Usage:
    python scripts/export_npy.py --from synthetic --name Arxiv --out Data/Arxiv
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gala_tpu.data.csr import coo_to_csr, normalize_self_loops, symmetrize  # noqa: E402
from gala_tpu.data.io import save_gala_npy  # noqa: E402


def write_gala_npy(out, src, dst, feats, labels, masks, n):
    """Write the GALA layout (reference: gala_export_npy.py:60-160 —
    remove-then-add self loops, header-prefixed uint32 adjacency npys)."""
    os.makedirs(out, exist_ok=True)
    src, dst = normalize_self_loops(src, dst, n)
    g = coo_to_csr(src, dst, None, n_rows=n)
    save_gala_npy(out, g, feats.astype(np.float32), labels, masks)
    print(f"wrote {out}: n={n} e={g.n_edges} f={feats.shape[1]} "
          f"c={int(labels.max()) + 1}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from", dest="source", required=True,
                    choices=["synthetic", "mtx", "npz", "ogb"])
    ap.add_argument("--name", default="Arxiv")
    ap.add_argument("--path", help="input file for mtx/npz")
    ap.add_argument("--out", required=True)
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--undirected", action="store_true")
    args = ap.parse_args()

    if args.source == "synthetic":
        from gala_tpu.data.datasets import load_dataset

        g, feats, labels, masks = load_dataset(
            args.name, scale=args.scale, seed=args.seed
        )
        write_gala_npy(args.out, g.src.astype(np.int64), g.dst.astype(np.int64),
                       feats, labels, masks, g.n_rows)
    elif args.source == "mtx":
        from gala_tpu.data.mtx import read_mtx

        g = read_mtx(args.path)
        n = g.n_rows
        rng = np.random.default_rng(args.seed)
        feats = rng.standard_normal((n, 64)).astype(np.float32)
        labels = rng.integers(0, 8, n)
        idx = rng.permutation(n)
        masks = {
            "train": np.isin(np.arange(n), idx[: n // 2]),
            "val": np.isin(np.arange(n), idx[n // 2 : 3 * n // 4]),
            "test": np.isin(np.arange(n), idx[3 * n // 4 :]),
        }
        write_gala_npy(args.out, g.src.astype(np.int64), g.dst.astype(np.int64),
                       feats, labels, masks, n)
    elif args.source == "npz":
        d = np.load(args.path)
        n = int(d["feat"].shape[0])
        src, dst = d["src"].astype(np.int64), d["dst"].astype(np.int64)
        if args.undirected:
            src, dst = symmetrize(src, dst, n)
        masks = {k: d[k] for k in ("train", "val", "test")}
        write_gala_npy(args.out, src, dst, d["feat"], d["label"], masks, n)
    else:  # ogb
        from ogb.nodeproppred import NodePropPredDataset  # optional dep

        ds = NodePropPredDataset(name=args.name)
        graph, labels = ds[0]
        split = ds.get_idx_split()
        n = graph["num_nodes"]
        src, dst = graph["edge_index"][0], graph["edge_index"][1]
        src, dst = symmetrize(src, dst, n)
        masks = {
            "train": np.isin(np.arange(n), split["train"]),
            "val": np.isin(np.arange(n), split["valid"]),
            "test": np.isin(np.arange(n), split["test"]),
        }
        write_gala_npy(args.out, src, dst, graph["node_feat"],
                       labels.reshape(-1), masks, n)


if __name__ == "__main__":
    main()