#!/usr/bin/env python
"""Minibatch GraphSAGE bench — the BASELINE "GraphSAGE with neighbor
sampling on Reddit (minibatch gather/scatter pipeline)" config.

Prints one JSON line per run: epoch time (sampling + device, fenced by
the per-epoch loss fetch), sampled-edge throughput, and full-graph test
accuracy with the trained weights.

  python scripts/bench_minibatch.py --dataset Reddit --scale 0.25 \
      --fanouts 25 10 --batch-size 512 --iters 10
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="Reddit")
    ap.add_argument("--scale", type=float, default=0.25)
    ap.add_argument("--fanouts", nargs=2, type=int, default=[25, 10])
    ap.add_argument("--batch-size", type=int, default=512)
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--static", action="store_true",
                    help="same neighborhood every epoch (no per-epoch LCG)")
    args = ap.parse_args()

    from gala_tpu.data.datasets import load_dataset
    from gala_tpu.train_minibatch import train_sage_minibatch

    g, feats, labels, masks = load_dataset(args.dataset, scale=args.scale)
    res = train_sage_minibatch(
        g, feats, labels, masks,
        fanouts=tuple(args.fanouts), batch_size=args.batch_size,
        hidden=args.hidden, iters=args.iters, dynamic=not args.static,
    )
    n_train = int(masks["train"].sum())
    f1, f2 = args.fanouts
    sampled_edges = n_train * (f1 + f1 * f2)  # per epoch
    import jax

    print(json.dumps({
        "dataset": args.dataset, "scale": args.scale,
        "fanouts": args.fanouts, "batch_size": args.batch_size,
        "epoch_s": round(res.total_time, 6),
        "sampled_edges_per_s": round(sampled_edges / max(res.total_time, 1e-9), 1),
        "max_accuracy": round(res.max_accuracy, 4),
        "dynamic": not args.static,
        "backend": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
