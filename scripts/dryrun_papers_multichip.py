#!/usr/bin/env python
"""papers100M-0.05 bf16 THROUGH THE MULTI-CHIP PATH (VERDICT r4 #4).

The 0.05 node-sampled papers100M stand-in (5.55M nodes / 142M symmetrized edges,
f=128) is the config a single v5e chip provably cannot hold — the r4
chip queue died lowering it with ResourceExhausted (21.48G needed of
15.75G HBM, results_r4/queue.log) — i.e. exactly what `gala_tpu/
parallel/` was built for: node-partitioned DP over a mesh, per-shard
scatter-free bell reduce, boundary rows by halo all_to_all, parameter
grads psum'd by shard_map's transpose.  Reference analog: Table-6.py:9
runs papers100M at 1-20%.

Without multi-chip hardware this runs on the virtual CPU mesh (the
driver's dryrun mechanism): it validates that the sharded program
COMPILES AND TRAINS at the real 0.05 shapes and records per-shard
array sizes — wall-clock is host-CPU bound and not publishable.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      PALLAS_AXON_POOL_IPS= python scripts/dryrun_papers_multichip.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--fraction", type=float, default=0.05)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    # force the virtual mesh BEFORE jax initializes (no-op when the
    # caller already exported the flags, as the usage line shows)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    if len(jax.devices()) < args.devices:
        sys.exit(f"need {args.devices} devices, have {len(jax.devices())} "
                 "(set XLA_FLAGS/JAX_PLATFORMS before any jax import)")

    from gala_tpu.data.datasets import load_dataset
    from gala_tpu.dsl.parser import parse_source
    from gala_tpu.lowering.lower import lower
    from gala_tpu.parallel.compiled import shard_compiled
    from gala_tpu.parallel.mesh import make_mesh

    t0 = time.time()
    data = load_dataset("Papers100M", scale=args.fraction)
    g_host = data[0]
    print(f"[papers-mc] loaded: {g_host.n_rows} nodes, {g_host.n_edges} "
          f"edges ({time.time()-t0:.0f}s)", flush=True)

    # the reference Table-5/6 model: 2-layer GCN, hidden 32
    src = """
G = load_dataset("Papers100M");
aggrFn = dsl.get_aggregate(fn = dsl.fn.mul_sum);
L1 = layer(G, hs, nonln_fn, aggregate_fn) {
    deg = G.graphs.degrees();
    norm = dsl.fn.pow(deg, -0.5);
    res = norm * G.node.feats;
    res = aggregate_fn(G.graphs, res);
    res = dsl.nn.ffn(res, out=hs);
    res = norm * res;
    G.node.feats = nonln_fn(res);
}
M1 = model(G, non_ln) {
    l1 = L1(G, 32, non_ln, aggrFn);
    l2 = L1(l1, G.labels.size(), null, aggrFn);
}
m1 = M1(G, dsl.non_ln.ReLU);
m1.train(iters=10, validation_step=100);
res = m1.eval();
# schedule
training_subgraph(false);
"""
    spec = parse_source(src)
    # strategy='segment' keeps the single-chip lowering light (the
    # sharded path builds its OWN per-shard bell layouts; building the
    # full single-chip binned layout for 80M edges here would only be
    # thrown away)
    cm = lower(spec, mode="train", data=data, dtype=jnp.bfloat16,
               strategy="segment")
    print(f"[papers-mc] lowered ({time.time()-t0:.0f}s)", flush=True)

    # the single-chip device buffers (padded edge arrays, features,
    # labels) are dead weight once shard_compiled re-puts everything
    # from the host retention — at 142M edges holding them through the
    # 8-way layout build OOM-killed the HOST (130G RSS, r5 first run);
    # the training-subgraph pass is likewise disabled above (two more
    # ~100M-edge layouts that the sharded run would rebuild per shard)
    import gc
    f_dim = int(np.asarray(cm.host_feats).shape[1])
    cm.full_graphs = None
    cm.train_graphs = None
    # make_params only reads x.shape[1]; a 1-row stub keeps that alive
    cm.x = np.zeros((1, f_dim), np.float32)
    cm.labels = cm.train_mask = cm.test_mask = None
    gc.collect()

    mesh = make_mesh(args.devices, model_axis=1)
    sm = shard_compiled(cm, mesh=mesh, use_bell=True, dtype=jnp.bfloat16)
    gc.collect()
    sg = sm.full_graphs[0]
    per_shard_nodes = sg.n_pad // args.devices
    print(f"[papers-mc] sharded: {args.devices}-way, "
          f"{per_shard_nodes} nodes/shard ({time.time()-t0:.0f}s)", flush=True)

    res = sm.train(iters=args.iters, warmup=max(args.iters - 2, 0))
    final_loss = float(res.losses[-1]) if res.losses else float("nan")
    # per-shard HBM the REAL-chip run would hold: feature table slice +
    # the dominant (chunked) gather temp, bf16
    feat_bytes = per_shard_nodes * 128 * 2
    row = {
        "dataset": "Papers100M", "fraction": args.fraction,
        "devices": args.devices, "nodes": int(g_host.n_rows),
        "edges": int(g_host.n_edges),
        "final_loss": final_loss,
        "loss_finite": bool(np.isfinite(final_loss)),
        "epoch_s_cpu_harness": round(res.total_time, 3),
        "per_shard_feat_mb": round(feat_bytes / 1e6, 1),
        "backend": jax.devices()[0].platform,
    }
    print(json.dumps(row), flush=True)
    if args.outdir:
        os.makedirs(args.outdir, exist_ok=True)
        path = os.path.join(args.outdir, "stat_papers_multichip.csv")
        fresh = not os.path.exists(path)
        with open(path, "a") as f:
            if fresh:
                f.write(",".join(row.keys()) + "\n")
            f.write(",".join(str(v) for v in row.values()) + "\n")
    assert row["loss_finite"], "non-finite loss on the sharded papers run"
    print(f"[papers-mc] OK ({time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
