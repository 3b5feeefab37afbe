#!/bin/bash
# Round-4 follow-up chip jobs — run AFTER scripts/r4_chip_queue.sh.
# One TPU chip: never overlap a timing run.
set -x
cd /root/repo
mkdir -p results_r4

probe() {
    timeout 120 python -c "import jax, jax.numpy as jnp; \
r = jax.jit(lambda x: (x@x).sum())(jnp.ones((128,128))); r.block_until_ready(); \
print('probe ok')" || { echo "TUNNEL DEAD — aborting queue"; exit 1; }
}
probe

# 0. fig16 re-runs: the main queue's rows predate two fixes —
#    (a) need-flash: the inference primal no longer accumulates the
#        flash pos-stats (Reddit GAT inference should drop);
#    (b) all-None plan lists no longer disable the XLA fallback's
#        packing/staging/flat optimizations (Products GCN regressed
#        1.7x in the main queue run: 0.62s vs r3's 0.37s)
timeout 5400 python scripts/evaluate.py --job fig16 --datasets Reddit --models gat \
    --scale 0.25 --iters 30 --outdir results_r4
timeout 5400 python scripts/evaluate.py --job fig16 --datasets Products --models gcn gat \
    --scale 0.25 --iters 30 --outdir results_r4

# 1. GAT component decomposition at Reddit-0.25 (VERDICT r3 #4: why is
#    the epoch-level GAT:GCN ratio ~6x when the fused attention forward
#    measures 1.32x of a GCN sweep at arxiv scale?)
timeout 3600 python scripts/profile_gat.py --dataset Reddit --scale 0.25 \
    --iters 15 2>&1 | tee results_r4/profile_gat_reddit.txt

# 2. fig19 memory-vs-time schedules under round-4 defaults
timeout 3600 python scripts/evaluate.py --job fig19 --datasets Reddit --scale 0.25 \
    --iters 20 --outdir results_r4

# 3. int64 path refresh
timeout 1200 python -m gala_tpu inference_long examples/gcn.txt --scale 0.05 \
    2>&1 | tee results_r4/int64_refresh.txt

# 3b. table5 Products re-run: the main-queue run OOMed at `cir` (21.5G
#     needed / 15.75G HBM — unrolled staged chunks all live inside the
#     train loop); the staged reduce now scan-rolls at >=16 chunks
#     (AOT memory probe: 2.4G temp).  Re-measures all four variants.
timeout 5400 python scripts/evaluate.py --job table5 --datasets Products --scale 0.25 \
    --iters 30 --outdir results_r4

# 3c. papers100M bf16 0.05 retry: the main-queue run died lowering
#     step_train — train_rows/test_rows/labels rode as closed-over
#     device constants, an extra n-scaled copy per compiled executable
#     (ResourceExhausted); they are jit arguments now
timeout 7200 python scripts/evaluate.py --job table6 --t6-dataset Papers100M \
    --fractions 0.05 --iters 20 --dtype bf16 --outdir results_r4

# 4. external-ecosystem baseline (stock flax.linen + segment_sum GNNs,
#    VERDICT r3 missing #3): same synthetic graphs, same timing protocol
timeout 3600 python scripts/baseline_flax.py --datasets Arxiv --models gcn gat \
    --iters 30 --outdir results_r4
timeout 5400 python scripts/baseline_flax.py --datasets Reddit --models gcn gat \
    --scale 0.25 --iters 15 --outdir results_r4

# 5. bench with the locality-bearing RGG2D section (Pallas engaged
#    end-to-end: spatial-tile ids clear the staged-row reuse break-even
#    that the R-MAT community stand-ins never do); npz cache pre-warmed
timeout 3600 python bench.py | tee results_r4/bench_rgg.json

echo "FOLLOWUP DONE"
