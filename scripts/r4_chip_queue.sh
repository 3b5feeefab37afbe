#!/bin/bash
# Serial chip-job queue for the round-4 results sweep.  One TPU chip:
# jobs must never overlap a timing run.
#
# Round-4 focus (VERDICT r3): re-measure every published table under
# the round-3/4 DEFAULTS (pallas auto ON, flash-identity backward,
# reweighted-bell dynamic sampling, col_tile memory gate), so
# RESULTS.md rows reflect what HEAD actually executes.
set -x
cd /root/repo
mkdir -p results_r4

probe() {  # compile-health probe: XLA jit in a 120 s subprocess
    timeout 120 python -c "import jax, jax.numpy as jnp; \
r = jax.jit(lambda x: (x@x).sum())(jnp.ones((128,128))); r.block_until_ready(); \
print('probe ok')" || { echo "TUNNEL DEAD — aborting queue"; exit 1; }
}
probe

# 1. table7 sampling modes: dynamic is now the reweighted-bell path
#    (zero per-epoch index gathers) — r3 measured 16x over none, the
#    VERDICT bar is <= 3x
timeout 3600 python scripts/evaluate.py --job table7 --datasets Arxiv --iters 30 \
    --outdir results_r4

# 2. fig16 under current defaults: GCN + GAT at the published scales
timeout 5400 python scripts/evaluate.py --job fig16 --datasets Reddit --models gat gcn \
    --scale 0.25 --iters 30 --outdir results_r4
timeout 5400 python scripts/evaluate.py --job fig16 --datasets Products --models gat gcn \
    --scale 0.25 --iters 30 --outdir results_r4
timeout 3600 python scripts/evaluate.py --job fig16 --datasets Arxiv \
    --models gcn gat gin sage --iters 30 --outdir results_r4

# 3. table5 with the col_tile memory gate: dir runs FORCED (ablation
#    measurable), all runs gated (expect all ~= cir now)
timeout 3600 python scripts/evaluate.py --job table5 --datasets Reddit --scale 0.25 \
    --iters 30 --outdir results_r4
timeout 3600 python scripts/evaluate.py --job table5 --datasets Products --scale 0.25 \
    --iters 30 --outdir results_r4

# 4. fig20 input-aware refresh under the same gate
timeout 3600 python scripts/evaluate.py --job fig20 --datasets Reddit --scale 0.25 \
    --iters 30 --outdir results_r4

# 5. papers100M bf16 ladder: land 0.02 and push 0.05 (r3 queued, never ran)
timeout 5400 python scripts/evaluate.py --job table6 --t6-dataset Papers100M \
    --fractions 0.02 --iters 20 --dtype bf16 --outdir results_r4
timeout 7200 python scripts/evaluate.py --job table6 --t6-dataset Papers100M \
    --fractions 0.05 --iters 20 --dtype bf16 --outdir results_r4

# 6. headline bench (updated contract)
timeout 3600 python bench.py | tee results_r4/bench.json

# 7. fig18 FULL reference grid (layers {2,3,4,8} x hidden {32..1024},
#    GCN, Reddit-0.25 — reference: scripts/Evaluations/Figure-18.py:7-8)
#    Last: longest job, partial rows still land in the CSV as they finish.
timeout 14400 python scripts/evaluate.py --job fig18 --datasets Reddit --scale 0.25 \
    --layers 2 3 4 8 --hidden 32 64 128 256 512 1024 \
    --iters 20 --outdir results_r4

echo "QUEUE DONE"
