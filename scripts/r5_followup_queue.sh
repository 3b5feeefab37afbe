#!/bin/bash
# Round-5 follow-up chip jobs — run AFTER scripts/r5_chip_queue.sh.
# One TPU chip: never overlap a timing run.
set -x
cd /root/repo
mkdir -p results_r5

probe() {
    timeout 120 python -c "import jax, jax.numpy as jnp; \
r = jax.jit(lambda x: (x@x).sum())(jnp.ones((128,128))); r.block_until_ready(); \
print('probe ok')" || { echo "TUNNEL DEAD — aborting queue"; exit 1; }
}
probe

# 1. bench re-run with the two r5 perf changes (rows-as-constants gate,
#    Pallas auto-default off): checks the headline recovery toward the
#    199M the same config measured at cd09e85, and produces the new
#    rgg_edges_per_s (XLA default) + rgg_pallas_vs_xla A/B fields
timeout 3600 python bench.py 2>&1 | tee results_r5/bench2.txt

# 2. flax ecosystem baseline re-runs with the FIXED fetch-fence timing
#    (the r5 main-queue rows measured enqueue time) + bf16 variants;
#    Reddit f32 GCN is expected to record `oom` (stock layer-1 messages
#    at 27.4M x 256 f32 = 26.1G)
timeout 3600 python scripts/baseline_flax.py --datasets Arxiv --models gcn gat \
    --iters 30 --outdir results_r5 2>&1 | tee results_r5/flax_arxiv2.txt
timeout 3600 python scripts/baseline_flax.py --datasets Arxiv --models gcn gat \
    --iters 30 --dtype bf16 --outdir results_r5 2>&1 | tee -a results_r5/flax_arxiv2.txt
timeout 5400 python scripts/baseline_flax.py --datasets Reddit --models gcn gat \
    --scale 0.25 --iters 15 --outdir results_r5 2>&1 | tee results_r5/flax_reddit2.txt
timeout 5400 python scripts/baseline_flax.py --datasets Reddit --models gcn gat \
    --scale 0.25 --iters 15 --dtype bf16 --outdir results_r5 2>&1 \
    | tee -a results_r5/flax_reddit2.txt

# 3. table5 all-vs-cir diagnosis: sweep-width probe + per-variant
#    forwards at Reddit-0.25 (r5 measured all 1.79x cir with NARROWER
#    sweeps — something pathological in the 32-wide path)
timeout 3600 python scripts/diag_table5_all.py --scale 0.25 --iters 10 2>&1 \
    | tee results_r5/diag_table5_all.txt

# 4. arxiv headline decomposition (names the gap between the slot
#    gather floor and the 11.3ms epoch)
timeout 3600 python scripts/profile_headline.py --iters 30 2>&1 \
    | tee results_r5/profile_headline.txt

echo "R5 FOLLOWUP DONE"
