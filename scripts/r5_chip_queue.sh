#!/bin/bash
# Round-5 chip queue — the four round-4 dead validations first (VERDICT
# r5 task 2), then the diagnosis runs.  One TPU chip: never overlap a
# timing run.  Every item is timeout-bounded and tee'd so a mid-queue
# death leaves the earlier results on disk (the r4 failure mode).
set -x
cd /root/repo
mkdir -p results_r5

probe() {
    timeout 120 python -c "import jax, jax.numpy as jnp; \
r = jax.jit(lambda x: (x@x).sum())(jnp.ones((128,128))); r.block_until_ready(); \
print('probe ok')" || { echo "TUNNEL DEAD — aborting queue"; exit 1; }
}
probe

# 1. bench with the new Pallas-vs-XLA RGG A/B control and 3-run
#    headline variance (VERDICT tasks 1 + 7)
timeout 3600 python bench.py 2>&1 | tee results_r5/bench1.txt

# 2. table5 Products {none,cir,dir,all}: validates the scan-rolled
#    staged reduce against the 21.48G compile-OOM (r4 queue.log:66) on
#    the real chip, plus the new col_tile budget gate
timeout 5400 python scripts/evaluate.py --job table5 --datasets Products \
    --scale 0.25 --iters 30 --outdir results_r5 2>&1 | tee results_r5/table5_products.txt

# 3. table5 Reddit: validates `all` <= 1.05x `cir` after the col_tile
#    budget gate (VERDICT task 5; r4 measured all 0.417 vs cir 0.322)
timeout 3600 python scripts/evaluate.py --job table5 --datasets Reddit \
    --scale 0.25 --iters 30 --outdir results_r5 2>&1 | tee results_r5/table5_reddit.txt

# 4. papers100M bf16 0.05 retry with the r4 closure-args fix
timeout 7200 python scripts/evaluate.py --job table6 --t6-dataset Papers100M \
    --fractions 0.05 --iters 20 --dtype bf16 --outdir results_r5 2>&1 \
    | tee results_r5/papers005.txt

# 5. first flax.linen ecosystem baseline rows
timeout 3600 python scripts/baseline_flax.py --datasets Arxiv --models gcn gat \
    --iters 30 --outdir results_r5 2>&1 | tee results_r5/flax_arxiv.txt
timeout 5400 python scripts/baseline_flax.py --datasets Reddit --models gcn gat \
    --scale 0.25 --iters 15 --outdir results_r5 2>&1 | tee results_r5/flax_reddit.txt

# 6. fig16 Products GCN regression diagnosis (r3 0.3692 -> r4 0.4663):
#    default (pallas-auto strategy, plans reuse-gated off) vs forced
#    pure-bell — if AUTO=0 restores the r3 number, the gated-off
#    fallback is NOT equivalent to plain bell and that's the bug
timeout 2400 python scripts/evaluate.py --job fig16 --datasets Products --models gcn \
    --scale 0.25 --iters 30 --outdir results_r5 2>&1 | tee results_r5/fig16_products_default.txt
GALA_PALLAS_AUTO=0 timeout 2400 python scripts/evaluate.py --job fig16 \
    --datasets Products --models gcn --scale 0.25 --iters 30 --tag _noauto \
    --outdir results_r5 2>&1 | tee results_r5/fig16_products_noauto.txt

# 7. Reddit GAT decomposition with the closure-args fix (VERDICT task 3)
timeout 3600 python scripts/profile_gat.py --dataset Reddit --scale 0.25 \
    --iters 15 2>&1 | tee results_r5/profile_gat_reddit.txt

# 8. int64 path refresh (r4 row is 0 bytes)
timeout 1800 python -m gala_tpu inference_long examples/gcn.txt --scale 0.05 \
    2>&1 | tee results_r5/int64_refresh.txt

# 9. sub-cliff packing A/B on the arxiv headline (VERDICT task 6
#    candidate): GALA_PACK_MIN_BYTES=1 packs every narrow table;
#    budget=1s stops bench after the headline+baseline core
GALA_PACK_MIN_BYTES=1 GALA_BENCH_BUDGET_S=1 timeout 1800 python bench.py 2>&1 \
    | tee results_r5/bench_packall.txt

echo "R5 QUEUE DONE"
