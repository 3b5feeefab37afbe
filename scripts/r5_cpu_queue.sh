#!/bin/bash
# Round-5 CPU-mesh jobs (no chip involved; run serially — ONE host CPU).
# 1) the papers100M-0.05 bf16 sharded train (the single-chip-impossible
#    config through parallel/, VERDICT r4 #4);
# 2) bench_scaling rows at --devices 1 2 4 8 (harness-only label).
set -x
cd /root/repo
mkdir -p results_r5
export PALLAS_AXON_POOL_IPS=
export JAX_PLATFORMS=cpu
export XLA_FLAGS=--xla_force_host_platform_device_count=8

timeout 7200 python scripts/dryrun_papers_multichip.py --devices 8 \
    --fraction 0.05 --iters 3 --outdir results_r5 2>&1 \
    | tee results_r5/papers_multichip.txt

timeout 5400 python scripts/bench_scaling.py --devices 1 2 4 8 --mode weak \
    --nodes 65536 --iters 12 --warmup 3 --outdir results_r5 2>&1 \
    | tee results_r5/scaling_weak.txt

timeout 5400 python scripts/bench_scaling.py --devices 1 2 4 8 --mode strong \
    --nodes 262144 --iters 12 --warmup 3 --outdir results_r5 2>&1 \
    | tee results_r5/scaling_strong.txt

echo "R5 CPU QUEUE DONE"
