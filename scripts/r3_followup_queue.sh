#!/bin/bash
# Follow-up chip queue: optimization experiments AFTER the results sweep.
# Decides the sub-cliff packing default and profiles GAT at scale.
set -x
cd /root/repo
mkdir -p results_r3

# 1. sub-cliff packed-gather microbench (Reddit-0.25 GAT shapes):
#    f=33 (x|vl score column), f=32 (GCN layer-2), f=36 (bwd pass-2)
timeout 1800 python scripts/bench_packed_gather.py --n 58000 --f 33 --nb 1790000 --k 16 \
    | tee results_r3/packed_gather_f33.txt
timeout 1800 python scripts/bench_packed_gather.py --n 58000 --f 32 --nb 1790000 --k 16 \
    | tee results_r3/packed_gather_f32.txt
timeout 1800 python scripts/bench_packed_gather.py --n 170000 --f 33 --nb 2300000 --k 8 \
    | tee results_r3/packed_gather_arxiv.txt

# 2a. flash-backward effect: fig16 GAT at Reddit/Products-0.25 with the
#     pass-1-free backward (compare against the r3-main rows measured
#     pre-flash: Reddit gat 0.676, Products gat 2.785)
timeout 3600 python scripts/evaluate.py --job fig16 \
    --datasets Reddit --models gat --scale 0.25 --iters 30 \
    --tag flash --outdir results_r3 \
    || echo "flash fig16 Reddit failed" >> results_r3/queue_errors.txt
timeout 3600 python scripts/evaluate.py --job fig16 \
    --datasets Products --models gat --scale 0.25 --iters 30 \
    --tag flash --outdir results_r3 \
    || echo "flash fig16 Products failed" >> results_r3/queue_errors.txt

# 2b. A/B: + forced sub-cliff packing on top of the flash backward
GALA_PACK_MIN_BYTES=4096 timeout 3600 python scripts/evaluate.py --job fig16 \
    --datasets Reddit --models gat gcn --scale 0.25 --iters 30 \
    --tag packed --outdir results_r3 \
    || echo "packed fig16 Reddit failed" >> results_r3/queue_errors.txt

# 3. GAT decomposition profile at Reddit-0.25 scale
timeout 3600 python scripts/profile_gat.py --scale 0.25 --dataset Reddit 2>/dev/null \
    | tee results_r3/profile_gat_reddit.txt \
    || timeout 3600 python scripts/profile_gat.py | tee results_r3/profile_gat_default.txt

# 4. dynamic-sampling phase breakdown (table7 dynamic was 16x none;
#    the per-dispatch debug shows whether it's compute or stream stalls)
GALA_TPU_PHASE_DEBUG=1 timeout 1800 python -c "
import gala_tpu
src = open('examples/gcn.txt').read() + '\naggrFn=aggrFn.sample(20).dynamic();\n'
cm = gala_tpu.compile_source(src, mode='train')
res = cm.train(iters=12)
print('dynamic inference_time', res.inference_time)
" 2>&1 | grep -v WARNING | tee results_r3/dynamic_phase_debug.txt

# 5. minibatch SAGE retry (the HTTP 413 was the closed-over feature
#    table embedded as an HLO constant; now a jit argument)
timeout 3600 python scripts/bench_minibatch.py --dataset Reddit --scale 0.25 \
    --iters 12 | tee results_r3/minibatch_sage.json \
    || echo "minibatch retry failed" >> results_r3/queue_errors.txt

# 6. papers100M 0.02 retry in bf16 (f32 OOMed at 0.02; bf16 halves HBM)
timeout 3600 python scripts/evaluate.py --job table6 --t6-dataset Papers100M \
    --fractions 0.02 --iters 20 --dtype bf16 --outdir results_r3 \
    || echo "table6 0.02 bf16 failed" >> results_r3/queue_errors.txt

# 6b. fig20 re-run after the TPU-aware opt_input fix (auto had emitted
#     the GPU col_tile heuristic: 0.116 vs hand 0.079 total)
timeout 3600 python scripts/evaluate.py --job fig20 --datasets Reddit --scale 0.25 \
    --iters 20 --outdir results_r3 \
    || echo "fig20 rerun failed" >> results_r3/queue_errors.txt

# 6c. pallas benches retry with the fixed operand passing (the r3-main
#     big-table/sddmm attempts died on HTTP 413: operands were closure
#     constants in the compile request; trivial-kernel gate already
#     passed in the main queue so Mosaic is probed directly here)
timeout 3600 python scripts/bench_pallas_bell.py --n 2500000 --f 128 --nb 8000000 --k 16 \
    --locality 0.3 | sed 's/\x1b\[[0-9;]*m//g' | tee results_r3/pallas_bell_big.txt \
    || echo "pallas big retry failed" >> results_r3/queue_errors.txt
timeout 3600 python scripts/bench_pallas_bell.py --sddmm \
    | sed 's/\x1b\[[0-9;]*m//g' | tee results_r3/pallas_sddmm.txt \
    || echo "pallas sddmm retry failed" >> results_r3/queue_errors.txt

# 7. Mosaic bisect: trivial kernels now compile (queue gate passed)
#    while bell_spmm still 500s — find the feature that crashes
#    tpu_compile_helper
timeout 3000 python scripts/pallas_bisect.py --timeout 240 \
    | tee results_r3/pallas_bisect.txt

echo FOLLOWUP_DONE
