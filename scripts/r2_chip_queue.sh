#!/bin/bash
# Serial chip-job queue for the round-2 results sweep. One TPU chip:
# jobs must never overlap a timing run.  Fire as soon as the axon
# tunnel is healthy (probe: timeout 60 python -c "import jax; print(jax.devices())").
set -x
cd /root/repo
mkdir -p results_r2

# -1. Pallas fused bell-SpMM on the real chip FIRST (Mosaic lowering +
#     perf vs the XLA gather composition; decides whether pallas_bell
#     becomes an auto default).  Small table (<100MB, XLA fast) and a
#     Products-scale table (>500MB physical, XLA above the cliff).
timeout 5400 python scripts/bench_pallas_bell.py --n 60000 --f 128 --nb 1000000 --k 16 \
    | tee results_r2/pallas_bell_small.txt
timeout 5400 python scripts/bench_pallas_bell.py --n 2500000 --f 128 --nb 8000000 --k 16 \
    --locality 0.3 | tee results_r2/pallas_bell_big.txt
timeout 5400 python scripts/bench_pallas_bell.py --sddmm | tee results_r2/pallas_sddmm.txt
timeout 5400 python scripts/bench_pallas_bell.py --attn --n 60000 --f 128 --nb 1000000 \
    --k 16 | tee results_r2/pallas_attn_small.txt
timeout 5400 python scripts/bench_pallas_bell.py --attn --n 2500000 --f 128 --nb 8000000 \
    --k 16 --locality 0.3 | tee results_r2/pallas_attn_big.txt

# 0. headline bench (now reports roofline GB/s + GAT row + vs_bcoo)
timeout 5400 python bench.py | tee results_r2/bench.json

# 1. table5: DIR axis is now real (col_tile drives executed chunking) —
#    the r1 verdict's "dir == none to 4 digits" must move
timeout 5400 python scripts/evaluate.py --job table5 --datasets Reddit --scale 0.25 \
    --iters 30 --outdir results_r2
timeout 5400 python scripts/evaluate.py --job table5 --datasets Products --scale 0.05 \
    --iters 30 --outdir results_r2

# 2. GAT after round-2 kernels (multi-head shared gather, staged dedup
#    tables, occupancy masks): fig16 GAT rows at r1 scales for direct
#    comparison against RESULTS.md (Reddit 0.246s / Products 2.73s)
timeout 5400 python scripts/evaluate.py --job fig16 --datasets Reddit --models gat gcn \
    --scale 0.25 --iters 30 --outdir results_r2
timeout 5400 python scripts/evaluate.py --job fig16 --datasets Products --models gat gcn \
    --scale 0.25 --iters 30 --outdir results_r2

# 2b. multi-head GAT (BASELINE configs[2]: 3-layer 8-head on Arxiv)
timeout 5400 python scripts/evaluate.py --job fig16 --datasets Arxiv --models gat \
    --layers 3 --heads 8 --iters 30 --outdir results_r2

# 2c. the same GAT/GCN rows with the fused Pallas kernels routed
#     end-to-end (bins + hubs): direct XLA-vs-Pallas comparison in
#     results_r2 to decide the auto default
GALA_PALLAS_AUTO=1 timeout 5400 python scripts/evaluate.py --job fig16 \
    --datasets Reddit --models gat gcn --scale 0.25 --iters 30 \
    --strategy pallas_bell --tag pallas --outdir results_r2 \
    || echo "pallas fig16 Reddit failed" >> results_r2/queue_errors.txt
GALA_PALLAS_AUTO=1 timeout 5400 python scripts/evaluate.py --job fig16 \
    --datasets Products --models gat gcn --scale 0.25 --iters 30 \
    --strategy pallas_bell --tag pallas --outdir results_r2 \
    || echo "pallas fig16 Products failed" >> results_r2/queue_errors.txt

# 3. table7 with fused dynamic sampling (r1: dynamic 8.8x over none;
#    scanned (ra,rb) epochs should bring it to ~1.5x)
timeout 5400 python scripts/evaluate.py --job table7 --datasets Arxiv --iters 30 \
    --outdir results_r2

# 3b. minibatch GraphSAGE on Reddit (BASELINE's neighbor-sampling
#     pipeline config) — dynamic + static neighborhoods
timeout 5400 python scripts/bench_minibatch.py --dataset Reddit --scale 0.25 \
    --iters 12 | tee results_r2/minibatch_sage.json
timeout 5400 python scripts/bench_minibatch.py --dataset Reddit --scale 0.25 \
    --iters 12 --static | tee -a results_r2/minibatch_sage.json

# 4. fig18 on Reddit (the reference's Figure-18 dataset; r1 ran Arxiv)
timeout 5400 python scripts/evaluate.py --job fig18 --datasets Reddit --scale 0.25 \
    --layers 2 3 --hidden 32 128 512 --iters 20 --outdir results_r2

# 5. fig19 memory-vs-time across datasets (physical-footprint metric)
timeout 5400 python scripts/evaluate.py --job fig19 --datasets Arxiv Reddit --scale 0.25 \
    --iters 20 --outdir results_r2

# 5b. table6 papers100M fractions (r1 OOMed above 0.01; the row-select
#     logits fix + int64 path should carry 0.02 and 0.05 single-chip)
timeout 5400 python scripts/evaluate.py --job table6 --t6-dataset Papers100M \
    --fractions 0.005 0.01 0.02 0.05 --iters 20 --outdir results_r2

# 6. fig16 full matrix refresh on the small datasets (cheap)
timeout 5400 python scripts/evaluate.py --job fig16 --datasets Cora Pubmed CoraFull Arxiv \
    --iters 30 --outdir results_r2

# 7. gather microbenches (staged two-level + cliff curve, regression check)
timeout 5400 python scripts/bench_staged_gather.py | tee results_r2/staged_gather.txt
echo QUEUE_DONE
