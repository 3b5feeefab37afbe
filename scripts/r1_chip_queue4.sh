#!/bin/bash
# Final round-1 chip queue: pipelined re-runs of the chunk-affected
# fig18 cells, papers100M-parity table6 fractions, gather-cliff
# microbench, final bench.
set -x
cd /root/repo
python scripts/evaluate.py --job fig18 --datasets Arxiv --outdir results_r1 \
    --layers 2 3 4 8 --hidden 256 512 1024 --iters 30
python scripts/evaluate.py --job table6 --t6-dataset Papers100M \
    --fractions 0.01 0.02 0.05 --iters 30 --outdir results_r1
python scripts/evaluate.py --job table6 --t6-dataset Papers100M \
    --fractions 0.1 --dtype bf16 --iters 30 --outdir results_r1
# packed-gather A/B: these fractions crossed the cliff pre-packing
# (0.1: 0.257s, 0.2: 0.551s total)
python scripts/evaluate.py --job table6 --fractions 0.1 0.2 --iters 30 \
    --outdir results_r1
python scripts/bench_gather_cliff.py
python bench.py
echo QUEUE4_DONE
