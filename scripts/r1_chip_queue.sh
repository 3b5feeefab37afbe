#!/bin/bash
# Serial chip-job queue for the round-1 results sweep. One TPU chip:
# jobs must never overlap a timing run.
set -x
cd /root/repo
# fig18 scalability grid, remaining layer counts
python scripts/evaluate.py --job fig18 --datasets Arxiv --outdir results_r1 \
    --layers 2 --hidden 1024 --iters 30
python scripts/evaluate.py --job fig18 --datasets Arxiv --outdir results_r1 \
    --layers 3 4 --hidden 32 64 128 256 512 1024 --iters 30
python scripts/evaluate.py --job fig18 --datasets Arxiv --outdir results_r1 \
    --layers 8 --hidden 32 64 128 256 512 1024 --iters 30
# fig16: Reddit remaining models (gcn row exists at scale 0.25)
python scripts/evaluate.py --job fig16 --datasets Reddit --models gin sage \
    --scale 0.25 --iters 30 --outdir results_r1
python scripts/evaluate.py --job fig16 --datasets Reddit --models gat \
    --scale 0.25 --iters 30 --outdir results_r1
# table5: CIR-vs-DIR breakdown on the reference's two datasets
python scripts/evaluate.py --job table5 --datasets Reddit --scale 0.25 \
    --iters 30 --outdir results_r1
python scripts/evaluate.py --job table5 --datasets Products --scale 0.05 \
    --iters 30 --outdir results_r1
echo QUEUE_DONE
