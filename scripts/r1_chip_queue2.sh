#!/bin/bash
# Second serial chip queue: GAT profile + remaining fig16 dataset rows.
set -x
cd /root/repo
python scripts/profile_gat.py --scale 1.0 --hidden 32
# re-run Reddit gcn: the existing row (inference > total) came from an
# interrupted session and may have overlapped another chip job
python scripts/evaluate.py --job fig16 --datasets Reddit --models gcn \
    --scale 0.25 --iters 30 --outdir results_r1
# fig16: the two datasets the reference evaluates that had no rows yet
python scripts/evaluate.py --job fig16 --datasets CoraFull --scale 1.0 \
    --iters 30 --outdir results_r1
python scripts/evaluate.py --job fig16 --datasets Products --models gcn sage \
    --scale 0.25 --iters 30 --outdir results_r1
python scripts/evaluate.py --job fig16 --datasets Products --models gin \
    --scale 0.25 --iters 30 --outdir results_r1
# Reddit GAT retry: the chunked fused attention bounds the gather
# buffers (the 0.25-scale run OOMed at 31G before)
python scripts/evaluate.py --job fig16 --datasets Reddit --models gat \
    --scale 0.25 --iters 30 --outdir results_r1
echo QUEUE2_DONE
