#!/bin/bash
# Full results re-sweep after the dispatch-starvation timing fix
# (commit bb472ba): all prior inference_time values were inflated by
# per-dispatch H2D stalls. Compiles are cached; this is mostly run time.
set -x
cd /root/repo
python scripts/evaluate.py --job fig16 --datasets Cora Pubmed Arxiv --iters 30 --outdir results_r1
python scripts/evaluate.py --job fig18 --datasets Arxiv --outdir results_r1 --iters 30
python scripts/evaluate.py --job fig19 --datasets Arxiv --iters 30 --outdir results_r1
python scripts/evaluate.py --job fig20 --datasets Cora Pubmed Arxiv --iters 30 --outdir results_r1
python scripts/evaluate.py --job table7 --datasets Arxiv --iters 30 --outdir results_r1
python scripts/evaluate.py --job table6 --iters 30 --outdir results_r1
python scripts/evaluate.py --job table5 --datasets Reddit --scale 0.25 --iters 30 --outdir results_r1
python scripts/evaluate.py --job table5 --datasets Products --scale 0.05 --iters 30 --outdir results_r1
python scripts/evaluate.py --job fig16 --datasets CoraFull --iters 30 --outdir results_r1
python scripts/evaluate.py --job fig16 --datasets Reddit --models gcn gin sage --scale 0.25 --iters 30 --outdir results_r1
python scripts/evaluate.py --job fig16 --datasets Reddit --models gat --scale 0.25 --iters 30 --outdir results_r1
python scripts/evaluate.py --job fig16 --datasets Products --models gcn sage gin --scale 0.25 --iters 30 --outdir results_r1
echo RESWEEP_DONE
