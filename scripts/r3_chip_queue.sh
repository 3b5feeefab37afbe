#!/bin/bash
# Serial chip-job queue for the round-3 results sweep.  One TPU chip:
# jobs must never overlap a timing run.
#
# Ordering rationale (round-3): XLA jobs FIRST.  The Mosaic remote
# compile helper was dead for all of round 2 (HTTP 500 on even a
# trivial x*2 Pallas kernel, results_r2/pallas_*.txt) while XLA
# compiled fine through the same tunnel — so the numbers we can
# actually produce come first, and the Pallas microbenches run last,
# gated on a 120 s trivial-kernel probe.
set -x
cd /root/repo
mkdir -p results_r3

probe() {  # compile-health probe: XLA jit in a 120 s subprocess
    timeout 120 python -c "import jax, jax.numpy as jnp; \
r = jax.jit(lambda x: (x@x).sum())(jnp.ones((128,128))); r.block_until_ready(); \
print('probe ok')" || { echo "TUNNEL DEAD — aborting queue"; exit 1; }
}
probe

# 0. headline bench (early-JSON contract form)
timeout 3600 python bench.py | tee results_r3/bench.json

# 1. GAT vs GCN at r1 scales: the <=3x epoch-ratio bar (r2: 6.2x on
#    Arxiv, 8.6x Reddit).  Node-packed attention tables are this
#    round's lever — direct comparison against results_r2/stat_fig16.csv
timeout 3600 python scripts/evaluate.py --job fig16 --datasets Reddit --models gat gcn \
    --scale 0.25 --iters 30 --outdir results_r3
timeout 3600 python scripts/evaluate.py --job fig16 --datasets Products --models gat gcn \
    --scale 0.25 --iters 30 --outdir results_r3

# 2. table7 sampling modes incl. fused dynamic (r1: dynamic 8.8x over
#    none; scanned (ra,rb) epochs should bring it near 1x)
timeout 3600 python scripts/evaluate.py --job table7 --datasets Arxiv --iters 30 \
    --outdir results_r3

# 3. table5 refresh (r2 captured it: dir=1.36 vs none=0.78 — dir now
#    measurably different; re-measure after this round's changes)
timeout 3600 python scripts/evaluate.py --job table5 --datasets Reddit --scale 0.25 \
    --iters 30 --outdir results_r3

# 4. papers100M fractions with memory_mb (VERDICT r2 item 5: 0.02/0.05
#    now that the OOM fixes landed; bf16 halves HBM)
timeout 3600 python scripts/evaluate.py --job table6 --t6-dataset Papers100M \
    --fractions 0.005 0.01 0.02 --iters 20 --outdir results_r3
timeout 3600 python scripts/evaluate.py --job table6 --t6-dataset Papers100M \
    --fractions 0.05 --iters 20 --dtype bf16 --outdir results_r3

# 5. use_long (int64) end-to-end at scale — proves the long path
#    (reference: gala_inference_long.cpp)
timeout 3600 python -m gala_tpu inference_long examples/gcn.txt \
    --scale 0.05 --iters 10 | tee results_r3/inference_long.txt

# 6. multi-head GAT (BASELINE configs[2]: 3-layer 8-head on Arxiv)
timeout 3600 python scripts/evaluate.py --job fig16 --datasets Arxiv --models gat \
    --layers 3 --heads 8 --iters 30 --outdir results_r3

# 7. minibatch GraphSAGE (neighbor-sampling pipeline)
timeout 3600 python scripts/bench_minibatch.py --dataset Reddit --scale 0.25 \
    --iters 12 | tee results_r3/minibatch_sage.json

# 8. fig18 scalability on Reddit + fig19 memory-vs-time
timeout 3600 python scripts/evaluate.py --job fig18 --datasets Reddit --scale 0.25 \
    --layers 2 3 --hidden 32 128 512 --iters 20 --outdir results_r3
timeout 3600 python scripts/evaluate.py --job fig19 --datasets Arxiv Reddit --scale 0.25 \
    --iters 20 --outdir results_r3

# 9. fig16 full matrix refresh on the small datasets (cheap)
timeout 3600 python scripts/evaluate.py --job fig16 --datasets Cora Pubmed CoraFull Arxiv \
    --iters 30 --outdir results_r3

# 10. fig20 input-aware vs hand-tuned
timeout 3600 python scripts/evaluate.py --job fig20 --datasets Reddit --scale 0.25 \
    --iters 20 --outdir results_r3

# ---- Pallas tail: only if Mosaic compiles a trivial kernel ---------- #
if timeout 180 python -c "
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
def k(x_ref, o_ref): o_ref[...] = x_ref[...] * 2.0
r = jax.jit(pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((256,256), jnp.float32)))(jnp.ones((256,256)))
r.block_until_ready(); print('mosaic ok')"; then
    timeout 3600 python scripts/bench_pallas_bell.py --n 60000 --f 128 --nb 1000000 --k 16 \
        | sed 's/\x1b\[[0-9;]*m//g' | tee results_r3/pallas_bell_small.txt
    timeout 3600 python scripts/bench_pallas_bell.py --n 2500000 --f 128 --nb 8000000 --k 16 \
        --locality 0.3 | sed 's/\x1b\[[0-9;]*m//g' | tee results_r3/pallas_bell_big.txt
    timeout 3600 python scripts/bench_pallas_bell.py --sddmm \
        | sed 's/\x1b\[[0-9;]*m//g' | tee results_r3/pallas_sddmm.txt
    timeout 3600 python scripts/bench_pallas_bell.py --attn --n 60000 --f 128 --nb 1000000 --k 16 \
        | sed 's/\x1b\[[0-9;]*m//g' | tee results_r3/pallas_attn_small.txt
else
    echo "mosaic still dead $(date -u +%FT%TZ)" | tee results_r3/pallas_skipped.txt
fi
echo QUEUE_DONE
