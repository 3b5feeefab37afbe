"""Execution-level corpus parity: representative reference DSL programs
compile AND train end-to-end (tiny synthetic stand-ins, CPU).

Parse-level and pass-level corpus coverage is exhaustive
(tests/test_parser.py); this samples one program per corpus family so
the full pipeline — parser, IR, passes, lowering, training loop — is
exercised on the reference's own inputs, including every ablation knob.
"""
import os

import numpy as np
import pytest

import gala_tpu

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier

CORPUS = "/root/reference/tests/GALA-DSL"

REPRESENTATIVES = [
    # the full a100 model x dataset matrix (24 programs) ...
    *(
        f"{m}/{d}/a100.txt"
        for m in ("gcn", "gat", "gin", "sage")
        for d in ("Cora", "Pubmed", "CoraFull", "Reddit", "Arxiv", "Products")
    ),
    # ... one h100 per family (same programs, different hand schedule) ...
    "gcn/Reddit/h100.txt",
    "gat/Pubmed/h100.txt",
    "gin/Arxiv/h100.txt",
    "sage/CoraFull/h100.txt",
    "ablations/sampling/data/Reddit.txt",
    "ablations/sampling/dynamic/Reddit.txt",
    "ablations/sampling/kernel/Reddit.txt",
    "ablations/sampling/no-sampling/Reddit.txt",
    "ablations/speedups/cir-vs-dir/Reddit/none.txt",
    "ablations/speedups/cir-vs-dir/Reddit/cir.txt",
    "ablations/speedups/cir-vs-dir/Reddit/dir.txt",
    "ablations/speedups/cir-vs-dir/Reddit/all.txt",
    "ablations/speedups/inter-vs-intra/Reddit/uo.txt",
    "ablations/speedups/training/fo.txt",
    "ablations/memory-consumption/memory.txt",
    "ablations/memory-consumption/time.txt",
    "ablations/scalability/3_64.txt",
]


@pytest.mark.parametrize("rel", REPRESENTATIVES)
def test_corpus_program_trains(rel):
    path = os.path.join(CORPUS, rel)
    if not os.path.exists(path):
        pytest.skip(f"{rel} not in reference corpus")
    src = open(path).read()
    # opt_input paths point at the reference's local data tree; the
    # autoschedule falls back to the bound dataset's stats
    cm = gala_tpu.compile_source(src, mode="train", scale=0.01)
    res = cm.train(iters=6)
    assert np.isfinite(res.total_time), rel
    assert np.isfinite(res.losses[-1]), rel
    line = res.csv(cm.spec.print_accuracy, cm.spec.print_memory)
    assert all(np.isfinite(float(p)) for p in line.split(",")), line
