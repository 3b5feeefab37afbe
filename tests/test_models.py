"""Model + training tests: all four model families reach high accuracy on
the planted-community dataset (accuracy-as-oracle, the reference's
correctness strategy — SURVEY.md §4, reference: scripts/Evaluations/Table-7.py)."""
import jax
import numpy as np
import pytest

from gala_tpu.models import gat, gcn, gin, sage
from gala_tpu.ops.graph import Graph
from gala_tpu.train import train

MODELS = {"gcn": gcn, "gat": gat, "gin": gin, "sage": sage}


@pytest.fixture(scope="module")
def setup(small_dataset):
    g_host, feats, labels, masks = small_dataset
    g = Graph.from_host(g_host, strategy="segment")
    x = g.pad_nodes(feats)
    y = g.pad_nodes(labels)
    tm = g.pad_nodes(masks["train"])
    sm = g.pad_nodes(masks["test"])
    return g, x, y, tm, sm


@pytest.mark.parametrize("name", [
    n if n == "gcn" else pytest.param(n, marks=pytest.mark.slow)
    for n in MODELS
])
def test_model_trains_to_accuracy(name, setup):
    g, x, y, tm, sm = setup
    mod = MODELS[name]
    params = mod.init(jax.random.key(0), x.shape[1], [16], 5)
    res = train(
        mod.forward, params, [g, g], x, y, tm, sm,
        iters=60, valid_step=5, warmup=2,
    )
    assert res.losses[-1] < res.losses[0]
    assert res.max_accuracy > 0.75, f"{name}: acc {res.max_accuracy}"


def test_gcn_strategies_agree(setup, small_dataset):
    """Same seed, different execution strategies -> near-identical logits."""
    g_host, feats, *_ = small_dataset
    outs = []
    for strat in ["dense", "segment", "segment_scan"]:
        g = Graph.from_host(g_host, strategy=strat)
        x = g.pad_nodes(feats)
        params = gcn.init(jax.random.key(1), x.shape[1], [16], 5)
        outs.append(np.asarray(gcn.forward(params, [g, g], x))[: g.n_nodes])
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(outs[1], outs[2], rtol=1e-3, atol=1e-4)


def test_csv_contract(setup):
    g, x, y, tm, sm = setup
    params = gcn.init(jax.random.key(0), x.shape[1], [16], 5)
    res = train(gcn.forward, params, [g, g], x, y, tm, sm, iters=8, warmup=2)
    parts = res.csv(print_accuracy=True).split(",")
    assert len(parts) == 3
    assert float(parts[0]) >= 0 and float(parts[1]) >= float(parts[0])


@pytest.mark.slow
def test_compiled_training_with_forced_chunking(monkeypatch):
    """Integration: the rolled-scan chunked kernels (attention sweeps,
    bell reduce, ELL, SDDMM) run INSIDE the epoch-fused lax.scan
    training loop (nested scans) — compile a GCN and a GAT end-to-end
    with tiny memory budgets and train a few epochs."""
    import gala_tpu
    import gala_tpu.ops.attention as A
    import gala_tpu.ops.spmm as S
    from __graft_entry__ import GAT_DSL, GCN_DSL

    monkeypatch.setattr(S, "_BELL_CHUNK_ELEMS", 1 << 14)
    monkeypatch.setattr(S, "_BELL_FLAT_ELEMS", 1 << 14)
    monkeypatch.setattr(S, "_SCAN_MIN_CHUNKS", 2)
    monkeypatch.setattr(A, "_ATTN_CHUNK_ELEMS", 1 << 13)
    monkeypatch.setattr(A, "_ATTN_FLAT_ELEMS", 1 << 13)
    monkeypatch.setattr(A, "_SCAN_MIN_CHUNKS", 2)
    for src in (GCN_DSL, GAT_DSL):
        cm = gala_tpu.compile_source(src, mode="train", scale=0.01)
        res = cm.train(iters=6)
        assert np.isfinite(res.losses[-1])
        assert np.isfinite(res.total_time)
