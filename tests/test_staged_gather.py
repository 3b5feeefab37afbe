"""Staged (two-level dedup) gather parity: forcing the stage tables on a
small graph must reproduce the direct bell/attention results exactly —
the layout only changes WHERE rows are gathered from, never the math.

The production gates (ops.graph._STAGE_BUILD_BYTES,
ops.spmm._STAGE_MIN_BYTES) require cliff-sized tables; tests shrink
them to zero so the staged code path runs on the 300-node fixture.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gala_tpu.ops.graph as graph_mod
import gala_tpu.ops.spmm as spmm_mod
from gala_tpu.data.csr import densify
from gala_tpu.data.ell import build_binned_ell, build_stage_tables, stage_chunks
from gala_tpu.ops.graph import Graph
from gala_tpu.ops.spmm import spmm

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier


@pytest.fixture()
def force_stage(monkeypatch):
    monkeypatch.setattr(graph_mod, "_STAGE_BUILD_BYTES", 0)
    monkeypatch.setattr(spmm_mod, "_STAGE_MIN_BYTES", 0)
    # disable packing so the stage path (gated on p == 1) is exercised
    monkeypatch.setattr(spmm_mod, "_PACK_MIN_BYTES", 1 << 60)


def test_stage_tables_cover_all_chunks(small_dataset):
    g_host, *_ = small_dataset
    hb = build_binned_ell(g_host)
    st = build_stage_tables(hb)
    # chunk count must match the canonical runtime iteration
    n_chunks = sum(
        len(stage_chunks(k, nb)) for k, nb in zip(hb.bin_ks, hb.bin_counts)
    )
    if hb.n_big:
        n_chunks += len(stage_chunks(hb.big_vals.shape[1], hb.big_vals.shape[0]))
    assert len(st.uniq) == n_chunks
    assert 0 < st.uniq_frac <= 1.0
    # every local index addresses a real uniq row holding the right id
    off = 0
    for (si, lo, hi), u, l in zip(st.chunk_rows, st.uniq, st.local):
        assert l.max() < u.shape[0]


def test_staged_spmm_matches_direct(small_dataset, force_stage):
    g_host, *_ = small_dataset
    a = densify(g_host)
    g = Graph.from_host(g_host, strategy="bell")
    assert g.bell.stage is not None, "force_stage gate failed to build tables"
    f = 72  # > 64 so packing cannot apply even without the monkeypatch
    x = np.random.default_rng(0).normal(size=(g.n_nodes, f)).astype(np.float32)
    xp = g.pad_nodes(x)
    out = np.asarray(spmm(g, xp))
    np.testing.assert_allclose(out[: g.n_nodes], a @ x, rtol=1e-4, atol=1e-4)
    # backward rides the transpose layout's stage tables
    grad = jax.grad(lambda v: jnp.sum(spmm(g, v) ** 2))(xp)
    np.testing.assert_allclose(
        np.asarray(grad)[: g.n_nodes], 2 * a.T @ (a @ x), rtol=1e-3, atol=1e-3
    )


def test_staged_vs_unstaged_bitwise(small_dataset, force_stage):
    """The staged path must agree with the unstaged chunked path to
    float tolerance on identical inputs (same einsum shapes per chunk)."""
    g_host, *_ = small_dataset
    g = Graph.from_host(g_host, strategy="bell")
    x = np.random.default_rng(1).normal(size=(g.n_nodes, 72)).astype(np.float32)
    xp = g.pad_nodes(x)
    staged = np.asarray(spmm(g, xp))
    unstaged_bell = dataclasses.replace(g.bell, stage=None)
    unstaged_t = dataclasses.replace(g.t_bell, stage=None)
    g2 = dataclasses.replace(g, bell=unstaged_bell, t_bell=unstaged_t)
    direct = np.asarray(spmm(g2, xp))
    np.testing.assert_allclose(staged, direct, rtol=1e-5, atol=1e-5)


def test_staged_scan_rolled_matches(small_dataset, monkeypatch, force_stage):
    """Many-chunk staged segments roll into lax.scan (one chunk's staged
    temps live at a time — the unrolled barrier chain let XLA keep every
    chunk's gather temp alive inside a training while-loop and OOM at
    Products-0.25 scale).  Shrinking S_CHUNK forces multi-chunk segments
    on the 300-node fixture; the rolled result must match the dense
    oracle and the unstaged path, forward and backward."""
    import gala_tpu.data.ell as ell_mod

    monkeypatch.setattr(ell_mod, "S_CHUNK", 64)
    monkeypatch.setattr(spmm_mod, "_SCAN_MIN_CHUNKS", 2)
    # tiny chunks dedup poorly on the random fixture; the perf gate
    # must not drop the tables whose CORRECTNESS this test pins
    monkeypatch.setattr(graph_mod, "_STAGE_MAX_UNIQ_FRAC", 1.1)
    g_host, *_ = small_dataset
    a = densify(g_host)
    g = Graph.from_host(g_host, strategy="bell")
    assert g.bell.stage is not None
    n_chunks = max(
        len(stage_chunks(k, nb))
        for k, nb in zip(g.bell.bin_ks, g.bell.bin_counts)
    )
    assert n_chunks >= 2, "fixture did not produce multi-chunk segments"
    x = np.random.default_rng(3).normal(size=(g.n_nodes, 72)).astype(np.float32)
    xp = g.pad_nodes(x)
    out = np.asarray(spmm(g, xp))
    np.testing.assert_allclose(out[: g.n_nodes], a @ x, rtol=1e-4, atol=1e-4)
    grad = jax.grad(lambda v: jnp.sum(spmm(g, v) ** 2))(xp)
    np.testing.assert_allclose(
        np.asarray(grad)[: g.n_nodes], 2 * a.T @ (a @ x), rtol=1e-3, atol=1e-3
    )
    # parity against the unstaged path on the same layout
    g2 = dataclasses.replace(
        g,
        bell=dataclasses.replace(g.bell, stage=None),
        t_bell=dataclasses.replace(g.t_bell, stage=None),
    )
    np.testing.assert_allclose(
        out, np.asarray(spmm(g2, xp)), rtol=1e-5, atol=1e-5
    )


def test_staged_attention_matches_unstaged(small_dataset, monkeypatch, force_stage):
    import gala_tpu.ops.attention as attn_mod
    from gala_tpu.ops.attention import AttnBell, attention_aggregate

    g_host, *_ = small_dataset
    n_pad = ((g_host.n_rows + 8) // 8) * 8
    ab = AttnBell.from_host(g_host, n_pad, n_pad)
    assert ab.fwd.stage is not None

    f = 72
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(n_pad, f)).astype(np.float32))
    vl = jnp.asarray(rng.normal(size=(n_pad, 1)).astype(np.float32))
    vr = jnp.asarray(rng.normal(size=(n_pad, 1)).astype(np.float32))

    def loss(ab_, x_, vl_, vr_):
        return jnp.sum(attention_aggregate(n_pad, n_pad, 0.2, ab_, x_, vl_, vr_) ** 2)

    out_s = attention_aggregate(n_pad, n_pad, 0.2, ab, x, vl, vr)
    gx_s, gvl_s, gvr_s = jax.grad(loss, argnums=(1, 2, 3))(ab, x, vl, vr)

    ab_plain = AttnBell(
        fwd=dataclasses.replace(ab.fwd, stage=None),
        t=dataclasses.replace(ab.t, stage=None),
        rows=ab.rows, t_rows=ab.t_rows,
    )
    out_p = attention_aggregate(n_pad, n_pad, 0.2, ab_plain, x, vl, vr)
    gx_p, gvl_p, gvr_p = jax.grad(loss, argnums=(1, 2, 3))(ab_plain, x, vl, vr)

    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_p), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_p), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gvl_s), np.asarray(gvl_p), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gvr_s), np.asarray(gvr_p), rtol=1e-3, atol=1e-3)
