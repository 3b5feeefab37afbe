"""Tests for data-layer utilities: reordering, mtx IO, GALA npy IO,
sampling, subgraphs, stats, checkpointing."""
import os
import tempfile

import numpy as np
import pytest

from gala_tpu.data.csr import densify
from gala_tpu.data.io import load_gala_npy, save_gala_npy
from gala_tpu.data.mtx import read_mtx, write_mtx
from gala_tpu.data.reordering import apply_reorder, bfs_order, degree_order
from gala_tpu.data.sampling import sample_graph_ab, sample_graph_random
from gala_tpu.data.subgraph import mask_subgraphs
from gala_tpu.utils.stats import MtxStats, approx_range, degree_entropy


def test_reorder_is_similarity_transform(small_dataset):
    g, feats, labels, masks = small_dataset
    perm = degree_order(g)
    g2, f2, l2, m2, inv = apply_reorder(g, perm, feats, labels, masks)
    np.testing.assert_allclose(densify(g2), densify(g)[np.ix_(perm, perm)])
    assert np.all(l2 == labels[perm])
    assert np.all(inv[perm] == np.arange(g.n_rows))


def test_bfs_order_is_permutation(small_dataset):
    g, *_ = small_dataset
    order = bfs_order(g)
    assert sorted(order.tolist()) == list(range(g.n_rows))


def test_mtx_roundtrip(small_dataset):
    g, *_ = small_dataset
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "g.mtx")
        write_mtx(p, g)
        g2 = read_mtx(p)
        np.testing.assert_allclose(densify(g2), densify(g))


def test_gala_npy_roundtrip(small_dataset):
    g, feats, labels, masks = small_dataset
    with tempfile.TemporaryDirectory() as d:
        save_gala_npy(d, g, feats, labels, masks)
        g2, f2, l2, m2 = load_gala_npy(d)
        assert g2.n_rows == g.n_rows and g2.n_edges == g.n_edges
        np.testing.assert_allclose(densify(g2), densify(g))
        np.testing.assert_allclose(f2, feats)
        assert np.all(l2 == labels)
        assert np.all(m2["train"] == masks["train"])


def test_sampling_caps_degree(small_dataset):
    g, *_ = small_dataset
    for sampler in (sample_graph_random, sample_graph_ab):
        gs = sampler(g, 4)
        assert gs.degrees.max() <= 4
        assert gs.n_edges <= g.n_edges


def test_sample_ab_deterministic(small_dataset):
    g, *_ = small_dataset
    a = sample_graph_ab(g, 5)
    b = sample_graph_ab(g, 5)
    assert np.array_equal(a.src, b.src) and np.array_equal(a.dst, b.dst)


def test_mask_subgraphs_structure(small_dataset):
    g, feats, labels, masks = small_dataset
    subs = mask_subgraphs(g, masks["train"], 2)
    assert len(subs) == 2
    # last layer keeps exactly the edges into masked nodes
    keep = masks["train"][g.dst]
    assert subs[1].n_edges == int(keep.sum())
    # earlier layers keep at least as many edges (grown mask)
    assert subs[0].n_edges >= subs[1].n_edges
    # every edge of layer-1's subgraph reaches the mask within 2 hops
    assert subs[0].n_edges <= g.n_edges


def test_stats(small_dataset):
    g, *_ = small_dataset
    s = MtxStats.of(g)
    assert s.n_edges == g.n_edges
    assert s.mean_degree == pytest.approx(g.n_edges / g.n_rows)
    assert degree_entropy(g, frac=1.0) > 0
    r = approx_range(g, n_tiles=4)
    assert r.shape == (4, 2)


def test_checkpoint_roundtrip():
    import jax.numpy as jnp

    from gala_tpu.checkpoint import load_checkpoint, save_checkpoint

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": [jnp.ones(4)]}
    with tempfile.TemporaryDirectory() as d:
        p = save_checkpoint(os.path.join(d, "ckpt"), params, step=3)
        back = load_checkpoint(p, like={"params": params, "step": 0})
        np.testing.assert_allclose(np.asarray(back["params"]["w"]),
                                   np.asarray(params["w"]))


def test_dynamic_sampled_spmm(small_dataset):
    import jax
    import jax.numpy as jnp

    from gala_tpu.ops.graph import Graph
    from gala_tpu.ops.spmm import spmm_sampled

    g_host, feats, *_ = small_dataset
    g = Graph.from_host(g_host, strategy="ell")
    x = g.pad_nodes(feats)
    out = spmm_sampled(g, x, k=4, ra=5, rb=7)
    assert out.shape[0] == g.n_pad
    assert np.all(np.isfinite(np.asarray(out)))
    # deterministic given (ra, rb)
    out2 = spmm_sampled(g, x, k=4, ra=5, rb=7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
    # differentiable
    grad = jax.grad(lambda v: jnp.sum(spmm_sampled(g, v, 4, 5, 7)))(x)
    assert np.all(np.isfinite(np.asarray(grad)))


def test_dynamic_sampled_spmm_chunked_matches(small_dataset, monkeypatch):
    """Forcing the memory-bounded scan on the sampled path must match
    the one-shot sampled aggregation exactly (same (ra, rb) stream)."""
    import jax
    import jax.numpy as jnp

    import gala_tpu.ops.spmm as S
    from gala_tpu.ops.graph import Graph
    from gala_tpu.ops.spmm import spmm_sampled

    g_host, feats, *_ = small_dataset
    g = Graph.from_host(g_host, strategy="ell")
    x = g.pad_nodes(feats)
    ref = np.asarray(spmm_sampled(g, x, k=4, ra=5, rb=7))
    ref_g = np.asarray(
        jax.grad(lambda v: jnp.sum(spmm_sampled(g, v, 4, 5, 7) ** 2))(x)
    )
    monkeypatch.setattr(S, "_BELL_CHUNK_ELEMS", 1 << 13)
    got = np.asarray(spmm_sampled(g, x, k=4, ra=5, rb=7))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    got_g = np.asarray(
        jax.grad(lambda v: jnp.sum(spmm_sampled(g, v, 4, 5, 7) ** 2))(x)
    )
    np.testing.assert_allclose(got_g, ref_g, rtol=1e-4, atol=1e-4)


def test_dynamic_sampled_bell_matches_gather_form(small_dataset):
    """The reweighted-bell dynamic path (zero per-epoch index gathers;
    ops.spmm._spmm_dyn_bell) must equal the direct gather form
    (_spmm_dyn, the reference formula executed literally) — the k picks
    with repetition ARE the position-count weights, so the match is
    exact up to float association.  Forward and backward, several
    (ra, rb) streams, hub + degenerate rows included."""
    import jax
    import jax.numpy as jnp

    from gala_tpu.data.csr import coo_to_csr
    from gala_tpu.ops.graph import Graph
    from gala_tpu.ops.spmm import spmm_sampled

    rng = np.random.default_rng(11)
    n, f = 400, 24
    # mixed structure: uniform edges + a 200-in-degree hub-ish node +
    # self loops + an isolated node (399)
    e = 3000
    src = rng.integers(0, n - 1, e)
    dst = rng.integers(0, n - 1, e)
    hub_src = rng.integers(0, n - 1, 200)
    src = np.concatenate([src, hub_src, np.arange(n - 1)])
    dst = np.concatenate([dst, np.full(200, 7), np.arange(n - 1)])
    g_host = coo_to_csr(src, dst, None, n_rows=n)

    g_ref = Graph.from_host(g_host, strategy="segment", keep_edges=True)
    g_bell = Graph.from_host(g_host, strategy="bell", keep_edges=True,
                             dynamic_sample=True)
    assert g_bell.dyn_f is not None and g_bell.dyn_t is not None
    x = g_ref.pad_nodes(rng.normal(size=(n, f)).astype(np.float32))

    for k, ra, rb in ((4, 5, 7), (9, 13, 2), (300, 17, 5)):
        ref = np.asarray(spmm_sampled(g_ref, x, k=k, ra=ra, rb=rb))
        got = np.asarray(spmm_sampled(g_bell, x, k=k, ra=ra, rb=rb))
        np.testing.assert_allclose(
            got[:n], ref[:n], rtol=1e-4, atol=1e-4
        )
        ref_g = np.asarray(jax.grad(
            lambda v: jnp.sum(spmm_sampled(g_ref, v, k, ra, rb) ** 2))(x))
        got_g = np.asarray(jax.grad(
            lambda v: jnp.sum(spmm_sampled(g_bell, v, k, ra, rb) ** 2))(x))
        np.testing.assert_allclose(
            got_g[:n], ref_g[:n], rtol=1e-3, atol=1e-3
        )


@pytest.mark.slow
def test_multihead_gat(small_dataset):
    import functools

    import jax

    from gala_tpu.models import gat
    from gala_tpu.ops.graph import Graph
    from gala_tpu.train import train

    g_host, feats, labels, masks = small_dataset
    g = Graph.from_host(g_host, strategy="segment")
    x = g.pad_nodes(feats)
    params = gat.init(jax.random.key(0), x.shape[1], [8], 5, n_heads=4)
    fwd = functools.partial(gat.forward, n_heads=4)
    res = train(
        fwd, params, [g, g], x, g.pad_nodes(labels),
        g.pad_nodes(masks["train"]), g.pad_nodes(masks["test"]),
        iters=40, warmup=2,
    )
    assert res.max_accuracy > 0.75


def test_native_bell_fill_matches_numpy():
    """The OpenMP binned-ELL fill produces the identical layout."""
    import numpy as np

    from gala_tpu import native
    from gala_tpu.data.csr import coo_to_csr
    from gala_tpu.data.ell import build_binned_ell

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(0)
    n, e = 3000, 40000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    dst = np.concatenate([dst, np.full(400, 17)])  # hub
    src = np.concatenate([src, rng.integers(0, n, 400)])
    key = np.unique(src.astype(np.int64) * n + dst)
    src, dst = key // n, key % n
    g = coo_to_csr(src, dst, rng.standard_normal(len(src)).astype(np.float32), n_rows=n)
    a = build_binned_ell(g, with_edge_ids=True)                       # numpy
    b = build_binned_ell(g, with_edge_ids=True, native_min_edges=0)   # native
    np.testing.assert_array_equal(a.flat_cols, b.flat_cols)
    np.testing.assert_array_equal(a.flat_edge, b.flat_edge)
    for va, vb in zip(a.bin_vals, b.bin_vals):
        np.testing.assert_array_equal(va, vb)
    if a.big_vals is not None:
        np.testing.assert_array_equal(a.big_vals, b.big_vals)


def test_train_checkpoint_resume(tmp_path):
    """train(checkpoint_path=...) then train(resume_from=...) continues
    from the saved params (loss continues to decrease, not restart)."""
    import gala_tpu

    src = (
        'G = load_dataset("CkptT");\n'
        "aggrFn = dsl.get_aggregate(fn = dsl.fn.mul_sum);\n"
        "L1 = layer(G, hs, nonln_fn, aggregate_fn) {\n"
        "    deg = G.graphs.degrees();\n"
        "    norm = dsl.fn.pow(deg, -0.5);\n"
        "    res = norm * G.node.feats;\n"
        "    res = aggregate_fn(G.graphs, res);\n"
        "    res = dsl.nn.ffn(res, out=hs);\n"
        "    res = norm * res;\n"
        "    G.node.feats = nonln_fn(res);\n"
        "}\n"
        "M1 = model(G, non_ln) {\n"
        "    l1 = L1(G, 8, non_ln, aggrFn);\n"
        "    l2 = L1(l1, G.labels.size(), null, aggrFn);\n"
        "}\n"
        "m1 = M1(G, dsl.non_ln.ReLU);\n"
        "m1.train(iters=10, validation_step=5);\n"
        "res = m1.eval();\n"
    )
    cm = gala_tpu.compile_source(src, mode="train")
    ck = str(tmp_path / "ck")
    r1 = cm.train(iters=10, checkpoint_path=ck)
    r2 = cm.train(iters=10, resume_from=ck + ".npz" if os.path.exists(ck + ".npz") else ck)
    # resumed run starts from trained params: its first losses should be
    # no worse than the fresh run's last losses (allow small noise)
    assert r2.losses[0] <= r1.losses[0]
    assert r2.losses[0] <= r1.losses[-1] * 1.5


def _npy_bytes(descr: str, shape, payload: bytes) -> bytes:
    """Hand-assembled npy v1.0 file — the exact byte layout
    npy::LoadArrayFromNumpy (reference: tests/common.h:293-366) parses:
    magic, version, little-endian header length, python-dict header
    padded with spaces to 64-byte alignment ending in newline, raw
    little-endian data."""
    shp = "(" + ", ".join(str(s) for s in shape) + ("," if len(shape) == 1 else "") + ")"
    header = ("{'descr': '%s', 'fortran_order': False, 'shape': %s, }"
              % (descr, shp)).encode()
    pad = 64 - ((10 + len(header) + 1) % 64)
    header = header + b" " * pad + b"\n"
    return b"\x93NUMPY\x01\x00" + len(header).to_bytes(2, "little") + header + payload


def test_gala_npy_byte_layout_fixture(tmp_path):
    """Interop: a dataset directory written BYTE-BY-BYTE in the format
    the reference's exporter produces and readSM_npy32 consumes
    (reference: tests/common.h:331-366, scripts/Data/gala_export_npy.py)
    must load through load_gala_npy with identical semantics: Adj_src =
    uint32 [n_rows, n_cols, dst...], Adj_dst = uint32 [src...], CSR rows
    are destinations, vals := 1."""
    import struct

    # 4-node graph, 5 edges (dst, src): (0,1) (1,0) (1,2) (2,3) (3,0)
    dsts = [0, 1, 1, 2, 3]
    srcs = [1, 0, 2, 3, 0]
    n = 4
    feats = np.arange(n * 3, dtype="<f4").reshape(n, 3)
    labels = np.asarray([0, 1, 0, 1], dtype="<i8").reshape(n, 1)
    tn = np.asarray([1, 1, 0, 0], dtype="<i4").reshape(n, 1)
    vl = np.asarray([0, 0, 1, 0], dtype="<i4").reshape(n, 1)
    ts = np.asarray([0, 0, 0, 1], dtype="<i4").reshape(n, 1)

    d = tmp_path / "ByteFix"
    d.mkdir()
    (d / "Adj_src.npy").write_bytes(_npy_bytes(
        "<u4", (2 + len(dsts),),
        struct.pack(f"<{2 + len(dsts)}I", n, n, *dsts)))
    (d / "Adj_dst.npy").write_bytes(_npy_bytes(
        "<u4", (len(srcs),), struct.pack(f"<{len(srcs)}I", *srcs)))
    (d / "Feat.npy").write_bytes(_npy_bytes("<f4", (n, 3), feats.tobytes()))
    (d / "Lab.npy").write_bytes(_npy_bytes("<i8", (n, 1), labels.tobytes()))
    (d / "TnMsk.npy").write_bytes(_npy_bytes("<i4", (n, 1), tn.tobytes()))
    (d / "VlMsk.npy").write_bytes(_npy_bytes("<i4", (n, 1), vl.tobytes()))
    (d / "TsMsk.npy").write_bytes(_npy_bytes("<i4", (n, 1), ts.tobytes()))

    g, f2, l2, m2 = load_gala_npy(str(d))
    assert g.n_rows == g.n_cols == n and g.n_edges == 5
    # dst-sorted CSR over destinations, vals all 1
    got = sorted(zip(g.dst.tolist(), g.src.tolist()))
    assert got == sorted(zip(dsts, srcs))
    assert np.all(g.vals == 1.0)
    np.testing.assert_array_equal(f2, feats)
    np.testing.assert_array_equal(l2, [0, 1, 0, 1])
    assert m2["train"].tolist() == [True, True, False, False]
    assert m2["test"].tolist() == [False, False, False, True]

    # save_gala_npy emits the same byte-level contract (dtypes/shapes
    # the reference reader requires)
    out = tmp_path / "resaved"
    save_gala_npy(str(out), g, f2, l2, m2)
    a_src = np.load(out / "Adj_src.npy")
    assert a_src.dtype == np.uint32 and a_src[0] == n and a_src[1] == n
    assert np.load(out / "Adj_dst.npy").dtype == np.uint32
    assert np.load(out / "Lab.npy").dtype == np.int64
    assert np.load(out / "TnMsk.npy").dtype == np.int32


def test_data_root_end_to_end(tmp_path, small_dataset):
    """--data-root as a first-class path: a GALA-layout directory named
    like the DSL's dataset resolves through load_dataset and trains."""
    import gala_tpu

    g, feats, labels, masks = small_dataset
    save_gala_npy(str(tmp_path / "DiskSet"), g, feats, labels, masks)
    src = '''
G = load_dataset("DiskSet");
aggrFn = dsl.get_aggregate(fn = dsl.fn.mul_sum);
L1 = layer(G, hs, nonln_fn, aggregate_fn) {
    deg = G.graphs.degrees();
    norm = dsl.fn.pow(deg, -0.5);
    res = norm * G.node.feats;
    res = aggregate_fn(G.graphs, res);
    res = dsl.nn.ffn(res, out=hs);
    res = norm * res;
    G.node.feats = nonln_fn(res);
}
M1 = model(G, non_ln) {
    l1 = L1(G, 16, non_ln, aggrFn);
    l2 = L1(l1, G.labels.size(), null, aggrFn);
}
m1 = M1(G, dsl.non_ln.ReLU);
m1.train(iters=30, validation_step=5);
res = m1.eval();
'''
    cm = gala_tpu.compile_source(src, mode="train", data_root=str(tmp_path))
    res = cm.train(iters=30)
    assert res.max_accuracy > 0.7, res.max_accuracy


def test_dist_and_tile_stats(small_dataset):
    from gala_tpu.utils.stats import DistStats, tile_stats

    g, *_ = small_dataset
    st = tile_stats(g, blk_r=64, blk_c=64)
    for key in ("row", "col", "tile", "row_block", "col_block"):
        d = st[key]
        assert d.nelems > 0
        assert abs(d.sum - g.n_edges) < 1e-9, key   # every nnz counted once
        assert 0.0 <= d.gini <= 1.0
        assert 0.0 < d.pratio <= 1.0
    # uniform vector: gini 0, pratio 1
    u = DistStats.of(np.full(16, 3.0))
    assert abs(u.gini) < 1e-12 and abs(u.pratio - 1.0) < 1e-12
    # one spike: gini -> (n-1)/n, pratio -> 1/n
    s = DistStats.of(np.eye(1, 16, 0).ravel() * 5)
    assert abs(s.pratio - 1 / 16) < 1e-12


def test_check_equal(small_dataset):
    import dataclasses as dc

    from gala_tpu.utils.stats import check_equal

    g, *_ = small_dataset
    ok, why = check_equal(g, g)
    assert ok, why
    g2 = dc.replace(g, vals=g.vals * 2.0)
    ok, why = check_equal(g, g2)
    assert not ok and why == "values differ"
    ok, why = check_equal(g, g2, check_vals=False)
    assert ok
    g3 = dc.replace(g, n_cols=g.n_cols + 1)
    assert check_equal(g, g3)[1] == "dims differ"


def test_train_with_recovery(tmp_path, small_dataset):
    """Failure-recovery orchestration: a segment that dies mid-training
    restarts from the last checkpoint; a fresh 'process' (new
    orchestrator call) skips completed epochs via the progress file."""
    import gala_tpu
    from gala_tpu.resilience import load_progress, train_with_recovery

    import importlib.util as _il
    spec = _il.spec_from_file_location(
        "evaluate", os.path.join(os.path.dirname(__file__), "..", "scripts", "evaluate.py")
    )
    _ev = _il.module_from_spec(spec); spec.loader.exec_module(_ev)
    cm = gala_tpu.compile_source(_ev.make_dsl("gcn", "RecovT", hidden=12),
                                 mode="train", scale=0.05)
    ckpt = str(tmp_path / "ck")

    calls = {"n": 0}

    def flaky_train(**kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("injected device loss")
        return cm.train(warmup=1, **kw)

    res = train_with_recovery(flaky_train, iters=24, checkpoint_path=ckpt,
                              segment=8, max_restarts=2)
    assert load_progress(ckpt) == 24
    assert calls["n"] == 4          # 3 segments + 1 injected failure
    assert res.max_accuracy > 0.7, res.max_accuracy
    # a fresh orchestrator continues instead of retraining
    import pytest as _pt
    with _pt.raises(RuntimeError, match="already completed"):
        train_with_recovery(flaky_train, iters=24, checkpoint_path=ckpt,
                            segment=8)


def test_stage_dedup_native_matches_numpy():
    from gala_tpu import native

    if not native.available():
        import pytest as _pt
        _pt.skip("native toolchain unavailable")
    rng = np.random.default_rng(9)
    cols = rng.integers(0, 500, 10_000).astype(np.int32)
    bounds = [(0, 3000), (3000, 7100), (7100, 10_000)]
    uniq_buf, counts, local = native.stage_dedup_native(cols, bounds)
    for ci, (b0, b1) in enumerate(bounds):
        u_ref, inv_ref = np.unique(cols[b0:b1], return_inverse=True)
        u = uniq_buf[b0 : b0 + int(counts[ci])]
        np.testing.assert_array_equal(u, u_ref)
        np.testing.assert_array_equal(local[b0:b1], inv_ref)


def test_plan_blocks_native_matches_numpy():
    """Native OpenMP block planner == the pure-NumPy plan in plan_chunks.

    Covers non-dividing chunk counts (zero-padded tail) and the U-pad
    (chunks with fewer unique blocks repeat block 0)."""
    from gala_tpu import native
    from gala_tpu.ops.pallas.bell_spmm import BLK

    if not native.available():
        import pytest as _pt
        _pt.skip("native toolchain unavailable")
    rng = np.random.default_rng(11)
    for nb, k, r in [(1000, 16, 128), (517, 8, 64), (63, 32, 64)]:
        cols = rng.integers(0, 4096, nb * k).astype(np.int32)
        c_chunks = -(-nb // r)
        cols2 = np.zeros((c_chunks * r, k), np.int64)
        cols2[:nb] = cols.reshape(nb, k)
        cols3 = cols2.reshape(c_chunks, r, k)
        blocks, locals_, u = native.plan_blocks_native(cols3)
        # reference plan
        blk_l, loc_l = [], []
        for c in range(c_chunks):
            ids = cols3[c]
            b = np.unique(ids // BLK)
            blk_l.append(b)
            loc_l.append(np.searchsorted(b, ids // BLK) * BLK + ids % BLK)
        u_ref = max(b.shape[0] for b in blk_l)
        assert u == u_ref
        for c, b in enumerate(blk_l):
            np.testing.assert_array_equal(blocks[c, : b.shape[0]], b)
            np.testing.assert_array_equal(
                blocks[c, b.shape[0]:], np.full(u - b.shape[0], b[0])
            )
            np.testing.assert_array_equal(locals_[c], loc_l[c])


def test_rgg2d_dataset_locality_and_training():
    """The geometric registry graph (RGG2D) must (a) load with
    spatial-tile ids whose dominant degree-class segment clears the
    Pallas staged-row reuse break-even, unlike the R-MAT community
    stand-ins (measured 0.13-0.19), and (b) train to a meaningful
    accuracy through the public API (labels are grid regions =>
    geometric homophily)."""
    import gala_tpu
    from gala_tpu.data.datasets import load_dataset
    from gala_tpu.data.ell import build_binned_ell
    from gala_tpu.ops.pallas.bell_spmm import _est_reuse

    g, feats, labels, masks = load_dataset("RGG2D", scale=0.02)
    assert feats.shape[0] == g.n_rows
    hb = build_binned_ell(g)
    best = 0.0
    off = 0
    for k, nb in zip(hb.bin_ks, hb.bin_counts):
        if nb * k > 50_000:
            best = max(best, _est_reuse(hb.flat_cols[off : off + nb * k], k, 64))
        off += nb * k
    assert best > 2.0, f"spatial-tile layout lost its locality: reuse {best}"

    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "evaluate", os.path.join(
            os.path.dirname(__file__), "..", "scripts", "evaluate.py")
    )
    ev = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ev)
    cm = gala_tpu.compile_source(
        ev.make_dsl("gcn", "RGG2D"), mode="train", scale=0.02
    )
    res = cm.train(iters=40)
    assert res.max_accuracy > 0.6, res.max_accuracy


def test_rgg2d_native_matches_python(monkeypatch):
    """The C++ grid-hash RGG neighbor search produces exactly the
    Python generator's edge set (order-free comparison; CSR sorting
    normalizes order downstream)."""
    import gala_tpu.native as native
    from gala_tpu.data.synthetic import rgg2d_edges

    if not native.available():
        import pytest

        pytest.skip("native toolchain unavailable")
    n, r = 5000, 0.02
    s1, d1 = rgg2d_edges(n, r, seed=11)
    monkeypatch.setenv("GALA_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_lib", None)
    s2, d2 = rgg2d_edges(n, r, seed=11)
    assert set(zip(s1.tolist(), d1.tolist())) == set(zip(s2.tolist(), d2.tolist()))
