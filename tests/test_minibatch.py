"""Minibatch neighbor-sampling pipeline (gala_tpu.data.minibatch +
gala_tpu.train_minibatch) — the BASELINE GraphSAGE-with-sampling config.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gala_tpu.data.csr import coo_to_csr
from gala_tpu.data.minibatch import NeighborSampler
from gala_tpu.train_minibatch import forward_minibatch, train_sage_minibatch

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier


def test_sampler_shapes_and_determinism(small_dataset):
    g, *_ = small_dataset
    s = NeighborSampler(g, fanouts=(5, 3), batch_size=64)
    nodes = np.arange(150)
    e1 = s.epoch(nodes, epoch=2, seed=7)
    e2 = s.epoch(nodes, epoch=2, seed=7)
    nb = -(-150 // 64)
    assert e1.targets.shape == (nb, 64)
    assert e1.n1.shape == (nb, 64, 5)
    assert e1.n2.shape == (nb, 64, 5, 3)
    assert e1.mask.sum() == 150
    np.testing.assert_array_equal(e1.targets, e2.targets)
    np.testing.assert_array_equal(e1.n2, e2.n2)
    # different epoch -> different shuffle/sample
    e3 = s.epoch(nodes, epoch=3, seed=7)
    assert not np.array_equal(e1.targets, e3.targets)


def test_sampled_neighbors_are_real_neighbors(small_dataset):
    g, *_ = small_dataset
    s = NeighborSampler(g, fanouts=(4, 2), batch_size=32)
    eb = s.epoch(np.arange(100), epoch=0, seed=1)
    rp, src = g.row_ptr, g.src
    for t, row in zip(eb.targets[0], eb.n1[0]):
        deg = rp[t + 1] - rp[t]
        nbrs = set(src[rp[t]: rp[t + 1]].tolist()) if deg else {t}
        assert set(row.tolist()) <= nbrs


def test_minibatch_estimator_exact_on_regular_graph():
    """On a d-regular graph with fanout == d and the deterministic
    (ra, rb) = (1, 0) enumeration, the sampled mean IS the exact
    neighbor mean: minibatch logits == full-graph SAGE logits."""
    from gala_tpu.models import sage
    from gala_tpu.ops.graph import Graph

    rng = np.random.default_rng(0)
    n, d = 64, 4
    # circulant 4-regular graph
    src = np.concatenate([(np.arange(n) + o) % n for o in (1, 2, 3, 4)])
    dst = np.tile(np.arange(n), 4)
    g = coo_to_csr(src=src.astype(np.int64), dst=dst.astype(np.int64),
                   vals=None, n_rows=n, n_cols=n)
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    params = sage.init(jax.random.key(0), 8, [16], 3)

    gd = Graph.from_host(g)
    xt = gd.pad_nodes(feats)
    full = np.asarray(sage.forward(params, [gd, gd], xt))[:n]

    s = NeighborSampler(g, fanouts=(d, d), batch_size=n)
    eb = s.epoch(np.arange(n), epoch=0, seed=0, dynamic=False)
    out = np.asarray(forward_minibatch(
        params, xt, jnp.asarray(eb.targets[0]), jnp.asarray(eb.n1[0]),
        jnp.asarray(eb.n2[0]),
    ))
    order = np.asarray(eb.targets[0])
    np.testing.assert_allclose(out, full[order], rtol=1e-4, atol=1e-5)


def test_minibatch_sage_trains_to_accuracy(small_dataset):
    g, feats, labels, masks = small_dataset
    res = train_sage_minibatch(
        g, feats, labels, masks, fanouts=(8, 4), batch_size=64,
        hidden=16, iters=12, valid_step=3,
    )
    assert res.losses[-1] < res.losses[0]
    assert res.max_accuracy > 0.7, res.max_accuracy
