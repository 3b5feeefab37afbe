"""Kernel tests: SDDVV / SDDMM / edge softmax vs NumPy reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gala_tpu.ops.edge import edge_softmax, leaky_relu, sddmm, sddvv_add, sddvv_mul
from gala_tpu.ops.graph import Graph


@pytest.fixture(scope="module")
def g(small_dataset):
    g_host, *_ = small_dataset
    return Graph.from_host(g_host, strategy="segment")


def test_sddvv(g):
    rng = np.random.default_rng(0)
    vl = rng.normal(size=(g.n_pad, 1)).astype(np.float32)
    vr = rng.normal(size=(g.n_pad, 1)).astype(np.float32)
    src, dst = np.asarray(g.src), np.asarray(g.dst)
    np.testing.assert_allclose(
        np.asarray(sddvv_add(g, jnp.asarray(vl), jnp.asarray(vr))),
        vl[src, 0] + vr[dst, 0],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(sddvv_mul(g, jnp.asarray(vl), jnp.asarray(vr))),
        vl[src, 0] * vr[dst, 0],
        rtol=1e-6,
    )


def test_sddmm(g):
    rng = np.random.default_rng(1)
    a = rng.normal(size=(g.n_pad, 8)).astype(np.float32)
    b = rng.normal(size=(g.n_pad, 8)).astype(np.float32)
    src, dst = np.asarray(g.src), np.asarray(g.dst)
    np.testing.assert_allclose(
        np.asarray(sddmm(g, jnp.asarray(a), jnp.asarray(b))),
        np.sum(a[src] * b[dst], axis=-1),
        rtol=1e-5, atol=1e-5,
    )


def test_sddmm_chunked_matches(g, monkeypatch):
    """Forcing the memory-bounded scan (tiny gathered-buffer budget)
    must match the one-shot sddmm, forward and gradients."""
    import gala_tpu.ops.spmm as S

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.normal(size=(g.n_pad, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(g.n_pad, 8)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(g.e_pad,)).astype(np.float32))

    def loss(a, b):
        return jnp.sum(sddmm(g, a, b) * co)

    ref = np.asarray(sddmm(g, a, b))
    ref_ga, ref_gb = jax.grad(loss, argnums=(0, 1))(a, b)
    monkeypatch.setattr(S, "_BELL_CHUNK_ELEMS", 1 << 12)
    got = np.asarray(sddmm(g, a, b))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    got_ga, got_gb = jax.grad(loss, argnums=(0, 1))(a, b)
    np.testing.assert_allclose(np.asarray(got_ga), np.asarray(ref_ga),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_gb), np.asarray(ref_gb),
                               rtol=1e-4, atol=1e-4)


def test_edge_softmax_normalizes(g):
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(g.e_pad,)).astype(np.float32))
    p = np.asarray(edge_softmax(g, logits))
    sums = np.zeros(g.n_pad)
    np.add.at(sums, np.asarray(g.dst), p)
    deg = np.asarray(g.deg)[:, 0]
    real = deg[: g.n_nodes] > 0
    np.testing.assert_allclose(sums[: g.n_nodes][real], 1.0, rtol=1e-5)
    assert np.all(p >= 0)


def test_edge_softmax_grad_matches_autodiff(g):
    """custom_vjp backward == jax autodiff of the raw segment softmax."""
    from gala_tpu.ops.edge import _segment_softmax

    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(g.e_pad,)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(g.e_pad,)).astype(np.float32))

    g1 = jax.grad(lambda l: jnp.sum(w * edge_softmax(g, l)))(logits)
    g2 = jax.grad(lambda l: jnp.sum(w * _segment_softmax(l, g.dst, g.n_pad)))(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


def test_leaky_relu():
    x = jnp.asarray([-2.0, 0.0, 3.0])
    np.testing.assert_allclose(np.asarray(leaky_relu(x, 0.1)), [-0.2, 0.0, 3.0])
