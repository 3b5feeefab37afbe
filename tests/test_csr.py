"""Unit tests for host-side CSR construction (gala_tpu.data.csr).

The reference has no unit tests (SURVEY.md §4); these cover the CSR
build/transpose/pad invariants its OpenMP code assumes
(reference: src/formats/csrc_matrix.h).
"""
import numpy as np
import pytest

from gala_tpu.data.csr import (
    HostCSR,
    coo_to_csr,
    densify,
    is_symmetric,
    normalize_self_loops,
    pad_edges,
    symmetrize,
    transpose,
)


def test_coo_to_csr_sorted_and_counts():
    src = np.array([2, 0, 1, 0, 2])
    dst = np.array([0, 1, 1, 2, 2])
    g = coo_to_csr(src, dst, None, n_rows=3)
    assert np.all(np.diff(g.dst) >= 0)
    assert g.row_ptr.tolist() == [0, 1, 3, 5]
    assert g.degrees.tolist() == [1, 2, 2]
    assert g.vals.dtype == np.float32 and np.all(g.vals == 1.0)


def test_transpose_roundtrip():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 50, 200)
    dst = rng.integers(0, 50, 200)
    g = coo_to_csr(src, dst, rng.random(200).astype(np.float32), 50)
    gt = transpose(g)
    gtt = transpose(gt)
    assert np.allclose(densify(gtt), densify(g))
    assert np.allclose(densify(gt), densify(g).T)


def test_symmetrize_and_self_loops():
    src = np.array([0, 1, 2, 2])
    dst = np.array([1, 2, 0, 2])
    s, d = symmetrize(src, dst, 3)
    a = np.zeros((3, 3))
    a[d, s] = 1
    assert np.allclose(a, a.T)
    s2, d2 = normalize_self_loops(s, d, 3)
    g = coo_to_csr(s2, d2, None, 3)
    dm = densify(g)
    assert np.all(np.diag(dm) == 1.0)  # exactly one self loop each
    assert is_symmetric(g)


def test_pad_edges_static_shape():
    g = coo_to_csr(np.array([0, 1]), np.array([1, 0]), None, 2)
    gp, e_real = pad_edges(g, multiple=128)
    assert e_real == 2
    assert gp.n_edges == 128
    assert np.all(gp.vals[2:] == 0)
    assert np.all(gp.dst[2:] == 2)  # phantom row


def test_densify_duplicate_edges_accumulate():
    g = coo_to_csr(np.array([0, 0]), np.array([1, 1]), np.array([2.0, 3.0]), 2)
    assert densify(g)[1, 0] == 5.0


def test_dcsr_round_trip():
    from gala_tpu.data.csr import HostCSR, coo_to_csr, from_dcsr, to_dcsr

    rng = np.random.default_rng(3)
    n = 64
    src = rng.integers(0, n, 200).astype(np.int32)
    # leave rows 0..19 empty so compression is non-trivial
    dst = rng.integers(20, n, 200).astype(np.int32)
    g = coo_to_csr(src, dst, rng.random(200).astype(np.float32), n, n)
    d = to_dcsr(g)
    assert d.rows.shape[0] < n
    assert d.n_edges == g.n_edges
    g2 = from_dcsr(d)
    np.testing.assert_array_equal(g2.row_ptr, g.row_ptr)
    np.testing.assert_array_equal(g2.dst, g.dst)
    np.testing.assert_array_equal(g2.src, g.src)
    np.testing.assert_allclose(g2.vals, g.vals)
