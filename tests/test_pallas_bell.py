"""Interpret-mode correctness of the fused Pallas bell-SpMM
(gala_tpu.ops.pallas.bell_spmm).  Perf selection happens on the real
chip (scripts/bench_pallas_bell.py); these tests pin the semantics.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from gala_tpu.ops.pallas.bell_spmm import BLK, bell_spmm_pallas, plan_chunks

pytestmark = pytest.mark.slow  # compile-heavy: excluded from the fast tier


def _case(n=200, nb=100, k=5, f=128, seed=0):
    rng = np.random.default_rng(seed)
    cols = rng.integers(0, n, nb * k).astype(np.int32)
    vals = rng.normal(size=(nb, k)).astype(np.float32)
    x = rng.normal(size=(n, f)).astype(np.float32)
    ref = np.einsum("vk,vkf->vf", vals, x[cols.reshape(nb, k)])
    return cols, vals, x, ref


def test_plan_chunks_covers_all_slots():
    cols, vals, x, _ = _case()
    blocks, locals_, nb, c, u = plan_chunks(cols, 5, 32)
    assert locals_.shape == (c, 32, 5)
    # every slot's staged row maps back to the original source row
    for ci in range(c):
        for v in range(32):
            gi = ci * 32 + v
            if gi >= nb:
                continue
            for j in range(5):
                st = locals_[ci, v, j]
                src = blocks[ci, st // BLK] * BLK + st % BLK
                assert src == cols[gi * 5 + j]


@pytest.mark.parametrize("use_gather", [True, False])
def test_bell_spmm_pallas_matches_dense(use_gather):
    cols, vals, x, ref = _case()
    out = bell_spmm_pallas(
        jnp.asarray(x), cols, jnp.asarray(vals), k=5, rows_per_chunk=32,
        use_gather=use_gather, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_bell_spmm_pallas_ragged_tail():
    # nb not a multiple of rows_per_chunk; wide k
    cols, vals, x, ref = _case(n=333, nb=77, k=9, seed=3)
    out = bell_spmm_pallas(
        jnp.asarray(x), cols, jnp.asarray(vals), k=9, rows_per_chunk=32,
        use_gather=True, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_sddmm_pallas_matches_dense():
    from gala_tpu.ops.pallas.sddmm import sddmm_pallas

    rng = np.random.default_rng(4)
    n, e, f = 150, 1000, 128
    dst = rng.integers(0, n, e).astype(np.int32)
    src = rng.integers(0, n, e).astype(np.int32)
    a = rng.normal(size=(n, f)).astype(np.float32)
    b = rng.normal(size=(n, f)).astype(np.float32)
    ref = np.sum(a[dst] * b[src], axis=1)
    out = sddmm_pallas(jnp.asarray(a), jnp.asarray(b), dst, src,
                       edges_per_chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)


def test_pallas_bell_strategy_wiring(monkeypatch, small_dataset):
    """strategy='pallas_bell' routes bell aggregation through the fused
    kernel (interpret mode off-TPU) and matches dense, fwd + bwd."""
    import jax

    import gala_tpu.ops.pallas.bell_spmm as pb
    from gala_tpu.data.csr import densify
    from gala_tpu.ops.graph import Graph
    from gala_tpu.ops.spmm import spmm

    # the small test graph is far below the real slot gate
    monkeypatch.setattr(pb, "_MIN_PLAN_SLOTS", 0)
    g_host, *_ = small_dataset
    g = Graph.from_host(g_host, strategy="pallas_bell")
    a = densify(g_host)
    assert g.bell is not None and g.bell.pallas_plans is not None
    assert any(p is not None for p in g.bell.pallas_plans)

    x = np.random.default_rng(0).normal(size=(g.n_nodes, 16)).astype(np.float32)
    xp = g.pad_nodes(x)
    out = np.asarray(spmm(g, xp))
    np.testing.assert_allclose(out[: g.n_nodes], a @ x, rtol=1e-4, atol=1e-4)

    grad = jax.grad(lambda v: jnp.sum(spmm(g, v) ** 2))(xp)
    ref = 2 * a.T @ (a @ x)
    np.testing.assert_allclose(
        np.asarray(grad)[: g.n_nodes], ref, rtol=1e-3, atol=1e-3
    )


def test_pallas_plan_vmem_autoshrink():
    """make_plan halves rows_per_chunk until the staged footprint fits
    the given budget."""
    from gala_tpu.ops.pallas.bell_spmm import make_plan

    rng = np.random.default_rng(7)
    # adversarial: every slot hits a distinct 8-row block
    cols = (np.arange(512 * 4) * BLK % (512 * 4 * BLK)).astype(np.int32)
    rng.shuffle(cols)
    plan = make_plan(cols, k=4, rows_per_chunk=512, max_staged_rows=256)
    assert plan is not None
    assert plan.u * BLK <= 256
    assert plan.r < 512


def test_attn_fwd_pallas_matches_reference():
    """Fused Pallas attention forward == masked leaky-relu softmax +
    weighted reduce (ops/attention._head_softmax semantics), multi-head."""
    from gala_tpu.ops.pallas.attn_bell import attn_fwd_planned
    from gala_tpu.ops.pallas.bell_spmm import make_plan

    rng = np.random.default_rng(11)
    n, nb, k, hf, nh, slope = 300, 90, 7, 32, 4, 0.2
    fh = hf // nh
    cols = rng.integers(0, n, nb * k).astype(np.int32)
    w = (rng.random((nb, k)) > 0.25).astype(np.float32)
    w[:, 0] = 1.0  # every row keeps at least one slot
    x = rng.normal(size=(n, hf)).astype(np.float32)
    vl = rng.normal(size=(n, nh)).astype(np.float32)
    vr = rng.normal(size=(nb, nh)).astype(np.float32)

    # reference math in numpy
    NEG = -1e30
    seg_x = x[cols.reshape(nb, k)]          # (nb, k, hf)
    seg_l = vl[cols.reshape(nb, k)]         # (nb, k, nh)
    ref = np.zeros((nb, hf), np.float32)
    ref_m = np.zeros((nb, nh), np.float32)
    ref_s = np.zeros((nb, nh), np.float32)
    for h in range(nh):
        z = seg_l[..., h] + vr[:, h][:, None]
        z = np.where(z > 0, z, slope * z)
        z = np.where(w != 0, z, NEG)
        m = np.maximum(z.max(axis=1), NEG / 2)
        p = np.where(w != 0, np.exp(z - m[:, None]), 0.0)
        s = p.sum(axis=1)
        s = np.where(s > 0, s, 1.0)
        p = p / s[:, None]
        ref[:, h * fh : (h + 1) * fh] = np.einsum(
            "vk,vkf->vf", p, seg_x[..., h * fh : (h + 1) * fh]
        )
        ref_m[:, h] = m
        ref_s[:, h] = s

    # kernel input: [x | vl] padded to 128 lanes
    f_pad = 128
    xx = np.zeros((n, f_pad), np.float32)
    xx[:, :hf] = x
    xx[:, hf : hf + nh] = vl
    plan = make_plan(cols, k, rows_per_chunk=32)
    xxj = jnp.asarray(xx)
    if plan.n_need > n:
        xxj = jnp.concatenate(
            [xxj, jnp.zeros((plan.n_need - n, f_pad))], axis=0
        )
    out, m, s = attn_fwd_planned(
        plan, xxj, jnp.asarray(w), jnp.asarray(vr), hf, nh, slope,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), ref_m, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(s), ref_s, rtol=1e-4, atol=1e-4)

    # ---- backward pass-1 kernel vs _head_bwd_stats numpy math -------- #
    from gala_tpu.ops.pallas.attn_bell import attn_bwd1_planned

    dout = rng.normal(size=(nb, hf)).astype(np.float32)
    ref_sds = np.zeros((nb, nh), np.float32)
    ref_a = np.zeros((nb, nh), np.float32)
    ref_b = np.zeros((nb, nh), np.float32)
    for h in range(nh):
        zpre = seg_l[..., h] + vr[:, h][:, None]
        z = np.where(zpre > 0, zpre, slope * zpre)
        z = np.where(w != 0, z, NEG)
        p = np.where(w != 0, np.exp(z - ref_m[:, h][:, None]), 0.0)
        p = p / ref_s[:, h][:, None]
        do = dout[:, h * fh : (h + 1) * fh]
        dp = np.einsum("vkf,vf->vk", seg_x[..., h * fh : (h + 1) * fh], do)
        lr = np.where(zpre > 0, 1.0, slope)
        ref_sds[:, h] = np.sum(p * dp, axis=1)
        ref_a[:, h] = np.sum(p * dp * lr, axis=1)
        ref_b[:, h] = np.sum(p * lr, axis=1)
    sds, a, bb = attn_bwd1_planned(
        plan, xxj, jnp.asarray(w), jnp.asarray(vr), jnp.asarray(dout),
        jnp.asarray(ref_m), jnp.asarray(ref_s), hf, nh, slope,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(sds), ref_sds, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(a), ref_a, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(bb), ref_b, rtol=1e-4, atol=1e-4)


def test_attn_bwd2_pallas_matches_reference():
    """Fused Pallas backward pass-2 == _slot_grads numpy math: slots
    gather the destination-side [dout | vr | m | s | sds] table; output
    rows are this source node's [dx | dvl]."""
    from gala_tpu.ops.pallas.attn_bell import attn_bwd2_planned
    from gala_tpu.ops.pallas.bell_spmm import make_plan

    rng = np.random.default_rng(13)
    n, nb, k, hf, nh, slope = 250, 80, 5, 32, 4, 0.2
    fh = hf // nh
    cols = rng.integers(0, n, nb * k).astype(np.int32)
    w = (rng.random((nb, k)) > 0.3).astype(np.float32)
    w[:, 0] = 1.0
    dout = rng.normal(size=(n, hf)).astype(np.float32)
    vr = rng.normal(size=(n, nh)).astype(np.float32)
    m = rng.normal(size=(n, nh)).astype(np.float32)
    s = (rng.random((n, nh)) + 0.5).astype(np.float32)
    sds = rng.normal(size=(n, nh)).astype(np.float32)
    x_rows = rng.normal(size=(nb, hf)).astype(np.float32)
    vl_rows = rng.normal(size=(nb, nh)).astype(np.float32)

    gc = cols.reshape(nb, k)
    ref_dx = np.zeros((nb, hf), np.float32)
    ref_dvl = np.zeros((nb, nh), np.float32)
    NEG = -1e30
    for h in range(nh):
        do = dout[gc][..., h * fh : (h + 1) * fh]
        zpre = vl_rows[:, h][:, None] + vr[gc][..., h]
        z = np.where(zpre > 0, zpre, slope * zpre)
        z = np.where(w != 0, z, NEG)
        p = np.where(w != 0, np.exp(z - m[gc][..., h]) / s[gc][..., h], 0.0)
        dp = np.einsum("vkf,vf->vk", do, x_rows[:, h * fh : (h + 1) * fh])
        ds = p * (dp - sds[gc][..., h])
        dz = ds * np.where(zpre > 0, 1.0, slope)
        ref_dx[:, h * fh : (h + 1) * fh] = np.einsum("vk,vkf->vf", p, do)
        ref_dvl[:, h] = dz.sum(axis=1)

    f_pad = 128
    wtab = np.zeros((n, f_pad), np.float32)
    wtab[:, :hf] = dout
    wtab[:, hf : hf + nh] = vr
    wtab[:, hf + nh : hf + 2 * nh] = m
    wtab[:, hf + 2 * nh : hf + 3 * nh] = s
    wtab[:, hf + 3 * nh : hf + 4 * nh] = sds
    plan = make_plan(cols, k, rows_per_chunk=32)
    wtabj = jnp.asarray(wtab)
    if plan.n_need > n:
        wtabj = jnp.concatenate(
            [wtabj, jnp.zeros((plan.n_need - n, f_pad))], axis=0
        )
    out = attn_bwd2_planned(
        plan, wtabj, jnp.asarray(w), jnp.asarray(x_rows),
        jnp.asarray(vl_rows), hf, nh, slope, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :hf]), ref_dx, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out[:, hf:]), ref_dvl, rtol=1e-4, atol=1e-4
    )
