"""Pipeline-parallel (GPipe over the 'pipe' mesh axis) tests.

Parity oracle: the pipelined schedule must compute exactly what the
sequential program computes — same microbatch losses, same gradients —
because the schedule only reorders work across devices.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gala_tpu.parallel.pp import (
    gpipe,
    make_pipe_mesh,
    make_sage_pipeline,
    merge_sage_params,
    stack_stage_params,
)

pytestmark = [
    pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices"),
    pytest.mark.slow,  # multi-device compiles: excluded from the fast tier
]


def test_gpipe_matches_sequential():
    """4-stage linear+relu pipeline == sequential application."""
    p, b, w = 4, 8, 16
    n_micro = 6
    rng = np.random.default_rng(0)
    mats = [rng.normal(size=(w, w)).astype(np.float32) * 0.3 for _ in range(p)]
    xs = rng.normal(size=(n_micro, b, w)).astype(np.float32)

    stage_params = stack_stage_params([{"w": jnp.asarray(m)} for m in mats])

    def stage_fn(pl, h, idx):
        return jax.nn.relu(h @ pl["w"])

    mesh = make_pipe_mesh(p)
    out = gpipe(mesh, stage_fn, stage_params, jnp.asarray(xs), w_out=w)
    assert out.shape == (n_micro, b, w)

    ref = xs
    for m in mats:
        ref = np.maximum(ref @ m, 0.0)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def micro_stream(small_dataset):
    from gala_tpu.data.minibatch import NeighborSampler

    g_host, feats, labels, masks = small_dataset
    f1, f2, b = 4, 3, 16
    sampler = NeighborSampler(g_host, (f1, f2), b)
    train_nodes = np.flatnonzero(np.asarray(masks["train"]))
    if train_nodes.size < 2 * b:  # ensure a few microbatches
        train_nodes = np.arange(g_host.n_rows)
    eb = sampler.epoch(train_nodes, 0, seed=0, dynamic=False)
    y = np.asarray(labels, np.int64)[eb.targets].astype(np.int32)
    micro = {
        "t": jnp.asarray(eb.targets),
        "n1": jnp.asarray(eb.n1),
        "n2": jnp.asarray(eb.n2),
        "y": jnp.asarray(y),
        "m": jnp.asarray(eb.mask),
    }
    return g_host, feats, labels, micro, f1


def test_sage_pipeline_grads_match_sequential(micro_stream):
    g_host, feats, labels, micro, f1 = micro_stream
    n_classes = int(labels.max()) + 1
    hidden = 8
    xt = jnp.asarray(feats, jnp.float32)

    mesh = make_pipe_mesh(2)
    stage_params, opt_state, step = make_sage_pipeline(
        mesh, xt, f1=f1, hidden=hidden, n_classes=n_classes, seed=3
    )

    # ---- sequential oracle: same init, same microbatches ------------- #
    from gala_tpu.models import sage
    from gala_tpu.train_minibatch import forward_minibatch

    base = sage.init(jax.random.key(3), feats.shape[1], [hidden], n_classes)

    def seq_loss(p):
        n_micro = micro["t"].shape[0]
        total = 0.0
        for i in range(n_micro):
            logits = forward_minibatch(
                p, xt, micro["t"][i], micro["n1"][i], micro["n2"][i]
            )
            logp = jax.nn.log_softmax(logits.astype(jnp.float32))
            yb = micro["y"][i]
            nll = -jnp.take_along_axis(logp, yb[:, None], 1)[:, 0]
            m = micro["m"][i].astype(jnp.float32)
            total = total + jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)
        return total / n_micro

    ref_loss, ref_grads = jax.value_and_grad(seq_loss)(base)

    # ---- one pipelined step returns the same loss + grads ------------ #
    new_params, _, loss = step(stage_params, opt_state, micro)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)

    # pipelined grads live per-stage; pull them out of the optimizer's
    # effect by differencing is noisy — instead recompute grads directly
    from gala_tpu.parallel import pp as _pp  # reuse internals? no: merge

    # stage-0 slice carries layer-1 grads, stage-1 slice layer-2 grads.
    # Verify through the updated params: direction must match sequential
    # Adam's first step on the oracle grads (sign agreement on the
    # largest-magnitude entries is a robust check).
    merged = merge_sage_params(new_params)
    import optax

    tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(0.01))
    o0 = tx.init(base)
    upd, _ = tx.update(ref_grads, o0, base)
    ref_step = optax.apply_updates(base, upd)

    for li in range(2):
        for part in ("fc", "sfc"):
            got = np.asarray(merged[part][li]["w"])
            want = np.asarray(ref_step[part][li]["w"])
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sage_pipeline_trains(micro_stream):
    """Loss decreases over a few pipelined steps."""
    g_host, feats, labels, micro, f1 = micro_stream
    n_classes = int(labels.max()) + 1
    xt = jnp.asarray(feats, jnp.float32)
    mesh = make_pipe_mesh(2)
    stage_params, opt_state, step = make_sage_pipeline(
        mesh, xt, f1=f1, hidden=8, n_classes=n_classes
    )
    losses = []
    for _ in range(8):
        stage_params, opt_state, loss = step(stage_params, opt_state, micro)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses
