"""Row-selected training loss (interp.forward_rows): the loss computed
on the train-row subset must equal the full-logits masked loss exactly,
for every model family; training behavior is unchanged."""
import importlib.util
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gala_tpu
from gala_tpu.train import masked_cross_entropy

_SPEC = importlib.util.spec_from_file_location(
    "evaluate", os.path.join(os.path.dirname(__file__), "..", "scripts", "evaluate.py")
)
_ev = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(_ev)


@pytest.mark.parametrize("model", [
    "gcn",
    pytest.param("gat", marks=pytest.mark.slow),
    "gin",
    "sage",
])
def test_selected_loss_equals_full(model):
    src = _ev.make_dsl(model, "RowSelT", hidden=12)
    cm = gala_tpu.compile_source(src, mode="train", scale=0.03)
    params = cm.make_params(0)
    carry = jax.jit(cm.invariant)(cm.full_graphs, cm.x)

    idx = np.flatnonzero(np.asarray(cm.train_mask))
    pad = (-idx.size) % 8
    idx = np.concatenate([idx, np.full(pad, cm.train_mask.shape[0] - 1, idx.dtype)])
    rows = jnp.asarray(idx.astype(np.int32))

    full = cm.forward(params, cm.full_graphs, carry)
    l_full = masked_cross_entropy(full, cm.labels, cm.train_mask)
    sel = cm.forward_rows(params, cm.full_graphs, carry, rows)
    l_sel = masked_cross_entropy(sel, cm.labels[rows], cm.train_mask[rows])
    np.testing.assert_allclose(float(l_sel), float(l_full), rtol=1e-5)
    # the selected logits are exactly the full logits' rows
    np.testing.assert_allclose(
        np.asarray(sel), np.asarray(full)[idx], rtol=1e-5, atol=1e-6
    )


def test_training_converges_with_selection():
    src = _ev.make_dsl("gcn", "RowSelT2", hidden=12)
    cm = gala_tpu.compile_source(src, mode="train", scale=0.05)
    r_sel = cm.train(iters=25)
    r_full = cm.train(iters=25, select_rows=False)
    assert r_sel.max_accuracy > 0.8
    # same optimization trajectory: losses match closely
    np.testing.assert_allclose(
        np.asarray(r_sel.losses), np.asarray(r_full.losses), rtol=1e-3, atol=1e-4
    )


def test_validation_accuracy_row_selected_matches_full():
    """Validation accuracy computed on the test-row subset (the (N, C)
    logits shrink to the mask fraction) equals full-graph accuracy."""
    src = _ev.make_dsl("gcn", "RowSelT3", hidden=12)
    cm = gala_tpu.compile_source(src, mode="train", scale=0.05)
    r_sel = cm.train(iters=25)
    r_full = cm.train(iters=25, select_rows=False)
    np.testing.assert_allclose(r_sel.max_accuracy, r_full.max_accuracy,
                               rtol=1e-5, atol=1e-6)
