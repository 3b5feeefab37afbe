"""Golden-IR tests for the four middle-end passes (SURVEY.md §4: the
reference verifies these only via end-to-end ablation DSLs; here each pass
has direct IR-shape assertions plus numeric equivalence via lowering)."""
import numpy as np
import pytest

from gala_tpu.dsl.parser import parse_file, parse_source
from gala_tpu.dsl.spec import ModelSpec
from gala_tpu.ir.build import generate_ir
from gala_tpu.ir.compute_ir import ComputeOp
from gala_tpu.passes.code_motion import training_invariant_code_motion
from gala_tpu.passes.reorder import operator_reordering
from gala_tpu.passes.sparsify import sparsity_aware_rewrites
from gala_tpu.passes.subgraph import training_subgraph
from tests.test_parser import GCN_SRC


def _gcn_spec(sparser=False) -> ModelSpec:
    spec = parse_source(GCN_SRC)
    spec.graph.feat_size = 24
    spec.graph.label_size = 5
    spec.output_sizes = [16, 5]
    spec.col_tile = 0
    spec.graph.sparser = sparser
    return spec


def _ops(nodes):
    return [n.op for n in nodes]


def test_reorder_moves_shrinking_ffn_before_aggregate():
    prog = generate_ir(_gcn_spec())
    prog = operator_reordering(prog)
    ops = _ops(prog.loop.nodes)
    # layer-1 FFN (24->16) must now precede the layer-1 aggregation
    i_ffn = ops.index(ComputeOp.FFN)
    i_agg = ops.index(ComputeOp.AGGREGATE_MUL_SUM)
    assert i_ffn < i_agg
    # wiring stays acyclic: no node consumes its own output
    for n in prog.loop.nodes:
        assert all(d is not n.outputs[0] for d in n.inputs)


def test_reorder_tim_mode_keeps_ffn_late():
    prog = generate_ir(_gcn_spec())
    prog = operator_reordering(prog, enable_tim=True)
    ops = _ops(prog.loop.nodes)
    assert ops.index(ComputeOp.AGGREGATE_MUL_SUM) < ops.index(ComputeOp.FFN)


def test_sparsity_rewrite_folds_norm_sandwich():
    prog = generate_ir(_gcn_spec(sparser=True))
    prog = sparsity_aware_rewrites(prog)
    ops = _ops(prog.loop.nodes)
    assert ComputeOp.AGGREGATE_EDGE_MUL in ops
    assert ComputeOp.ROW_BROADCAST not in ops  # both sandwiches folded
    # aggregations now carry edge values
    aggs = [n for n in prog.loop.nodes if n.op is ComputeOp.AGGREGATE_MUL_SUM]
    assert all(len(a.inputs) == 3 for a in aggs)


def test_code_motion_hoists_invariant_ops():
    prog = generate_ir(_gcn_spec(sparser=True))
    prog = operator_reordering(prog, enable_tim=True)
    prog = sparsity_aware_rewrites(prog)
    prog = training_invariant_code_motion(prog)
    pre_ops = _ops(prog.pre)
    loop_ops = _ops(prog.loop.nodes)
    # first-layer aggregation hoisted; no learned op hoisted
    assert ComputeOp.AGGREGATE_MUL_SUM in pre_ops
    assert ComputeOp.FFN not in pre_ops
    # beyond-prefix hoisting: every edge-value precompute left the loop
    assert ComputeOp.AGGREGATE_EDGE_MUL not in loop_ops


def test_training_subgraph_creates_transforms():
    prog = generate_ir(_gcn_spec())
    prog = training_subgraph(prog)
    assert prog.uses_training_subgraphs
    from gala_tpu.ir.data_ir import DataOpt

    subs = [t for t in prog.transforms if t.transforms[0].kind is DataOpt.SUBGRAPH]
    assert len(subs) == 2  # one per layer


def test_passes_preserve_numerics(small_dataset):
    """With zero biases the optimized program computes the *same function*
    as the naive one.  (With biases, moving an FFN across an aggregation
    changes A@(XW+b) into (A@X)W+b — an approximation the reference's
    reordering makes too, since its generated torch Linears carry biases;
    the model family and accuracy are preserved, the function is not.)"""
    import jax

    from gala_tpu.lowering.lower import lower

    outs = {}
    for label, flags in [
        ("none", dict(operator_reordering=False, sparse_rewrites=False,
                      training_subgraph=False, train_code_motion=False)),
        ("all", dict()),
    ]:
        spec = _gcn_spec(sparser=True)
        for k, v in flags.items():
            setattr(spec.passes, k, v)
        cm = lower(spec, mode="train", data=small_dataset)
        params = cm.make_params(seed=0)
        params = jax.tree.map(lambda p: p, params)
        for name in params:
            params[name]["b"] = params[name]["b"] * 0.0
        graphs = cm.full_graphs
        carry = cm.invariant(graphs, cm.x) if cm.invariant else cm.x
        outs[label] = np.asarray(cm.forward(params, graphs, carry))
    np.testing.assert_allclose(outs["none"], outs["all"], rtol=1e-3, atol=1e-4)


def test_passes_preserve_accuracy(small_dataset):
    """With biases the optimized program is a different (equally good)
    parameterization: trained accuracy must match the naive build."""
    from gala_tpu.lowering.lower import lower

    accs = {}
    for label, flags in [
        ("none", dict(operator_reordering=False, sparse_rewrites=False,
                      training_subgraph=False, train_code_motion=False)),
        ("all", dict()),
    ]:
        spec = _gcn_spec(sparser=True)
        for k, v in flags.items():
            setattr(spec.passes, k, v)
        cm = lower(spec, mode="train", data=small_dataset)
        accs[label] = cm.train(iters=40, warmup=2).max_accuracy
    assert accs["all"] >= accs["none"] - 0.05
