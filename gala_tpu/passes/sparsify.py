"""Pass 2: sparsity-aware rewrites.

Clean-room equivalent of `GALATransformations::sparsityAwareRewrites`
(reference: src/middle-end/middle-end.h:213-406).  When the schedule marks
the graph `is_sparser`, the symmetric-normalization sandwich

    res = norm * (A @ (norm * X))

is rewritten so the two row-broadcasts fold into precomputed edge values:

    ev  = norm[src] * norm[dst] * A.vals      (SDDVV-mul, loop-invariant)
    res = A_ev @ X                            (SpMM with edge values)

An FFN may sit between the aggregation and the trailing broadcast
(norm * ((A @ X') W) == (norm * (A @ X')) W), which the pattern matcher
tolerates.  The edge-value computation is emitted at the pattern site and
is later hoisted out of the loop by training-invariant code motion.
"""
from __future__ import annotations

from gala_tpu.ir.compute_ir import ComputeNode, ComputeOp, OpType, Program
from gala_tpu.ir.data_ir import DataFormat, DataNode


def _producer_of(loop_nodes, data):
    for n in loop_nodes:
        if data in n.outputs:
            return n
    return None


def sparsity_aware_rewrites(prog: Program) -> Program:
    loop = prog.loop
    if loop is None:
        return prog

    changed = True
    while changed:
        changed = False
        for agg in list(loop.nodes):
            if agg.op is not ComputeOp.AGGREGATE_MUL_SUM or len(agg.inputs) > 2:
                continue
            graph = agg.inputs[1]
            if not graph.sparser:
                continue
            rb1 = _producer_of(loop.nodes, agg.inputs[0])
            if rb1 is None or rb1.op is not ComputeOp.ROW_BROADCAST:
                continue
            # trailing broadcast: directly on the aggregate output, or on
            # an FFN applied to it
            mid = None
            rb2 = None
            for n in loop.nodes:
                if n.op is ComputeOp.ROW_BROADCAST and n.inputs[1] is agg.outputs[0]:
                    rb2 = n
                    break
                if n.op is ComputeOp.FFN and n.inputs[0] is agg.outputs[0]:
                    mid = n
            if rb2 is None and mid is not None:
                for n in loop.nodes:
                    if n.op is ComputeOp.ROW_BROADCAST and n.inputs[1] is mid.outputs[0]:
                        rb2 = n
                        break
            if rb2 is None:
                continue
            norm = rb1.inputs[0]
            if rb2.inputs[0] is not norm:
                continue

            # --- rewrite ------------------------------------------------- #
            ev = DataNode(
                name=f"edge_norm_vals{agg.layer + 1}",
                fmt=DataFormat.CSR,
                directed=graph.directed,
                weighted=True,
                derived=True,
                index=graph.index,
            )
            ev_node = ComputeNode(
                op_type=OpType.AGGREGATE_EDGE,
                op=ComputeOp.AGGREGATE_EDGE_MUL,
                inputs=[norm, norm, graph],
                outputs=[ev],
                layer=agg.layer,
            )
            loop.insert(loop.nodes.index(rb1), ev_node)

            # aggregation consumes rb1's feature input + the edge values
            agg.inputs[0] = rb1.inputs[1]
            agg.inputs.append(ev)
            # remove rb1; splice rb2 out by moving its output onto its
            # producer (FFN or the aggregate), keeping downstream wiring
            tail = mid if (mid is not None and rb2.inputs[1] is mid.outputs[0]) else agg
            tail.outputs[0] = rb2.outputs[0]
            loop.nodes.remove(rb1)
            loop.nodes.remove(rb2)
            changed = True
            break
    return prog
