"""GCN: symmetric-normalized sum aggregation.

Layer body as in the reference DSL (reference:
tests/GALA-DSL/gcn/Reddit/a100.txt):

    norm = deg^-0.5          (invariant, detached)
    res  = norm * x          (row broadcast)
    res  = A @ res           (SpMM)
    res  = res @ W + b       (FFN)
    res  = norm * res
    x    = relu(res)         (skipped on the last layer)

The sparsity-aware rewrite variant (norm_src*norm_dst folded into edge
values once; reference: src/middle-end/middle-end.h:213-406) is applied
at lowering time, not here — this is the un-rewritten hand model used as
the correctness oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gala_tpu.models.common import gcn_norm, layer_sizes, linear, linear_init
from gala_tpu.ops.graph import Graph
from gala_tpu.ops.spmm import spmm


def init(rng: jax.Array, n_feats: int, hidden: list[int], n_classes: int):
    sizes = layer_sizes(n_feats, hidden, n_classes)
    keys = jax.random.split(rng, len(sizes))
    return {"fc": [linear_init(k, i, o) for k, (i, o) in zip(keys, sizes)]}


def forward(params, graphs: list[Graph], x: jax.Array) -> jax.Array:
    n_layers = len(params["fc"])
    for li in range(n_layers):
        g = graphs[li]
        norm = gcn_norm(g)
        res = norm * x
        res = spmm(g, res)
        res = linear(params["fc"][li], res)
        res = norm * res
        x = jax.nn.relu(res) if li < n_layers - 1 else res
    return x
