"""GraphSAGE: mean aggregation with dual (neighbor + self) FFNs.

Layer body as in the reference DSL (reference:
tests/GALA-DSL/sage/Reddit/a100.txt; `dsl.fn.mul_mean` expands to the op
sequence [GET_DEGREES, GET_NORMALIZATION(pow -1), AGGREGATE,
MULT_NORM_RES, ADD_TWO_FFN] — reference: src/frontend/frontend.y SAGE_OPS
handling):

    norm  = deg^-1                     (invariant, detached)
    res_n = A @ x                      (SpMM)
    res_n = norm * res_n               (mean)
    res   = res_n @ W + b  +  x @ Ws + bs   (ADD_TWO_FFN: fc + sfc)
    x     = relu(res)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gala_tpu.models.common import gcn_norm, layer_sizes, linear, linear_init
from gala_tpu.ops.graph import Graph
from gala_tpu.ops.spmm import spmm


def init(rng: jax.Array, n_feats: int, hidden: list[int], n_classes: int):
    sizes = layer_sizes(n_feats, hidden, n_classes)
    keys = jax.random.split(rng, 2 * len(sizes)).reshape(len(sizes), 2)
    return {
        "fc": [linear_init(k[0], i, o) for k, (i, o) in zip(keys, sizes)],
        "sfc": [linear_init(k[1], i, o) for k, (i, o) in zip(keys, sizes)],
    }


def forward(params, graphs: list[Graph], x: jax.Array) -> jax.Array:
    n_layers = len(params["fc"])
    for li in range(n_layers):
        g = graphs[li]
        norm = gcn_norm(g, power=-1.0)
        res_n = spmm(g, x)
        res_n = norm * res_n
        res = linear(params["fc"][li], res_n) + linear(params["sfc"][li], x)
        x = jax.nn.relu(res) if li < n_layers - 1 else res
    return x
