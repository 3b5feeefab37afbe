"""GIN: sum aggregation with learned epsilon self-weighting.

Layer body as in the reference DSL (reference:
tests/GALA-DSL/gin/Reddit/a100.txt):

    res_n = A @ x                      (SpMM)
    res   = (1 + eps) * x              (SCALAR_ADD_EPS_MULTIPLY_OP;
                                        eps is a learned scalar, init 0 —
                                        reference: src/codegen/common.h eps
                                        registered as a model parameter)
    res   = res + res_n                (ADD_OP)
    res   = res @ W + b                (FFN)
    x     = relu(res)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gala_tpu.models.common import layer_sizes, linear, linear_init
from gala_tpu.ops.graph import Graph
from gala_tpu.ops.spmm import spmm


def init(rng: jax.Array, n_feats: int, hidden: list[int], n_classes: int):
    sizes = layer_sizes(n_feats, hidden, n_classes)
    keys = jax.random.split(rng, len(sizes))
    return {
        "fc": [linear_init(k, i, o) for k, (i, o) in zip(keys, sizes)],
        "eps": [jnp.zeros((), jnp.float32) for _ in sizes],
    }


def forward(params, graphs: list[Graph], x: jax.Array) -> jax.Array:
    n_layers = len(params["fc"])
    for li in range(n_layers):
        g = graphs[li]
        res_n = spmm(g, x)
        res = (1.0 + params["eps"][li]) * x
        res = res + res_n
        res = linear(params["fc"][li], res)
        x = jax.nn.relu(res) if li < n_layers - 1 else res
    return x
