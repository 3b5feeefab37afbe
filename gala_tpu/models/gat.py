"""GAT: single-head additive attention with edge softmax.

Layer body as in the reference DSL (reference:
tests/GALA-DSL/gat/Reddit/a100.txt):

    res   = x @ W + b              (FFN)
    attnL = res @ aL  (out=1)      (FFN_OP_EDGE)
    attnR = res @ aR  (out=1)
    attn  = attnL[src] + attnR[dst]        (SDDVV, edge_fn = sum)
    attn  = leaky_relu(attn)               (optional, per DSL)
    vals  = edge_softmax(attn)             (per-destination segments)
    res   = SpMM_with_edge_values(vals, res)
    x     = relu(res)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gala_tpu.models.common import layer_sizes, linear, linear_init
from gala_tpu.ops.edge import edge_softmax, leaky_relu, sddvv_add
from gala_tpu.ops.graph import Graph
from gala_tpu.ops.spmm import spmm_ev


def init(rng: jax.Array, n_feats: int, hidden: list[int], n_classes: int):
    sizes = layer_sizes(n_feats, hidden, n_classes)
    keys = jax.random.split(rng, 3 * len(sizes)).reshape(len(sizes), 3)
    return {
        "fc": [linear_init(k[0], i, o) for k, (i, o) in zip(keys, sizes)],
        "attn_l": [linear_init(k[1], o, 1) for k, (_, o) in zip(keys, sizes)],
        "attn_r": [linear_init(k[2], o, 1) for k, (_, o) in zip(keys, sizes)],
    }


def forward(params, graphs: list[Graph], x: jax.Array, negative_slope: float = 0.2):
    # negative_slope 0.2 matches the reference's hardcoded leaky-relu param
    # (reference: src/frontend/frontend.y addLeakyReLU `addParam("0.2")`).
    n_layers = len(params["fc"])
    for li in range(n_layers):
        g = graphs[li]
        res = linear(params["fc"][li], x)
        attn_l = linear(params["attn_l"][li], res)
        attn_r = linear(params["attn_r"][li], res)
        attn = sddvv_add(g, attn_l, attn_r)
        attn = leaky_relu(attn, negative_slope)
        vals = edge_softmax(g, attn)
        res = spmm_ev(g, vals, res)
        x = jax.nn.relu(res) if li < n_layers - 1 else res
    return x
