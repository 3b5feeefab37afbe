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


def init(
    rng: jax.Array,
    n_feats: int,
    hidden: list[int],
    n_classes: int,
    n_heads: int = 1,
):
    """n_heads > 1: per-layer weights become (d_in, H*d_out); hidden
    layers concatenate heads (so the next layer sees H*d_out), the final
    layer averages them (standard GAT; the reference's DSL GAT is the
    H=1 special case)."""
    dims = [n_feats, *[h * n_heads for h in hidden], n_classes]
    sizes = list(zip(dims[:-1], dims[1:]))
    keys = jax.random.split(rng, 3 * len(sizes)).reshape(len(sizes), 3)
    heads = [n_heads] * (len(sizes) - 1) + [n_heads]
    per_head = [*hidden, n_classes]
    return {
        "fc": [
            linear_init(k[0], i, h * o)
            for k, (i, _), h, o in zip(keys, sizes, heads, per_head)
        ],
        "attn_l": [
            linear_init(k[1], o, 1) for k, h, o in zip(keys, heads, per_head)
        ],
        "attn_r": [
            linear_init(k[2], o, 1) for k, h, o in zip(keys, heads, per_head)
        ],
    }


def forward(
    params,
    graphs: list[Graph],
    x: jax.Array,
    negative_slope: float = 0.2,
    n_heads: int = 1,
):
    # negative_slope 0.2 matches the reference's hardcoded leaky-relu param
    # (reference: src/frontend/frontend.y addLeakyReLU `addParam("0.2")`).
    n_layers = len(params["fc"])
    for li in range(n_layers):
        g = graphs[li]
        res = linear(params["fc"][li], x)          # (N, H*Fh)
        h_outs = []
        fh = res.shape[1] // n_heads
        for h in range(n_heads):
            rh = res[:, h * fh : (h + 1) * fh]
            attn_l = linear(params["attn_l"][li], rh)
            attn_r = linear(params["attn_r"][li], rh)
            if g.attn is not None:
                # fused slot-space attention (gala_tpu.ops.attention):
                # one gather per head instead of the edge-centric chain
                from gala_tpu.ops.attention import attention_aggregate

                h_outs.append(
                    attention_aggregate(
                        g.n_pad, g.c_pad, negative_slope, g.attn,
                        rh, attn_l, attn_r,
                    )
                )
                continue
            attn = sddvv_add(g, attn_l, attn_r)
            attn = leaky_relu(attn, negative_slope)
            vals = edge_softmax(g, attn)
            h_outs.append(spmm_ev(g, vals, rh))
        if n_heads == 1:
            res = h_outs[0]
        elif li < n_layers - 1:
            res = jnp.concatenate(h_outs, axis=1)   # concat hidden heads
        else:
            res = sum(h_outs) / n_heads             # average final heads
        x = jax.nn.relu(res) if li < n_layers - 1 else res
    return x
