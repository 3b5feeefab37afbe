"""Shared model plumbing: parameter init, FFN, normalization helpers.

The reference's generated model is a `torch::nn::Module` with per-layer
`fc` Linears plus model-specific extras (`efc` attention heads, `sfc`
self Linears, `eps` scalars — reference: src/codegen/common.h:1185-1310).
Here models are pure functions over a params pytree; parameter shapes and
initialization mirror torch's `nn::Linear` defaults (U(-1/sqrt(fan_in),
1/sqrt(fan_in)) for weight and bias) so training trajectories are
statistically comparable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from gala_tpu.ops.graph import Graph
from gala_tpu.ops.spmm import spmm_direct

MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def linear_init(rng: jax.Array, d_in: int, d_out: int):
    """torch nn::Linear default init (kaiming-uniform bound 1/sqrt(fan_in))."""
    kw, kb = jax.random.split(rng)
    bound = 1.0 / jnp.sqrt(jnp.maximum(d_in, 1))
    w = jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound)
    b = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return {"w": w, "b": b}


def linear(p, x):
    # params stay f32 masters; compute follows the activation dtype
    # (bf16 mixed precision casts here, grads flow back to f32 via the
    # astype transpose)
    w = p["w"].astype(x.dtype)
    b = p["b"].astype(x.dtype)
    return (
        jnp.dot(x, w, preferred_element_type=x.dtype, precision=MATMUL_PRECISION)
        + b
    )


def gcn_norm(g: Graph, power: float = -0.5) -> jax.Array:
    """norm = deg^power, detached — the reference's degrees + pow pipeline
    (DEGREES via direct SpMM of ones then POWER_OP with .detach(),
    reference: src/codegen/common.h:900-914).  Zero-degree (padding) rows
    get norm 0 so they stay inert."""
    deg = g.deg
    safe = jnp.where(deg > 0, deg, 1.0)
    norm = jnp.where(deg > 0, jnp.power(safe, power), 0.0)
    return jax.lax.stop_gradient(norm)


def layer_sizes(n_feats: int, hidden: list[int], n_classes: int) -> list[tuple[int, int]]:
    """Per-layer (d_in, d_out) from feature size, hidden dims, label size."""
    dims = [n_feats, *hidden, n_classes]
    return list(zip(dims[:-1], dims[1:]))
