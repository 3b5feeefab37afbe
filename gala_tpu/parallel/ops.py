"""SPMD graph ops — called *inside* shard_map.

Each function sees per-shard local arrays (shard_map has already split
the ShardedGraph pytree along 'data').  Aggregation gathers remote source
features with `all_gather` over ICI and reduces into local destination
rows with a sorted segment sum; differentiating through shard_map turns
the all_gather into a psum_scatter automatically, which is exactly the
edge-partitioned backward.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

AXIS = "data"


def spmd_spmm(src, dst_local, vals, x_shard, rows_per_shard):
    """out_shard = (A @ X) rows owned by this shard.

    x_shard: (r, F) local feature rows; src holds *global* ids.
    """
    x_full = jax.lax.all_gather(x_shard, AXIS, tiled=True)  # (S*r, F) over ICI
    msg = vals[:, None] * x_full[src]
    out = jax.ops.segment_sum(
        msg, dst_local, num_segments=rows_per_shard + 1, indices_are_sorted=False
    )
    return out[:rows_per_shard]


def spmd_spmm_halo(src_halo, dst_local, vals, x_shard, send_idx,
                   rows_per_shard, n_shards, halo):
    """out_shard = (A @ X) rows owned by this shard, exchanging only the
    boundary rows peers reference (all_to_all over ICI) instead of
    all_gathering the full feature matrix.

    send_idx: (S, H) local rows this shard contributes to each peer;
    src_halo indexes the per-shard [local rows | S*H halo rows] table.
    Autodiff reverses the all_to_all and turns the gathers into
    scatter-adds, which is exactly the edge-partitioned backward.
    """
    f = x_shard.shape[1]
    send = x_shard[send_idx.reshape(-1)].reshape(n_shards, halo, f)
    recv = jax.lax.all_to_all(send, AXIS, split_axis=0, concat_axis=0)
    table = jnp.concatenate([x_shard, recv.reshape(n_shards * halo, f)], axis=0)
    msg = vals[:, None] * table[src_halo]
    out = jax.ops.segment_sum(
        msg, dst_local, num_segments=rows_per_shard + 1, indices_are_sorted=False
    )
    return out[:rows_per_shard]


def spmd_spmm_ev(src, dst_local, evals, x_shard, rows_per_shard):
    """SpMM with learned edge values (GAT path), same gather structure."""
    x_full = jax.lax.all_gather(x_shard, AXIS, tiled=True)
    msg = evals[:, None] * x_full[src]
    out = jax.ops.segment_sum(msg, dst_local, num_segments=rows_per_shard + 1)
    return out[:rows_per_shard]


def spmd_sddvv_add(src, dst_local, vl_shard, vr_shard, rows_per_shard):
    """Per-edge vl[src] + vr[dst]; vl gathered globally, vr local."""
    vl_full = jax.lax.all_gather(vl_shard, AXIS, tiled=True)
    vr_pad = jnp.concatenate([vr_shard, jnp.zeros((1, 1), vr_shard.dtype)])
    return vl_full[src, 0] + vr_pad[dst_local, 0]


def spmd_sddvv_mul(src, dst_local, vl_shard, vr_shard, rows_per_shard):
    """Per-edge vl[src] * vr[dst] — the sparsity-rewrite precompute
    (norm_src * norm_dst edge values) under SPMD."""
    vl_full = jax.lax.all_gather(vl_shard, AXIS, tiled=True)
    vr_pad = jnp.concatenate([vr_shard, jnp.zeros((1, 1), vr_shard.dtype)])
    return vl_full[src, 0] * vr_pad[dst_local, 0]


def spmd_edge_softmax(dst_local, logits, vals, rows_per_shard):
    """Softmax over each local destination's incoming edges (edges of one
    destination never cross shards — the point of dst-partitioning)."""
    n_seg = rows_per_shard + 1
    m = jax.ops.segment_max(logits, dst_local, num_segments=n_seg)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    z = jnp.exp(logits - m[dst_local])
    z = jnp.where(vals != 0, z, 0.0)  # mask padded edges
    s = jax.ops.segment_sum(z, dst_local, num_segments=n_seg)
    s = jnp.where(s > 0, s, 1.0)
    return z / s[dst_local]
