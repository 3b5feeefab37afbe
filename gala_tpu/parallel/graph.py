"""Edge-partitioned graph layout for SPMD execution.

The distribution strategy (SURVEY.md §2.4): nodes are range-partitioned
over the 'data' mesh axis; each device owns the edges whose *destination*
falls in its node range (so the aggregation reduction is entirely local)
plus the features of its own nodes.  Source features from other shards
arrive via an all_gather over ICI inside shard_map — the cross-chip
analog of the reference's ordered column tiling of the contraction
dimension (reference: src/ops/tiling.h:222-284).

Layout: flat arrays whose leading dimension is divisible by the number of
shards; under shard_map with PartitionSpec('data') each device sees its
contiguous chunk.  Per-shard edge counts are padded to the global max so
shapes are identical on every device (SPMD requirement); padded edges
target the per-shard phantom row.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gala_tpu.data.csr import HostCSR


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class ShardedGraph:
    """dst-partitioned edge list, shard-uniform shapes."""

    src: jax.Array        # (S*Es,) int32 global source ids
    dst_local: jax.Array  # (S*Es,) int32 dst - shard_row_offset; Es*[r] = phantom
    vals: jax.Array       # (S*Es,) f32, 0 on padding
    deg: jax.Array        # (S*r, 1) f32 in-degrees

    n_shards: int
    rows_per_shard: int   # r: nodes per shard (padded)
    n_pad: int            # S * r == padded global node count
    n_nodes: int          # real node count
    edges_per_shard: int  # Es

    def tree_flatten(self):
        return (
            (self.src, self.dst_local, self.vals, self.deg),
            (self.n_shards, self.rows_per_shard, self.n_pad, self.n_nodes,
             self.edges_per_shard),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_host(cls, g: HostCSR, n_shards: int) -> "ShardedGraph":
        n = g.n_rows
        r = _round_up(max((n + n_shards - 1) // n_shards, 8), 8)
        n_pad = r * n_shards

        shard_of = g.dst // r
        per_shard = np.bincount(shard_of, minlength=n_shards)
        es = _round_up(max(int(per_shard.max()), 1), 128)

        src = np.zeros((n_shards, es), np.int32)
        dstl = np.full((n_shards, es), r, np.int32)  # phantom row r
        vals = np.zeros((n_shards, es), np.float32)
        for s in range(n_shards):
            sel = shard_of == s
            k = int(sel.sum())
            src[s, :k] = g.src[sel]
            dstl[s, :k] = g.dst[sel] - s * r
            vals[s, :k] = g.vals[sel]

        deg = np.zeros((n_pad, 1), np.float32)
        deg[:n, 0] = np.bincount(g.dst, minlength=n)

        return cls(
            src=jnp.asarray(src.reshape(-1)),
            dst_local=jnp.asarray(dstl.reshape(-1)),
            vals=jnp.asarray(vals.reshape(-1)),
            deg=jnp.asarray(deg),
            n_shards=n_shards,
            rows_per_shard=r,
            n_pad=n_pad,
            n_nodes=n,
            edges_per_shard=es,
        )

    def pad_nodes(self, x: np.ndarray) -> jnp.ndarray:
        x = np.asarray(x)
        pad = self.n_pad - x.shape[0]
        if pad > 0:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        return jnp.asarray(x)
