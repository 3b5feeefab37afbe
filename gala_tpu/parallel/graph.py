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
    """dst-partitioned edge list, shard-uniform shapes.

    Duck-types enough of `gala_tpu.ops.graph.Graph` that the op layer
    (spmm / sddvv / edge_softmax) dispatches to the SPMD collective path
    when handed one inside `shard_map` — which lets the IR interpreter
    (gala_tpu.lowering.interp) run any DSL-compiled program multi-chip
    unchanged (see gala_tpu.parallel.compiled)."""

    src: jax.Array        # (S*Es,) int32 global source ids
    dst_local: jax.Array  # (S*Es,) int32 dst - shard_row_offset; Es*[r] = phantom
    vals: jax.Array       # (S*Es,) f32, 0 on padding
    occ: jax.Array        # (S*Es,) f32 occupancy: 1.0 per REAL edge, 0 on
                          # padding — the softmax/attention mask (a real
                          # edge whose WEIGHT is 0.0 must stay in the
                          # softmax; see ops/attention.build_attention_bell)
    deg: jax.Array        # (S*r, 1) f32 in-degrees
    # halo-exchange layout (comm-optimal path): instead of all_gathering
    # the full feature matrix, each shard sends only the boundary rows
    # its peers actually reference (all_to_all over ICI).  Each shard's
    # edges are stored [local block | remote block]: edges whose source
    # this shard owns occupy slots [0, El) and never touch the exchange,
    # so XLA's latency-hiding scheduler overlaps the local partition's
    # gather+reduce with the all_to_all (BASELINE.json: halo exchange
    # "overlapped with local neighborhood aggregation").
    src_halo: jax.Array   # (S*Es,) int32; [0,El): local row ids, [El,Es): r + halo slot
    send_idx: jax.Array   # (S*S, H) int32 local rows shard p sends to q

    n_shards: int
    rows_per_shard: int   # r: nodes per shard (padded)
    n_pad: int            # S * r == padded global node count
    n_nodes: int          # real node count
    edges_per_shard: int  # Es = El + Er
    edges_local: int      # El: slots of the local (no-exchange) block
    halo: int             # H: max boundary rows exchanged per shard pair
    use_halo: bool = False  # spmm via halo all_to_all instead of all_gather
    # TP plan as sorted (weight_name, 'col'|'row') items — static aux so
    # interp's FFN lowering sees it at trace time (gala_tpu.parallel.tp)
    tp_plan: tuple = ()

    # op-layer dispatch markers (see ops/spmm.py, ops/edge.py)
    is_spmd = True
    strategy = "spmd"
    attn = None           # fused single-chip attention layout: n/a

    @property
    def local_rows(self) -> int:
        """Node rows each shard owns — the per-shard leading dim of every
        node-sized tensor inside shard_map."""
        return self.rows_per_shard

    def tree_flatten(self):
        return (
            (self.src, self.dst_local, self.vals, self.occ, self.deg,
             self.src_halo, self.send_idx),
            (self.n_shards, self.rows_per_shard, self.n_pad, self.n_nodes,
             self.edges_per_shard, self.edges_local, self.halo, self.use_halo,
             self.tp_plan),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def from_host(cls, g: HostCSR, n_shards: int,
                  use_halo: bool = False) -> "ShardedGraph":
        n = g.n_rows
        r = _round_up(max((n + n_shards - 1) // n_shards, 8), 8)
        n_pad = r * n_shards

        shard_of = g.dst // r
        src_of = g.src // r
        is_local = src_of == shard_of
        per_shard_l = np.bincount(shard_of[is_local], minlength=n_shards)
        per_shard_r = np.bincount(shard_of[~is_local], minlength=n_shards)
        el = _round_up(max(int(per_shard_l.max()), 1), 128)
        er = _round_up(max(int(per_shard_r.max()), 1), 128)
        es = el + er

        src = np.zeros((n_shards, es), np.int32)
        dstl = np.full((n_shards, es), r, np.int32)  # phantom row r
        vals = np.zeros((n_shards, es), np.float32)
        reals = np.zeros((n_shards, es), bool)
        for s in range(n_shards):
            sel_l = (shard_of == s) & is_local
            sel_r = (shard_of == s) & ~is_local
            kl, kr = int(sel_l.sum()), int(sel_r.sum())
            src[s, :kl] = g.src[sel_l]
            dstl[s, :kl] = g.dst[sel_l] - s * r
            vals[s, :kl] = g.vals[sel_l]
            reals[s, :kl] = True
            src[s, el : el + kr] = g.src[sel_r]
            dstl[s, el : el + kr] = g.dst[sel_r] - s * r
            vals[s, el : el + kr] = g.vals[sel_r]
            reals[s, el : el + kr] = True

        deg = np.zeros((n_pad, 1), np.float32)
        deg[:n, 0] = np.bincount(g.dst, minlength=n)

        # ---- halo layout: per (owner q <- sender p) boundary row lists.
        # need[s][q] = sorted unique sources shard s reads from shard q.
        need = []
        for s in range(n_shards):
            srcs = src[s][reals[s]]
            owner = srcs // r
            need.append([
                np.unique(srcs[owner == q]) if q != s else np.zeros(0, np.int64)
                for q in range(n_shards)
            ])
        h = max(
            (len(need[s][q]) for s in range(n_shards) for q in range(n_shards)),
            default=1,
        )
        h = _round_up(max(h, 1), 8)
        send_idx = np.zeros((n_shards, n_shards, h), np.int32)
        for p in range(n_shards):
            for q in range(n_shards):
                rows = need[q][p] - p * r       # p-local ids q needs
                send_idx[p, q, : len(rows)] = rows
        # remap sources into the per-shard [local | halo] table:
        # owned u -> u - s*r ; remote u (owner q) -> r + q*h + pos(need[s][q], u)
        src_halo = np.full((n_shards, es), r, np.int32)  # phantom -> a local pad row
        for s in range(n_shards):
            srcs = src[s][reals[s]].astype(np.int64)
            owner = srcs // r
            local = srcs - s * r
            for q in range(n_shards):
                sel = owner == q
                if q == s or not sel.any():
                    continue
                local[sel] = r + q * h + np.searchsorted(need[s][q], srcs[sel])
            dest = np.full(es, r, np.int64)
            dest[np.nonzero(reals[s])[0]] = local
            src_halo[s] = dest.astype(np.int32)

        return cls(
            src=jnp.asarray(src.reshape(-1)),
            dst_local=jnp.asarray(dstl.reshape(-1)),
            vals=jnp.asarray(vals.reshape(-1)),
            occ=jnp.asarray(reals.reshape(-1).astype(np.float32)),
            deg=jnp.asarray(deg),
            src_halo=jnp.asarray(src_halo.reshape(-1)),
            send_idx=jnp.asarray(send_idx.reshape(n_shards * n_shards, h)),
            n_shards=n_shards,
            rows_per_shard=r,
            n_pad=n_pad,
            n_nodes=n,
            edges_per_shard=es,
            edges_local=el,
            halo=h,
            use_halo=use_halo,
        )

    def pad_nodes(self, x: np.ndarray) -> jnp.ndarray:
        x = np.asarray(x)
        pad = self.n_pad - x.shape[0]
        if pad > 0:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        return jnp.asarray(x)
