"""Device-side graph container for TPU aggregation kernels.

Replaces the reference's per-layer `global_{offset,columns,value}_graph`
device arrays (reference: src/codegen/cuda.h:1053-1331): the forward graph
lives at index 2*layer and its transpose (backward graph) at 2*layer+1,
aliased when the graph is undirected.  Here a single `Graph` pytree holds
both orientations plus the dense form when the MXU strategy is selected.

Layout decisions (TPU-first):
- Edges are *destination-sorted* with CSR-style row offsets, padded to a
  multiple of 128 phantom edges targeting phantom row `n_nodes`, so every
  kernel sees static shapes (XLA requirement).
- Node dimension is padded to a multiple of 8 (f32 sublane) including one
  phantom row that absorbs padded-edge contributions.
- `strategy` selects the execution path for aggregation:
    'dense'        adjacency densified once; SpMM = MXU matmul.  The
                   fastest path for small/medium graphs: 2*N^2*F FLOPs at
                   MXU speed beat scatter-bound sparse code on TPU.
    'segment'      gather + sorted segment_sum (one shot).  O(E*F) bytes
                   of intermediate; for small E*F.
    'segment_scan' lax.scan over edge chunks with an (N,F) accumulator;
                   bounded memory for large graphs (the analog of the
                   reference's ordered column tiling, reference:
                   src/ops/tiling.h:222-284).
    'auto'         density/size heuristic, the input-aware compilation
                   analog (reference: tests/gala_inference.cpp:84-131).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gala_tpu.data.csr import HostCSR, transpose as host_transpose, is_symmetric, densify

EDGE_PAD = 128
NODE_PAD = 8

# Above this many scalar elements the one-shot (E,F) gather intermediate is
# scanned in chunks instead (keeps peak memory ~CHUNK*F).
_SEGMENT_ONESHOT_LIMIT = 1 << 27  # 128M elements ~ 512MB f32
_DENSE_MAX_NODES = 16384  # N_pad^2 f32 <= 1GB; MXU wins below this size


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Graph:
    """Static-shape, dst-sorted edge list on device (+ transpose, + dense)."""

    # --- pytree children (device arrays) ---
    src: jax.Array          # (E_pad,) int32 source node per edge
    dst: jax.Array          # (E_pad,) int32 destination node, ascending
    vals: jax.Array         # (E_pad,) f32 structural edge values (0 on pad)
    t_src: jax.Array        # transpose graph: (E_pad,) int32
    t_dst: jax.Array        # (E_pad,) int32, ascending
    t_vals: jax.Array       # (E_pad,) f32
    t_perm: jax.Array       # (E_pad,) int32: forward edge id of transpose edge i
    a_dense: jax.Array | None   # (N_pad, C_pad) f32, only for 'dense'
    deg: jax.Array          # (N_pad, 1) f32 in-degrees (0 on padding)

    # --- static aux ---
    n_nodes: int            # real node count
    n_cols: int             # real source-side node count (== n_nodes here)
    n_pad: int              # padded node count (>= n_nodes+1)
    c_pad: int              # padded source-side count
    n_edges: int            # real edge count
    e_pad: int              # padded edge count
    undirected: bool
    strategy: str

    # ------------------------------------------------------------------ #
    def tree_flatten(self):
        children = (
            self.src, self.dst, self.vals,
            self.t_src, self.t_dst, self.t_vals, self.t_perm,
            self.a_dense, self.deg,
        )
        aux = (
            self.n_nodes, self.n_cols, self.n_pad, self.c_pad,
            self.n_edges, self.e_pad, self.undirected, self.strategy,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # ------------------------------------------------------------------ #
    @classmethod
    def from_host(
        cls,
        g: HostCSR,
        strategy: str = "auto",
        undirected: bool | None = None,
    ) -> "Graph":
        if undirected is None:
            undirected = is_symmetric(g)

        n = g.n_rows
        c = g.n_cols
        n_pad = _round_up(n + 1, NODE_PAD)
        c_pad = _round_up(c + 1, NODE_PAD)
        e_real = g.n_edges
        e_pad = _round_up(max(e_real, 1), EDGE_PAD)

        if strategy == "auto":
            strategy = choose_strategy(n_pad, c_pad, e_real)

        def pad_edges(dstv, srcv, valsv, phantom_dst, phantom_src):
            pad = e_pad - dstv.shape[0]
            dstv = np.concatenate([dstv, np.full(pad, phantom_dst, np.int64)]).astype(np.int32)
            srcv = np.concatenate([srcv, np.full(pad, phantom_src, np.int64)]).astype(np.int32)
            valsv = np.concatenate([valsv, np.zeros(pad, np.float32)])
            return dstv, srcv, valsv

        dst, src, vals = pad_edges(g.dst, g.src, g.vals, n, 0)

        # transpose graph (backward pass); perm maps transpose edge -> fwd edge
        gt = host_transpose(g)
        order = np.lexsort((g.dst.astype(np.int64), g.src.astype(np.int64)))
        t_dst, t_src, t_vals = pad_edges(g.src[order], g.dst[order], g.vals[order], c, 0)
        t_perm = np.concatenate(
            [order, np.full(e_pad - e_real, e_pad - 1, np.int64)]
        ).astype(np.int32)
        del gt

        deg_np = np.zeros((n_pad, 1), np.float32)
        deg_np[: n, 0] = np.bincount(g.dst, weights=None, minlength=n).astype(np.float32)

        a_dense = None
        if strategy == "dense":
            d = np.zeros((n_pad, c_pad), np.float32)
            d[: n, : c] = densify(g)
            a_dense = jnp.asarray(d)

        return cls(
            src=jnp.asarray(src),
            dst=jnp.asarray(dst),
            vals=jnp.asarray(vals),
            t_src=jnp.asarray(t_src),
            t_dst=jnp.asarray(t_dst),
            t_vals=jnp.asarray(t_vals),
            t_perm=jnp.asarray(t_perm),
            a_dense=a_dense,
            deg=jnp.asarray(deg_np),
            n_nodes=n,
            n_cols=c,
            n_pad=n_pad,
            c_pad=c_pad,
            n_edges=e_real,
            e_pad=e_pad,
            undirected=undirected,
            strategy=strategy,
        )

    # ------------------------------------------------------------------ #
    def pad_nodes(self, x: np.ndarray) -> jnp.ndarray:
        """Pad a host (N, ...) node array to (n_pad, ...) and move to device."""
        x = np.asarray(x)
        pad = self.n_pad - x.shape[0]
        if pad > 0:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        return jnp.asarray(x)

    def density(self) -> float:
        return self.n_edges / float(max(self.n_nodes, 1) ** 2)


def choose_strategy(n_pad: int, c_pad: int, e_real: int, feat_dim: int = 128) -> str:
    """Input-aware strategy selection (the TPU analog of the reference's
    density heuristic, reference: tests/gala_inference.cpp:84-131).

    - Small graphs: densify; the MXU at ~100+ TFLOP/s beats any sparse
      path even at 1000x more FLOPs.
    - Otherwise gather+segment_sum, scanned in chunks when the (E, F)
      intermediate would not fit comfortably in HBM.
    """
    if max(n_pad, c_pad) <= _DENSE_MAX_NODES:
        return "dense"
    if e_real * feat_dim <= _SEGMENT_ONESHOT_LIMIT:
        return "segment"
    return "segment_scan"
