"""Fused Pallas bell-SpMM: block-DMA gather + in-VMEM K-slot reduce.

The round-1 per-row-DMA gather (ops/pallas/gather.py) lost to XLA at
33M rows/s — descriptor-issue bound, one descriptor per gathered row.
This kernel moves MULTIPLE ROWS PER DESCRIPTOR: the host planner
(plan_chunks) groups each chunk's unique source rows into 8-row-aligned
BLOCKS, the kernel DMAs whole blocks from the HBM feature table into a
VMEM staging buffer (8 rows per descriptor minimum; fewer descriptors
whenever consecutive blocks coalesce into runs), and the K-slot
weighted reduction runs entirely in VMEM — no (S, F) slot intermediate
ever touches HBM.  This is the TPU shape of the reference's coarsened
CUDA SpMM suite (reference: src/codegen/cuda.h:282-436: one warp
streams a row of B per neighbor; here one DMA streams 8+ rows and the
MXU does the reduction).

In-VMEM slot distribution (r3, measured on the real toolchain —
scripts/pallas_bisect.py + probe_onehot.py / probe_bell_full.py):
- one-hot: W[v, u] = sum_k vals[v,k] * [locals[v,k] == u] built in K
  VPU passes, out = W @ staged on the MXU.  This is the ONLY form the
  v5e Mosaic backend compiles: tpu.dynamic_gather is "Not implemented:
  Multiple source vregs along gather dimension", i.e. an in-VMEM
  take_along_axis gather cannot address a table taller than one vreg
  (8 sublanes) — every gather-form variant dies in tpu_compile_helper
  no matter how the indices are laid out.
- the per-chunk block-id table rides in SMEM-WINDOWED BlockSpecs
  ((C,1,u) array, (1,1,u) cur/next windows), NOT scalar prefetch: a
  prefetched operand must fit the 1MB SMEM whole, which silently
  crashed the compile helper for any real graph (C*u*4B was 4MB at
  Reddit scale; the cur/next windows are 2*u*4B at any C).

Correctness is validated in interpret mode (tests/test_pallas_bell.py)
and against the XLA reduce on chip; scripts/bench_pallas_bell.py
measures it vs the XLA one-shot before it is wired into
choose_strategy.
"""
from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8          # table rows per DMA descriptor (8-sublane aligned)


# u8-tile width for every one-hot sweep: bounds the live (r, tile)
# transients (hit/w/iota, ~12*r*tile bytes) regardless of how many
# staged rows a chunk has — an untiled sweep at u8~1400, k=16 keeps
# ~22MB of hit matrices live and crashes the compiler (VMEM)
_OH_TILE = 1024


def _oh_iota(r, t, off, v0=0):
    """(r, t) global staged-row positions of one sweep tile.  Positions
    below the v0 watermark are replaced by -1 (matches no local id):
    _fori_tiles clamps its last iteration to a full-width tile that
    re-reads rows already swept, and the masked iota is what keeps the
    re-read rows out of every one-hot product."""
    g = off + jax.lax.broadcasted_iota(jnp.int32, (r, t), 1)
    return jnp.where(g >= v0, g, -1)


def _onehot_w_tile(locals_, vals, iota):
    """w (r, t) with w[v, u] = sum_j vals[v, j] * [locals_[v, j] ==
    iota[v, u]] — one u8-tile of the one-hot weight matrix, built in k
    VPU passes.  w @ staged_tile then performs the slot gather AND the
    k-way weighted reduce in one MXU matmul.  Lane slices + [:, None]
    keep the native (sublane, lane) layout — the only index
    manipulations v5e Mosaic accepts (an (r,k)->(rk,) reshape, and
    tpu.dynamic_gather over a >8-row table, both fail; see module
    docstring)."""
    r, k = locals_.shape
    w = jnp.zeros(iota.shape, jnp.float32)
    for j in range(k):
        hit = (locals_[:, j][:, None] == iota).astype(jnp.float32)
        w = w + vals[:, j][:, None].astype(jnp.float32) * hit
    return w


def _chunk_pad(cols: np.ndarray, k: int, rows_per_chunk: int):
    """(C, R, k) zero-padded chunk view of a segment's slot cols."""
    nb = cols.shape[0] // k
    r = rows_per_chunk
    c_chunks = -(-nb // r)
    cols2 = np.zeros((c_chunks * r, k), np.int64)
    cols2[:nb] = cols.reshape(nb, k)
    return cols2.reshape(c_chunks, r, k), nb, c_chunks


def plan_chunk_max_u(cols: np.ndarray, k: int, rows_per_chunk: int) -> int:
    """Worst chunk's unique-8-row-block count at this granularity — the
    count-only probe make_plan's VMEM-budget loop runs (one parallel
    sort pass; the fill runs once, after r is chosen)."""
    from gala_tpu import native

    cols3, _, c_chunks = _chunk_pad(cols, k, rows_per_chunk)
    counts = native.plan_blocks_count_native(cols3)
    if counts is not None:
        return int(counts.max())
    return max(
        np.unique(cols3[c] // BLK).shape[0] for c in range(c_chunks)
    )


def plan_chunks(cols: np.ndarray, k: int, rows_per_chunk: int,
                u_hint: int | None = None):
    """Host planner for one k-wide segment.

    cols: (nb*k,) int32 source-row ids (slot order).  Returns
    (blocks (C, U) int32 block ids, locals (C, R, k) int32 staged-row
    indices, n_rows, C, U): chunk c DMAs blocks[c] (8 rows each, padded
    by repeating block 0 — harmless duplicate traffic) and resolves
    slot (v, j) at staged row locals[c, v, j].

    Invariant: every emitted local id is NON-NEGATIVE (cols >= 0 and
    pad slots resolve block 0) — _oh_iota's -1 masked-position sentinel
    relies on it (a negative local would silently match masked iota
    positions).  Both the NumPy path below and plan_blocks_fill_i32
    preserve it; make_plan asserts it once per plan.
    """
    cols3, nb, c_chunks = _chunk_pad(cols, k, rows_per_chunk)
    r = rows_per_chunk
    from gala_tpu import native

    planned = native.plan_blocks_native(cols3, u=u_hint)
    if planned is not None:
        blocks, locals_, u = planned
        return blocks, locals_, nb, c_chunks, u
    blocks_l, locals_l = [], []
    for c in range(c_chunks):
        ids = cols3[c]
        blk = np.unique(ids // BLK)
        loc = np.searchsorted(blk, ids // BLK) * BLK + ids % BLK
        blocks_l.append(blk)
        locals_l.append(loc)
    u = max(b.shape[0] for b in blocks_l)
    blocks = np.zeros((c_chunks, u), np.int32)
    for c, b in enumerate(blocks_l):
        blocks[c, : b.shape[0]] = b
        if b.shape[0] < u:
            blocks[c, b.shape[0]:] = b[0]
    locals_ = np.stack(locals_l).astype(np.int32)
    return blocks, locals_, nb, c_chunks, u


def stage_blocks(bc_ref, bn_ref, x_hbm, staged, sems, u):
    """Double-buffered 8-row block staging shared by the bell / attn /
    sddmm kernels.  Grid step pid issues chunk pid+1's block DMAs
    (ids from the NEXT SMEM window bn_ref) into slot (pid+1)%2, then
    waits on chunk pid's slot — fetch overlaps the reduce across grid
    steps, the guide's DMA pipeline pattern.  Returns chunk pid's
    staging-slot index (kernels read tiles from staged[slot, ...] —
    ref reads, so fori_loop tile sweeps slice it dynamically)."""
    pid = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    def issue_chunk(b_ref, slot):
        def issue(i, _):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(b_ref[0, 0, i] * BLK, BLK), :],
                staged.at[slot, pl.ds(i * BLK, BLK), :],
                sems.at[slot],
            ).start()
            return 0

        jax.lax.fori_loop(0, u, issue, 0)

    def wait_chunk(slot):
        def wait(i, _):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(0, BLK), :],
                staged.at[slot, pl.ds(i * BLK, BLK), :],
                sems.at[slot],
            ).wait()
            return 0

        jax.lax.fori_loop(0, u, wait, 0)

    @pl.when(pid == 0)
    def _():
        issue_chunk(bc_ref, 0)

    @pl.when(pid + 1 < n_chunks)
    def _():
        issue_chunk(bn_ref, (pid + 1) % 2)

    wait_chunk(pid % 2)
    return pid % 2


def block_specs(c_chunks: int, u: int):
    """The cur/next SMEM-windowed BlockSpec pair for a (C, 1, u) block
    table (see module docstring: windowing, not scalar prefetch)."""
    return [
        pl.BlockSpec((1, 1, u), lambda c: (c, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, u),
                     lambda c: (jnp.minimum(c + 1, c_chunks - 1), 0, 0),
                     memory_space=pltpu.SMEM),
    ]


def _fori_tiles(u8, carry0, tile_fn, tile=_OH_TILE):
    """Run tile_fn(off, v0, t, carry) -> carry over u8 staged rows in
    `tile`-row steps as ONE rolled lax.fori_loop of >= 2 full-width
    iterations.  Mosaic's stack accounting SUMS every straight-line
    region's transients — unrolled iterations, inline tails, and
    1-trip loops that canonicalize to inline code all stack on top of
    the kernel's other sweeps (the 17-35MB overflows at real chunk
    sizes) — so the ONLY body shape that may exist is the rolled one:
    no static tail call, and the tile shrinks so a single-trip loop
    never occurs.  The last iteration re-reads a clamped full tile
    [u8-t, u8); tile_fn masks the already-swept positions below the
    v0 watermark via _oh_iota(r, t, off, v0) (one-hot misses), so
    overlap re-reads contribute nothing."""
    # the clamped-offset alignment proof below (pl.multiple_of) and the
    # 8-rounded tile are only valid when u8 is block-aligned; every
    # planner emits u8 = u*BLK, so fail loudly on anything else
    assert u8 % BLK == 0, u8
    if u8 <= 16:
        return tile_fn(0, 0, u8, carry0)
    t = min(tile, ((u8 + 1) // 2 + 7) // 8 * 8, u8)
    n = -(-u8 // t)

    def body(i, c):
        # u8 and t are both multiples of BLK, so the clamped offset is
        # too — but Mosaic's alignment prover cannot see through
        # minimum; pl.multiple_of restores the static 8-sublane proof
        # the vector loads need
        off = pl.multiple_of(jnp.minimum(i * t, u8 - t), BLK)
        return tile_fn(off, i * t, t, c)

    return jax.lax.fori_loop(0, n, body, carry0)


def _mxu_dot(w, tab, precision):
    """(r, u8) f32 one-hot weights @ staged table, f32 accumulate.
    bf16 tables multiply natively on the MXU (w rounds to bf16 — the
    table data is already bf16, so no extra signal is lost); f32
    tables honor `precision` (None = fastest bf16 passes, HIGHEST =
    f32-exact, the XLA-parity setting)."""
    if tab.dtype == jnp.bfloat16:
        return jnp.dot(w.astype(jnp.bfloat16), tab,
                       preferred_element_type=jnp.float32)
    return jnp.dot(w, tab.astype(jnp.float32), precision=precision,
                   preferred_element_type=jnp.float32)


def _kernel(bc_ref, bn_ref, locals_ref, vals_ref, x_hbm, out_ref,
            staged, sems, *, u, k, f, precision, lo, fo, fo_pad):
    """Grid step c: tiled one-hot W from chunk c's locals/vals,
    W @ staged table (lane columns [lo, lo+fo)) on the MXU — the slot
    gather and k-way weighted reduce in a single (tile-accumulated)
    matmul (see module docstring for why gather forms cannot
    compile)."""
    slot = stage_blocks(bc_ref, bn_ref, x_hbm, staged, sems, u)
    locals_, vals = locals_ref[0], vals_ref[0]
    r = locals_.shape[0]
    u8 = u * BLK

    def tile(off, v0, t, acc):
        w = _onehot_w_tile(locals_, vals, _oh_iota(r, t, off, v0))
        tv = staged[slot, pl.ds(off, t), :][:, lo : lo + fo]
        return acc + _mxu_dot(w, tv, precision)

    acc = _fori_tiles(u8, jnp.zeros((r, fo), jnp.float32), tile)
    if fo_pad > fo:
        acc = jnp.concatenate(
            [acc, jnp.zeros((r, fo_pad - fo), jnp.float32)], axis=1)
    out_ref[...] = acc.astype(out_ref.dtype)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BellPlan:
    """Pre-built device plan for one k-wide segment (host planning
    happens once at graph build, like the stage tables)."""

    blocks: jax.Array    # (C, U) int32 8-row block ids
    locals_: jax.Array   # (C, R, k) int32 staged-row indices
    nb: int              # real output rows
    c_chunks: int
    u: int
    r: int
    k: int
    n_need: int          # table rows every block DMA stays inside
    f_budget: int = 128  # physical feature width r was budgeted for; the
                         # executor falls back to XLA when the actual
                         # width exceeds it (VMEM would overflow)

    def tree_flatten(self):
        return ((self.blocks, self.locals_),
                (self.nb, self.c_chunks, self.u, self.r, self.k,
                 self.n_need, self.f_budget))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def make_plan(cols: np.ndarray, k: int, rows_per_chunk: int = 256,
              max_staged_rows: int | None = None,
              f_budget: int = 128) -> BellPlan | None:
    """Plan one k-wide segment.  When max_staged_rows is given (the
    VMEM budget: 2 staging slots x u*BLK rows x f_pad lanes must fit
    ~16MB/core), rows_per_chunk is halved until the worst chunk's
    staged footprint fits; returns None if even 8-row chunks do not
    (caller falls back to the XLA gather path)."""
    cols = np.asarray(cols)
    r = rows_per_chunk
    u = None
    if max_staged_rows is not None:
        # count-only probes until the worst chunk fits; each probe is one
        # parallel sort pass (the fill's extra pass runs once, below).
        # Shrink geometrically toward the budget rather than blind
        # halving — u shrinks sublinearly in r, so the jump never
        # overshoots by more than one refinement round.
        while True:
            u = plan_chunk_max_u(cols, k, r)
            if u * BLK <= max_staged_rows:
                break
            if r <= 8:
                return None
            over = (u * BLK) / max_staged_rows
            r = max((r // max(2, int(over))) // 8 * 8, 8)  # 8-sublane grain
            u = None
    blocks, locals_, nb, c_chunks, u = plan_chunks(cols, k, r, u_hint=u)
    assert int(np.min(locals_)) >= 0  # _oh_iota -1 sentinel contract
    return BellPlan(
        blocks=jnp.asarray(blocks),
        locals_=jnp.asarray(locals_),
        nb=nb, c_chunks=c_chunks, u=u, r=r, k=k,
        n_need=int(blocks.max() + 1) * BLK,
        f_budget=f_budget,
    )


# segments with fewer slots than this keep the XLA gather path (a
# pallas_call per tiny bin costs more in launch/compile than it saves)
_MIN_PLAN_SLOTS = 1 << 15
# default VMEM budget for the double-buffered staging scratch: rows such
# that 2 * rows * f_pad lanes * itemsize ~ 10MB (the tiled one-hot
# transients are a fixed ~12 * r * _OH_TILE ~ 3MB on top)
_MAX_STAGED_ROWS = 8192
_STAGING_BYTES = 10 << 20
# budget for the per-chunk operand set: r shrinks for wide-k segments
_SEG_VMEM_BYTES = 4 << 20
# chunks whose slots reuse staged rows fewer than this many times run
# the XLA gather path instead: the kernel's MXU/VPU work scales with
# staged rows, its win with reuse.  Chip-measured (results_r3/
# pallas_bell_onehot.txt): reuse 3.0 -> 4.3x over XLA one-shot, 5.2 ->
# 6.3x, 12.8 -> 9.7x; sub-1 reuse loses 2-4x.
_REUSE_MIN = 2.0
# plans budget-shrunk below this r are descriptor-issue bound (r=16
# measured at 30M slots/s vs 335M at r=256) — refuse instead
_MIN_R = 64


def _reuse_ok(plan: BellPlan) -> bool:
    import os

    reuse_min = float(os.environ.get("GALA_PALLAS_REUSE_MIN", _REUSE_MIN))
    reuse = (plan.nb * plan.k) / float(plan.c_chunks * plan.u * BLK)
    return reuse >= reuse_min and plan.r >= _MIN_R


def _est_reuse(cols: np.ndarray, k: int, r: int, n_probe: int = 32) -> float:
    """Sampled UPPER BOUND on the staged-row reuse a plan over `cols`
    can reach: mean distinct-block count over up to n_probe chunks at
    the largest candidate r.  Budget refinement only ever SHRINKS r,
    and reuse = r*k / (u(r)*BLK) grows with r (u is concave in r), so
    a below-threshold estimate here proves every feasible plan is
    below threshold too — the full planner (one parallel sort pass
    over all slots per refinement round, seconds at 10^7-slot scale)
    can be skipped.  Measured real-layout reality this protects: the
    synthetic community graphs plan at reuse 0.13-0.19 everywhere
    (round-4 locality study), so production builds hit this gate and
    pay ~0 planning cost."""
    cols = cols.reshape(-1, k)
    nb = cols.shape[0]
    n_chunks = max(nb // max(r, 1), 1)
    probe = np.linspace(0, n_chunks - 1, min(n_probe, n_chunks)).astype(np.int64)
    u8 = [
        np.unique(cols[c * r : (c + 1) * r] // BLK).size * BLK
        for c in probe
    ]
    return (r * k) / float(max(np.mean(u8), 1.0))


def build_segment_plans(hb, f_pad: int = 128, itemsize: int = 4,
                        rows_per_chunk: int = 256, chunk_slots: int = 0):
    """Per-segment BellPlans for a HostBinnedEll, in _bell_raw's segment
    order (degree-class bins, then the hub block).  Entries are None for
    segments where the fused kernel should not run (too few slots,
    staging cannot fit VMEM, or staged-row reuse below the measured
    break-even) — the executor mixes paths per segment."""
    from gala_tpu.data.ell import _segments

    budget_rows = _STAGING_BYTES // (2 * max(f_pad, 128) * itemsize)
    budget_rows = max(min(budget_rows, _MAX_STAGED_ROWS), BLK)
    plans = []
    for k, nb, off in _segments(hb):
        if nb * k < _MIN_PLAN_SLOTS:
            plans.append(None)
            continue
        # wide-k segments shrink r so the per-chunk operand set
        # (locals/vals (r, k) plus the (r, f) output tile) stays modest
        r_seg = max(_SEG_VMEM_BYTES // (k * max(f_pad, 128) * itemsize), 8)
        # the DIR col_tile directive drives the kernels' chunk
        # granularity too (same schedule surface as the XLA paths);
        # rounded to the 8-sublane grain make_plan needs
        r_dir = rows_per_chunk
        if chunk_slots:
            # the DIR directive picks the granularity but never above
            # the caller's r cap (VMEM stack budget, see ops/attention)
            r_dir = min(max((chunk_slots // k) // 8 * 8, 8),
                        rows_per_chunk)
        seg_cols = hb.flat_cols[off : off + nb * k]
        reuse_min = float(
            os.environ.get("GALA_PALLAS_REUSE_MIN", _REUSE_MIN)
        )
        if _est_reuse(seg_cols, k, min(r_dir, r_seg)) < reuse_min:
            plans.append(None)  # provably below break-even: skip planning
            continue
        plan = make_plan(cols=seg_cols, k=k,
                         rows_per_chunk=min(r_dir, r_seg),
                         max_staged_rows=budget_rows,
                         f_budget=max(f_pad, 128))
        if plan is not None and not _reuse_ok(plan):
            plan = None
        plans.append(plan)
    return tuple(plans)


def bell_spmm_planned(plan: BellPlan, x, vals, precision=None,
                      interpret: bool = False, use_gather=None,
                      col_range: tuple[int, int] | None = None,
                      out_dtype=None):
    """Execute a pre-planned fused bell-SpMM segment (jit-safe: the
    plan arrays are ordinary device operands).

    precision: matmul precision for f32 tables (None = fast bf16 MXU
    passes, ~4e-3 rel err; jax.lax.Precision.HIGHEST = f32-exact,
    matching the XLA segment-sum path bit-for-bit tolerance).
    col_range=(lo, hi): reduce only table lanes [lo, hi) — the per-head
    value columns of the fused-attention composition (attn_bell); the
    output then has hi-lo columns.
    out_dtype: output dtype (default x.dtype; the hub-attention
    composition keeps f32 partials over a bf16 table).
    use_gather is accepted and ignored for API compatibility — the
    gather form cannot compile on v5e Mosaic (module docstring)."""
    del use_gather
    out_dtype = out_dtype or x.dtype
    n, f = x.shape
    assert f % 128 == 0, f
    lo, hi = col_range if col_range is not None else (0, f)
    fo = hi - lo
    fo_pad = ((fo + 127) // 128) * 128
    r, k, u, c_chunks, nb = plan.r, plan.k, plan.u, plan.c_chunks, plan.nb
    vals_pad = jnp.zeros((c_chunks * r, k), vals.dtype).at[:nb].set(vals)
    if plan.n_need > n:  # table must cover every block DMA
        x = jnp.concatenate(
            [x, jnp.zeros((plan.n_need - n, f), x.dtype)], axis=0
        )

    blocks3 = plan.blocks.reshape(c_chunks, 1, u)
    kern = functools.partial(_kernel, u=u, k=k, f=f, precision=precision,
                             lo=lo, fo=fo, fo_pad=fo_pad)
    out = pl.pallas_call(
        kern,
        grid=(c_chunks,),
        in_specs=block_specs(c_chunks, u) + [
            pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((r, fo_pad), lambda c: (c, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, u * BLK, f), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((c_chunks * r, fo_pad), out_dtype),
        interpret=interpret,
    )(blocks3, blocks3, plan.locals_,
      vals_pad.reshape(c_chunks, r, k), x)
    return out[:nb, :fo]


def bell_spmm_pallas(x, cols: np.ndarray, vals, k: int,
                     rows_per_chunk: int = 256, precision=None,
                     interpret: bool = False, use_gather=None):
    """Convenience: plan (host, trace time) + execute.  See
    bell_spmm_planned for the jit-safe pre-planned form."""
    plan = make_plan(cols, k, rows_per_chunk)
    return bell_spmm_planned(plan, x, vals, precision=precision,
                             interpret=interpret, use_gather=use_gather)
