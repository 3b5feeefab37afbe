"""Fused Pallas attention for binned-ELL bin segments — one-hot form.

One kernel per degree-class bin computes, for each chunk of virtual
rows, the ENTIRE fused-attention pass in VMEM: block-DMA staging of
the [x | vl] rows (multiple rows per descriptor, double-buffered
across grid steps — same plan machinery and SMEM-windowed block tables
as ops.pallas.bell_spmm), per-slot score extraction, per-head masked
leaky-relu softmax, and the weighted feature reduce.  No (S, hf+H)
slot intermediate ever touches HBM — the XLA chunked path
(ops/attention._attn_fwd_chunked) streams that buffer through HBM once
per chunk; here it lives only in VMEM.

Every per-slot access is expressed through the per-slot one-hot
hit_j[v, u] = [locals[v, j] == u] over one u8-tile of staged rows
(v5e Mosaic cannot compile in-VMEM dynamic gathers — bell_spmm
docstring):
  - per-slot scalars (scores, saved stats):  hit_j @ tab[:, cols]
    — a thin (r, t) @ (t, c) MXU matvec per slot column;
  - per-slot feature dots (dp = <do_v, x_slot>):  rowsum(hit_j * G)
    with G = do @ tab_vals^T per u8-tile on the MXU (the staged-table
    SDDMM trick);
  - weighted feature reduces (out = sum_j p_j * x_slot):
    W = sum_j p[:, j, None] * hit_j, then W @ tab_vals — exactly
    bell_spmm's one-hot reduce with runtime edge values.
All sweeps run through bell_spmm._fori_tiles (lax.fori_loop over
u8-tiles): Mosaic stacks every UNROLLED iteration's transients, so an
unrolled sweep overflowed the 16MB VMEM at real chunk sizes (probe
logs: 18.9M fwd / 34.9M bwd2); the rolled loop keeps one tile's
buffers live.  A previous composition form (XLA score pre-gather +
separate reduce kernels) compiled but LOST 2x to the XLA chunked path
— the row-granular HBM score gather and the duplicate staging passes
cost more than the kernel saved (results_r3/pallas_bell_onehot.txt).

This is the TPU shape of the reference's fused GAT edge-kernel suite
(reference: src/codegen/cuda.h:504-953: SDDVV + inplace softmax + SpMM
with edge values as separate kernel launches over edge-sized buffers);
the slot layout turns all three into one row-local pass.

Hub nodes (deg > 128) run the SAME kernels over their virtual rows:
the forward uses normalize=False to emit unnormalized per-virtual-row
partials that the executor merges with a blockwise online-softmax
rescale (tiny (n_big)-sized segment ops); backward pass-1 recomputes
probabilities from the node-level (m, s) broadcast per virtual row, so
its partials (and pass-2's [dx | dvl] rows) just segment-sum per node
(ops/attention.py hub branches).

Semantics mirror ops/attention._head_softmax exactly:
  z    = leaky_relu(vl[src, h] + vr[dst, h]);  masked slots -> -1e30
  p    = exp(z - rowmax) / rowsum, masked slots -> 0
  out  = sum_k p * x[src, h*fh:(h+1)*fh]
and the returned per-row (m, s) stats feed the standard chunked
backward (_attn_bwd_chunked).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gala_tpu.ops.pallas.bell_spmm import (
    BLK, BellPlan, block_specs, stage_blocks, _fori_tiles, _mxu_dot,
    _oh_iota, _onehot_w_tile,
)

_NEG = -1e30
_STATS_LANES = 128  # m|s packed into one (r, 128) stats output
# attention kernels run 2-3 sweeps whose fori bodies and tails all SUM
# in Mosaic's stack accounting — a smaller tile keeps the total <16MB.
# Measured: tile 256 GREW the stack (16.95M vs 16.32M at u8=4096) —
# body transients are k-unroll-dominated, not tile-dominated; the plan
# budget caps staging instead, so the tile is a constant.
_ATTN_TILE = 512


def _lrelu(z, slope):
    return jnp.where(z > 0, z, slope * z)


def _hit(locals_, j, iota):
    """hit_j (r, t) f32 one-hot of slot column j over one u8-tile
    (lane slice + [:, None] keeps native layout — the only index ops
    Mosaic takes)."""
    return (locals_[:, j][:, None] == iota).astype(jnp.float32)


def _sddmm_g(rows_f32, tab_cols):
    """G (r, t) = rows @ tab_cols^T on the MXU — per-(row, staged-row)
    feature dots, extracted per slot with rowsum(hit_j * G)."""
    return jax.lax.dot_general(
        rows_f32, tab_cols.astype(jnp.float32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _zcol(packed, j, width, idx):
    lo = j * width + idx
    return packed[:, lo : lo + 1]


def _kernel(bc_ref, bn_ref, locals_ref, w_ref, vr_ref, xx_hbm,
            out_ref, stats_ref, staged, sems,
            *, u, k, hf, fh, nh, slope, f_pad, out_pad, normalize,
            precision, tile):
    """Grid step c: softmax-attend chunk c from staging slot c%2 while
    chunk c+1's block DMAs land in slot (c+1)%2.

    normalize=False computes UNNORMALIZED per-row partials for the hub
    class (acc = sum_k exp(z - m) * x with raw m = rowmax): virtual rows
    of one hub node combine afterwards with the standard blockwise
    online-softmax merge (exp(m_v - M) rescaling) in tiny XLA segment
    ops — the expensive slot reduce stays in this kernel."""
    r = locals_ref.shape[1]
    u8 = u * BLK
    slot = stage_blocks(bc_ref, bn_ref, xx_hbm, staged, sems, u)
    locals_ = locals_ref[0]                       # (r, k)
    w = w_ref[0]                                  # (r, k) occupancy mask
    vr = vr_ref[0]                                # (r, nh)

    # sweep 1: per-slot scores, packed (r, k*nh) j-major
    def score_tile(off, v0, t, z0):
        iota = _oh_iota(r, t, off, v0)
        sc_t = staged[slot, pl.ds(off, t), :][:, hf : hf + nh].astype(
            jnp.float32)
        return z0 + jnp.concatenate(
            [jnp.dot(_hit(locals_, j, iota), sc_t,
                     preferred_element_type=jnp.float32)
             for j in range(k)], axis=1)

    z0 = _fori_tiles(u8, jnp.zeros((r, k * nh), jnp.float32),
                     score_tile, tile=tile)

    outs, ms, ss = [], [], []
    for h in range(nh):
        z_h = jnp.concatenate(
            [_zcol(z0, j, nh, h) for j in range(k)], axis=1)   # (r, k)
        zpre = z_h + vr[:, h][:, None].astype(jnp.float32)
        z = jnp.where(w != 0, _lrelu(zpre, slope), _NEG)
        m = jnp.max(z, axis=1)
        if normalize:
            m = jnp.maximum(m, _NEG / 2)
        p = jnp.where(w != 0, jnp.exp(z - m[:, None]), 0.0)
        s = jnp.sum(p, axis=1)
        if normalize:
            s = jnp.where(s > 0, s, 1.0)
            p = p / s[:, None]

        # sweep 2 (per head): W = sum_j p_j * hit_j, out = W @ val-cols
        def value_tile(off, v0, t, acc, p=p, h=h):
            w_t = _onehot_w_tile(locals_, p, _oh_iota(r, t, off, v0))
            tv = staged[slot, pl.ds(off, t), :][:, h * fh : (h + 1) * fh]
            return acc + _mxu_dot(w_t, tv, precision)

        outs.append(_fori_tiles(
            u8, jnp.zeros((r, fh), jnp.float32), value_tile,
            tile=tile))
        ms.append(m)
        ss.append(s)
    out = jnp.concatenate(outs, axis=1) if nh > 1 else outs[0]  # (r, hf)
    if out_pad > hf:
        out = jnp.concatenate(
            [out, jnp.zeros((r, out_pad - hf), out.dtype)], axis=1
        )
    out_ref[...] = out.astype(out_ref.dtype)
    stats = jnp.stack(ms + ss, axis=1)                          # (r, 2*nh)
    stats_ref[...] = jnp.concatenate(
        [stats, jnp.zeros((r, _STATS_LANES - 2 * nh), jnp.float32)], axis=1
    )


def attn_fwd_planned(plan: BellPlan, xx, w, vr_rows, hf: int, nh: int,
                     slope: float, interpret: bool = False,
                     normalize: bool = True, precision=None):
    """Fused attention forward for one pre-planned k-wide bin segment.

    xx: (n', f_pad) padded [x | vl] table (f_pad % 128 == 0, rows cover
    plan.n_need); w: (nb, k) slot occupancy; vr_rows: (nb, nh) dst-side
    scores in bin order.  Returns (out (nb, hf), m (nb, nh), s (nb, nh)).

    normalize=False: hub-class mode — per-virtual-row UNNORMALIZED
    partials (see _kernel); vr_rows must carry the owning node's vr per
    virtual row and the caller merges rows with exp(m_v - M) rescaling.
    """
    n, f_pad = xx.shape
    assert f_pad % 128 == 0 and n >= plan.n_need, (xx.shape, plan.n_need)
    assert 2 * nh <= _STATS_LANES
    r, k, u, c_chunks, nb = plan.r, plan.k, plan.u, plan.c_chunks, plan.nb
    fh = hf // nh
    out_pad = ((hf + 127) // 128) * 128
    w_pad = jnp.zeros((c_chunks * r, k), w.dtype).at[:nb].set(w)
    vr_pad = jnp.zeros((c_chunks * r, nh), jnp.float32).at[:nb].set(
        vr_rows.astype(jnp.float32)
    )
    blocks3 = plan.blocks.reshape(c_chunks, 1, u)

    kern = functools.partial(
        _kernel, u=u, k=k, hf=hf, fh=fh, nh=nh, slope=float(slope),
        f_pad=f_pad, out_pad=out_pad, normalize=normalize,
        precision=precision,
        tile=_ATTN_TILE,
    )
    out, stats = pl.pallas_call(
        kern,
        grid=(c_chunks,),
        in_specs=block_specs(c_chunks, u) + [
            pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, r, nh), lambda c: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((r, out_pad), lambda c: (c, 0)),
            pl.BlockSpec((r, _STATS_LANES), lambda c: (c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, u * BLK, f_pad), xx.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=[
            # hub partials stay f32: they are rescaled and summed across
            # virtual rows after the kernel
            jax.ShapeDtypeStruct(
                (c_chunks * r, out_pad),
                xx.dtype if normalize else jnp.float32,
            ),
            jax.ShapeDtypeStruct((c_chunks * r, _STATS_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        blocks3, blocks3,
        plan.locals_.reshape(c_chunks, r, k),
        w_pad.reshape(c_chunks, r, k),
        vr_pad.reshape(c_chunks, r, nh),
        xx,
    )
    m = stats[:nb, :nh]
    s = stats[:nb, nh : 2 * nh]
    return out[:nb, :hf], m, s


def _bwd1_kernel(bc_ref, bn_ref, locals_ref, w_ref, aux_ref, xx_hbm,
                 stats_ref, staged, sems,
                 *, u, k, hf, fh, nh, slope, f_pad, tile):
    """Backward pass-1 (forward layout): per-destination-row stats
      sds = sum_k p*dp,  A = sum p*dp*lrelu',  B = sum p*lrelu'
    with p recomputed from the saved per-node (m, s)
    (ops/attention._head_bwd_stats math).  aux rows pack
    [dout (hf) | vr (nh) | m (nh) | s (nh)]."""
    r = locals_ref.shape[1]
    u8 = u * BLK
    slot = stage_blocks(bc_ref, bn_ref, xx_hbm, staged, sems, u)
    locals_ = locals_ref[0]                       # (r, k)
    w = w_ref[0]                                  # (r, k)
    aux = aux_ref[0]                              # (r, a_pad)
    dos = [aux[:, h * fh : (h + 1) * fh].astype(jnp.float32)
           for h in range(nh)]

    # one sweep: per-slot scores (z0) and per-slot feature dots (dps)
    def sweep1(off, v0, t, carry):
        z0, dps = carry
        iota = _oh_iota(r, t, off, v0)
        rows_t = staged[slot, pl.ds(off, t), :]
        sc_t = rows_t[:, hf : hf + nh].astype(jnp.float32)
        g_ts = [_sddmm_g(dos[h], rows_t[:, h * fh : (h + 1) * fh])
                for h in range(nh)]
        zt, dt = [], []
        for j in range(k):
            hit = _hit(locals_, j, iota)
            zt.append(jnp.dot(hit, sc_t, preferred_element_type=jnp.float32))
            for h in range(nh):
                dt.append(jnp.sum(hit * g_ts[h], axis=1, keepdims=True))
        return (z0 + jnp.concatenate(zt, axis=1),
                dps + jnp.concatenate(dt, axis=1))

    z0, dps = _fori_tiles(
        u8,
        (jnp.zeros((r, k * nh), jnp.float32),
         jnp.zeros((r, k * nh), jnp.float32)),
        sweep1,
        tile=tile,
    )

    outs = []
    for h in range(nh):
        vr_h = aux[:, hf + h][:, None].astype(jnp.float32)
        m_h = aux[:, hf + nh + h][:, None].astype(jnp.float32)
        s_h = aux[:, hf + 2 * nh + h][:, None].astype(jnp.float32)
        zpre = jnp.concatenate(
            [_zcol(z0, j, nh, h) for j in range(k)], axis=1) + vr_h
        z = jnp.where(w != 0, _lrelu(zpre, slope), _NEG)
        p = jnp.where(w != 0, jnp.exp(z - m_h) / s_h, 0.0)
        dp = jnp.concatenate(
            [_zcol(dps, j, nh, h) for j in range(k)], axis=1)
        lr = jnp.where(zpre > 0, 1.0, slope)
        outs.append(jnp.sum(p * dp, axis=1))           # sds
        outs.append(jnp.sum(p * dp * lr, axis=1))      # A
        outs.append(jnp.sum(p * lr, axis=1))           # B
    stats = jnp.stack(outs, axis=1)                    # (r, 3*nh)
    stats_ref[...] = jnp.concatenate(
        [stats, jnp.zeros((r, _STATS_LANES - 3 * nh), jnp.float32)], axis=1
    )


def attn_bwd1_planned(plan: BellPlan, xx, w, vr_rows, dout_rows, m_rows,
                      s_rows, hf: int, nh: int, slope: float,
                      interpret: bool = False):
    """Fused backward pass-1 for one planned bin segment: returns
    (sds, a, b) each (nb, nh) — the accumulators _attn_bwd_chunked
    needs (dvr = a - sds*b; sds feeds pass 2)."""
    n, f_pad = xx.shape
    assert f_pad % 128 == 0 and n >= plan.n_need, (xx.shape, plan.n_need)
    assert 3 * nh <= _STATS_LANES
    r, k, u, c_chunks, nb = plan.r, plan.k, plan.u, plan.c_chunks, plan.nb
    fh = hf // nh
    a_w = hf + 3 * nh
    a_pad = ((a_w + 127) // 128) * 128
    aux = jnp.zeros((c_chunks * r, a_pad), jnp.float32)
    aux = aux.at[:nb, :hf].set(dout_rows.astype(jnp.float32))
    aux = aux.at[:nb, hf : hf + nh].set(vr_rows.astype(jnp.float32))
    aux = aux.at[:nb, hf + nh : hf + 2 * nh].set(m_rows)
    # pad rows keep s=1 so the masked exp/s never divides by zero
    aux = aux.at[:, hf + 2 * nh : hf + 3 * nh].set(1.0)
    aux = aux.at[:nb, hf + 2 * nh : hf + 3 * nh].set(s_rows)
    w_pad = jnp.zeros((c_chunks * r, k), w.dtype).at[:nb].set(w)
    blocks3 = plan.blocks.reshape(c_chunks, 1, u)

    kern = functools.partial(
        _bwd1_kernel, u=u, k=k, hf=hf, fh=fh, nh=nh, slope=float(slope),
        f_pad=f_pad,
        tile=_ATTN_TILE,
    )
    (stats,) = pl.pallas_call(
        kern,
        grid=(c_chunks,),
        in_specs=block_specs(c_chunks, u) + [
            pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, r, a_pad), lambda c: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((r, _STATS_LANES), lambda c: (c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, u * BLK, f_pad), xx.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_chunks * r, _STATS_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        blocks3, blocks3,
        plan.locals_.reshape(c_chunks, r, k),
        w_pad.reshape(c_chunks, r, k),
        aux.reshape(c_chunks, r, a_pad),
        xx,
    )
    # stats columns are interleaved per head: [sds_h, a_h, b_h] * nh
    st = stats[:nb, : 3 * nh].reshape(nb, nh, 3)
    return st[..., 0], st[..., 1], st[..., 2]


def _bwd2_kernel(bc_ref, bn_ref, locals_ref, w_ref, aux_ref,
                 wtab_hbm, out_ref, staged, sems,
                 *, u, k, hf, fh, nh, slope, f_pad, out_pad, tile):
    """Backward pass-2 (transpose layout): slot gradients for all heads
    (ops/attention._slot_grads math).  Staged rows are the
    destination-side [dout | vr | m | s | sds] table; aux rows pack this
    source node's [x (hf) | vl (nh)]."""
    r = locals_ref.shape[1]
    u8 = u * BLK
    slot = stage_blocks(bc_ref, bn_ref, wtab_hbm, staged, sems, u)
    locals_ = locals_ref[0]                       # (r, k)
    w = w_ref[0]                                  # (r, k)
    aux = aux_ref[0]                              # (r, a_pad) [x | vl]
    x_cs = [aux[:, h * fh : (h + 1) * fh].astype(jnp.float32)
            for h in range(nh)]

    # sweep 1: per-head per-slot feature dots dp AND the per-slot
    # [vr|m|s|sds] scalars, both via hit_j one-hot products against the
    # staged table.  The scalars ride the same thin hit @ (t, 4nh) MXU
    # dot shape bwd1's score extraction uses (the rolled _fori_tiles
    # keeps one tile's (r, 4nh) transients live); an earlier XLA
    # row-granular pre-gather of these 4nh lanes cost ~1s at 16M slots
    # — the exact HBM gather the kernel exists to avoid
    # (results_r3/pallas_bell_onehot.txt MONOLITH-FORI bwd2).
    def tile1(off, v0, t, carry):
        dps, sg0 = carry
        iota = _oh_iota(r, t, off, v0)
        rows_t = staged[slot, pl.ds(off, t), :]
        st_t = rows_t[:, hf : hf + 4 * nh].astype(jnp.float32)
        g_ts = [_sddmm_g(x_cs[h], rows_t[:, h * fh : (h + 1) * fh])
                for h in range(nh)]
        dt, st = [], []
        for j in range(k):
            hit = _hit(locals_, j, iota)
            st.append(jnp.dot(hit, st_t,
                              preferred_element_type=jnp.float32))
            for h in range(nh):
                dt.append(jnp.sum(hit * g_ts[h], axis=1, keepdims=True))
        return (dps + jnp.concatenate(dt, axis=1),
                sg0 + jnp.concatenate(st, axis=1))

    dps, sg = _fori_tiles(
        u8,
        (jnp.zeros((r, k * nh), jnp.float32),
         jnp.zeros((r, k * 4 * nh), jnp.float32)),
        tile1, tile=tile)

    dx_h, dvl_h = [], []
    for h in range(nh):
        vl_c = aux[:, hf + h][:, None].astype(jnp.float32)
        vr_g = jnp.concatenate(
            [_zcol(sg, j, 4 * nh, h) for j in range(k)], axis=1)
        m_g = jnp.concatenate(
            [_zcol(sg, j, 4 * nh, nh + h) for j in range(k)], axis=1)
        s_g = jnp.concatenate(
            [_zcol(sg, j, 4 * nh, 2 * nh + h) for j in range(k)], axis=1)
        sds_g = jnp.concatenate(
            [_zcol(sg, j, 4 * nh, 3 * nh + h) for j in range(k)], axis=1)
        # pad slots never hit the mask branch but keep s=1-safe anyway
        s_g = jnp.where(s_g != 0, s_g, 1.0)
        zpre = vl_c + vr_g
        z = jnp.where(w != 0, _lrelu(zpre, slope), _NEG)
        p = jnp.where(w != 0, jnp.exp(z - m_g) / s_g, 0.0)
        dp = jnp.concatenate(
            [_zcol(dps, j, nh, h) for j in range(k)], axis=1)
        ds = p * (dp - sds_g)
        dz = ds * jnp.where(zpre > 0, 1.0, slope)

        # sweep 2 (per head): dx = W @ dout-cols, W = sum_j p_j hit_j
        def dx_tile(off, v0, t, acc, p=p, h=h):
            w_t = _onehot_w_tile(locals_, p, _oh_iota(r, t, off, v0))
            tv = staged[slot, pl.ds(off, t), :][:, h * fh : (h + 1) * fh]
            return acc + jnp.dot(w_t, tv.astype(jnp.float32),
                                 preferred_element_type=jnp.float32)

        dx_h.append(_fori_tiles(
            u8, jnp.zeros((r, fh), jnp.float32), dx_tile,
            tile=tile))
        dvl_h.append(jnp.sum(dz, axis=1)[:, None])
    dx = jnp.concatenate(dx_h, axis=1) if nh > 1 else dx_h[0]
    dvl = jnp.concatenate(dvl_h, axis=1) if nh > 1 else dvl_h[0]
    out = jnp.concatenate([dx, dvl], axis=1)      # (r, hf + nh)
    if out_pad > hf + nh:
        out = jnp.concatenate(
            [out, jnp.zeros((r, out_pad - (hf + nh)), jnp.float32)], axis=1
        )
    out_ref[...] = out


def attn_bwd2_planned(plan: BellPlan, wtab, w, x_rows, vl_rows, hf: int,
                      nh: int, slope: float, interpret: bool = False):
    """Fused backward pass-2 for one planned transpose-side bin segment:
    returns (nb, hf + nh) = [dx | dvl] rows (t-bin order).

    wtab: (n', f_pad) padded [dout | vr | m | s | sds] destination table
    (f_pad % 128 == 0, rows cover plan.n_need); x_rows/vl_rows: this
    segment's source-node features / left scores in t-bin order."""
    n, f_pad = wtab.shape
    assert f_pad % 128 == 0 and n >= plan.n_need, (wtab.shape, plan.n_need)
    r, k, u, c_chunks, nb = plan.r, plan.k, plan.u, plan.c_chunks, plan.nb
    fh = hf // nh
    a_w = hf + nh
    a_pad = ((a_w + 127) // 128) * 128
    out_pad = a_pad
    aux = jnp.zeros((c_chunks * r, a_pad), jnp.float32)
    aux = aux.at[:nb, :hf].set(x_rows.astype(jnp.float32))
    aux = aux.at[:nb, hf : hf + nh].set(vl_rows.astype(jnp.float32))
    w_pad = jnp.zeros((c_chunks * r, k), w.dtype).at[:nb].set(w)
    blocks3 = plan.blocks.reshape(c_chunks, 1, u)

    kern = functools.partial(
        _bwd2_kernel, u=u, k=k, hf=hf, fh=fh, nh=nh, slope=float(slope),
        f_pad=f_pad, out_pad=out_pad,
        tile=_ATTN_TILE,
    )
    (out,) = pl.pallas_call(
        kern,
        grid=(c_chunks,),
        in_specs=block_specs(c_chunks, u) + [
            pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, r, a_pad), lambda c: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((r, out_pad), lambda c: (c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, u * BLK, f_pad), wtab.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c_chunks * r, out_pad), jnp.float32),
        ],
        interpret=interpret,
    )(
        blocks3, blocks3,
        plan.locals_.reshape(c_chunks, r, k),
        w_pad.reshape(c_chunks, r, k),
        aux.reshape(c_chunks, r, a_pad),
        wtab,
    )
    return out[:nb, : hf + nh]
