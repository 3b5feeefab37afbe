"""Fused Pallas attention for binned-ELL bin segments — composition form.

r3 final architecture (VMEM-budget driven, every piece chip-proven):
the attention passes COMPOSE two Pallas primitives over the shared
BellPlan staging machinery plus (nb, k)-sized XLA math —
  1. bell_spmm's tiled one-hot reduce (ops.pallas.bell_spmm._kernel,
     col_range per head): out = sum_j p[v, j] * tab[slot_vj, cols];
  2. slot_dots_planned (this module): dp[v, j] = <rows_v, tab[slot_vj,
     cols]> via the per-tile staged SDDMM G = rows @ tab_cols^T on the
     MXU and per-slot extraction rowsum(hit_j * G),
while the per-slot SCALAR columns (scores vl[src], saved [vr|m|s|sds])
are pre-gathered in XLA from the slot rows reconstructed out of the
plan (plan_slot_rows) — nb*k*nh*4B of HBM traffic, trivial next to the
feature gather.  The softmax itself (z, m, p, s — all (nb, k)) runs in
XLA between the kernels.  Earlier monolithic kernels that kept the
whole pass in one pallas_call overflowed the 16MB VMEM stack at real
chunk sizes (results_r3/probe logs: 18.9M fwd, 34.9M bwd2); hit_j is
the per-slot one-hot over one u8-tile of staged rows — v5e Mosaic
cannot compile in-VMEM dynamic gathers at all (bell_spmm docstring).

This is the TPU shape of the reference's fused GAT edge-kernel suite
(reference: src/codegen/cuda.h:504-953: SDDVV + inplace softmax + SpMM
with edge values as separate kernel launches over EDGE-SIZED buffers);
here the inter-kernel traffic is (nb, k) scalars only — the (S, hf)
slot-feature intermediate never touches HBM.

Hub nodes (deg > 128) run the SAME composition over their virtual
rows: the forward uses normalize=False to emit unnormalized
per-virtual-row partials that the executor merges with a blockwise
online-softmax rescale (tiny (n_big)-sized segment ops); backward
pass-1 recomputes probabilities from the node-level (m, s) broadcast
per virtual row, so its partials (and pass-2's [dx | dvl] rows) just
segment-sum per node (ops/attention.py hub branches).

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
    BLK, BellPlan, bell_spmm_planned, block_specs, stage_blocks,
    _oh_iota, _OH_TILE,
)

_NEG = -1e30


def _lrelu(z, slope):
    return jnp.where(z > 0, z, slope * z)


def plan_slot_rows(plan: BellPlan):
    """(C, r, k) absolute table-row id of every slot, reconstructed on
    device from the plan (blocks[c, locals // 8] * 8 + locals % 8) —
    lets the wrappers pre-gather per-slot scalar columns in XLA."""
    c_chunks, u = plan.blocks.shape
    loc = plan.locals_
    blk = jnp.take_along_axis(
        plan.blocks, (loc // BLK).reshape(c_chunks, -1), axis=1
    )
    return (blk * BLK + (loc % BLK).reshape(c_chunks, -1)).reshape(loc.shape)


def _slot_scalars(plan: BellPlan, tab, lo: int, width: int):
    """(nb, k, width) f32 per-slot gather of tab[:, lo:lo+width] in XLA."""
    rows = plan_slot_rows(plan).reshape(-1)
    g = tab[rows, lo : lo + width].astype(jnp.float32)
    return g.reshape(-1, plan.k, width)[: plan.nb]


# ---------------------------------------------------------------- #
# slot_dots: the per-slot feature-dot kernel (staged SDDMM)
# ---------------------------------------------------------------- #

def _dots_kernel(bc_ref, bn_ref, locals_ref, rows_ref, tab_hbm, out_ref,
                 staged, sems, *, u, k, lo, fo, k_pad):
    """dp[v, j] = < rows_v, tab[slot_vj, lo:lo+fo] >: per u8-tile,
    G = rows @ tab_cols^T on the MXU, then rowsum(hit_j * G) per slot."""
    r = locals_ref.shape[1]
    u8 = u * BLK
    tab = stage_blocks(bc_ref, bn_ref, tab_hbm, staged, sems, u)
    locals_ = locals_ref[0]                       # (r, k)
    rows = rows_ref[0].astype(jnp.float32)        # (r, fo_pad) [:fo used]

    acc = jnp.zeros((r, k), jnp.float32)
    for off in range(0, u8, _OH_TILE):
        t = min(_OH_TILE, u8 - off)
        iota = _oh_iota(r, t, off)
        g_t = jax.lax.dot_general(
            rows[:, :fo], tab[off : off + t, lo : lo + fo].astype(
                jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                          # (r, t)
        dt = []
        for j in range(k):
            hit = (locals_[:, j][:, None] == iota).astype(jnp.float32)
            dt.append(jnp.sum(hit * g_t, axis=1, keepdims=True))
        acc = acc + jnp.concatenate(dt, axis=1)
    if k_pad > k:
        acc = jnp.concatenate(
            [acc, jnp.zeros((r, k_pad - k), jnp.float32)], axis=1)
    out_ref[...] = acc


def slot_dots_planned(plan: BellPlan, tab, rows_mat,
                      col_range: tuple[int, int],
                      interpret: bool = False):
    """dp (nb, k) f32 with dp[v, j] = <rows_mat[v], tab[slot_vj,
    lo:hi]> for one planned bin segment — the slot-wise SDDMM of the
    GAT backward, block-DMA staged like bell_spmm."""
    n, f_pad = tab.shape
    assert f_pad % 128 == 0 and n >= plan.n_need, (tab.shape, plan.n_need)
    lo, hi = col_range
    fo = hi - lo
    r, k, u, c_chunks, nb = plan.r, plan.k, plan.u, plan.c_chunks, plan.nb
    k_pad = ((k + 127) // 128) * 128
    fo_pad = ((fo + 127) // 128) * 128
    rows_pad = jnp.zeros((c_chunks * r, fo_pad), jnp.float32)
    rows_pad = rows_pad.at[:nb, :fo].set(rows_mat.astype(jnp.float32))
    blocks3 = plan.blocks.reshape(c_chunks, 1, u)

    kern = functools.partial(_dots_kernel, u=u, k=k, lo=lo, fo=fo,
                             k_pad=k_pad)
    out = pl.pallas_call(
        kern,
        grid=(c_chunks,),
        in_specs=block_specs(c_chunks, u) + [
            pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
            pl.BlockSpec((1, r, fo_pad), lambda c: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((r, k_pad), lambda c: (c, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, u * BLK, f_pad), tab.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        out_shape=jax.ShapeDtypeStruct((c_chunks * r, k_pad), jnp.float32),
        interpret=interpret,
    )(blocks3, blocks3,
      plan.locals_.reshape(c_chunks, r, k),
      rows_pad.reshape(c_chunks, r, fo_pad),
      tab)
    return out[:nb, :k]


# ---------------------------------------------------------------- #
# attention passes as compositions
# ---------------------------------------------------------------- #

def attn_fwd_planned(plan: BellPlan, xx, w, vr_rows, hf: int, nh: int,
                     slope: float, interpret: bool = False,
                     normalize: bool = True, precision=None):
    """Fused attention forward for one pre-planned k-wide bin segment.

    xx: (n', f_pad) padded [x | vl] table (f_pad % 128 == 0, rows cover
    plan.n_need); w: (nb, k) slot occupancy; vr_rows: (nb, nh) dst-side
    scores in bin order.  Returns (out (nb, hf), m (nb, nh), s (nb, nh)).

    normalize=False: hub-class mode — per-virtual-row UNNORMALIZED
    partials (see module docstring); vr_rows must carry the owning
    node's vr per virtual row and the caller merges rows with
    exp(m_v - M) rescaling."""
    n, f_pad = xx.shape
    assert f_pad % 128 == 0 and n >= plan.n_need, (xx.shape, plan.n_need)
    nb = plan.nb
    fh = hf // nh
    vls = _slot_scalars(plan, xx, hf, nh)         # (nb, k, nh)

    outs, ms, ss = [], [], []
    for h in range(nh):
        zpre = vls[:, :, h] + vr_rows[:, h : h + 1].astype(jnp.float32)
        z = jnp.where(w != 0, _lrelu(zpre, slope), _NEG)
        m = jnp.max(z, axis=1)
        if normalize:
            m = jnp.maximum(m, _NEG / 2)
        p = jnp.where(w != 0, jnp.exp(z - m[:, None]), 0.0)
        s = jnp.sum(p, axis=1)
        if normalize:
            s = jnp.where(s > 0, s, 1.0)
            p = p / s[:, None]
        outs.append(bell_spmm_planned(
            plan, xx, p, precision=precision, interpret=interpret,
            col_range=(h * fh, (h + 1) * fh),
            out_dtype=xx.dtype if normalize else jnp.float32,
        ))
        ms.append(m[:, None])
        ss.append(s[:, None])
    out = jnp.concatenate(outs, axis=1) if nh > 1 else outs[0]
    if not normalize:
        out = out.astype(jnp.float32)
    return (out, jnp.concatenate(ms, axis=1)[:nb],
            jnp.concatenate(ss, axis=1)[:nb])


def attn_bwd1_planned(plan: BellPlan, xx, w, vr_rows, dout_rows, m_rows,
                      s_rows, hf: int, nh: int, slope: float,
                      interpret: bool = False):
    """Fused backward pass-1 for one planned bin segment: returns
    (sds, a, b) each (nb, nh) — the accumulators _attn_bwd_chunked
    needs (dvr = a - sds*b; sds feeds pass 2).  p is recomputed from
    the saved per-node (m, s) (ops/attention._head_bwd_stats math);
    dp comes from the slot_dots kernel."""
    n, f_pad = xx.shape
    assert f_pad % 128 == 0 and n >= plan.n_need, (xx.shape, plan.n_need)
    fh = hf // nh
    vls = _slot_scalars(plan, xx, hf, nh)         # (nb, k, nh)

    sds_h, a_h, b_h = [], [], []
    for h in range(nh):
        dp = slot_dots_planned(
            plan, xx, dout_rows[:, h * fh : (h + 1) * fh],
            col_range=(h * fh, (h + 1) * fh), interpret=interpret)
        zpre = vls[:, :, h] + vr_rows[:, h : h + 1].astype(jnp.float32)
        z = jnp.where(w != 0, _lrelu(zpre, slope), _NEG)
        p = jnp.where(
            w != 0,
            jnp.exp(z - m_rows[:, h : h + 1]) / s_rows[:, h : h + 1],
            0.0,
        )
        lr = jnp.where(zpre > 0, 1.0, slope)
        sds_h.append(jnp.sum(p * dp, axis=1, keepdims=True))
        a_h.append(jnp.sum(p * dp * lr, axis=1, keepdims=True))
        b_h.append(jnp.sum(p * lr, axis=1, keepdims=True))
    cat = lambda xs: jnp.concatenate(xs, axis=1)
    return cat(sds_h), cat(a_h), cat(b_h)


def attn_bwd2_planned(plan: BellPlan, wtab, w, x_rows, vl_rows, hf: int,
                      nh: int, slope: float, interpret: bool = False):
    """Fused backward pass-2 for one planned transpose-side bin segment:
    returns (nb, hf + nh) = [dx | dvl] rows (t-bin order)
    (ops/attention._slot_grads math).

    wtab: (n', f_pad) padded [dout | vr | m | s | sds] destination table
    (f_pad % 128 == 0, rows cover plan.n_need); x_rows/vl_rows: this
    segment's source-node features / left scores in t-bin order."""
    n, f_pad = wtab.shape
    assert f_pad % 128 == 0 and n >= plan.n_need, (wtab.shape, plan.n_need)
    fh = hf // nh
    sg = _slot_scalars(plan, wtab, hf, 4 * nh)    # (nb, k, 4nh)

    dx_h, dvl_h = [], []
    for h in range(nh):
        dp = slot_dots_planned(
            plan, wtab, x_rows[:, h * fh : (h + 1) * fh],
            col_range=(h * fh, (h + 1) * fh), interpret=interpret)
        vr_g = sg[:, :, h]
        m_g = sg[:, :, nh + h]
        # pad slots never hit the mask branch but keep s=1-safe anyway
        s_g = jnp.where(sg[:, :, 2 * nh + h] != 0, sg[:, :, 2 * nh + h],
                        1.0)
        sds_g = sg[:, :, 3 * nh + h]
        zpre = vl_rows[:, h : h + 1].astype(jnp.float32) + vr_g
        z = jnp.where(w != 0, _lrelu(zpre, slope), _NEG)
        p = jnp.where(w != 0, jnp.exp(z - m_g) / s_g, 0.0)
        ds = p * (dp - sds_g)
        dz = ds * jnp.where(zpre > 0, 1.0, slope)
        dx_h.append(bell_spmm_planned(
            plan, wtab, p, interpret=interpret,
            col_range=(h * fh, (h + 1) * fh), out_dtype=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ))
        dvl_h.append(jnp.sum(dz, axis=1)[:, None])
    dx = jnp.concatenate(dx_h, axis=1) if nh > 1 else dx_h[0]
    dvl = jnp.concatenate(dvl_h, axis=1) if nh > 1 else dvl_h[0]
    return jnp.concatenate([dx.astype(jnp.float32), dvl], axis=1)
