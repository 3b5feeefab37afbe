"""Fused Pallas attention forward for binned-ELL bin segments.

One kernel per degree-class bin computes, for each chunk of virtual
rows, the ENTIRE fused-attention forward in VMEM: block-DMA staging of
the [x | vl] rows (multiple rows per descriptor, double-buffered across
grid steps — same plan machinery as ops.pallas.bell_spmm), in-VMEM slot
gather, per-head masked leaky-relu softmax, and the weighted feature
reduce.  No (S, hf+H) slot intermediate ever touches HBM — the XLA
chunked path (ops/attention._attn_fwd_chunked) streams that buffer
through HBM once per chunk; here it lives only in VMEM.

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

from gala_tpu.ops.pallas.bell_spmm import BLK, BellPlan, _vmem_gather

_NEG = -1e30
_STATS_LANES = 128  # m|s packed into one (r, 128) stats output


def _lrelu(z, slope):
    return jnp.where(z > 0, z, slope * z)


def _stage_blocks(blocks_ref, xx_hbm, staged, sems, u):
    """Double-buffered block-DMA staging: issue chunk c+1's copies into
    slot (c+1)%2, wait on chunk c's in slot c%2.  Returns the staged
    (u*BLK, f_pad) table view for the current chunk."""
    pid = pl.program_id(0)
    n_chunks = pl.num_programs(0)

    def issue_chunk(c, slot):
        def issue(i, _):
            pltpu.make_async_copy(
                xx_hbm.at[pl.ds(blocks_ref[c, i] * BLK, BLK), :],
                staged.at[slot, pl.ds(i * BLK, BLK), :],
                sems.at[slot],
            ).start()
            return 0

        jax.lax.fori_loop(0, u, issue, 0)

    def wait_chunk(slot):
        def wait(i, _):
            pltpu.make_async_copy(
                xx_hbm.at[pl.ds(0, BLK), :],
                staged.at[slot, pl.ds(i * BLK, BLK), :],
                sems.at[slot],
            ).wait()
            return 0

        jax.lax.fori_loop(0, u, wait, 0)

    @pl.when(pid == 0)
    def _():
        issue_chunk(0, 0)

    @pl.when(pid + 1 < n_chunks)
    def _():
        issue_chunk(pid + 1, (pid + 1) % 2)

    wait_chunk(pid % 2)
    return staged[pid % 2]


def _kernel(blocks_ref, locals_ref, w_ref, vr_ref, xx_hbm,
            out_ref, stats_ref, staged, sems,
            *, u, k, hf, fh, nh, slope, f_pad, out_pad, normalize):
    """Grid step c: softmax-attend chunk c from staging slot c%2 while
    chunk c+1's block DMAs land in slot (c+1)%2.

    normalize=False computes UNNORMALIZED per-row partials for the hub
    class (acc = sum_k exp(z - m) * x with raw m = rowmax): virtual rows
    of one hub node combine afterwards with the standard blockwise
    online-softmax merge (exp(m_v - M) rescaling) in tiny XLA segment
    ops — the expensive slot gather + reduce stays in this kernel."""
    r = locals_ref.shape[1]
    tab = _stage_blocks(blocks_ref, xx_hbm, staged, sems, u)
    locals_ = locals_ref[0]                       # (r, k)
    w = w_ref[0]                                  # (r, k) occupancy mask
    vr = vr_ref[0]                                # (r, nh)
    seg = _vmem_gather(tab, locals_.reshape(-1)).reshape(r, k, f_pad)

    outs, ms, ss = [], [], []
    for h in range(nh):
        z = seg[..., hf + h].astype(jnp.float32) + vr[:, h][:, None].astype(
            jnp.float32
        )
        z = jnp.where(w != 0, _lrelu(z, slope), _NEG)
        m = jnp.max(z, axis=1)
        if normalize:
            m = jnp.maximum(m, _NEG / 2)
        p = jnp.where(w != 0, jnp.exp(z - m[:, None]), 0.0)
        s = jnp.sum(p, axis=1)
        if normalize:
            s = jnp.where(s > 0, s, 1.0)
            p = p / s[:, None]
        # batched-contraction einsums do not lower in Mosaic — the
        # weighted reduce runs as broadcast-mult + middle-axis sum
        outs.append(
            jnp.sum(
                p[..., None]
                * seg[..., h * fh : (h + 1) * fh].astype(jnp.float32),
                axis=1,
            )
        )
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
                     normalize: bool = True):
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c_chunks,),
        in_specs=[
            pl.BlockSpec((1, r, k), lambda c, blocks: (c, 0, 0)),
            pl.BlockSpec((1, r, k), lambda c, blocks: (c, 0, 0)),
            pl.BlockSpec((1, r, nh), lambda c, blocks: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((r, out_pad), lambda c, blocks: (c, 0)),
            pl.BlockSpec((r, _STATS_LANES), lambda c, blocks: (c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, u * BLK, f_pad), xx.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(
        _kernel, u=u, k=k, hf=hf, fh=fh, nh=nh, slope=float(slope),
        f_pad=f_pad, out_pad=out_pad, normalize=normalize,
    )
    out, stats = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
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
        plan.blocks,
        plan.locals_.reshape(c_chunks, r, k),
        w_pad.reshape(c_chunks, r, k),
        vr_pad.reshape(c_chunks, r, nh),
        xx,
    )
    m = stats[:nb, :nh]
    s = stats[:nb, nh : 2 * nh]
    return out[:nb, :hf], m, s


def _bwd1_kernel(blocks_ref, locals_ref, w_ref, aux_ref, xx_hbm,
                 stats_ref, staged, sems,
                 *, u, k, hf, fh, nh, slope, f_pad):
    """Backward pass-1 (forward layout): per-destination-row stats
      sds = sum_k p*dp,  A = sum p*dp*lrelu',  B = sum p*lrelu'
    with p recomputed from the saved per-node (m, s)
    (ops/attention._head_bwd_stats math).  aux rows pack
    [dout (hf) | vr (nh) | m (nh) | s (nh)]."""
    r = locals_ref.shape[1]
    tab = _stage_blocks(blocks_ref, xx_hbm, staged, sems, u)
    locals_ = locals_ref[0]                       # (r, k)
    w = w_ref[0]                                  # (r, k)
    aux = aux_ref[0]                              # (r, a_pad)
    seg = _vmem_gather(tab, locals_.reshape(-1)).reshape(r, k, f_pad)

    outs = []
    for h in range(nh):
        vr_h = aux[:, hf + h][:, None].astype(jnp.float32)
        m_h = aux[:, hf + nh + h][:, None].astype(jnp.float32)
        s_h = aux[:, hf + 2 * nh + h][:, None].astype(jnp.float32)
        zpre = seg[..., hf + h].astype(jnp.float32) + vr_h
        z = jnp.where(w != 0, _lrelu(zpre, slope), _NEG)
        p = jnp.where(w != 0, jnp.exp(z - m_h) / s_h, 0.0)
        do = aux[:, h * fh : (h + 1) * fh].astype(jnp.float32)
        dp = jnp.sum(
            seg[..., h * fh : (h + 1) * fh].astype(jnp.float32)
            * do[:, None, :],
            axis=-1,
        )
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c_chunks,),
        in_specs=[
            pl.BlockSpec((1, r, k), lambda c, blocks: (c, 0, 0)),
            pl.BlockSpec((1, r, k), lambda c, blocks: (c, 0, 0)),
            pl.BlockSpec((1, r, a_pad), lambda c, blocks: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((r, _STATS_LANES), lambda c, blocks: (c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, u * BLK, f_pad), xx.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(
        _bwd1_kernel, u=u, k=k, hf=hf, fh=fh, nh=nh, slope=float(slope),
        f_pad=f_pad,
    )
    (stats,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c_chunks * r, _STATS_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(
        plan.blocks,
        plan.locals_.reshape(c_chunks, r, k),
        w_pad.reshape(c_chunks, r, k),
        aux.reshape(c_chunks, r, a_pad),
        xx,
    )
    # stats columns are interleaved per head: [sds_h, a_h, b_h] * nh
    st = stats[:nb, : 3 * nh].reshape(nb, nh, 3)
    return st[..., 0], st[..., 1], st[..., 2]


def _bwd2_kernel(blocks_ref, locals_ref, w_ref, aux_ref, wtab_hbm,
                 out_ref, staged, sems,
                 *, u, k, hf, fh, nh, slope, f_pad, out_pad):
    """Backward pass-2 (transpose layout): slot gradients for all heads
    (ops/attention._slot_grads math).  Gathered rows are the
    destination-side [dout | vr | m | s | sds] table; aux rows pack this
    source node's [x (hf) | vl (nh)]."""
    r = locals_ref.shape[1]
    tab = _stage_blocks(blocks_ref, wtab_hbm, staged, sems, u)
    locals_ = locals_ref[0]                       # (r, k)
    w = w_ref[0]                                  # (r, k)
    aux = aux_ref[0]                              # (r, a_pad) [x | vl]
    seg = _vmem_gather(tab, locals_.reshape(-1)).reshape(r, k, f_pad)

    dx_h, dvl_h = [], []
    for h in range(nh):
        do = seg[..., h * fh : (h + 1) * fh].astype(jnp.float32)
        vr_g = seg[..., hf + h].astype(jnp.float32)
        m_g = seg[..., hf + nh + h].astype(jnp.float32)
        s_g = seg[..., hf + 2 * nh + h].astype(jnp.float32)
        sds_g = seg[..., hf + 3 * nh + h].astype(jnp.float32)
        vl_c = aux[:, hf + h][:, None].astype(jnp.float32)
        x_c = aux[:, h * fh : (h + 1) * fh].astype(jnp.float32)
        zpre = vl_c + vr_g
        z = jnp.where(w != 0, _lrelu(zpre, slope), _NEG)
        p = jnp.where(w != 0, jnp.exp(z - m_g) / s_g, 0.0)
        dp = jnp.sum(do * x_c[:, None, :], axis=-1)
        ds = p * (dp - sds_g)
        dz = ds * jnp.where(zpre > 0, 1.0, slope)
        dx_h.append(jnp.sum(p[..., None] * do, axis=1))
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c_chunks,),
        in_specs=[
            pl.BlockSpec((1, r, k), lambda c, blocks: (c, 0, 0)),
            pl.BlockSpec((1, r, k), lambda c, blocks: (c, 0, 0)),
            pl.BlockSpec((1, r, a_pad), lambda c, blocks: (c, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((r, out_pad), lambda c, blocks: (c, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, u * BLK, f_pad), wtab.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kern = functools.partial(
        _bwd2_kernel, u=u, k=k, hf=hf, fh=fh, nh=nh, slope=float(slope),
        f_pad=f_pad, out_pad=out_pad,
    )
    (out,) = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c_chunks * r, out_pad), jnp.float32),
        ],
        interpret=interpret,
    )(
        plan.blocks,
        plan.locals_.reshape(c_chunks, r, k),
        w_pad.reshape(c_chunks, r, k),
        aux.reshape(c_chunks, r, a_pad),
        wtab,
    )
    return out[:nb, : hf + nh]
