"""Benchmark entry point — prints ONE JSON line (plus an optional
enriched second line when the wall-clock budget allows).

Metric: full-graph GCN training throughput in edges/second (per-epoch
aggregated edges / mean epoch time, the reference's timing protocol:
mean over epochs after a 5-epoch warmup, reference:
src/codegen/common.h:1494-1587).

vs_baseline: ratio against a DGL-equivalent XLA baseline implementing the
same model with naive (unfused, gather/scatter autodiff) ops — the
stand-in for the reference's DGL comparison until real GALA numbers can
be produced on shared hardware (the repo publishes none, BASELINE.md).

Contract discipline (round-2 lesson: rc=124 with nothing printed):
  1. the health probe checks COMPILE health (jit a trivial fn in a
     60s subprocess), not just device enumeration — a half-dead tunnel
     enumerates fine but hangs every compile;
  2. the headline JSON line prints the moment the two core sections
     (compiled GCN + naive baseline) finish;
  3. extras (BCOO baseline, GAT, roofline) only run if the elapsed
     wall-clock is under GALA_BENCH_BUDGET_S (default 900 s), and
     append a second, enriched JSON line that is also contract-valid.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

_T0 = time.time()
BUDGET_S = float(os.environ.get("GALA_BENCH_BUDGET_S", "900"))

# The axon TPU tunnel can die mid-session in two ways: (a) fully dead —
# backend init hangs; (b) half-dead — device enumeration works but every
# compile hangs or 500s.  Probe BOTH in a throwaway subprocess BEFORE
# importing jax here; on failure fall back to CPU (sitecustomize never
# registers axon when PALLAS_AXON_POOL_IPS is empty) and report the
# backend in the JSON line so a CPU number is never mistaken for a TPU
# number.
_PROBE_SRC = (
    "import jax, jax.numpy as jnp; "
    "r = jax.jit(lambda x: (x @ x).sum())(jnp.ones((128, 128))); "
    "r.block_until_ready(); print('ok')"
)
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "axon" not in _plat:
    pass  # caller explicitly pinned a non-TPU platform (e.g. cpu)
else:
    try:
        subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=120, check=True, capture_output=True,
        )
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        # sitecustomize already registered the (dead) axon platform in
        # this interpreter — env vars alone can't unregister it, so
        # re-exec with the axon opt-out set from interpreter start
        os.environ["PALLAS_AXON_POOL_IPS"] = ""
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["GALA_BENCH_BACKEND_NOTE"] = (
            "cpu-fallback (TPU tunnel compile-dead)"
        )
        os.execv(sys.executable, [sys.executable] + sys.argv)
_BACKEND_NOTE = os.environ.pop("GALA_BENCH_BACKEND_NOTE", "default")

import jax
import jax.numpy as jnp
import numpy as np


def _baseline_forward(params, a_indices, a_vals, n, x):
    """DGL-style naive path: autodiff scatter/gather, no transpose-graph
    routing, no invariant hoisting — what the reference baselines do."""
    src, dst = a_indices
    deg = jax.ops.segment_sum(jnp.ones_like(a_vals), dst, num_segments=n)
    norm = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1.0)), 0.0)[:, None]
    h = x
    for li, p in enumerate(params["fc"]):
        h = norm * h
        msg = a_vals[:, None] * h[src]
        h = jax.ops.segment_sum(msg, dst, num_segments=n)
        h = h @ p["w"] + p["b"]
        h = norm * h
        if li == 0:
            h = jax.nn.relu(h)
    return h


def main():
    import argparse

    import optax

    from gala_tpu.data.datasets import load_dataset
    from gala_tpu.dsl.parser import parse_source
    from gala_tpu.lowering.lower import lower
    from __graft_entry__ import GCN_DSL

    ap = argparse.ArgumentParser()
    # one dtype applied to BOTH the compiled path and the naive baseline,
    # so vs_baseline isolates compiler quality from precision choice
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    act_dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    # Arxiv-shaped graph (169k nodes, 1.17M edges, 128 feats, 40 classes)
    # cpu-fallback runs shrink the workload so the JSON contract is met
    # in minutes, not the ~40min a full-scale CPU sweep takes (the
    # numbers are labeled by the "backend" field either way)
    on_cpu = _BACKEND_NOTE != "default"
    data = load_dataset("Arxiv", scale=0.25 if on_cpu else 1.0)
    g_host, feats, labels, masks = data
    n_edges = g_host.n_edges
    iters, warmup = (10, 2) if on_cpu else (30, 5)

    # ---- core section 1: gala_tpu compiled path ------------------------ #
    spec = parse_source(GCN_DSL)
    # bf16 activations: the TPU-native precision choice (params/loss stay
    # f32); accuracy parity is asserted in tests and the verify flow
    cm = lower(spec, mode="train", data=data, dtype=act_dtype)
    # mean ± std over 3 independent timed runs (executable cached after
    # the first): single-run epoch numbers drifted 7% across the r4
    # bench invocations (199.5 -> 186.1 M edges/s on identical config,
    # VERDICT r4 #7) — report the spread so single-run deltas inside it
    # are never read as regressions.  Reference protocol analog:
    # calc_mean_std, /root/reference/tests/common.h:584-632.
    runs = [cm.train(iters=iters, warmup=warmup).total_time]
    if not on_cpu:
        for _ in range(2):
            runs.append(cm.train(iters=iters, warmup=warmup).total_time)
    gala_epoch = float(np.mean(runs))
    gala_std_pct = (
        100.0 * float(np.std(runs)) / gala_epoch if gala_epoch else 0.0
    )

    # ---- core section 2: naive baseline path --------------------------- #
    n = g_host.n_rows
    src = jnp.asarray(g_host.src.astype(np.int32))
    dst = jnp.asarray(g_host.dst.astype(np.int32))
    vals = jnp.asarray(g_host.vals)
    x = jnp.asarray(feats).astype(act_dtype)
    y = jnp.asarray(labels)
    tm = jnp.asarray(masks["train"])
    rng = jax.random.key(0)
    k1, k2 = jax.random.split(rng)
    f, h, c = feats.shape[1], 32, int(labels.max()) + 1
    params = {
        "fc": [
            {"w": jax.random.uniform(k1, (f, h), jnp.float32, -1 / f**0.5, 1 / f**0.5),
             "b": jnp.zeros((h,))},
            {"w": jax.random.uniform(k2, (h, c), jnp.float32, -1 / h**0.5, 1 / h**0.5),
             "b": jnp.zeros((c,))},
        ]
    }
    tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(0.01))
    opt_state = tx.init(params)

    @jax.jit
    def base_step(params, opt_state):
        def loss_fn(p):
            logits = _baseline_forward(p, (src, dst), vals, n, x)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
            m = tm.astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    from gala_tpu.utils.timing import EpochTimer

    timer = EpochTimer()
    loss = None
    for i in range(iters):
        if i == warmup:
            timer.start(fence_on=loss)
        params, opt_state, loss = base_step(params, opt_state)
    base_epoch = timer.stop(loss, n=iters - warmup)

    edges_per_s = n_edges / gala_epoch if gala_epoch > 0 else 0.0
    backend = (
        jax.default_backend() if _BACKEND_NOTE == "default" else _BACKEND_NOTE
    )
    headline = {
        "metric": "gcn_arxiv_train_edges_per_s",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(base_epoch / gala_epoch, 3) if gala_epoch else 0.0,
        "dtype": args.dtype,
        "backend": backend,
        "std_pct": round(gala_std_pct, 2),
        "runs": len(runs),
    }
    # CONTRACT: the headline prints NOW — everything below is optional.
    print(json.dumps(headline), flush=True)

    if time.time() - _T0 > BUDGET_S:
        return

    # ---- extra 1: stock-library baseline: jax.experimental.sparse ------ #
    # The same GCN written the way a plain-JAX user would: adjacency as a
    # BCOO matrix, aggregation as `A @ X`.  Unlike the hand-written naive
    # baseline above, this code is not ours — it is what the ecosystem
    # ships — so vs_bcoo is a non-self-authored comparison point
    # (reference analog: the DGL/SeaStar/SparseTIR external baselines,
    # tests/Baselines/**).
    from jax.experimental import sparse as jsparse

    a_bcoo = jsparse.BCOO(
        (vals.astype(act_dtype), jnp.stack([dst, src], axis=1)), shape=(n, n)
    )

    def _bcoo_forward(p, h):
        deg = jax.ops.segment_sum(jnp.ones_like(vals), dst, num_segments=n)
        norm = jnp.where(deg > 0, jax.lax.rsqrt(jnp.maximum(deg, 1.0)), 0.0)
        norm = norm[:, None].astype(h.dtype)
        for li, layer in enumerate(p["fc"]):
            h = norm * h
            h = a_bcoo @ h
            h = h @ layer["w"] + layer["b"]
            h = norm * h
            if li == 0:
                h = jax.nn.relu(h)
        return h

    params_b = jax.tree.map(lambda a: a, params)  # fresh copy, same init
    opt_state_b = tx.init(params_b)

    @jax.jit
    def bcoo_step(params, opt_state):
        def loss_fn(p):
            logits = _bcoo_forward(p, x)
            logp = jax.nn.log_softmax(logits)
            nll = -jnp.take_along_axis(logp, y[:, None], 1)[:, 0]
            m = tm.astype(jnp.float32)
            return jnp.sum(nll * m) / jnp.maximum(jnp.sum(m), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    try:
        timer_b = EpochTimer()
        loss_b = None
        for i in range(iters):
            if i == warmup:
                timer_b.start(fence_on=loss_b)
            params_b, opt_state_b, loss_b = bcoo_step(params_b, opt_state_b)
        bcoo_epoch = timer_b.stop(loss_b, n=iters - warmup)
    except Exception:
        bcoo_epoch = 0.0  # BCOO unsupported on this backend: omit the row

    # ---- roofline accounting (BASELINE.md: "SpMM GB/s per chip
    # approaching HBM speed-of-light").  Dominant epoch traffic is the
    # slot gathers of the 4 aggregation sweeps (2 layers forward + 2
    # transpose backward); XLA:TPU reads a full 128-lane physical row
    # per gathered slot, so bytes = slots x phys(width) x itemsize.
    # v5e HBM speed-of-light ~819 GB/s. ------------------------------- #
    def _phys(f):
        return ((f + 127) // 128) * 128

    g0 = cm.full_graphs[0]
    itemsize = jnp.dtype(act_dtype).itemsize
    f0 = int(cm.x.shape[1])
    hid = int(spec.output_sizes[0])
    ncls = int(cm.n_classes)
    if g0.bell is not None:
        s_f = int(g0.bell.flat_cols.shape[0])
        s_b = int(g0.t_bell.flat_cols.shape[0])
    else:
        s_f = s_b = int(g0.e_pad)
    bytes_epoch = itemsize * (
        s_f * (_phys(f0) + _phys(hid))       # fwd gathers, layer 1 + 2
        + s_b * (_phys(hid) + _phys(ncls))   # bwd transpose gathers
    )
    gbps = bytes_epoch / gala_epoch / 1e9 if gala_epoch > 0 else 0.0
    HBM_SOL_GBPS = 819.0

    enriched = dict(headline)
    enriched.update(
        vs_bcoo=round(bcoo_epoch / gala_epoch, 3)
        if gala_epoch and bcoo_epoch else 0.0,
        gather_gbps=round(gbps, 1),
        pct_hbm_sol=round(100.0 * gbps / HBM_SOL_GBPS, 1),
    )

    if time.time() - _T0 > BUDGET_S:
        print(json.dumps(enriched), flush=True)
        return

    # ---- extra 2: second model row: GAT (same dataset/protocol) -------- #
    from __graft_entry__ import GAT_DSL

    try:
        gat_spec = parse_source(GAT_DSL)
        cm_gat = lower(gat_spec, mode="train", data=data, dtype=act_dtype)
        res_gat = cm_gat.train(iters=iters, warmup=warmup)
        gat_epoch = res_gat.total_time
        enriched.update(
            gat_edges_per_s=round(n_edges / gat_epoch, 1) if gat_epoch else 0.0,
            gat_vs_gcn_epoch=round(gat_epoch / gala_epoch, 2) if gala_epoch else 0.0,
        )
    except Exception:
        pass  # GAT row is optional; the enriched line still prints

    if on_cpu or time.time() - _T0 > BUDGET_S:
        print(json.dumps(enriched), flush=True)
        return

    # ---- extra 3: above-the-cliff config (Products-0.25 GCN) ----------- #
    # The arxiv headline's feature table (~43MB) sits BELOW the ~96MB
    # gather cliff, where the XLA gather is already fast and the fused
    # Pallas bell kernels deliberately do not engage — so the headline
    # cannot show the kernel win (VERDICT r3).  This config is above the
    # cliff; the fields record which executor actually ran (segments
    # with a live plan + fraction of slots they cover) and the
    # percentage of HBM speed-of-light computed from the bytes each path
    # ACTUALLY moves (planned segments DMA c_chunks*u8 staged rows — the
    # reuse factor — while XLA segments gather one row per slot).
    def _side_stats(bell):
        """(slots_total, slots_planned, row_reads): row_reads is the
        number of physical feature-row reads the side actually
        issues (planned segments read c_chunks*u8 staged rows)."""
        total = planned = reads = 0
        plans = bell.pallas_plans or (None,) * (
            len(bell.bin_ks) + (1 if bell.n_big else 0)
        )
        sizes = [
            (k, nb) for k, nb in zip(bell.bin_ks, bell.bin_counts)
        ]
        if bell.n_big:
            sizes.append((bell.big_vals.shape[1], bell.big_vals.shape[0]))
        for (k, nb), pn in zip(sizes, plans):
            s = nb * k
            total += s
            if pn is not None:
                planned += s
                reads += pn.c_chunks * pn.u * 8
            else:
                reads += s
        return total, planned, reads

    try:
        data_p = load_dataset("Products", scale=0.25)
        gp_host = data_p[0]
        cm_p = lower(spec, mode="train", data=data_p, dtype=act_dtype)
        res_p = cm_p.train(iters=15, warmup=3)
        p_epoch = res_p.total_time
        gp = cm_p.full_graphs[0]

        sf, pf, rf = _side_stats(gp.bell)
        sb, pb, rb_ = _side_stats(gp.t_bell)
        f0p = int(cm_p.x.shape[1])
        hidp = int(spec.output_sizes[0])
        nclsp = int(cm_p.n_classes)
        bytes_p = itemsize * (
            rf * (_phys(f0p) + _phys(hidp))
            + rb_ * (_phys(hidp) + _phys(nclsp))
        )
        gbps_p = bytes_p / p_epoch / 1e9 if p_epoch > 0 else 0.0
        enriched.update(
            products_edges_per_s=round(gp_host.n_edges / p_epoch, 1)
            if p_epoch else 0.0,
            products_pallas_slot_frac=round(
                (pf + pb) / max(sf + sb, 1), 3
            ),
            products_gather_gbps=round(gbps_p, 1),
            products_pct_hbm_sol=round(100.0 * gbps_p / HBM_SOL_GBPS, 1),
        )
        # free the Products device buffers (graph tables + features are
        # GBs) before the RGG sections — holding every section's model
        # alive exhausted HBM on the engaged RGG arm in r5 bench2
        del cm_p, res_p, gp
        import gc; gc.collect()
    except Exception:
        pass  # Products row is optional; the enriched line still prints

    if time.time() - _T0 > BUDGET_S:
        print(json.dumps(enriched), flush=True)
        return

    # ---- extra 4: locality-bearing config (RGG2D) + Pallas A/B --------- #
    # The R-MAT community stand-ins measure staged-row reuse 0.13-0.19 on
    # every segment, so the per-segment break-even gate correctly keeps
    # them on XLA and products_pallas_slot_frac reads 0.0.  The geometric
    # generator family (reference: src/utils/generator.h generate_rgg2D)
    # with Morton-order node ids measures reuse ~3.4 on the dominant
    # segments — the ONE config where the fused Pallas kernels engage
    # end-to-end (84% of slots planned).  The same-graph A/B (VERDICT r4
    # #1; reference analog: the coarsened-kernel vs cuSPARSE dispatch,
    # /root/reference/src/codegen/cuda.h:211-279 vs :282-436) measured
    # the engaged path at 0.71x the XLA executors (73.2 vs 102.7M
    # edges/s, r5) — so the DEFAULT is the XLA path (rgg_edges_per_s)
    # and the engaged run under GALA_PALLAS_AUTO=1 reports the
    # negative-result ratio explicitly.
    try:
        data_r = load_dataset("RGG2D")
        cm_r = lower(spec, mode="train", data=data_r, dtype=act_dtype)
        res_r = cm_r.train(iters=15, warmup=3)
        r_epoch = res_r.total_time
        gr = cm_r.full_graphs[0]
        sf, pf, rf = _side_stats(gr.bell)
        sb, pb, rb2 = _side_stats(gr.t_bell)
        f0r = int(cm_r.x.shape[1])
        nclsr = int(cm_r.n_classes)
        bytes_r = itemsize * (
            rf * (_phys(f0r) + _phys(hid))
            + rb2 * (_phys(hid) + _phys(nclsr))
        )
        gbps_r = bytes_r / r_epoch / 1e9 if r_epoch > 0 else 0.0
        enriched.update(
            rgg_edges_per_s=round(data_r[0].n_edges / r_epoch, 1)
            if r_epoch else 0.0,
            rgg_gather_gbps=round(gbps_r, 1),
            rgg_pct_hbm_sol=round(100.0 * gbps_r / HBM_SOL_GBPS, 1),
        )
        # free the XLA-arm model before compiling the engaged arm (the
        # two RGG models + plan tables do not fit HBM together)
        del cm_r, res_r, gr
        import gc; gc.collect()

        # engaged-path arm of the A/B (auto-selection forced back on)
        os.environ["GALA_PALLAS_AUTO"] = "1"
        try:
            cm_rp = lower(spec, mode="train", data=data_r, dtype=act_dtype)
            rp_epoch = cm_rp.train(iters=15, warmup=3).total_time
            grp = cm_rp.full_graphs[0]
            sfp, pfp, _ = _side_stats(grp.bell)
            sbp, pbp, _ = _side_stats(grp.t_bell)
        finally:
            os.environ.pop("GALA_PALLAS_AUTO", None)
        enriched.update(
            rgg_pallas_edges_per_s=round(data_r[0].n_edges / rp_epoch, 1)
            if rp_epoch else 0.0,
            rgg_pallas_slot_frac=round(
                (pfp + pbp) / max(sfp + sbp, 1), 3
            ),
            rgg_pallas_vs_xla=round(r_epoch / rp_epoch, 3)
            if r_epoch and rp_epoch else 0.0,
        )
    except Exception:
        pass  # RGG row is optional; the enriched line still prints

    print(json.dumps(enriched), flush=True)


if __name__ == "__main__":
    main()
