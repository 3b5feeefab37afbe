"""AOT export: a CompiledModel serialized to a standalone artifact.

The reference's codegen writes a standalone ``./gala_model`` executable
(reference: src/codegen/cuda.h writeCode -> gala.cu -> nvcc; the driver
compiles it once and re-runs it without the compiler).  The TPU-native
analog is ``jax.export``: the jitted training / inference steps
serialize to StableHLO with platform checks, and the loader replays
them with numpy + jax only — no parser, IR, passes, or kernel library
at run time.

Every exported function takes FLAT LISTS of arrays (params / optimizer
state / bound data), so the loader never needs the pytree definitions —
those are baked into the traced module at export time.

Artifact layout (a directory):

    manifest.json       protocol metadata: iters, valid_step, chunk
                        length, warmup, csv flags, leaf counts/dtypes,
                        platforms, format version
    step.jaxexport      one training epoch   (p, o, d) -> (p, o, loss)
    chunk.jaxexport     scanned K epochs     (p, o, d) -> (p, o, (K,))
    fwd.jaxexport       forward              (p, d) -> logits
    fwdchunk.jaxexport  scanned K forwards   (p, dep, d) -> dep
    acc.jaxexport       test accuracy        (p, d) -> scalar
    state.npz           p0..pN, o0..oM, d0..dK leaf arrays

The training protocol the loader replays matches gala_tpu.train (warmup
epochs excluded from timings, validation singles every ``valid_step``
epochs, runs between them fused into scanned chunks, accuracy evaluated
on parameter snapshots after the timed regions).  v1 scope: full-graph
epochs (no per-layer training subgraphs) and no per-epoch inputs.
"""
from __future__ import annotations

import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from gala_tpu.train import (
    TrainResult,
    make_optimizer,
    masked_accuracy,
    masked_cross_entropy,
)

FORMAT_VERSION = 1


# --------------------------------------------------------------------- #
# dtype-preserving leaf IO (np.savez cannot hold bfloat16 directly)
# --------------------------------------------------------------------- #
def _save_leaves(path: str, groups: dict[str, list]) -> dict[str, list[str]]:
    """Save {prefix: [leaf, ...]} as ``{prefix}{i}`` npz entries; returns
    {prefix: [dtype_str, ...]} for the manifest.  Non-numpy dtypes
    (bfloat16) are stored as same-width uint views."""
    arrays, dtypes = {}, {}
    for prefix, leaves in groups.items():
        dtypes[prefix] = []
        for i, leaf in enumerate(leaves):
            a = np.asarray(leaf)
            dtypes[prefix].append(str(a.dtype))
            try:
                np.dtype(str(a.dtype))  # numpy-native?
            except TypeError:
                a = a.view(np.dtype(f"uint{a.dtype.itemsize * 8}"))
            arrays[f"{prefix}{i}"] = a
    np.savez_compressed(path, **arrays)
    return dtypes


def _load_leaves(path: str, dtypes: dict[str, list[str]]) -> dict[str, list]:
    with np.load(path) as z:
        out = {}
        for prefix, dts in dtypes.items():
            leaves = []
            for i, dt in enumerate(dts):
                a = z[f"{prefix}{i}"]
                try:
                    want = np.dtype(dt)
                    if a.dtype != want:
                        a = a.astype(want)
                except TypeError:
                    import ml_dtypes

                    a = a.view(np.dtype(getattr(ml_dtypes, dt)))
                leaves.append(a)
            out[prefix] = leaves
    return out


# --------------------------------------------------------------------- #
# export
# --------------------------------------------------------------------- #
def export_compiled(
    cm,
    path: str,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
    seed: int = 0,
    chunk: int | None = None,
) -> str:
    """Serialize ``cm`` (a lowered CompiledModel) into ``path``.

    platforms: lowering targets baked into the artifact.  The default
    covers the real chip and the CPU fallback; Pallas strategies lower
    for TPU only — pass ``platforms=("tpu",)`` there.
    chunk: scanned-epoch fusion length (default: valid_step - 1, the
    run length between validation epochs).
    """
    from jax import export as jexport

    loop = cm.program.loop
    if cm.spec.compute.sample_dynamic:
        # per-epoch (_ra, _rb) sampling inputs cannot ride a serialized
        # artifact: the exported step would silently freeze one
        # neighborhood (interp's constant fallback) — a different model.
        # Same guard shape as parallel/compiled.shard_compiled.
        raise NotImplementedError(
            "export of dynamic-sampling programs is not supported: the "
            "artifact would train on one frozen neighborhood every epoch"
        )
    valid_step = loop.valid_step or 5
    if chunk is None:
        chunk = max(valid_step - 1, 1)

    params = cm.make_params(seed)
    tx = make_optimizer(loop.lr, loop.weight_decay)
    opt_state = tx.init(params)
    # the hoisted training-invariant prefix (code-motion product) runs
    # once here; its carry is baked into the artifact's bound data —
    # the loader never re-executes it (same as train.py running it
    # outside the timed loop)
    xc = cm.x
    if cm.invariant is not None:
        xc = jax.jit(cm.invariant)(cm.full_graphs, cm.x)
    data = (cm.full_graphs, xc, cm.labels, cm.train_mask, cm.test_mask)

    p_leaves, p_def = jax.tree_util.tree_flatten(params)
    o_leaves, o_def = jax.tree_util.tree_flatten(opt_state)
    d_leaves, d_def = jax.tree_util.tree_flatten(data)
    forward = cm.forward

    def _unpack(p_l, o_l, d_l):
        p = jax.tree_util.tree_unflatten(p_def, p_l)
        o = jax.tree_util.tree_unflatten(o_def, o_l) if o_l is not None else None
        graphs, x, y, tm, sm = jax.tree_util.tree_unflatten(d_def, d_l)
        return p, o, graphs, x, y, tm, sm

    def _loss(p, graphs, x, y, tm):
        return masked_cross_entropy(forward(p, graphs, x), y, tm)

    def _body(p, o, graphs, x, y, tm):
        loss, grads = jax.value_and_grad(_loss)(p, graphs, x, y, tm)
        updates, o2 = tx.update(grads, o, p)
        import optax

        return optax.apply_updates(p, updates), o2, loss

    def step_fn(p_l, o_l, d_l):
        p, o, graphs, x, y, tm, _ = _unpack(p_l, o_l, d_l)
        p2, o2, loss = _body(p, o, graphs, x, y, tm)
        return (
            jax.tree_util.tree_leaves(p2),
            jax.tree_util.tree_leaves(o2),
            loss,
        )

    def chunk_fn(p_l, o_l, d_l):
        p, o, graphs, x, y, tm, _ = _unpack(p_l, o_l, d_l)

        def body(carry, _):
            pc, oc = carry
            p2, o2, loss = _body(pc, oc, graphs, x, y, tm)
            return (p2, o2), loss

        (p, o), losses = jax.lax.scan(body, (p, o), None, length=chunk)
        return jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(o), losses

    def fwd_fn(p_l, d_l):
        p, _, graphs, x, _, _, _ = _unpack(p_l, None, d_l)
        return forward(p, graphs, x)

    def fwdchunk_fn(p_l, dep0, d_l):
        p, _, graphs, x, _, _, _ = _unpack(p_l, None, d_l)

        def body(dep, _):
            # thread the carry through one param leaf so XLA cannot
            # hoist the loop-invariant forward out of the scan (same
            # trick as gala_tpu.train.multi_fwd; underflows to zero)
            leaves = jax.tree_util.tree_leaves(p)
            leaves = [leaves[0] + (dep * 1e-38).astype(leaves[0].dtype)] + leaves[1:]
            p2 = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(p), leaves
            )
            lg = forward(p2, graphs, x)
            return jnp.mean(lg).astype(jnp.float32), None

        dep, _ = jax.lax.scan(body, dep0, None, length=chunk)
        return dep

    def acc_fn(p_l, d_l):
        p, _, graphs, x, y, _, sm = _unpack(p_l, None, d_l)
        return masked_accuracy(forward(p, graphs, x), y, sm)

    os.makedirs(path, exist_ok=True)
    dep0 = jnp.float32(0.0)
    exports = {
        "step": (step_fn, (p_leaves, o_leaves, d_leaves)),
        "chunk": (chunk_fn, (p_leaves, o_leaves, d_leaves)),
        "fwd": (fwd_fn, (p_leaves, d_leaves)),
        "fwdchunk": (fwdchunk_fn, (p_leaves, dep0, d_leaves)),
        "acc": (acc_fn, (p_leaves, d_leaves)),
    }
    for name, (fn, args) in exports.items():
        exp = jexport.export(jax.jit(fn), platforms=list(platforms))(*args)
        with open(os.path.join(path, f"{name}.jaxexport"), "wb") as f:
            f.write(exp.serialize())

    dtypes = _save_leaves(
        os.path.join(path, "state.npz"),
        {"p": p_leaves, "o": o_leaves, "d": d_leaves},
    )
    manifest = {
        "version": FORMAT_VERSION,
        "iters": loop.iters,
        "valid_step": valid_step,
        "chunk": chunk,
        "warmup": 5,
        "print_accuracy": bool(cm.spec.print_accuracy),
        "print_memory": bool(cm.spec.print_memory),
        "platforms": list(platforms),
        "dtypes": dtypes,
        "dataset": cm.spec.dataset,
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return path


# --------------------------------------------------------------------- #
# load + replay
# --------------------------------------------------------------------- #
@dataclasses.dataclass
class ExportedModel:
    """A loaded artifact: replays the reference training protocol from
    the serialized StableHLO modules alone."""

    path: str
    manifest: dict
    _calls: dict
    _state: dict

    def forward(self):
        p = self._state["p"]
        return self._calls["fwd"](p, self._state["d"])

    def train(self, iters: int | None = None) -> TrainResult:
        from gala_tpu.utils.timing import EpochTimer

        m = self.manifest
        iters = iters if iters is not None else m["iters"]
        valid_step, warmup, K = m["valid_step"], m["warmup"], m["chunk"]
        p, o, d = self._state["p"], self._state["o"], self._state["d"]
        step, chunk_c = self._calls["step"], self._calls["chunk"]
        fwd, fwdchunk, acc = (
            self._calls["fwd"], self._calls["fwdchunk"], self._calls["acc"],
        )

        plan = _chunk_plan(iters, valid_step, warmup, K)
        losses, snapshots = [], []
        mem_mb = 0.0
        timer = EpochTimer()
        loss = None
        for kind, epoch, ln in plan:
            if epoch == warmup:
                timer.start(fence_on=loss)
                if m["print_memory"]:
                    from gala_tpu.train import device_memory_mb

                    mem_mb = device_memory_mb()
            if kind == "single":
                p, o, loss = step(p, o, d)
                losses.append(loss)
                if valid_step > 0 and epoch % valid_step == 0:
                    snapshots.append(p)
            else:
                p, o, loss = chunk_c(p, o, d)
                losses.append(loss)
        total_time = timer.stop(loss, n=max(iters - warmup, 1))

        dep = jnp.float32(0.0)
        fence_on = None
        for kind, epoch, ln in plan:
            if epoch == warmup:
                timer.start(fence_on=fence_on)
            if kind == "single":
                out = fwd(p, d)
                fence_on = out[0, 0]
            else:
                dep = fwdchunk(p, dep, d)
                fence_on = dep
        inference_time = timer.stop(fence_on, n=max(iters - warmup, 1))

        accs = [float(np.asarray(acc(ps, d))) for ps in snapshots]
        losses_host = np.concatenate(
            [np.atleast_1d(np.asarray(l)) for l in losses]
        ).tolist()
        self._state["p"], self._state["o"] = p, o
        return TrainResult(
            inference_time=inference_time,
            total_time=total_time,
            max_accuracy=max(accs) if accs else 0.0,
            losses=losses_host,
            accuracies=accs,
            params=p,
            memory_mb=mem_mb,
        )

    def run(self, iters: int | None = None) -> str:
        res = self.train(iters=iters)
        return res.csv(self.manifest["print_accuracy"], self.manifest["print_memory"])


def _chunk_plan(iters: int, valid_step: int, warmup: int, K: int):
    """('single', e, 1) / ('chunk', e, K) items; chunks never cross a
    validation epoch or the warmup boundary, ragged tails fall back to
    singles (exported chunks have a fixed length)."""
    plan, e = [], 0
    while e < iters:
        if valid_step > 0 and e % valid_step == 0:
            plan.append(("single", e, 1))
            e += 1
            continue
        nxt = ((e // valid_step) + 1) * valid_step if valid_step > 0 else iters
        end = min(iters, nxt, warmup if e < warmup else iters)
        while end - e >= K and K > 1:
            plan.append(("chunk", e, K))
            e += K
        while e < end:
            plan.append(("single", e, 1))
            e += 1
    return plan


def load_exported(path: str) -> ExportedModel:
    from jax import export as jexport

    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    if manifest["version"] > FORMAT_VERSION:
        raise ValueError(
            f"artifact format v{manifest['version']} is newer than this "
            f"loader (v{FORMAT_VERSION})"
        )
    calls = {}
    for name in ("step", "chunk", "fwd", "fwdchunk", "acc"):
        with open(os.path.join(path, f"{name}.jaxexport"), "rb") as f:
            exp = jexport.deserialize(f.read())
        calls[name] = exp.call
    state = _load_leaves(os.path.join(path, "state.npz"), manifest["dtypes"])
    state = {k: [jnp.asarray(a) for a in v] for k, v in state.items()}
    return ExportedModel(path=path, manifest=manifest, _calls=calls, _state=state)
