"""Pallas (Mosaic) kernels + a toolchain-health probe.

The axon remote-compile helper can be dead while plain XLA compiles
fine (round 2: every Pallas compile returned HTTP 500 for days — even
a trivial x*2 kernel — while XLA one-shots ran at full speed).  Any
auto-selection of a Pallas kernel must therefore confirm the Mosaic
toolchain actually works, or a user flipping GALA_PALLAS_AUTO=1 gets a
MosaicError instead of a slower-but-working XLA path.
"""
from __future__ import annotations

import os
import subprocess
import sys

_PROBE_SRC = (
    "import jax, jax.numpy as jnp\n"
    "from jax.experimental import pallas as pl\n"
    "def k(x_ref, o_ref): o_ref[...] = x_ref[...] * 2.0\n"
    "f = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))\n"
    "r = jax.jit(f)(jnp.ones((128, 128)))\n"
    "r.block_until_ready()\n"
    "print('mosaic-ok')\n"
)

_mosaic_ok: bool | None = None


def mosaic_available(timeout: float = 150.0) -> bool:
    """True when the Mosaic TPU toolchain compiles a trivial kernel.

    Probed once per process in a subprocess (a dead remote-compile
    helper HANGS rather than failing, so the probe must be killable).
    Override with GALA_MOSAIC_OK=0/1 to skip the probe entirely.
    On CPU (interpret-mode testing) this returns True without probing —
    interpret mode does not touch the Mosaic toolchain.
    """
    global _mosaic_ok
    env_override = os.environ.get("GALA_MOSAIC_OK")
    if env_override is not None:
        return env_override == "1"
    if _mosaic_ok is not None:
        return _mosaic_ok
    import jax

    if jax.default_backend() != "tpu":
        _mosaic_ok = True  # interpret mode; no Mosaic involved
        return _mosaic_ok
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout, capture_output=True, text=True,
        )
        _mosaic_ok = proc.returncode == 0 and "mosaic-ok" in (proc.stdout or "")
    except (subprocess.TimeoutExpired, OSError):
        _mosaic_ok = False
    if not _mosaic_ok:
        import warnings

        warnings.warn(
            "Mosaic TPU toolchain probe failed (remote compile helper "
            "dead?) — Pallas kernels disabled, using XLA paths",
            stacklevel=2,
        )
    return _mosaic_ok
