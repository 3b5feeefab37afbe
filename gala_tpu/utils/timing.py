"""Device timing that is correct on remote-tunneled platforms (axon).

`jax.block_until_ready` does not actually wait for device completion on
the axon platform (measured: an 8192^3 bf16 matmul "completes" in 60us
with block_until_ready vs 8.8ms with a host fetch).  Device execution is
in-order, so the correct fence is a *host fetch of the most recently
enqueued result*: everything enqueued before it is complete once the
fetch returns.  Each fetch costs one tunnel round trip (~26ms measured),
so fences go only at timing-region boundaries, never per iteration.

This replaces the reference's cudaDeviceSynchronize()+omp_get_wtime()
brackets (reference: src/codegen/common.h:1494-1563, threading_utils.h:5).
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import numpy as np


def fence(x=None) -> None:
    """Wait until all device work enqueued so far is complete.

    If `x` (any pytree with at least one array) is given, fetching one of
    its leaves fences the in-order stream.  Without `x`, a trivial
    computation is enqueued and fetched.
    """
    if x is None:
        import jax.numpy as jnp

        x = jnp.zeros((), jnp.int32) + 1
    leaves = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "shape")]
    if not leaves:
        return
    l = leaves[-1]
    np.asarray(jax.device_get(l if l.ndim == 0 else l.ravel()[0]))


def timeit(fn: Callable, *args, iters: int = 20, warmup: int = 3) -> float:
    """Mean seconds per call: enqueue `iters` calls, fence once."""
    r = None
    for _ in range(warmup):
        r = fn(*args)
    fence(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    fence(r)
    return (time.perf_counter() - t0) / iters


class EpochTimer:
    """Fenced timing for a region containing many enqueued epochs."""

    def __init__(self):
        self.t0 = None
        self.seconds = 0.0

    def start(self, fence_on=None):
        fence(fence_on)
        self.t0 = time.perf_counter()

    def stop(self, fence_on, n: int = 1) -> float:
        if self.t0 is None:
            return 0.0
        fence(fence_on)
        self.seconds = time.perf_counter() - self.t0
        return self.seconds / max(n, 1)
