"""Probe Mosaic compile limits of the one-hot bell kernel body.

Stage-9 of pallas_bisect compiles at (r=8, u8=32); the full kernel at
(r=40, u8=5040) crashes tpu_compile_helper (exit 1, no diagnostic).
This sweeps (r, u8) to find the cliff.  Each probe in its own
subprocess so a compiler crash doesn't poison the rest.

Usage: python scripts/probe_onehot.py [r u8 [k f]]   (no args = sweep)
"""
import os
import subprocess
import sys

CODE = """
import functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

r, u8, k, f = %d, %d, %d, %d
C = 2
rng = np.random.default_rng(0)
locals_ = jnp.asarray(rng.integers(0, u8, (C, r, k)).astype(np.int32))
vals = jnp.asarray(rng.normal(size=(C, r, k)).astype(np.float32))
x = jnp.asarray(rng.normal(size=(u8, f)).astype(np.float32))

def kern(l_ref, v_ref, x_ref, o_ref):
    tab = x_ref[...]
    iota = jax.lax.broadcasted_iota(jnp.int32, (r, u8), 1)
    w = jnp.zeros((r, u8), jnp.float32)
    loc = l_ref[0]
    vv = v_ref[0]
    for j in range(k):
        hit = (loc[:, j][:, None] == iota).astype(jnp.float32)
        w = w + vv[:, j][:, None] * hit
    o_ref[...] = jnp.dot(w, tab, preferred_element_type=jnp.float32)

out = pl.pallas_call(
    kern,
    grid=(C,),
    in_specs=[pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
              pl.BlockSpec((1, r, k), lambda c: (c, 0, 0)),
              pl.BlockSpec((u8, f), lambda c: (0, 0))],
    out_specs=pl.BlockSpec((r, f), lambda c: (c, 0)),
    out_shape=jax.ShapeDtypeStruct((C * r, f), jnp.float32),
)(locals_, vals, x)
out.block_until_ready()
print('PROBE_OK')
"""


def probe(r, u8, k=16, f=128, timeout=300):
    try:
        p = subprocess.run(
            [sys.executable, "-c", CODE % (r, u8, k, f)],
            capture_output=True, text=True, timeout=timeout,
        )
        ok = p.returncode == 0 and "PROBE_OK" in p.stdout
        err = "" if ok else (p.stderr or p.stdout)[-400:]
    except subprocess.TimeoutExpired:
        ok, err = False, "TIMEOUT"
    return ok, err


def main():
    if len(sys.argv) > 2:
        r, u8 = int(sys.argv[1]), int(sys.argv[2])
        k = int(sys.argv[3]) if len(sys.argv) > 3 else 16
        f = int(sys.argv[4]) if len(sys.argv) > 4 else 128
        ok, err = probe(r, u8, k, f)
        print(f"r={r} u8={u8} k={k} f={f}: {'PASS' if ok else 'FAIL'}")
        if not ok:
            print(err)
        return
    for r, u8 in [(8, 128), (8, 1024), (8, 5040), (8, 5120),
                  (40, 128), (40, 1024), (40, 5040),
                  (64, 1024), (256, 1024), (256, 8192)]:
        ok, err = probe(r, u8)
        print(f"r={r:4d} u8={u8:5d}: {'PASS' if ok else 'FAIL'}  "
              f"{err.splitlines()[-1][:120] if err else ''}", flush=True)


if __name__ == "__main__":
    main()
