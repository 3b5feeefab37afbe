"""Probe the FULL bell_spmm_planned (one-hot) at synthetic plan sizes.

probe_onehot.py shows the one-hot body compiles at every size up to
(r=256, u8=8192) — but the full kernel (DMA staging + scalar prefetch +
double buffering) crashes tpu_compile_helper at (r=40, u=630, C=1639)
while passing at (r=8, u=16, C=512).  Sweep (r, u, C) on synthetic
BellPlans to find which axis kills the compiler.

Usage: python scripts/probe_bell_full.py [r u C]   (no args = sweep)
"""
import subprocess
import sys

CODE = """
import jax, jax.numpy as jnp
import numpy as np
from gala_tpu.ops.pallas.bell_spmm import BellPlan, bell_spmm_planned, BLK

r, u, C, k, f = %d, %d, %d, 16, 128
rng = np.random.default_rng(0)
n = u * BLK * 2
blocks = jnp.asarray(rng.integers(0, n // BLK, (C, u)).astype(np.int32))
locals_ = jnp.asarray(rng.integers(0, u * BLK, (C, r, k)).astype(np.int32))
nb = C * r
plan = BellPlan(blocks=blocks, locals_=locals_, nb=nb, c_chunks=C,
                u=u, r=r, k=k, n_need=n)
x = jnp.asarray(rng.normal(size=(n, f)).astype(np.float32))
vals = jnp.asarray(rng.normal(size=(nb, k)).astype(np.float32))
out = bell_spmm_planned(plan, x, vals, use_gather=False)
out.block_until_ready()
print('PROBE_OK')
"""


def probe(r, u, C, timeout=300):
    try:
        p = subprocess.run(
            [sys.executable, "-c", CODE % (r, u, C)],
            capture_output=True, text=True, timeout=timeout,
        )
        ok = p.returncode == 0 and "PROBE_OK" in p.stdout
        err = "" if ok else (p.stderr or p.stdout)[-400:]
    except subprocess.TimeoutExpired:
        ok, err = False, "TIMEOUT"
    return ok, err


def main():
    if len(sys.argv) > 3:
        r, u, C = (int(a) for a in sys.argv[1:4])
        ok, err = probe(r, u, C)
        print(f"r={r} u={u} C={C}: {'PASS' if ok else 'FAIL'}")
        if not ok:
            print(err)
        return
    for r, u, C in [(8, 16, 512), (40, 16, 64), (8, 630, 64),
                    (40, 630, 64), (40, 630, 1639), (8, 64, 64),
                    (8, 128, 64), (8, 256, 64)]:
        ok, err = probe(r, u, C)
        print(f"r={r:4d} u={u:4d} C={C:5d}: {'PASS' if ok else 'FAIL'}  "
              f"{err.splitlines()[-1][:160] if err else ''}", flush=True)


if __name__ == "__main__":
    main()
