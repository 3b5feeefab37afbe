"""Probe the attention-kernel compile cliff on the real toolchain.

Tiled bwd1 compiles at u8=1384 but fwd and bwd2 crash the compile
helper (exit 1, no diagnostic).  Sweep u8 on synthetic BellPlans per
kernel, each probe in its own subprocess.

Usage: python scripts/probe_attn.py [fwd|bwd1|bwd2] [u ...]
"""
import subprocess
import sys

CODE = """
import jax, jax.numpy as jnp
import numpy as np
from gala_tpu.ops.pallas.bell_spmm import BellPlan, BLK
from gala_tpu.ops.pallas.attn_bell import (
    attn_fwd_planned, attn_bwd1_planned, attn_bwd2_planned)

which, r, u, C, k, hf, nh = %r, 256, %d, 64, 16, 128, 1
rng = np.random.default_rng(0)
n = u * BLK * 2
blocks = jnp.asarray(rng.integers(0, n // BLK, (C, u)).astype(np.int32))
locals_ = jnp.asarray(rng.integers(0, u * BLK, (C, r, k)).astype(np.int32))
nb = C * r
plan = BellPlan(blocks=blocks, locals_=locals_, nb=nb, c_chunks=C,
                u=u, r=r, k=k, n_need=n, f_budget=256)
f_pad = ((hf + 4 * nh + 127) // 128) * 128
xx = jnp.asarray(rng.normal(size=(n, f_pad)).astype(np.float32))
w = jnp.ones((nb, k), jnp.float32)
vr = jnp.asarray(rng.normal(size=(nb, nh)).astype(np.float32))
if which == 'fwd':
    out, m, s = attn_fwd_planned(plan, xx, w, vr, hf, nh, 0.2)
elif which == 'bwd1':
    out, _, _ = attn_bwd1_planned(
        plan, xx, w, vr, jnp.ones((nb, hf)), jnp.ones((nb, nh)),
        jnp.ones((nb, nh)), hf, nh, 0.2)
else:
    out = attn_bwd2_planned(plan, xx, w, jnp.ones((nb, hf)),
                            jnp.ones((nb, nh)), hf, nh, 0.2)
out.block_until_ready()
print('PROBE_OK')
"""


def probe(which, u, timeout=420):
    try:
        p = subprocess.run(
            [sys.executable, "-c", CODE % (which, u)],
            capture_output=True, text=True, timeout=timeout,
        )
        ok = p.returncode == 0 and "PROBE_OK" in p.stdout
        err = "" if ok else (p.stderr or p.stdout)[-500:]
    except subprocess.TimeoutExpired:
        ok, err = False, "TIMEOUT"
    return ok, err


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    us = [int(a) for a in sys.argv[2:]] or [18, 64, 128, 173]
    for u in us:
        ok, err = probe(which, u)
        print(f"{which} u8={u*8:5d}: {'PASS' if ok else 'FAIL'}  "
              f"{err.splitlines()[-1][:200] if err else ''}", flush=True)


if __name__ == "__main__":
    main()
