"""GALA-TPU: a TPU-native GNN acceleration language and compiler.

A from-scratch re-design of the capabilities of the GALA artifact
(ADAPT-uiuc/GALA-GNN-Acceleration-LAnguage) for TPU hardware:

- The reference is an ahead-of-time DSL -> CUDA/libtorch code generator
  (reference: src/frontend, src/codegen/cuda.h).  Here the same DSL is
  parsed into a graph IR, optimized by the same four whole-program passes,
  and *lowered to a jitted JAX program* -- XLA is the code generator and
  Pallas supplies the hand-tuned kernels the reference emits as CUDA text.
- Compute path: jax / XLA / Pallas; sparse aggregation runs on the MXU
  where profitable (dense & block-sparse strategies) and via sorted
  segment reductions otherwise.
- Scale-out: `jax.sharding` meshes with `shard_map` (see gala_tpu.parallel),
  which the reference lacks entirely (its Environment enum is aspirational,
  reference: src/codegen/common.h:22-29).

Public API (mirrors the reference driver CLIs, reference: tests/gala_train.cpp):

    import gala_tpu as gt
    prog  = gt.compile_file("model.txt")          # text DSL -> CompiledModel
    stats = prog.train()                          # runs the training loop
    print(stats.csv())                            # 'inference_time,total_time'
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache.  On remote-compile platforms (axon
    tunnel) even trivial programs take minutes to compile; the disk cache
    turns repeat compiles into ~0.3s loads.  Opt out with
    GALA_TPU_NO_COMPILE_CACHE=1 or point GALA_TPU_COMPILE_CACHE elsewhere."""
    if _os.environ.get("GALA_TPU_NO_COMPILE_CACHE"):
        return
    path = _os.environ.get(
        "GALA_TPU_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".jax_cache"),
    )
    # CPU AOT entries are host-ISA-specific: loading one compiled on a
    # different machine warns "could lead to execution errors such as
    # SIGILL" (seen live after a container host move).  CPU-pinned runs
    # (JAX_PLATFORMS/JAX_PLATFORM_NAME=cpu: tests, bench cpu-fallback,
    # dryrun subprocess) therefore cache under a host-fingerprinted
    # subdir; TPU entries stay at top level — they target the v5e, are
    # host-independent, and cost minutes each to recompile.
    _plat_envs = (
        _os.environ.get("JAX_PLATFORMS", "")
        + "," + _os.environ.get("JAX_PLATFORM_NAME", "")
    ).lower()
    if "cpu" in (p.strip() for p in _plat_envs.split(",")):
        import hashlib as _hashlib

        try:
            with open("/proc/cpuinfo") as _f:
                _sig = next(l for l in _f if l.startswith("flags"))
        except Exception:
            import platform as _platform

            _sig = _platform.processor() or _platform.machine()
        _fp = _hashlib.sha1(_sig.encode()).hexdigest()[:10]
        path = _os.path.join(path, f"cpu-{_fp}")
    try:
        _jax.config.update("jax_compilation_cache_dir", path)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compile_cache()

from gala_tpu.ops.graph import Graph
from gala_tpu.api import compile_file, compile_source, compile_model

__all__ = [
    "Graph",
    "compile_file",
    "compile_source",
    "compile_model",
    "__version__",
]
