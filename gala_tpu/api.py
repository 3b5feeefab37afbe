"""Top-level compile API (placeholder wiring; filled in by dsl/lowering).

The reference exposes compilation through five driver CLIs
(reference: tests/gala_{inference,train,...}.cpp); here a single Python
entry point covers all of them, with the driver differences expressed as
keyword options (see gala_tpu.dsl.schedule.Schedule).
"""
from __future__ import annotations


def compile_source(source: str, **opts):
    from gala_tpu.dsl.parser import parse_source
    from gala_tpu.lowering.lower import lower

    spec = parse_source(source)
    return lower(spec, **opts)


def compile_file(path: str, **opts):
    with open(path) as f:
        return compile_source(f.read(), **opts)


def compile_model(spec, **opts):
    """Compile an already-built ModelSpec (Python-embedded DSL path)."""
    from gala_tpu.lowering.lower import lower

    return lower(spec, **opts)
