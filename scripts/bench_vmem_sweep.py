"""Scoped-VMEM sweep for the ResNet-50 headline via per-jit compiler_options.

XLA_FLAGS cannot reach the TPU compiler in this environment (compilation
rides a remote-compile tunnel; the local parser rejects TPU flags with
"Unknown flag in XLA_FLAGS"). ``.lower().compile(compiler_options=...)``
IS forwarded — the lever lives in runtime/benchmark.py::bench_engine.

Result (docs/benchmarks.md): 32/64/96 MiB all measured SLOWER than the
default — the knob is closed. Kept as the 5-minute re-test.

Appends JSON lines to scripts/bench_vmem_sweep.log.
"""

from __future__ import annotations

import json

VARIANTS = {
    "default": None,
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
}


def run_variants(variants: dict, log_path: str, batch: int = 128,
                 canvas: int = 256, iters: int = 30) -> None:
    from ics_tpu.runtime.benchmark import bench_engine
    from ics_tpu.runtime.compile_cache import enable_persistent_cache
    from ics_tpu.runtime.engine import InferenceEngine

    enable_persistent_cache()
    engine = InferenceEngine(
        "resnet50", precision="bf16", buckets=(batch,), canvas=canvas
    )
    with open(log_path, "a") as log:
        for name, opts in variants.items():
            try:
                rec = {
                    "variant": name,
                    **bench_engine(engine, batch=batch, canvas=canvas,
                                   iters=iters, compiler_options=opts),
                }
            except Exception as exc:
                rec = {"variant": name,
                       "error": f"{type(exc).__name__}: {exc}"[:300]}
            line = json.dumps(rec)
            print(line, flush=True)
            log.write(line + "\n")


if __name__ == "__main__":
    run_variants(VARIANTS, "scripts/bench_vmem_sweep.log")
