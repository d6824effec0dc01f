"""Second compiler-option sweep on the ResNet-50 headline step.

Candidates targeted the measured bottleneck (stages 2-4 at 205-582 GB/s
effective vs the 835 peak): scheduler + LICM knobs. Result
(docs/benchmarks.md): every surviving option lands inside the ±1%
run-to-run band — measured flat, lever closed. Kept as the re-test.

Appends JSON lines to scripts/bench_flags2.log.
"""

from __future__ import annotations

from bench_vmem_sweep import run_variants

VARIANTS = {
    "default_a": None,
    "lhs_off": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "licm_inflate": {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    "default_b": None,
}


if __name__ == "__main__":
    run_variants(VARIANTS, "scripts/bench_flags2.log")
