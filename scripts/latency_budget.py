"""Standalone latency-budget run on the real chip (VERDICT r2 item 2).

Builds the serving engine from settings (default: resnet50 @ the shipped
canvas), measures every budget component (runtime/latency_budget.py) and
writes a BENCH-style artifact to LATENCY_BUDGET.json. Exit code 1 when any
component is over its budget line — CI-shaped.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/latency_budget.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path


def main() -> int:
    from ics_tpu.core.config import settings
    from ics_tpu.runtime import latency_budget
    from ics_tpu.runtime.compile_cache import enable_persistent_cache
    from ics_tpu.runtime.engine import InferenceEngine

    enable_persistent_cache()
    import jax

    platform = jax.devices()[0].platform
    engine = InferenceEngine(
        model_name=settings.TPU_DEFAULT_MODEL,
        num_classes=settings.TPU_NUM_CLASSES,
        precision=settings.TPU_PRECISION,
        buckets=settings.get_batch_buckets(),
        canvas=settings.TPU_CANVAS,
    )
    measured = latency_budget.measure(engine)
    violations = latency_budget.check(measured, platform)
    artifact = {
        "platform": platform,
        "model": settings.TPU_DEFAULT_MODEL,
        "canvas": settings.TPU_CANVAS,
        "componentes": measured,
        "orcamento": latency_budget.budget_lines(platform),
        "violacoes": violations,
    }
    Path("LATENCY_BUDGET.json").write_text(
        json.dumps(artifact, indent=2) + "\n"
    )
    print(json.dumps(artifact))
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
