"""Latency-budget regression gate (runtime/latency_budget.py; VERDICT r2
item 2): every controllable p50 component is measured and asserted against
its budget line, so a regression in decode/staging/step code fails HERE
before co-located hardware exists.

CPU lines gate the host components (identical code to production) and
sanity-bound the device ones on the tiny engine.
"""

import pytest

from ics_tpu.runtime import latency_budget
from ics_tpu.runtime.engine import InferenceEngine

pytestmark = pytest.mark.anyio


@pytest.fixture(scope="module")
def measured():
    engine = InferenceEngine(
        "resnet_tiny", num_classes=8, precision="fp32",
        buckets=(8,), canvas=64,
    )
    # small jpeg + few repeats: this is a regression gate, not a bench
    return latency_budget.measure(
        engine, repeats=5, jpeg_side=256, device_iters=5
    )


def test_all_components_measured(measured):
    for component in (
        "host_entropy_decode_ms", "host_pixel_decode_ms", "stage_b8_ms",
        "h2d_roundtrip_b8_ms", "d2h_roundtrip_ms", "device_step_b8_ms",
    ):
        assert component in measured
        if measured[component] is not None:
            assert measured[component] > 0


def test_within_cpu_budget(measured):
    """THE gate: any component regressing past its line fails here with a
    named component and the measured value."""
    violations = latency_budget.check(measured, platform="cpu")
    assert violations == []


def test_violation_is_detected():
    fake = {"host_pixel_decode_ms": 10_000.0}
    violations = latency_budget.check(fake, platform="cpu")
    assert len(violations) == 1
    assert "host_pixel_decode_ms" in violations[0]


def test_unmeasured_component_is_skipped():
    assert latency_budget.check(
        {"host_entropy_decode_ms": None}, platform="cpu"
    ) == []


def test_metrics_export(measured):
    from ics_tpu.utils.metrics import registry

    latency_budget.export_metrics(measured)
    text = registry.expose()
    assert "latency_budget_host_pixel_decode_ms" in text
    assert "latency_budget_device_step_b8_ms" in text


def test_budget_lines_per_platform():
    tpu = latency_budget.budget_lines("tpu")
    assert tpu["device_step_b8_ms"] <= 10.0  # the co-located step budget
    assert latency_budget.budget_lines("axon") == tpu
    # unknown platforms fall back to the conservative cpu lines
    assert latency_budget.budget_lines("rocm") == latency_budget.BUDGETS["cpu"]
