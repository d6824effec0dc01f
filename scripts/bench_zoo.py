"""Zoo throughput on one chip: the round-2 model additions.

Same harness as bench.py (on-device ``lax.fori_loop``, cross-step data
dependency — tunnel-immune). Appends JSON lines to scripts/bench_zoo.log.

Run: ``python scripts/bench_zoo.py [model ...]``
"""

from __future__ import annotations

import json
import sys

CONFIGS = {
    # model: (batch, canvas, iters)
    "resnet18": (128, 256, 20),
    "resnet34": (128, 256, 20),
    "resnet101": (128, 256, 20),
    "resnet152": (128, 256, 20),
    "convnext_small": (128, 256, 20),
    "vit_l16": (32, 512, 10),
    "vit_s16": (128, 256, 20),
    "efficientnet_b0": (128, 256, 20),
    "mobilenetv3_small": (128, 256, 20),
    "efficientnet_v2_s": (64, 512, 15),
    "efficientnet_v2_m": (32, 512, 10),
    "swin_tiny": (128, 256, 20),
    "swin_small": (128, 256, 20),
    "swin_base": (64, 256, 15),
    # round-3 late additions: same-FLOP-class resnet50 variants
    "resnext50_32x4d": (128, 256, 20),
    "wide_resnet50_2": (128, 256, 20),
    # dense-connectivity family (narrow 3x3s + concat growth)
    "densenet121": (128, 256, 20),
    "densenet169": (128, 256, 20),
    # NAS family: SE-gated grouped bottlenecks (group width 8/24)
    "regnet_y_400mf": (128, 256, 20),
    "regnet_y_1_6gf": (128, 256, 20),
}


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")

    from ics_tpu.runtime.benchmark import bench_engine
    from ics_tpu.runtime.engine import InferenceEngine

    names = sys.argv[1:] or list(CONFIGS)
    with open("scripts/bench_zoo.log", "a") as log:
        for name in names:
            batch, canvas, iters = CONFIGS[name]
            engine = InferenceEngine(
                name, precision="bf16", buckets=(batch,), canvas=canvas
            )
            result = bench_engine(engine, batch=batch, canvas=canvas,
                                  iters=iters)
            line = json.dumps(result)
            print(line, flush=True)
            log.write(line + "\n")


if __name__ == "__main__":
    main()
