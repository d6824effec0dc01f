"""Augmented vs plain fine-tune step on the real chip.

The augmentation claim is "zero extra matmul cost" (crop/flip live inside
the same resize weight matrices — ops/augment.py); this measures what the
whole augmented step actually costs: per-image weight-matrix construction,
color jitter, mixup's roll + blend, soft-CE. Methodology matches the r3
fine-tune sweep: host-dispatch loop chained through the updated params
(each step consumes the previous step's variables, so steps serialize on
device), one scalar fetch at the end stops the clock; the single tunnel
RTT amortizes over the steps.

Appends JSON lines to scripts/bench_augment.log.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")

    from ics_tpu.models.registry import get_model
    from ics_tpu.ops.augment import AugmentConfig
    from ics_tpu.train.finetune import (
        make_augmented_train_step,
        make_optimizer,
        make_preproc_train_step,
    )

    B, CANVAS = 128, 512
    spec = get_model("resnet50")
    model = spec.build(num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0))
    opt = make_optimizer(lr=0.01)
    opt_state = opt.init(variables["params"])

    rng = np.random.default_rng(0)
    canvas = jnp.asarray(
        rng.integers(0, 256, (B, CANVAS, CANVAS, 3), np.uint8)
    )
    sizes = jnp.asarray(
        np.stack([rng.integers(256, CANVAS + 1, B),
                  rng.integers(256, CANVAS + 1, B)], axis=1).astype(np.int32)
    )
    labels = jnp.asarray(rng.integers(0, 1000, B).astype(np.int32))

    log = open("scripts/bench_augment.log", "a")

    def report(**rec):
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    def run(name, step, with_key):
        # train steps donate params/opt_state (r4): each variant must get
        # its own device copies or the 2nd variant reads donated buffers
        v = jax.tree_util.tree_map(jnp.array, variables)
        o = jax.tree_util.tree_map(jnp.array, opt_state)
        t0 = time.perf_counter()
        if with_key:
            v, o, m = step(v, o, canvas, sizes, labels, jax.random.PRNGKey(0))
        else:
            v, o, m = step(v, o, canvas, sizes, labels)
        _ = float(m["loss"])
        compile_s = time.perf_counter() - t0
        N = 20
        t0 = time.perf_counter()
        for i in range(N):
            if with_key:
                v, o, m = step(v, o, canvas, sizes, labels,
                               jax.random.PRNGKey(i))
            else:
                v, o, m = step(v, o, canvas, sizes, labels)
        _ = float(m["loss"])  # one fetch: chain is sequential on device
        dt = (time.perf_counter() - t0) / N
        report(step=name, batch=B, canvas=CANVAS,
               ms_per_step=round(dt * 1000, 2),
               img_s=round(B / dt, 1), compile_s=round(compile_s, 1))
        return dt

    plain = run("plain_preproc", make_preproc_train_step(model, opt), False)
    aug = run(
        "augment_crop_flip",
        make_augmented_train_step(model, opt, AugmentConfig()),
        True,
    )
    aug_full = run(
        "augment_mixup_smooth",
        make_augmented_train_step(
            model, opt,
            AugmentConfig(mixup_alpha=0.2, label_smoothing=0.1,
                          brightness=0.4, contrast=0.4, saturation=0.4),
        ),
        True,
    )
    aug_cutmix = run(
        "augment_cutmix_switch",
        make_augmented_train_step(
            model, opt,
            AugmentConfig(mixup_alpha=0.2, cutmix_alpha=1.0,
                          label_smoothing=0.1),
        ),
        True,
    )
    report(summary=True,
           overhead_crop_flip_pct=round((aug / plain - 1) * 100, 1),
           overhead_full_pct=round((aug_full / plain - 1) * 100, 1),
           overhead_cutmix_pct=round((aug_cutmix / plain - 1) * 100, 1))


if __name__ == "__main__":
    main()
