"""Buffer donation A/B on the real chip (VERDICT r3 item 3, SURVEY §7 step 8).

Train steps now donate (variables, opt_state) — XLA writes the updated
params/moments into the input buffers instead of allocating fresh ones.
This measures what that is actually worth, per model, with donation ON
vs OFF on the same step function:

- steady-state ms/step (host-dispatch loop chained through the updated
  params — steps serialize on device; one scalar fetch stops the clock)
- the compiler's own memory accounting (``compiled.memory_analysis()``)
  where the axon remote-compile path exposes it: donation should show up
  as alias size ~= params+opt bytes and a correspondingly smaller live
  peak.

Configs are VERDICT r3's ask verbatim: ResNet-50 b128 and Swin-B b64,
both at the 512 training canvas.

Appends JSON lines to scripts/bench_donation.log.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def tree_bytes(tree):
    import jax

    return sum(
        x.size * x.dtype.itemsize
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "size")
    )


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")

    from ics_tpu.models.registry import get_model
    from ics_tpu.train.finetune import make_optimizer, make_preproc_train_step

    log = open("scripts/bench_donation.log", "a")

    def report(**rec):
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    def bench(name, batch, canvas=512, image_size=224, steps=20):
        spec = get_model(name)
        model = spec.build(num_classes=1000)
        variables = model.init(jax.random.PRNGKey(0))
        opt = make_optimizer(lr=0.01)
        opt_state = opt.init(variables["params"])
        state_mb = round(
            (tree_bytes(variables) + tree_bytes(opt_state)) / 2**20, 1
        )

        rng = np.random.default_rng(0)
        canvas_u8 = jnp.asarray(
            rng.integers(0, 256, (batch, canvas, canvas, 3), np.uint8)
        )
        sizes = jnp.asarray(
            np.stack([rng.integers(256, canvas + 1, batch),
                      rng.integers(256, canvas + 1, batch)],
                     axis=1).astype(np.int32)
        )
        labels = jnp.asarray(rng.integers(0, 1000, batch).astype(np.int32))

        out = {}
        for donate in (False, True):
            step = make_preproc_train_step(model, opt, donate=donate)
            # fresh device copies per variant: the donated run consumes its
            # inputs, and both variants must start from identical trees
            v = jax.tree_util.tree_map(jnp.array, variables)
            o = jax.tree_util.tree_map(jnp.array, opt_state)

            mem = {}
            if os.environ.get("ICS_DONATION_MEM"):
                # opt-in: the AOT lower().compile() is a SECOND compile of
                # the same step over the remote tunnel (minutes cold)
                try:
                    compiled = step.lower(
                        v, o, canvas_u8, sizes, labels
                    ).compile()
                    ma = compiled.memory_analysis()
                    mem = {
                        "arg_mb": round(ma.argument_size_in_bytes / 2**20, 1),
                        "out_mb": round(ma.output_size_in_bytes / 2**20, 1),
                        "alias_mb": round(ma.alias_size_in_bytes / 2**20, 1),
                        "temp_mb": round(ma.temp_size_in_bytes / 2**20, 1),
                    }
                except Exception as e:  # remote-compile may not expose it
                    mem = {"memory_analysis": f"unavailable: {e!r}"}

            t0 = time.perf_counter()
            v, o, m = step(v, o, canvas_u8, sizes, labels)
            _ = float(m["loss"])
            compile_s = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            for _i in range(steps):
                v, o, m = step(v, o, canvas_u8, sizes, labels)
            _ = float(m["loss"])  # one fetch: param chain serializes steps
            dt = (time.perf_counter() - t0) / steps
            report(model=name, batch=batch, canvas=canvas, donate=donate,
                   params_opt_mb=state_mb, ms_per_step=round(dt * 1000, 2),
                   img_s=round(batch / dt, 1), compile_s=compile_s, **mem)
            out[donate] = dt
        report(model=name, batch=batch, summary=True,
               speedup_pct=round((out[False] / out[True] - 1) * 100, 1))

    import sys

    models = sys.argv[1:] or ["resnet50:128", "swin_base:64"]
    for spec_arg in models:
        name, _, b = spec_arg.partition(":")
        bench(name, batch=int(b or 64))


if __name__ == "__main__":
    main()
