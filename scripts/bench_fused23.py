"""Fused bottleneck chains on stages 2-4 (full-width Cm) — the stage-1
negative (Cm=64, half-width MXU) does not transfer; these were never
actually measured (profile_micro.log stops at stage2_b123_xla).

Numerics at b4, timing at b128 via the fori_loop harness. Appends to
scripts/profile_micro.log.
"""

from __future__ import annotations

import json
import time

import numpy as np

from bench_fused import bench_fn

B = 128
STAGES = {  # stage idx -> (H, C)
    1: (28, 512),
    2: (14, 1024),
    3: (7, 2048),
}


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")

    from ics_tpu.models.registry import get_model
    from ics_tpu.ops.pallas_bottleneck import fused_bottleneck_chain
    from ics_tpu.runtime.engine import _cast_pytree

    model = get_model("resnet50").build(num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0))
    folded = jax.device_put(
        _cast_pytree(model.fold(variables, pallas_chains=True), jnp.bfloat16)
    )
    rng = np.random.default_rng(0)
    log = open("/root/repo/scripts/profile_micro.log", "a")

    def report(rec):
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()

    for si, (h, c) in STAGES.items():
        # numerics
        xs = jax.device_put(rng.normal(size=(4, h, h, c)).astype(jnp.bfloat16))
        ref = xs
        for blk, f in zip(model.stages[si][1:], folded["stages"][si][1:]):
            ref = blk.apply_folded(f, ref)
        try:
            out = fused_bottleneck_chain(xs, folded["chains"][str(si)])
            diff = np.abs(np.asarray(ref, np.float32) - np.asarray(out, np.float32))
            report({"check": f"stage{si+1}_chain_numerics",
                    "max_abs": float(diff.max()),
                    "mean_abs": float(diff.mean()),
                    "ref_scale": float(np.abs(np.asarray(ref, np.float32)).mean())})
        except Exception as exc:
            report({"check": f"stage{si+1}_chain_numerics",
                    "error": f"{type(exc).__name__}: {exc}"[:300]})
            continue

        x = jax.device_put(rng.normal(size=(B, h, h, c)).astype(jnp.bfloat16))

        def xla_chain(xx, si=si):
            for blk, f in zip(model.stages[si][1:], folded["stages"][si][1:]):
                xx = blk.apply_folded(f, xx)
            return xx.astype(jnp.float32)

        ms, cs = bench_fn(xla_chain, (x,))
        report({"segment": f"stage{si+1}_chain_xla", "batch": B,
                "ms_per_batch": round(ms * 1000, 3), "compile_s": round(cs, 1)})

        def fused_chain(xx, si=si):
            return fused_bottleneck_chain(
                xx, folded["chains"][str(si)]
            ).astype(jnp.float32)

        try:
            ms, cs = bench_fn(fused_chain, (x,))
            report({"segment": f"stage{si+1}_chain_fused", "batch": B,
                    "ms_per_batch": round(ms * 1000, 3),
                    "compile_s": round(cs, 1)})
        except Exception as exc:
            report({"segment": f"stage{si+1}_chain_fused",
                    "error": f"{type(exc).__name__}: {exc}"[:300]})

    log.close()


if __name__ == "__main__":
    main()
