"""Pallas depthwise 7x7 vs XLA grouped conv, ConvNeXt shapes, b128.

Appends JSON lines to scripts/bench_dw.log.
"""

from __future__ import annotations

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")

    from bench_fused import bench_fn
    from ics_tpu.nn.layers import Conv2D
    from ics_tpu.ops.pallas_depthwise import depthwise_conv

    B = 128
    rng = np.random.default_rng(0)
    log = open("/root/repo/scripts/bench_dw.log", "a")
    for c, hw in [(96, 56), (192, 28), (384, 14), (768, 7)]:
        conv = Conv2D(c, c, 7, 1, padding="SAME", groups=c, use_bias=True)
        params = conv.init(jax.random.PRNGKey(1))
        w = jnp.asarray(params["w"], jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(c,)), jnp.bfloat16)
        pf = {"w": w, "b": b}
        x = jax.device_put(
            rng.normal(size=(B, hw, hw, c)).astype(jnp.bfloat16)
        )
        try:
            xs = x[:4]
            ref = conv.apply(pf, xs)
            out = depthwise_conv(xs, w, b)
            err = float(np.abs(
                np.asarray(ref, np.float32) - np.asarray(out, np.float32)
            ).max())
            ms_x, _ = bench_fn(
                lambda xx: conv.apply(pf, xx).astype(jnp.float32), (x,)
            )
            ms_p, _ = bench_fn(
                lambda xx: depthwise_conv(xx, w, b).astype(jnp.float32), (x,)
            )
            roof = 2 * B * hw * hw * c * 2 / 819e9 * 1000
            rec = {"shape": f"{hw}x{hw}x{c}",
                   "xla_ms": round(ms_x * 1000, 3),
                   "pallas_ms": round(ms_p * 1000, 3),
                   "roofline_ms": round(roof, 3), "max_err": err}
        except Exception as exc:
            rec = {"shape": f"{hw}x{hw}x{c}",
                   "error": f"{type(exc).__name__}: {exc}"[-400:]}
        line = json.dumps(rec)
        print(line, flush=True)
        log.write(line + "\n")
        log.flush()
    log.close()


if __name__ == "__main__":
    main()
