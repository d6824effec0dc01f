"""Swin attention decomposition: projections vs score/softmax traffic.

Variants:
- proj_only: qkv -> take v -> proj (no scores/softmax) — isolates GEMMs
- scores_bf16: score+softmax pipeline in bf16 (halves the materialized
  attn-matrix HBM traffic) instead of f32
Appends to scripts/profile_swin.log.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench(fn, x, iters=15):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x, n):
        def body(_, carry):
            bump = (carry > 1e30).astype(x.dtype)
            out = fn(x + bump)
            return out.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    _ = float(chained(x, 2))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chained(x, iters))
    return (time.perf_counter() - t0) / iters * 1000, compile_s


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")

    from ics_tpu.models.swin import WindowAttention, swin_tiny
    from ics_tpu.runtime.engine import _cast_pytree

    B = 128
    model = swin_tiny(num_classes=1000)
    folded = _cast_pytree(
        model.fold(model.init(jax.random.PRNGKey(0))), jnp.bfloat16
    )
    folded = jax.device_put(folded)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, 224, 224, 3)), jnp.bfloat16
    )

    orig = WindowAttention.apply

    def proj_only(self, params, xx, mask=None):
        bn, ww, _ = xx.shape
        qkv = self.qkv.apply(params["qkv"], xx)
        qkv = qkv.reshape(bn, ww, 3, self.num_heads, self.head_dim)
        v = jnp.transpose(qkv[:, :, 2], (0, 2, 1, 3))
        out = jnp.transpose(v, (0, 2, 1, 3)).reshape(bn, ww, self.dim)
        return self.proj.apply(params["proj"], out)

    def scores_bf16(self, params, xx, mask=None):
        bn, ww, _ = xx.shape
        qkv = self.qkv.apply(params["qkv"], xx)
        qkv = qkv.reshape(bn, ww, 3, self.num_heads, self.head_dim)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        )
        scale = self.head_dim ** -0.5
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k)  # bf16 out
        bias = params["rel_bias"].astype(attn.dtype)[self._rel_index]
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            n_windows = mask.shape[0]
            attn = attn.reshape(
                bn // n_windows, n_windows, self.num_heads, ww, ww
            )
            attn = attn + mask.astype(attn.dtype)[None, :, None]
            attn = attn.reshape(bn, self.num_heads, ww, ww)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bn, ww, self.dim)
        return self.proj.apply(params["proj"], out)

    variants = {"proj_only": proj_only, "scores_bf16": scores_bf16}
    with open("scripts/profile_swin.log", "a") as log:
        for name, fn in variants.items():
            WindowAttention.apply = fn
            ms, compile_s = bench(
                lambda xx: model.apply_folded(folded, xx), x
            )
            WindowAttention.apply = orig
            line = json.dumps(
                {"variant": name, "ms_per_batch": round(ms, 2),
                 "imgs_per_sec": round(B / ms * 1000, 1),
                 "compile_s": round(compile_s, 1)}
            )
            print(line, flush=True)
            log.write(line + "\n")


if __name__ == "__main__":
    main()
