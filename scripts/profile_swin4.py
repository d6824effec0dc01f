"""Swin attention: softmax denominator fused into the PV dot.

exp(s - max) is the only materialized tensor; appending a ones-column to
V makes ONE dot produce both P@V and the row sums (the normalizer), so
the exp tensor is written once + read once instead of softmax's extra
reduce/normalize passes. Appends to scripts/profile_swin.log.
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

    def fused_den(self, params, xx, mask=None, scores_in_dtype=True):
        bn, ww, _ = xx.shape
        qkv = self.qkv.apply(params["qkv"], xx)
        qkv = qkv.reshape(bn, ww, 3, self.num_heads, self.head_dim)
        q, k, v = (
            jnp.transpose(qkv[:, :, i], (0, 2, 1, 3)) for i in range(3)
        )
        scale = self.head_dim ** -0.5
        dt = xx.dtype
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", q * scale, k, preferred_element_type=dt
        )
        bias = params["rel_bias"].astype(dt)[self._rel_index]
        s = s + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            n_windows = mask.shape[0]
            s = s.reshape(bn // n_windows, n_windows, self.num_heads, ww, ww)
            s = s + mask.astype(dt)[None, :, None]
            s = s.reshape(bn, self.num_heads, ww, ww)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - m).astype(jnp.float32)).astype(dt)
        ones = jnp.ones((bn, self.num_heads, ww, 1), dt)
        v_aug = jnp.concatenate([v, ones], axis=-1)  # [Bn, H, ww, d+1]
        out_aug = jnp.einsum("bhqk,bhkd->bhqd", e, v_aug)
        out = out_aug[..., :-1] / jnp.maximum(out_aug[..., -1:], 1e-9)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(bn, ww, self.dim)
        return self.proj.apply(params["proj"], out)

    with open("scripts/profile_swin.log", "a") as log:
        for name, fn in (("fused_denominator", fused_den),):
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
