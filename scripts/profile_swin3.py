"""Swin attention: transpose-free einsum layout vs the shipped path.

Hypothesis: the explicit [Bn, ww, 3, H, d] -> [Bn, H, ww, d] transposes
materialize qkv copies in HBM; einsum with 'h' as a non-leading batch dim
lets XLA fold the permutation into dot_general. Appends to
scripts/profile_swin.log.
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

    def no_transpose(self, params, xx, mask=None, scores_in_dtype=True):
        bn, ww, _ = xx.shape
        qkv = self.qkv.apply(params["qkv"], xx)
        qkv = qkv.reshape(bn, ww, 3, self.num_heads, self.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [Bn, ww, H, d]
        scale = self.head_dim ** -0.5
        dt = xx.dtype
        attn = jnp.einsum(
            "bqhd,bkhd->bhqk", q * scale, k, preferred_element_type=dt
        )
        bias = params["rel_bias"].astype(dt)[self._rel_index]
        attn = attn + bias.transpose(2, 0, 1)[None]
        if mask is not None:
            n_windows = mask.shape[0]
            attn = attn.reshape(
                bn // n_windows, n_windows, self.num_heads, ww, ww
            )
            attn = attn + mask.astype(dt)[None, :, None]
            attn = attn.reshape(bn, self.num_heads, ww, ww)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        out = out.reshape(bn, ww, self.dim)
        return self.proj.apply(params["proj"], out)

    with open("scripts/profile_swin.log", "a") as log:
        for name, fn in (("shipped_bf16", orig), ("no_transpose", no_transpose)):
            WindowAttention.apply = (
                fn if name != "shipped_bf16" else orig
            )
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
