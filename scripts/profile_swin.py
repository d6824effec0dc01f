"""Where does Swin-T's time go? Ablation bench on the real chip.

Builds swin_tiny forward variants with components knocked out (attention
-> identity, MLP -> identity, shifts -> 0, bias/mask removed) and times
each at b128 @224 bf16 with the fori_loop harness (tunnel-immune).
Appends JSON lines to scripts/profile_swin.log.
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench(fn, args, iters=15):
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
    _ = float(chained(*args, 2) if False else chained(args, 2))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chained(args, iters))
    return (time.perf_counter() - t0) / iters * 1000, compile_s


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")

    from ics_tpu.models import swin as swin_mod
    from ics_tpu.models.swin import SwinBlock, swin_tiny
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

    orig_apply = SwinBlock.apply

    def attn_identity(self, params, xx):
        shortcut = xx
        y = self.ln2.apply(params["ln2"], xx)
        y = self.fc1.apply(params["fc1"], y)
        from ics_tpu.nn.layers import gelu

        y = gelu(y, exact=self.gelu_exact)
        return shortcut + self.fc2.apply(params["fc2"], y)

    def mlp_identity(self, params, xx):
        b = xx.shape[0]
        y = self.ln1.apply(params["ln1"], xx)
        if self.shift > 0:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
        w = swin_mod._window_partition(y, self.window)
        w = self.attn.apply(params["attn"], w, self._mask)
        y = swin_mod._window_merge(w, self.window, self.grid, b)
        if self.shift > 0:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        return xx + y

    def no_shift(self, params, xx):
        b = xx.shape[0]
        shortcut = xx
        y = self.ln1.apply(params["ln1"], xx)
        w = swin_mod._window_partition(y, self.window)
        w = self.attn.apply(params["attn"], w, None)
        y = swin_mod._window_merge(w, self.window, self.grid, b)
        xx = shortcut + y
        y = self.ln2.apply(params["ln2"], xx)
        y = self.fc1.apply(params["fc1"], y)
        from ics_tpu.nn.layers import gelu

        y = gelu(y, exact=self.gelu_exact)
        return xx + self.fc2.apply(params["fc2"], y)

    variants = {
        "full": orig_apply,
        "attn_removed": attn_identity,
        "mlp_removed": mlp_identity,
        "noshift_nomask": no_shift,
    }
    results = {}
    with open("scripts/profile_swin.log", "a") as log:
        for name, fn in variants.items():
            SwinBlock.apply = fn
            ms, compile_s = bench(
                lambda xx: model.apply_folded(folded, xx), x
            )
            SwinBlock.apply = orig_apply
            results[name] = ms
            line = json.dumps(
                {"variant": name, "ms_per_batch": round(ms, 2),
                 "imgs_per_sec": round(B / ms * 1000, 1),
                 "compile_s": round(compile_s, 1)}
            )
            print(line, flush=True)
            log.write(line + "\n")
        full = results["full"]
        summary = {
            "attn_cost_ms": round(full - results["attn_removed"], 2),
            "mlp_cost_ms": round(full - results["mlp_removed"], 2),
            "shift_mask_cost_ms": round(full - results["noshift_nomask"], 2),
        }
        print(json.dumps(summary), flush=True)
        log.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
