"""Fidelity of bf16 attention scores in Swin (GELU-note methodology).

Compares swin_tiny logits on the same batch:
  A) fp32 weights + f32 scores (reference)
  B) bf16 weights + f32 scores (previous serving config)
  C) bf16 weights + bf16 scores (new serving config)
If max|C - A| is within ~1x of max|B - A|, the bf16-score deviation is
below weight-rounding noise. Appends to scripts/profile_swin.log.
"""

from __future__ import annotations

import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")

    from ics_tpu.models.swin import swin_tiny
    from ics_tpu.runtime.engine import _cast_pytree

    model = swin_tiny(num_classes=1000)
    variables = model.init(jax.random.PRNGKey(0))
    folded32 = model.fold(variables)
    folded16 = _cast_pytree(folded32, jnp.bfloat16)
    x32 = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 224, 224, 3)) * 0.5,
        jnp.float32,
    )

    @jax.jit
    def ref(folded, x):  # f32 weights -> scores stay f32 either way
        return model._forward(folded, x, scores_in_dtype=False)

    @jax.jit
    def b_f32scores(folded, x):
        return model._forward(folded, x, scores_in_dtype=False)

    @jax.jit
    def c_bf16scores(folded, x):
        return model._forward(folded, x, scores_in_dtype=True)

    a = np.asarray(ref(folded32, x32), np.float32)
    b = np.asarray(
        b_f32scores(folded16, x32.astype(jnp.bfloat16)), np.float32
    )
    c = np.asarray(
        c_bf16scores(folded16, x32.astype(jnp.bfloat16)), np.float32
    )

    def softmax(z):
        e = np.exp(z - z.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    result = {
        "max_dlogit_bf16w_f32scores": float(np.abs(b - a).max()),
        "max_dlogit_bf16w_bf16scores": float(np.abs(c - a).max()),
        "max_dprob_bf16w_f32scores": float(
            np.abs(softmax(b) - softmax(a)).max()
        ),
        "max_dprob_bf16w_bf16scores": float(
            np.abs(softmax(c) - softmax(a)).max()
        ),
        "top1_agreement_f32scores": float(
            (b.argmax(-1) == a.argmax(-1)).mean()
        ),
        "top1_agreement_bf16scores": float(
            (c.argmax(-1) == a.argmax(-1)).mean()
        ),
    }
    line = json.dumps({"fidelity_swin_bf16_scores": result})
    print(line, flush=True)
    with open("scripts/profile_swin.log", "a") as log:
        log.write(line + "\n")


if __name__ == "__main__":
    main()
