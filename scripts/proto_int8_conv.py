"""Feasibility probe: is int8 MXU throughput (2x bf16 on v5e) reachable
through this stack (XLA over the remote-compile tunnel)?

Times a ResNet-50 stage-2-shaped 3x3 conv and a big matmul in bf16 vs
int8 with the on-device chained harness. If int8 isn't clearly faster,
an int8 serving lane is not worth building here.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp


def bench(fn, args, iters=50):
    @jax.jit
    def chained(n, *args):
        def body(_, carry):
            bump = (carry != 0).astype(args[0].dtype)
            out = fn(args[0] + bump, *args[1:])
            return out.reshape(-1)[0].astype(jnp.int32) * 0

        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    np.asarray(chained(2, *args))
    t0 = time.perf_counter()
    np.asarray(chained(iters, *args))
    return (time.perf_counter() - t0) / iters * 1e3


def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32 if x.dtype == jnp.int8
        else jnp.float32,
    )


def matmul(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32 if a.dtype == jnp.int8
        else jnp.float32,
    )


def main():
    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}")
    # stage-2 shape: [128, 28, 28, 512] x 3x3x512->512-ish (use 128,28,28,256)
    for name, mk in [
        ("conv 3x3 [64,28,28,256]->256", lambda dt: (
            jnp.asarray(rng.integers(-3, 4, (64, 28, 28, 256)), dt),
            jnp.asarray(rng.integers(-3, 4, (3, 3, 256, 256)), dt),
            conv,
        )),
        ("matmul [8192,1024]x[1024,1024]", lambda dt: (
            jnp.asarray(rng.integers(-3, 4, (8192, 1024)), dt),
            jnp.asarray(rng.integers(-3, 4, (1024, 1024)), dt),
            matmul,
        )),
    ]:
        row = [name]
        for dt in (jnp.bfloat16, jnp.int8):
            try:
                a, b, fn = mk(dt)
                ms = bench(lambda a_, b_: fn(a_, b_), (a, b))
                row.append(f"{dt.__name__}={ms:7.3f} ms")
            except Exception as exc:
                row.append(f"{dt.__name__}=FAIL({type(exc).__name__}: "
                           f"{str(exc)[:80]})")
        print("  ".join(row))


if __name__ == "__main__":
    main()
