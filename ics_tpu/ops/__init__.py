"""TPU ops package.

``should_interpret()`` is the ONE policy for running Pallas kernels in
interpreter mode (non-TPU backends — CPU tests); it was previously
copy-pasted into four kernel modules (self-review r3).
"""


def should_interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"
