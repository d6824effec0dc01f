"""TPU ops package.

``should_interpret()`` is the ONE policy for running Pallas kernels in
interpreter mode (non-TPU backends — CPU tests); it was previously
copy-pasted into four kernel modules (self-review r3). ``round_up`` and
``pick_tile_rows`` are likewise the one copy of the row-tiling policy
shared by the depthwise and bottleneck kernels (review r5).
"""


def should_interpret() -> bool:
    import jax

    return jax.default_backend() != "tpu"


def round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def pick_tile_rows(h: int, max_tile: int = 32) -> int:
    """Row-tile height for the Pallas image kernels: the whole image when
    small (halo recompute amortizes best), otherwise the largest divisor
    of ``h`` from the candidate set <= ``max_tile``."""
    if h <= max_tile:
        return h
    for cand in (32, 28, 16, 14, 8, 7, 4, 2):
        if cand <= max_tile and h % cand == 0:
            return cand
    return h
