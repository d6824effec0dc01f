"""Shared measurement helpers for the scripts/ harnesses.

One RSS parser and one seeded-JPEG generator used by both soak_e2e.py
and leak_probe.py, so a future change (different RSS field, different
JPEG parameters to match a real corpus) cannot silently diverge between
the harnesses and make their numbers non-comparable (review r5).
"""
from __future__ import annotations

import io

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return 0.0


def make_jpeg(seed: int, hw=(400, 480), blur: int = 0) -> bytes:
    """Deterministic noise JPEG (quality 88, 4:2:0). ``blur`` > 0 applies
    a Gaussian blur first — closer to a camera corpus than raw noise (the
    soak evidence runs use blur=1; leak_probe keeps raw noise so its
    per-iter deltas stay comparable with the checked-in r5 probes)."""
    from PIL import Image, ImageFilter

    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 256, (*hw, 3), np.uint8))
    if blur:
        img = img.filter(ImageFilter.GaussianBlur(blur))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=88, subsampling=2)
    return buf.getvalue()
