"""Content-class summed-CPU bench: serial libjpeg vs restart-parallel path
(native/jpeg_mt.cpp). Run: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/bench_jpeg_mt.py — numbers in docs/benchmarks.md."""
import ics_tpu.native.imgcodec as _ic
_ic.MT_MIN_BYTES = 0  # bench forces the MT path regardless of size
import io, time
import numpy as np
from PIL import Image
from ics_tpu.native import imgcodec

def make(content, side=(2048, 1536)):
    w, h = side
    if content == "noise":
        arr = np.random.default_rng(0).integers(0, 256, (h, w, 3), np.uint8)
    elif content == "photo":
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack([
            127+90*np.sin(x/97+y/211), 127+90*np.cos(x/131-y/77),
            127+90*np.sin((x+y)/157)], -1)
        arr = np.clip(base + np.random.default_rng(1).normal(0, 8, base.shape), 0, 255).astype(np.uint8)
    else:  # mid: photo + strong texture
        y, x = np.mgrid[0:h, 0:w].astype(np.float32)
        base = np.stack([127+90*np.sin(x/17+y/11)]*3, -1)
        arr = np.clip(base + np.random.default_rng(2).normal(0, 35, base.shape), 0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, "RGB").save(buf, "JPEG", quality=90, restart_marker_rows=1)
    return buf.getvalue()

for content in ("photo", "mid", "noise"):
    blob = make(content)
    density = len(blob) / (2048*1536)
    for label, threads in (("serial", 1), ("mt2", 2)):
        # warm
        imgcodec.jpeg_coefficients(blob, threads)
        t0 = time.process_time()
        for _ in range(5):
            imgcodec.jpeg_coefficients(blob, threads)
        cpu = (time.process_time() - t0) / 5 * 1000
        print(f"{content:6s} {len(blob)/1e6:.2f}MB density={density:.3f}B/px {label}: {cpu:.1f} ms CPU")
