"""Serving-path tests for the decode-on-TPU fast lane."""

import io

import numpy as np
import pytest
from PIL import Image, ImageFilter

from ics_tpu.native import imgcodec
from ics_tpu.runtime.engine import InferenceEngine
from ics_tpu.runtime.service import InferenceService

pytestmark = pytest.mark.skipif(
    not imgcodec.available(), reason="native imgcodec not built"
)


def jpeg_420(seed, h=80, w=96):
    rng = np.random.default_rng(seed)
    img = Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8)).filter(
        ImageFilter.GaussianBlur(1)
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90, subsampling=2)
    return buf.getvalue()


def png_bytes(seed, h=60, w=70):
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8)).save(buf, "PNG")
    return buf.getvalue()


@pytest.fixture()
async def svc():
    engine = InferenceEngine(
        "mobilenetv3_small", num_classes=8, precision="fp32",
        buckets=(1, 4), canvas=128,
    )
    s = InferenceService(engine, deadline_us=500, device_decode=True)
    await s.start()
    yield s
    await s.stop()


class TestDeviceDecodeLane:
    @pytest.mark.anyio
    async def test_jpeg_420_takes_device_lane(self, svc):
        out = await svc.classify_bytes(jpeg_420(1))
        assert out["decode"] == "device:420"
        assert len(out["top_classes"]) == 5
        assert svc._stats["device_decoded"] == 1
        assert svc._stats["device_decoded_420_512px"] == 1

    @pytest.mark.anyio
    async def test_png_takes_host_lane(self, svc):
        out = await svc.classify_bytes(png_bytes(2))
        assert out["decode"] == "host"
        assert svc._stats["host_decoded"] == 1

    @pytest.mark.anyio
    async def test_444_and_422_take_device_lanes(self, svc):
        # r1 served only 4:2:0; the broadened lanes cover 4:4:4/4:2:2/gray
        for subsampling, mode in ((0, "444"), (1, "422")):
            buf = io.BytesIO()
            Image.fromarray(
                np.random.default_rng(3).integers(0, 256, (60, 64, 3), np.uint8)
            ).save(buf, "JPEG", quality=90, subsampling=subsampling)
            out = await svc.classify_bytes(buf.getvalue())
            assert out["decode"] == f"device:{mode}"

    @pytest.mark.anyio
    async def test_progressive_jpeg_takes_device_lane(self, svc):
        # libjpeg's coefficient read handles progressive scans; the device
        # back end is scan-agnostic (it sees final coefficients)
        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(7).integers(0, 256, (60, 64, 3), np.uint8)
        ).save(buf, "JPEG", quality=90, progressive=True, subsampling=2)
        out = await svc.classify_bytes(buf.getvalue())
        assert out["decode"] == "device:420"

    @pytest.mark.anyio
    async def test_grayscale_takes_device_lane(self, svc):
        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(6).integers(0, 256, (60, 64), np.uint8), "L"
        ).save(buf, "JPEG", quality=90)
        out = await svc.classify_bytes(buf.getvalue())
        assert out["decode"] == "device:gray"

    @pytest.mark.anyio
    async def test_large_jpeg_takes_wide_lane(self, svc):
        # 600px > 512px bucket -> 1024px luma bucket, still on device
        out = await svc.classify_bytes(jpeg_420(4, h=600, w=600))
        assert out["decode"] == "device:420"
        assert svc._stats["device_decoded_420_1024px"] == 1

    @pytest.mark.anyio
    async def test_giant_jpeg_falls_back(self, svc):
        # >1024px exceeds every luma bucket -> host lane
        out = await svc.classify_bytes(jpeg_420(4, h=1100, w=80))
        assert out["decode"] == "host"

    @pytest.mark.anyio
    async def test_gray_lane_agrees_with_host(self, svc):
        buf = io.BytesIO()
        Image.fromarray(
            np.random.default_rng(8).integers(0, 256, (60, 64), np.uint8), "L"
        ).filter(ImageFilter.GaussianBlur(1)).save(buf, "JPEG", quality=92)
        blob = buf.getvalue()
        dev = await svc.classify_bytes(blob)
        svc.device_decode = False
        host = await svc.classify_bytes(blob)
        svc.device_decode = True
        assert dev["decode"] == "device:gray" and host["decode"] == "host"
        assert dev["top_classes"][0] == host["top_classes"][0]

    @pytest.mark.anyio
    async def test_device_and_host_lanes_agree(self, svc):
        """Same image through both lanes -> same top-1 (decode fidelity)."""
        blob = jpeg_420(5)
        dev = await svc.classify_bytes(blob)
        svc.device_decode = False
        host = await svc.classify_bytes(blob)
        assert dev["decode"] == "device:420" and host["decode"] == "host"
        assert dev["top_classes"][0] == host["top_classes"][0]
        np.testing.assert_allclose(
            dev["scores"], host["scores"], rtol=5e-2, atol=5e-3
        )


class TestWarmAllLanes:
    @pytest.mark.anyio
    async def test_warm_start_compiles_every_lane(self):
        """VERDICT r2 item 3: start(warm=True) compiles every configured
        (sampling x luma-bucket) decode lane — no sampling pays an inline
        cold compile on its first flush."""
        engine = InferenceEngine(
            "resnet_tiny", num_classes=8, precision="fp32",
            buckets=(1,), canvas=64,
        )
        s = InferenceService(engine, deadline_us=500, device_decode=True)
        await s.start(warm=True)
        try:
            # the dominant 4:2:0 lane is warm synchronously; the rest warm
            # in the background so boot isn't gated on 7 extra compiles
            assert "420" in engine._coeff_steps
            await s._lane_warm_task
            assert set(engine._coeff_steps) == {"420", "422", "444", "gray"}
        finally:
            await s.stop()
