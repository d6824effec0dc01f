"""Pipeline parallelism as a PRODUCT path (VERDICT r3 next-step #1).

Round 3 proved parallel/pipeline.py exact but nothing could reach it:
no setting engaged it and InferenceService never called it. These tests
boot the serving stack from settings (TPU_PP_STAGES) on the virtual
8-device CPU mesh and assert the pipelined engine serves real requests
with predictions identical to the unpipelined engine on the same weights.
"""

import asyncio
import io

import numpy as np
import pytest

from ics_tpu.core.config import reload_settings, settings


@pytest.fixture(autouse=True)
def _restore_settings():
    yield
    reload_settings()


def _blobs(n, rng):
    from PIL import Image

    out = []
    for _ in range(n):
        im = Image.fromarray(
            rng.integers(0, 256, (48, 48, 3), np.uint8), "RGB"
        )
        buf = io.BytesIO()
        im.save(buf, "JPEG", quality=90)
        out.append(buf.getvalue())
    return out


class TestPPSettingsBoot:
    def test_mesh_from_settings_builds_pp_axis(self):
        import jax

        from ics_tpu.parallel.mesh import mesh_from_settings

        reload_settings(TPU_PP_STAGES="4")
        mesh = mesh_from_settings(settings)
        assert mesh is not None and mesh.axis_names == ("pp",)
        assert mesh.shape["pp"] == 4
        assert len(jax.devices()) >= 4

    def test_pp_conflicts_with_explicit_mesh_shape(self):
        from ics_tpu.parallel.mesh import mesh_from_settings

        reload_settings(TPU_PP_STAGES="4", TPU_MESH_SHAPE="4,2")
        with pytest.raises(RuntimeError, match="mutuamente"):
            mesh_from_settings(settings)

    def test_pp_needs_enough_devices(self):
        from ics_tpu.parallel.mesh import mesh_from_settings

        reload_settings(TPU_PP_STAGES="16")
        with pytest.raises(RuntimeError, match="16"):
            mesh_from_settings(settings)

    def test_pp_rejects_non_transformer_model(self):
        from ics_tpu.runtime.service import InferenceService

        reload_settings(TPU_PP_STAGES="4", TPU_DEFAULT_MODEL="resnet_tiny")
        with pytest.raises(ValueError, match="ViT"):
            InferenceService.from_settings(
                num_classes=8, precision="fp32", canvas=64,
            )

    def test_pp_rejects_indivisible_depth(self):
        from ics_tpu.runtime.service import InferenceService

        # vit_tiny has depth 8; 3 stages don't divide it
        reload_settings(TPU_PP_STAGES="3", TPU_DEFAULT_MODEL="vit_tiny")
        with pytest.raises(ValueError, match="profundidade"):
            InferenceService.from_settings(
                num_classes=8, precision="fp32", canvas=64,
            )


class TestPPServing:
    def _service(self, **env):
        from ics_tpu.runtime.service import InferenceService

        reload_settings(
            TPU_PP_STAGES="4",
            TPU_PP_MICROBATCHES="2",
            TPU_DEFAULT_MODEL="vit_tiny",
            TPU_BATCH_BUCKETS="4",
            TPU_DEVICE_DECODE="true",  # must be force-disabled by PP
            TPU_BATCH_DEADLINE_US="20000",
            **env,
        )
        return InferenceService.from_settings(
            num_classes=8, precision="fp32", canvas=64,
        )

    def test_serves_batch_through_pipeline(self):
        service = self._service()
        engine = service.engine
        assert engine.mesh is not None and engine.mesh.axis_names == ("pp",)
        assert engine.pp_microbatches == 2
        # PP force-disables the decode-on-TPU lanes
        assert service.device_decode is False
        rng = np.random.default_rng(0)
        blobs = _blobs(4, rng)

        async def serve():
            await service.start()
            try:
                return await service.classify_many(blobs)
            finally:
                await service.stop()

        results = asyncio.run(serve())
        assert len(results) == 4
        assert all(np.isfinite(r["scores"]).all() for r in results)
        assert service.batcher.stats["flushes"] >= 1

    def test_pp_predictions_match_unpipelined(self):
        """The WHOLE point: same weights, same input — the pipelined
        product step must return the unpipelined engine's predictions."""
        import jax

        from ics_tpu.runtime.engine import InferenceEngine

        service = self._service()
        pp_engine = service.engine
        plain = InferenceEngine(
            "vit_tiny", num_classes=8, precision="fp32",
            buckets=(4,), canvas=64,
            variables=jax.tree_util.tree_map(
                np.asarray, pp_engine.variables
            ),
        )
        rng = np.random.default_rng(1)
        canvas = rng.integers(0, 256, (4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 56, np.int32)
        idx_pp, scores_pp = pp_engine.predict_staged(canvas, sizes)
        idx_pl, scores_pl = plain.predict_staged(canvas, sizes)
        np.testing.assert_array_equal(idx_pp, idx_pl)
        np.testing.assert_allclose(scores_pp, scores_pl, atol=1e-5)

    def test_buckets_round_to_microbatches(self):
        from ics_tpu.runtime.engine import InferenceEngine
        from ics_tpu.parallel.mesh import make_mesh
        import jax

        mesh = make_mesh((4,), ("pp",), devices=jax.devices()[:4])
        engine = InferenceEngine(
            "vit_tiny", num_classes=8, precision="fp32",
            buckets=(1, 3, 7), canvas=64, mesh=mesh, pp_microbatches=4,
        )
        assert engine.buckets == (4, 8)

    def test_coeff_lane_refused_under_pp(self):
        service = self._service()
        with pytest.raises(RuntimeError, match="pipeline"):
            service.engine._get_coeff_step("420")


class TestPPComposesWithReplicas:
    @pytest.mark.anyio
    async def test_pp_stages_honored_inside_each_replica(self):
        """review r4 finding: TPU_PP_STAGES + TPU_SERVING_REPLICAS
        previously built plain ('data',) replica meshes and silently
        DROPPED PP — the documented composition is replicas x pipeline."""
        from ics_tpu.runtime.hedging import HedgedInferenceService

        reload_settings(
            TPU_PP_STAGES="4",
            TPU_PP_MICROBATCHES="2",
            TPU_SERVING_REPLICAS="2",
            TPU_DEFAULT_MODEL="vit_tiny",
            TPU_BATCH_BUCKETS="4",
            TPU_DEVICE_DECODE="true",  # must be force-disabled under PP
            TPU_BATCH_DEADLINE_US="20000",
        )
        hedged = HedgedInferenceService.from_settings(
            num_classes=8, precision="fp32", canvas=64,
        )
        assert len(hedged.replicas) == 2
        for r in hedged.replicas:
            assert r.engine.mesh.axis_names == ("pp",)
            assert r.engine.mesh.shape["pp"] == 4
            assert r.engine.pp_microbatches == 2
            assert r.device_decode is False
        d0 = {d.id for d in hedged.replicas[0].engine.mesh.devices.flat}
        d1 = {d.id for d in hedged.replicas[1].engine.mesh.devices.flat}
        assert d0.isdisjoint(d1)
        await hedged.start()
        try:
            rng = np.random.default_rng(3)
            out = await hedged.classify_many(_blobs(2, rng))
            assert len(out) == 2
            assert all(np.isfinite(r["scores"]).all() for r in out)
        finally:
            await hedged.stop()

    def test_pp_replica_group_size_mismatch_fails_loudly(self):
        from ics_tpu.runtime.hedging import HedgedInferenceService

        reload_settings(
            TPU_PP_STAGES="4",
            TPU_SERVING_REPLICAS="4",  # 8 devices / 4 = 2 per group != 4
            TPU_DEFAULT_MODEL="vit_tiny",
        )
        with pytest.raises(RuntimeError, match="exatamente 4"):
            HedgedInferenceService.from_settings(
                num_classes=8, precision="fp32", canvas=64,
            )


class TestPPDiagnosticGuards:
    def test_tta_explain_embed_fail_cleanly_under_pp(self):
        """review r4 finding: the diagnostic steps run the full trunk in
        one plain jit — under PP that's a device OOM by premise. They must
        fail cleanly like the coeff lanes, never build the step."""
        from ics_tpu.parallel.mesh import make_mesh
        from ics_tpu.runtime.engine import InferenceEngine

        import jax

        mesh = make_mesh((4,), ("pp",), devices=jax.devices()[:4])
        engine = InferenceEngine(
            "vit_tiny", num_classes=8, precision="fp32", buckets=(4,),
            canvas=64, mesh=mesh, pp_microbatches=2,
        )
        canvas = np.zeros((4, 64, 64, 3), np.uint8)
        sizes = np.full((4, 2), 48, np.int32)
        with pytest.raises(RuntimeError, match="TTA"):
            engine.predict_staged_tta(canvas, sizes)
        with pytest.raises(RuntimeError, match="pipeline"):
            engine.embed_staged(canvas, sizes)
        with pytest.raises(RuntimeError, match="pipeline"):
            engine.explain_staged(canvas, sizes, class_idx=np.zeros(4, np.int32))

    @pytest.mark.anyio
    async def test_pool_disables_device_decode_under_pp(self):
        """review r4 finding: pool-created models inherited the pp mesh
        but kept device_decode=True against an engine that hard-raises on
        coeff lanes — every JPEG to a pool model 500'd."""
        from ics_tpu.runtime.service import InferenceServicePool

        reload_settings(TPU_PP_MICROBATCHES="2")
        from ics_tpu.parallel.mesh import make_mesh

        import jax

        mesh = make_mesh((4,), ("pp",), devices=jax.devices()[:4])
        pool = InferenceServicePool(
            default_model="vit_tiny", deadline_us=20000,
            device_decode=True,  # must be overridden per-engine under PP
            num_classes=8, precision="fp32", buckets=(4,), canvas=64,
            mesh=mesh, pp_microbatches=2,
        )
        svc = await pool.get("vit_tiny")
        try:
            assert svc.engine.pp_microbatches == 2
            assert svc.device_decode is False
            rng = np.random.default_rng(4)
            out = await svc.classify_bytes(_blobs(1, rng)[0])
            assert np.isfinite(out["scores"]).all()
        finally:
            await pool.stop()
