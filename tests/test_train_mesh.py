"""Dedicated-device training (TPU_TRAIN_DEVICES) — serving isolation.

8 virtual CPU devices (conftest): training pinned to a slice must place
every parameter/step on that slice only, leaving the other chips to
serving.
"""

import jax
import numpy as np
import pytest

from ics_tpu.parallel.mesh import train_mesh_from_settings


class _S:
    def __init__(self, spec):
        self.TPU_TRAIN_DEVICES = spec


class TestTrainMeshFromSettings:
    def test_empty_is_none(self):
        assert train_mesh_from_settings(_S("")) is None

    def test_all_uses_every_device(self):
        mesh = train_mesh_from_settings(_S("all"))
        assert mesh.devices.size == len(jax.devices())

    def test_slice_pins_exact_devices(self):
        mesh = train_mesh_from_settings(_S("4:8"))
        assert [d.id for d in mesh.devices.flat] == [
            d.id for d in jax.devices()[4:8]
        ]

    def test_single_device_slice_still_builds_mesh(self):
        mesh = train_mesh_from_settings(_S("7:8"))
        assert mesh is not None and mesh.devices.size == 1
        assert mesh.devices.flat[0].id == jax.devices()[7].id

    def test_bad_spec_is_loud(self):
        with pytest.raises(ValueError, match="slice"):
            train_mesh_from_settings(_S("x,y"))

    def test_out_of_range_slice_is_loud(self):
        # silently clamping '9:12' to fewer devices would be an invisible
        # capacity loss (same rule as mesh_from_settings)
        with pytest.raises(RuntimeError, match="out of range"):
            train_mesh_from_settings(_S("9:12"))

    def test_bare_number_is_rejected(self):
        with pytest.raises(ValueError, match="ambiguous"):
            train_mesh_from_settings(_S("6"))


class TestFineTunerOnMesh:
    def _train_on_slice(self):
        """Fine-tune 3 steps on the 4:8 device slice; assert every output
        leaf stayed on it. Returns (model, variables) for reuse."""
        from ics_tpu.models.resnet import resnet_tiny
        from ics_tpu.train.finetune import FineTuner

        mesh = train_mesh_from_settings(_S("4:8"))
        allowed = {d.id for d in jax.devices()[4:8]}
        model = resnet_tiny(num_classes=4)
        variables = model.init(jax.random.PRNGKey(0))
        tuner = FineTuner(model, image_size=64, resize_short=64, mesh=mesh)

        rng = np.random.default_rng(0)

        def batches():
            for _ in range(3):
                canvas = rng.integers(0, 256, (8, 64, 64, 3), np.uint8)
                sizes = np.full((8, 2), 64, np.int32)
                labels = rng.integers(0, 4, (8,)).astype(np.int32)
                yield canvas, sizes, labels

        variables, _, history = tuner.run(variables, batches(), max_steps=3)
        assert len(history) == 3
        assert all(np.isfinite(h["loss"]) for h in history)
        # every resulting leaf lives ONLY on the training slice
        for leaf in jax.tree_util.tree_leaves(variables):
            used = {d.id for d in leaf.sharding.device_set}
            assert used <= allowed, (used, allowed)
        return model, variables

    def test_training_stays_on_the_slice(self):
        self._train_on_slice()

    def test_eval_and_checkpoint_accept_mesh_sharded_variables(self, tmp_path):
        """The full job path after training on a slice: evaluate() (plain
        jit eval step) and orbax save/restore must work with variables
        committed to a non-default device group."""
        from ics_tpu.train.checkpoint import CheckpointManager
        from ics_tpu.train.finetune import evaluate

        model, variables = self._train_on_slice()

        rng = np.random.default_rng(1)

        def eval_batches():
            for _ in range(2):
                yield (
                    rng.integers(0, 256, (4, 64, 64, 3), np.uint8),
                    np.full((4, 2), 64, np.int32),
                    rng.integers(0, 4, (4,)).astype(np.int32),
                    4,
                )

        acc, total = evaluate(model, variables, eval_batches(),
                              image_size=64, resize_short=64)
        assert total == 8 and acc is not None and 0.0 <= acc <= 1.0

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        try:
            mgr.save(3, variables, {"dummy": np.zeros(2)}, {"step": 3})
            restored = mgr.restore(template={
                "variables": variables,
                "opt_state": {"dummy": np.zeros(2)},
                "metadata": {"step": 0},
            })
            assert int(restored["metadata"]["step"]) == 3
        finally:
            mgr.close()
