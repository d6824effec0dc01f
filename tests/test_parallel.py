"""Sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ics_tpu.parallel.mesh import batch_sharding, make_mesh


class TestMesh:
    def test_eight_virtual_devices(self):
        assert jax.device_count() == 8

    def test_default_mesh_2d(self):
        mesh = make_mesh()
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.shape == (4, 2)

    def test_pure_dp_mesh(self):
        mesh = make_mesh(shape=(8,), axes=("data",))
        assert mesh.devices.shape == (8,)

    def test_batch_sharding_distributes(self):
        mesh = make_mesh(shape=(8,), axes=("data",))
        x = np.zeros((16, 4, 4, 3), np.float32)
        xs = jax.device_put(x, batch_sharding(mesh, 4))
        assert len(xs.addressable_shards) == 8
        assert xs.addressable_shards[0].data.shape == (2, 4, 4, 3)


class TestDistributedInit:
    def test_noop_without_coordinator(self):
        from ics_tpu.core.config import Settings
        from ics_tpu.parallel import mesh as mesh_mod

        s = Settings(TPU_COORDINATOR_ADDRESS="")
        assert mesh_mod.maybe_initialize_distributed(s) is False

    def test_initializes_with_coordinator(self, monkeypatch):
        import jax

        from ics_tpu.core.config import Settings
        from ics_tpu.parallel import mesh as mesh_mod

        calls = {}

        def fake_init(coordinator_address, num_processes, process_id):
            calls.update(
                addr=coordinator_address, n=num_processes, pid=process_id
            )

        monkeypatch.setattr(jax.distributed, "initialize", fake_init)
        monkeypatch.setattr(mesh_mod, "_distributed_initialized", False)
        s = Settings(
            TPU_COORDINATOR_ADDRESS="10.0.0.1:8476",
            TPU_NUM_PROCESSES=4,
            TPU_PROCESS_ID=2,
        )
        assert mesh_mod.maybe_initialize_distributed(s) is True
        assert calls == {"addr": "10.0.0.1:8476", "n": 4, "pid": 2}
        # idempotent: second call doesn't re-init
        calls.clear()
        assert mesh_mod.maybe_initialize_distributed(s) is True
        assert calls == {}
        monkeypatch.setattr(mesh_mod, "_distributed_initialized", False)


class TestGraftEntry:
    def test_dryrun_multichip_8(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)

    def test_entry_compiles(self):
        import __graft_entry__

        fn, args = __graft_entry__.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 1000)
        s = float(jnp.sum(out[0]))
        assert abs(s - 1.0) < 1e-2  # softmax row
