"""2-process DCN smoke test (VERDICT r2 item 4; SURVEY §2.3 comm row).

``maybe_initialize_distributed`` is the multi-host seam: on a real pod each
host process calls it with TPU_COORDINATOR_ADDRESS and GSPMD then places
collectives across DCN. No multi-host TPU exists here, but the SAME wiring
runs multi-process on CPU: two local processes, process 0 hosting the
coordinator, a global mesh over both processes' devices, and a real
cross-process collective (sum over a process-sharded array, via gloo).

This executes the code path end-to-end — config object -> jax.distributed
-> global device view -> mesh -> collective — not just the function's
no-op branch (which tests/test_parallel.py covers).
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent(
    """
    import sys

    import jax

    from ics_tpu.core.config import Settings
    from ics_tpu.parallel import mesh as mesh_mod

    pid = int(sys.argv[1])
    port = sys.argv[2]
    s = Settings(
        TPU_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
        TPU_NUM_PROCESSES=2,
        TPU_PROCESS_ID=pid,
    )
    assert mesh_mod.maybe_initialize_distributed(s) is True
    assert jax.process_count() == 2, jax.process_count()
    devices = jax.devices()
    assert len(devices) == 4, devices  # 2 processes x 2 local devices
    mesh = mesh_mod.make_mesh(
        shape=(len(devices),), axes=("data",), devices=devices
    )
    assert mesh.devices.size == 4

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    local = np.full((2, 4), pid + 1, np.float32)
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local
    )
    total = jax.jit(
        lambda a: jax.numpy.sum(a),
        out_shardings=NamedSharding(mesh, P()),
    )(arr)
    # rows from p0 are 1s (sum 8), from p1 are 2s (sum 16)
    assert float(jax.device_get(total)) == 24.0

    # the DP TRAINING seam over DCN: a jitted grad+SGD step with the
    # batch sharded over both processes' devices and params replicated —
    # GSPMD must insert the cross-process gradient reduction, and both
    # processes must land on IDENTICAL new params
    import jax.numpy as jnp

    rep = NamedSharding(mesh, P())
    data_sh = NamedSharding(mesh, P("data"))
    w = jax.make_array_from_callback(
        (4,), rep, lambda idx: np.asarray([1.0, -2.0, 0.5, 3.0], np.float32)[idx]
    )
    # each process contributes ITS half of the global batch (distinct rows)
    x_local = np.arange(8, dtype=np.float32).reshape(2, 4) + 10 * pid
    y_local = np.asarray([1.0, -1.0], np.float32) + pid
    x = jax.make_array_from_process_local_data(data_sh, x_local)
    y = jax.make_array_from_process_local_data(data_sh, y_local)

    def loss_fn(w_, x_, y_):
        return jnp.mean((x_ @ w_ - y_) ** 2)

    @jax.jit
    def train_step(w_, x_, y_):
        loss, g = jax.value_and_grad(loss_fn)(w_, x_, y_)
        return w_ - 0.01 * g, loss

    new_w, loss = train_step(w, x, y)
    new_w_host = np.asarray(jax.device_get(
        jax.jit(lambda a: a, out_shardings=rep)(new_w)
    ))
    # reference: the same step on the CONCATENATED global batch (order:
    # process 0's rows then process 1's)
    xg = np.concatenate([np.arange(8, dtype=np.float32).reshape(2, 4),
                         np.arange(8, dtype=np.float32).reshape(2, 4) + 10])
    yg = np.concatenate([[1.0, -1.0], [2.0, 0.0]]).astype(np.float32)
    wg = np.asarray([1.0, -2.0, 0.5, 3.0], np.float32)
    g_ref = (2.0 / 4.0) * xg.T @ (xg @ wg - yg)
    ref = wg - 0.01 * g_ref
    np.testing.assert_allclose(new_w_host, ref, rtol=1e-5)
    assert np.isfinite(float(jax.device_get(loss)))
    print("INIT_OK PSUM_OK TRAIN_OK", flush=True)
    """
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.anyio
def test_two_process_distributed_init_and_collective(tmp_path):
    child = tmp_path / "dcn_child.py"
    child.write_text(_CHILD)
    port = _free_port()
    # clean environment: the repo on PYTHONPATH, CPU backend with 2 local
    # devices per process (the axon sitecustomize must NOT preload — the
    # tunnel backend is single-process by construction)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "PYTHONPATH": repo,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "HOME": os.environ.get("HOME", "/root"),
    }
    procs = [
        subprocess.Popen(
            [sys.executable, str(child), str(rank), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in (0, 1)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed init deadlocked (coordinator handshake)")
        outputs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert "INIT_OK PSUM_OK TRAIN_OK" in out, f"rank {rank}:\n{out}"
