"""Graceful shutdown: SIGTERM reaches Server.stop() + lifespan teardown.

The reference gets this from uvicorn's signal handling
(`/root/reference/Dockerfile:25`); our from-scratch server must drain
in-flight requests and run the lifespan __aexit__ (sync mutex release,
batcher stop) when docker sends SIGTERM.
"""

import os
import signal
import socket
import subprocess
import sys
import time

CHILD = r"""
import contextlib, sys
from ics_tpu.web import App, JSONResponse, Router
from ics_tpu.web.server import run

marker = sys.argv[1]

@contextlib.asynccontextmanager
async def lifespan(app):
    yield
    with open(marker, "w") as f:
        f.write("teardown-ran")

app = App(lifespan=lifespan)
router = Router(prefix="")

@router.get("/ping")
async def ping(request):
    return JSONResponse({"ok": True})

app.include_router(router)
print("PORT", int(sys.argv[2]), flush=True)
run(app, "127.0.0.1", int(sys.argv[2]))
print("CLEAN-EXIT", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_sigterm_drains_and_runs_lifespan_teardown(tmp_path):
    marker = str(tmp_path / "teardown.txt")
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep)
    )
    proc = subprocess.Popen(
        [sys.executable, "-c", CHILD, marker, str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    try:
        deadline = time.time() + 30
        up = False
        while time.time() < deadline:
            try:
                with socket.create_connection(("127.0.0.1", port), 0.5) as c:
                    c.sendall(b"GET /ping HTTP/1.1\r\nHost: x\r\n\r\n")
                    if b"200" in c.recv(1024):
                        up = True
                        break
            except OSError:
                time.sleep(0.2)
        assert up, "server never came up"

        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=20)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()

    assert proc.returncode == 0, out
    assert "CLEAN-EXIT" in out
    with open(marker) as f:
        assert f.read() == "teardown-ran"
