"""Cooperative cancellation of fine-tune jobs (POST /treinamento/jobs/{id}/cancelar)."""

import asyncio

import httpx
import pytest

from tests.test_train_serve_e2e import ADMIN, _login, app  # noqa: F401


@pytest.mark.anyio
async def test_cancel_running_job(app):  # noqa: F811
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb

        # long job: enough steps that cancellation lands mid-run
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 10_000,
                  "batch_size": 4, "epochs": 10_000, "canvas": 64},
            headers=admin,
        )
        assert r.status_code == 202, r.text
        id_job = r.json()["id_job"]

        # unknown job -> 404
        r = await c.post("/treinamento/jobs/nope/cancelar", headers=admin)
        assert r.status_code == 404

        # wait for it to actually run a step, then cancel
        for _ in range(200):
            r = await c.get(f"/treinamento/jobs/{id_job}", headers=admin)
            if r.json()["passos"] >= 1:
                break
            await asyncio.sleep(0.1)
        r = await c.post(f"/treinamento/jobs/{id_job}/cancelar", headers=admin)
        assert r.status_code == 202, r.text

        for _ in range(300):
            r = await c.get(f"/treinamento/jobs/{id_job}", headers=admin)
            status = r.json()
            if status["status"] not in ("pendente", "executando"):
                break
            await asyncio.sleep(0.1)
        assert status["status"] == "cancelado", status
        # nothing registered/promoted
        assert status["id_mod"] is None
        r = await c.get(f"/treinamento/modelos?id_amb={id_amb}", headers=admin)
        assert r.json()["total"] == 0

        # cancelling a finished job -> 409
        r = await c.post(f"/treinamento/jobs/{id_job}/cancelar", headers=admin)
        assert r.status_code == 409

        cancelled_steps = status["passos"]
        assert cancelled_steps >= 1

        # the slot is free again AND the cancelled work is resumable:
        # retomar_de reuses the cancelled job's checkpoint, so the new
        # job's first recorded step continues past the cancelled run
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 2, "batch_size": 4,
                  "epochs": 50, "canvas": 64, "retomar_de": id_job},
            headers=admin,
        )
        assert r.status_code == 202, r.text
        id_job2 = r.json()["id_job"]
        for _ in range(600):
            r = await c.get(f"/treinamento/jobs/{id_job2}", headers=admin)
            if r.json()["status"] in ("concluido", "falhou"):
                break
            await asyncio.sleep(0.25)
        status2 = r.json()
        assert status2["status"] == "concluido", status2
        assert status2["historico"][0]["step"] > cancelled_steps

        # the cancel was audited
        r = await c.get(
            "/auditoria/logs?nome_evento=cancelar_treinamento", headers=admin
        )
        assert r.status_code == 200

        # checkpoint GC: the cancelled job's dir (reused by the resumed job
        # which REGISTERED a model from it) must survive; a synthetic
        # orphan dir must go
        import os
        import pathlib
        import time as time_mod

        from ics_tpu.core.config import settings

        root = pathlib.Path(settings.TPU_WEIGHTS_DIR)
        orphan = root / id_amb / "resnet_tiny" / "deadbeef0000"
        orphan.mkdir(parents=True)
        (orphan / "marker.txt").write_text("x")
        fresh = root / id_amb / "resnet_tiny" / "deadbeef0001"
        fresh.mkdir(parents=True)  # recent mtime: a possible live writer
        old = time_mod.time() - 3600
        os.utime(orphan, (old, old))  # past the live-writer grace window
        r = await c.post("/treinamento/gc", headers=admin)
        assert r.status_code == 200, r.text
        gc = r.json()
        assert f"{id_amb}/resnet_tiny/deadbeef0000" in gc["removidos"]
        assert not orphan.exists()
        # recent unreferenced dir survives (import-in-flight grace), as
        # does the registered version's dir
        assert fresh.exists()
        assert gc["mantidos"] >= 2



@pytest.mark.anyio
async def test_retomar_de_traversal_rejected(app):  # noqa: F811
    """review r4: retomar_de interpolates into the checkpoint PATH — a
    '../'-style value could make the job write into another ambiente's
    registered model dir. Only a 12-hex job id is accepted."""
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb
        for bad in ("../../x/y/z", "..", "abc/def", "ABCDEF123456", "zz"):
            r = await c.post(
                f"/treinamento/ambiente/{id_amb}",
                json={"modelo": "resnet_tiny", "max_steps": 1,
                      "batch_size": 4, "canvas": 64, "retomar_de": bad},
                headers=admin,
            )
            assert r.status_code == 422, (bad, r.status_code, r.text)


@pytest.mark.anyio
async def test_eval_fraction_bounds_rejected(app):  # noqa: F811
    """review r4: eval_fraction=1.0 silently emptied the TRAIN split."""
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb
        for bad in (1.0, 1.5, -0.1):
            r = await c.post(
                f"/treinamento/ambiente/{id_amb}",
                json={"modelo": "resnet_tiny", "max_steps": 1,
                      "batch_size": 4, "canvas": 64,
                      "eval_fraction": bad},
                headers=admin,
            )
            assert r.status_code == 422, (bad, r.status_code, r.text)
        # batch_size=0 is falsy -> the route's `or 32` default applies;
        # a NEGATIVE value reaches the validator and must 422
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 1,
                  "batch_size": -1, "canvas": 64},
            headers=admin,
        )
        assert r.status_code == 422


@pytest.mark.anyio
async def test_zero_steps_registers_nothing(app):  # noqa: F811
    """review r4: a job whose every fetch fails (NextCloud down) executed
    zero steps yet registered AND promoted an empty-checkpoint version —
    bricking serving for the ambiente. It must fail instead."""
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb
        trainer = app.state.trainer
        real_fetch = trainer.fetch_bytes
        trainer.fetch_bytes = lambda h, p: (_ for _ in ()).throw(
            IOError("nextcloud fora do ar")
        )
        try:
            r = await c.post(
                f"/treinamento/ambiente/{id_amb}",
                json={"modelo": "resnet_tiny", "max_steps": 3,
                      "batch_size": 4, "canvas": 64},
                headers=admin,
            )
            assert r.status_code == 202, r.text
            id_job = r.json()["id_job"]
            for _ in range(300):
                r = await c.get(f"/treinamento/jobs/{id_job}", headers=admin)
                status = r.json()
                if status["status"] not in ("pendente", "executando"):
                    break
                await asyncio.sleep(0.1)
            assert status["status"] == "falhou", status
            assert "nenhum passo" in (status["erro"] or "")
            assert status["id_mod"] is None
            r = await c.get(
                f"/treinamento/modelos?id_amb={id_amb}", headers=admin
            )
            assert r.json()["total"] == 0
        finally:
            trainer.fetch_bytes = real_fetch
