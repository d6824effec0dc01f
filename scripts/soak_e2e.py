"""Assembled-system soak: every tier running SIMULTANEOUSLY on the chip
(VERDICT r4 item 4 — each tier is individually benched; this proves the
assembled system holds up under co-residency for a sustained window).

One process, one chip, concurrently:
  - fake NextCloud (hermetic in-process double, tests/fake_nextcloud.py)
  - sync engine ingesting a continuous image stream (WebDAV/Activity)
  - classify-on-sync ingestion hook -> TPU -> suggestion rows
  - N closed-loop serving clients (POST /inferencia/classificar, real
    JPEG multipart through the full route stack)
  - ONE background fine-tune job on the same chip (product path:
    POST /treinamento/ambiente/{id})

Sampled every --sample-s seconds: host RSS, client-side device residency
(sum of jax.live_arrays() nbytes — the axon tunnel returns None from
device.memory_stats(), so leaked *buffers we hold* are the observable;
a residency leak in our code shows here), imagens/sugestões counts,
serving latency window, train-job step. JSONL to scripts/soak_e2e.log.

Pass criteria (steady window = second half of samples):
  - RSS slope      <= --max-rss-slope   MB/min (default 5)
  - residency slope <= --max-dev-slope  MB/min (default 1)
Summary records sustained ingest img/s, suggestion lag (data_criado of
the suggestion minus data_proc of its image), serving p50/p99. Absolute
closed-loop numbers are session-relative — run
scripts/bench_single_request.py alongside for the session yardstick
(docs/benchmarks.md r4 cross-session note).

CPU smoke (tiny config, ~1 min; the 1-core host serializes compiles, so
run it ALONE):
  JAX_PLATFORMS=cpu python scripts/soak_e2e.py --minutes 0.5 \
      --model resnet_tiny --classes 16 --precision fp32 --canvas 64 \
      --buckets 1,4 --train-model resnet_tiny --train-canvas 64 \
      --train-batch 4 --train-steps 30 --no-device-decode
Chip run (the evidence run, shipped serving config incl. decode-on-TPU):
  python scripts/soak_e2e.py --minutes 10
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

LOG = os.path.join(os.path.dirname(__file__), "soak_e2e.log")


def log_line(rec: dict) -> None:
    line = json.dumps(rec)
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


from _probe_common import make_jpeg as _make_jpeg  # noqa: E402
from _probe_common import rss_mb  # noqa: E402,F401


def live_device_mb() -> float:
    import jax

    return sum(a.nbytes for a in jax.live_arrays()) / 1e6


def make_jpeg(seed: int, hw=(400, 480)) -> bytes:
    # blur=1: closer to a camera corpus than raw noise (evidence runs)
    return _make_jpeg(seed, hw, blur=1)


async def main(args) -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ics_tpu_xla_cache")

    import httpx

    from fake_nextcloud import FakeState, make_fake_nextcloud
    from ics_tpu.core import timezone as tz
    from ics_tpu.core.config import reload_settings, settings
    from ics_tpu.core.security import hash_password
    from ics_tpu.db.engine import Database

    workdir = f"/tmp/ics_soak_{os.getpid()}"
    os.makedirs(workdir, exist_ok=True)
    reload_settings(
        ENV="test",
        TPU_ENABLE_INFERENCE="true",
        TPU_MESH_SHAPE="1",
        TPU_DEFAULT_MODEL=args.model,
        TPU_NUM_CLASSES=str(args.classes),
        TPU_PRECISION=args.precision,
        TPU_CANVAS=str(args.canvas),
        TPU_BATCH_BUCKETS=args.buckets,
        TPU_BATCH_DEADLINE_US="2000",
        TPU_WARMUP_ON_STARTUP="false",
        TPU_DEVICE_DECODE="false" if args.no_device_decode else "true",
        TPU_WEIGHTS_DIR=workdir,
        TPU_EMBED_ON_SYNC="false",
    )
    from ics_tpu.main import _make_classify_on_sync, create_app
    from ics_tpu.sync.nextcloud_client import NextCloudClient
    from ics_tpu.sync.service import NextCloudSyncService

    db = Database(f"sqlite:///{workdir}/soak.db")
    app = create_app(db=db)
    await app.startup()

    # ---- fake NextCloud + sync engine with the TPU ingestion hook ----
    state = FakeState()
    state.add_folder("soak")
    blobs: dict[str, bytes] = {}

    def add_image(i: int) -> None:
        import hashlib

        data = make_jpeg(i)
        state.add_image("soak", f"img{i:05d}.jpg", data)
        # activity events carry the FULL path — a bare filename resolves
        # against the root folder, finds nothing, and is silently marked
        # failed (this exact bug stalled the r5 soak's ingest at the seed
        # images; see the r5 ingest-stall row in docs/benchmarks.md)
        state.record_event("file_created", f"soak/img{i:05d}.jpg")
        blobs[hashlib.sha256(data).hexdigest()] = data

    n_seed = args.initial_images
    for i in range(n_seed):
        add_image(i)
    nc_client = NextCloudClient(
        base_url="http://fake.test", username="tester", password="pw",
        user_path="/files/tester", max_retries=2, retry_delay=0.05,
        transport=httpx.ASGITransport(app=make_fake_nextcloud(state)),
    )
    sync = NextCloudSyncService(
        db, client=nc_client, on_image_bytes=_make_classify_on_sync(app)
    )
    t_sync0 = time.perf_counter()
    stats = await sync.sync_initial()
    log_line({
        "soak": "initial_sync", "stats": {
            k: v for k, v in stats.items() if isinstance(v, (int, str, bool))
        },
        "wall_s": round(time.perf_counter() - t_sync0, 1),
    })

    # ---- domain: ambiente + options + labels so a fine-tune can start ----
    from ics_tpu.db.models import (
        Ambiente,
        AmbienteConjuntoImagens,
        Classificacao,
        ConjuntoImagens,
        Imagem,
        Opcao,
        Usuario,
        UsuarioAmbiente,
        UsuarioConvencional,
    )

    now = tz.utcnow()
    with db.session() as s:
        adm = s.fetchone("SELECT id_adm FROM usuarios_administradores LIMIT 1")
        esp = Usuario(
            nome_completo="Especialista Soak", email="esp@soak.test",
            senha_hash=hash_password("SenhaBoa1"), data_criado=now, id_tipo=1,
        )
        s.add(esp)
        s.flush()
        con = UsuarioConvencional(cpf="15350946056", id_usu=esp.id_usu)
        s.add(con)
        s.flush()
        amb = Ambiente(
            titulo_amb="Soak", descricao_questionario="classe?",
            data_criado=now, id_adm=adm["id_adm"],
        )
        s.add(amb)
        s.flush()
        cnj = s.query(ConjuntoImagens).first()
        s.add(AmbienteConjuntoImagens(
            id_amb=amb.id_amb, id_cnj=cnj.id_cnj, data_associado=now,
        ))
        s.add(UsuarioAmbiente(
            id_con=con.id_con, id_amb=amb.id_amb, data_associado=now,
        ))
        opcoes = [Opcao(texto=t, id_amb=amb.id_amb) for t in ("alfa", "beta")]
        s.add_all(opcoes)
        s.flush()
        imgs = s.query(Imagem).all()
        for i, img in enumerate(imgs):
            s.add(Classificacao(
                data_criado=now, id_con=con.id_con,
                id_img=img.content_hash, id_opc=opcoes[i % 2].id_opc,
            ))
        s.commit()
        id_amb = str(amb.id_amb)

    # training fetches bytes synchronously from the fake corpus
    # (keyed by content hash == SHA-256 of the bytes, the imagens PK)
    app.state.trainer.fetch_bytes = (
        lambda content_hash, caminho: blobs[content_hash]
    )

    # ---- login + background fine-tune job via the product route ----
    transport = httpx.ASGITransport(app=app)
    http = httpx.AsyncClient(transport=transport, base_url="http://soak")
    r = await http.post("/auth/login", data={
        "username": settings.ADMIN_EMAIL, "password": settings.ADMIN_SENHA,
    })
    assert r.status_code == 200, r.text
    admin_hdr = {"Authorization": f"Bearer {r.json()['access_token']}"}
    r = await http.post(f"/treinamento/ambiente/{id_amb}", json={
        "modelo": args.train_model, "max_steps": args.train_steps,
        "batch_size": args.train_batch, "canvas": args.train_canvas,
        "epochs": 10_000,  # let max_steps bound it
        "eval_fraction": 0.2, "augmentar": True,
    }, headers=admin_hdr)
    assert r.status_code in (200, 201, 202), r.text
    id_job = r.json()["id_job"]
    log_line({"soak": "train_job_started", "id_job": id_job,
              "modelo": args.train_model, "max_steps": args.train_steps})

    # ---- concurrent load: serving clients + ingest stream + sampler ----
    stop = asyncio.Event()
    latencies: list[tuple[float, float]] = []  # (t, ms)
    served = [0]
    serve_blob = make_jpeg(999_999)

    async def serving_client(cid: int):
        while not stop.is_set():
            t0 = time.perf_counter()
            resp = None  # transport-level failure leaves no response
            err = None
            try:
                resp = await http.post(
                    "/inferencia/classificar",
                    files={"files": (f"c{cid}.jpg", serve_blob, "image/jpeg")},
                    headers=admin_hdr,
                )
                ok = resp.status_code == 200
            except Exception as exc:
                ok = False
                err = str(exc)[:200]
            dt = (time.perf_counter() - t0) * 1000
            if ok:
                latencies.append((time.perf_counter(), dt))
                served[0] += 1
            else:
                log_line({"soak": "serve_error", "client": cid,
                          "status": getattr(resp, "status_code", None),
                          "error": err})
                await asyncio.sleep(0.5)

    async def ingest_stream():
        i = n_seed
        while not stop.is_set():
            add_image(i)
            i += 1
            try:
                r_ = await sync.sync_periodic()
                if r_.get("skipped"):
                    log_line({"soak": "sync_skipped",
                              "reason": r_.get("reason")})
                # sync_periodic swallows per-event failures into the stats
                # dict — surface them, or an ingest stall is invisible
                # until the summary (r5 lesson)
                elif r_.get("error") or r_.get("errors"):
                    log_line({"soak": "sync_error",
                              "mode": r_.get("mode"),
                              "error": str(r_.get("error"))[:200]
                              if r_.get("error") else None,
                              "event_errors": [
                                  str(e)[:200] for e in r_.get("errors", [])
                              ][:5]})
            except Exception as exc:
                log_line({"soak": "sync_error", "error": str(exc)[:200]})
            await asyncio.sleep(args.ingest_interval_s)

    samples: list[dict] = []

    async def sampler():
        while not stop.is_set():
            t = time.perf_counter()
            with db.session() as s:
                n_img = s.fetchone("SELECT COUNT(*) AS n FROM imagens")["n"]
                n_sug = s.fetchone(
                    "SELECT COUNT(*) AS n FROM sugestoes_modelo"
                )["n"]
            window = [ms for (ts, ms) in latencies if ts > t - args.sample_s]
            jr = await http.get(f"/treinamento/jobs/{id_job}",
                                headers=admin_hdr)
            job = jr.json() if jr.status_code == 200 else {}
            row = {
                "soak": "sample",
                "t_s": round(t - t_start, 1),
                "rss_mb": round(rss_mb(), 1),
                "device_mb": round(live_device_mb(), 1),
                "imagens": n_img,
                "sugestoes": n_sug,
                "served_total": served[0],
                "serve_p50_ms": (round(float(np.percentile(window, 50)), 1)
                                 if window else None),
                "train_state": job.get("status"),
                "train_step": job.get("passos"),
            }
            samples.append(row)
            log_line(row)
            await asyncio.sleep(args.sample_s)

    t_start = time.perf_counter()
    tasks = [
        asyncio.ensure_future(serving_client(i)) for i in range(args.clients)
    ] + [asyncio.ensure_future(ingest_stream()),
         asyncio.ensure_future(sampler())]
    await asyncio.sleep(args.minutes * 60)
    stop.set()
    await asyncio.gather(*tasks, return_exceptions=True)

    # ---- teardown + verdicts ----
    jr = await http.get(f"/treinamento/jobs/{id_job}", headers=admin_hdr)
    job = jr.json() if jr.status_code == 200 else {}
    if job.get("status") in ("executando", "pendente"):
        await http.post(f"/treinamento/jobs/{id_job}/cancelar",
                        headers=admin_hdr)
        # the cancel is cooperative (between steps) and the training
        # thread may be mid-checkpoint: WAIT for it, or its orbax writes
        # race the interpreter shutdown
        for _ in range(120):
            jr = await http.get(f"/treinamento/jobs/{id_job}",
                                headers=admin_hdr)
            job = jr.json() if jr.status_code == 200 else job
            if job.get("status") not in ("executando", "pendente"):
                break
            await asyncio.sleep(1.0)

    with db.session() as s:
        n_img_final = s.fetchone("SELECT COUNT(*) AS n FROM imagens")["n"]
        n_sug_final = s.fetchone(
            "SELECT COUNT(*) AS n FROM sugestoes_modelo"
        )["n"]
        lag_rows = s.fetchall(
            "SELECT i.data_proc AS t_img, g.data_criado AS t_sug "
            "FROM sugestoes_modelo g JOIN imagens i "
            "ON i.content_hash = g.id_img"
        )
    from datetime import datetime

    lags = []
    for r_ in lag_rows:
        try:
            lags.append(
                (datetime.fromisoformat(r_["t_sug"])
                 - datetime.fromisoformat(r_["t_img"])).total_seconds()
            )
        except Exception:
            pass

    def slope_mb_per_min(key: str) -> float:
        steady = samples[len(samples) // 2:]
        if len(steady) < 3:
            return 0.0
        xs = np.asarray([r["t_s"] for r in steady]) / 60.0
        ys = np.asarray([r[key] for r in steady])
        return float(np.polyfit(xs, ys, 1)[0])

    wall_min = (time.perf_counter() - t_start) / 60.0
    all_lat = [ms for _, ms in latencies]
    rss_slope = slope_mb_per_min("rss_mb")
    dev_slope = slope_mb_per_min("device_mb")
    summary = {
        "soak": "summary",
        "minutes": round(wall_min, 2),
        "model": args.model,
        "train_model": args.train_model,
        "clients": args.clients,
        "served_total": served[0],
        "serve_req_per_s": round(served[0] / (wall_min * 60), 2),
        "serve_p50_ms": round(float(np.percentile(all_lat, 50)), 1)
        if all_lat else None,
        "serve_p99_ms": round(float(np.percentile(all_lat, 99)), 1)
        if all_lat else None,
        "ingested_images": n_img_final - n_seed,
        "ingest_img_per_min": round((n_img_final - n_seed) / wall_min, 2),
        "suggestions": n_sug_final,
        "suggestion_lag_p50_s": round(float(np.percentile(lags, 50)), 1)
        if lags else None,
        "suggestion_lag_p99_s": round(float(np.percentile(lags, 99)), 1)
        if lags else None,
        "train_final_state": job.get("status"),
        "train_final_step": job.get("passos"),
        "rss_slope_mb_per_min": round(rss_slope, 3),
        "device_slope_mb_per_min": round(dev_slope, 3),
        "rss_mb_final": samples[-1]["rss_mb"] if samples else None,
        "device_mb_final": samples[-1]["device_mb"] if samples else None,
        # leaks only GROW: a negative slope (e.g. the train job finishing
        # mid-window and releasing its params/opt state) is memory being
        # returned, not a leak — the r5 first run failed pass_device on
        # exactly that artifact (-20.7 MB/min)
        "pass_rss": rss_slope <= args.max_rss_slope,
        "pass_device": dev_slope <= args.max_dev_slope,
        # the ingest stream is a tier under test: zero ingested images
        # means the sync->TPU hook never exercised (r5 first run passed
        # everything else while ingest was silently stalled)
        "pass_ingest": (n_img_final - n_seed) > 0,
        "ts": round(time.time(), 1),
    }
    log_line(summary)
    await http.aclose()
    await nc_client.aclose()
    await app.shutdown()
    reload_settings()
    ok = (summary["pass_rss"] and summary["pass_device"]
          and summary["pass_ingest"])
    return 0 if ok else 1


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--minutes", type=float, default=10.0)
    p.add_argument("--model", default="resnet50")
    p.add_argument("--classes", type=int, default=1000)
    p.add_argument("--precision", default="bf16")
    p.add_argument("--canvas", type=int, default=512)
    p.add_argument("--buckets", default="1,8,32")
    p.add_argument("--no-device-decode", action="store_true",
                   help="shipped default is decode-on-TPU ON; this forces "
                        "the host-decode pixel lane (CPU smokes)")
    p.add_argument("--clients", type=int, default=4)
    p.add_argument("--initial-images", type=int, default=24)
    p.add_argument("--ingest-interval-s", type=float, default=2.0)
    p.add_argument("--sample-s", type=float, default=15.0)
    p.add_argument("--train-model", default="resnet18")
    p.add_argument("--train-canvas", type=int, default=256)
    p.add_argument("--train-batch", type=int, default=8)
    p.add_argument("--train-steps", type=int, default=2000)
    p.add_argument("--max-rss-slope", type=float, default=5.0,
                   help="MB/min over the steady window")
    p.add_argument("--max-dev-slope", type=float, default=1.0)
    args = p.parse_args()
    raise SystemExit(asyncio.run(main(args)))
