"""TPU inference management routes (net-new tier).

- ``GET /inferencia/modelos`` — registry listing (any authenticated user)
- ``GET /inferencia/status`` — engine/batcher/latency stats (admin)
- ``POST /inferencia/warmup`` — pre-compile batch buckets (admin)
- ``POST /inferencia/classificar`` — direct classify: multipart image(s) ->
  top-k classes/scores via the shared compiled step (authenticated)
- ``GET /monitor/metrics`` lives in main.py; profiler endpoints here:
  ``POST /inferencia/profiler/start|stop`` (admin) wrap jax.profiler traces
"""

from __future__ import annotations

import asyncio

from ics_tpu.models.registry import get_model, list_models
from ics_tpu.services.auth_service import get_current_user, require_admin
from ics_tpu.web import HTTPException, JSONResponse, Request, Router

router = Router(prefix="/inferencia")

_PROFILE_DIR = "/tmp/ics_tpu_profile"
_profiling = {"active": False}


def _engine(request: Request):
    engine = request.app.state.get("engine")
    if engine is None:
        raise HTTPException(503, "Serviço de inferência TPU indisponível.")
    return engine


@router.get("/modelos")
async def listar_modelos(request: Request):
    get_current_user(request)
    out = []
    # public surface: dev/CI toy models (random weights) are not offered
    for name in list_models(include_dev=False):
        spec = get_model(name)
        out.append(
            {
                "nome": name,
                "image_size": spec.image_size,
                "resize_short": spec.resize_short,
                "descricao": spec.description,
            }
        )
    return JSONResponse({"modelos": out, "total": len(out)})


@router.get("/status")
async def status_inferencia(request: Request):
    require_admin(request)
    return JSONResponse(_engine(request).status())


@router.post("/warmup")
async def warmup(request: Request):
    require_admin(request)
    service = _engine(request)
    loop = asyncio.get_running_loop()
    # under hedged serving every replica has its own engine — warming only
    # replica 0 would leave replicas >0 cold until first (hedged) traffic
    parts = getattr(service, "replicas", [service])
    for part in parts:
        await loop.run_in_executor(None, part.engine.warmup)
    return JSONResponse(
        {
            "message": "warmup concluído",
            "buckets": list(service.engine.buckets),
            "replicas": len(parts),
        }
    )


@router.post("/classificar")
async def classificar_direto(request: Request):
    get_current_user(request)
    modelo = request.query_params.get("modelo")
    pool = request.app.state.get("engine_pool")
    if modelo and pool is not None:
        from ics_tpu.models.registry import list_models

        if modelo not in list_models(include_dev=False):
            # dev/CI toy models resolve internally (tests, dryrun) but are
            # not selectable by API clients — random weights served as if
            # they were a zoo model would be silently meaningless scores
            raise HTTPException(
                422, f"Modelo desconhecido: {modelo}. Use /inferencia/modelos."
            )
        try:
            service = await pool.get(modelo)
        except (RuntimeError, ValueError) as exc:
            # deployment-config incompatibility (e.g. a non-transformer
            # trunk on a TPU_PP_STAGES pipeline mesh) — the client picked
            # a model this deployment cannot serve: 422, not 500
            raise HTTPException(
                422,
                f"Modelo '{modelo}' indisponível nesta configuração: {exc}",
            )
    else:
        service = _engine(request)
    form = await request.form()
    files = [f for _, f in form.files]
    if not files:
        raise HTTPException(422, "Envie ao menos uma imagem (campo 'files').")
    try:
        results = await service.classify_many([f.data for f in files])
    except (OSError, ValueError) as exc:
        # decode failures (PIL UnidentifiedImageError is an OSError) are the
        # client's fault; anything else is a server error and must surface
        # as a 500, not be blamed on the upload
        raise HTTPException(422, f"Uma ou mais imagens são inválidas: {exc}")
    return JSONResponse({"total": len(results), "resultados": results})


@router.post("/indexar")
async def indexar_embeddings(request: Request):
    """Backfill embeddings for synced images that lack one under the
    default model (admin). Body: ``{"limite": N}`` caps the pass (default
    500) — run repeatedly until ``pendentes`` hits 0. Images whose bytes
    can't be fetched/decoded are skipped and reported, not fatal.

    Batches ride the engine's largest bucket, so the backfill runs at
    full MXU throughput rather than image-at-a-time."""
    usuario = require_admin(request)
    service = _engine(request)
    db = request.state.db
    trainer = request.app.state.get("trainer")
    fetch = getattr(trainer, "fetch_bytes", None) if trainer else None
    if fetch is None:
        raise HTTPException(
            503, "Sem fonte de bytes (NextCloud não configurado)."
        )
    try:
        body = await request.json()
    except Exception:
        body = {}
    try:
        limite = int((body or {}).get("limite", 500))
    except (TypeError, ValueError) as exc:
        raise HTTPException(422, f"Parâmetro numérico inválido: {exc}")
    limite = max(1, min(limite, 5000))
    engine = service.engine
    modelo = engine.model_name

    from ics_tpu.crud import auditoria_crud
    from ics_tpu.crud.embedding_crud import (
        contar_embeddings,
        hashes_sem_embedding,
        upsert_embedding,
    )
    from ics_tpu.runtime.decode import decode_image, stage_batch

    pend = hashes_sem_embedding(db, modelo, limit=limite)

    def run_batches() -> tuple[int, int]:
        done = falhas = 0
        batch = max(engine.buckets)
        for start in range(0, len(pend), batch):
            chunk = pend[start:start + batch]
            images, hashes = [], []
            for item in chunk:
                try:
                    data = fetch(item["content_hash"], item["caminho_img"])
                    images.append(decode_image(data))
                    hashes.append(item["content_hash"])
                except Exception:
                    falhas += 1
            if not images:
                continue
            canvas, sizes = stage_batch(images, canvas=None)
            feats = engine.embed_staged(canvas, sizes)
            with request.app.state.db.session() as s:
                for h, vec in zip(hashes, feats):
                    upsert_embedding(s, h, modelo, vec)
                s.commit()
            done += len(hashes)
        return done, falhas

    loop = asyncio.get_running_loop()
    indexadas, falhas = await loop.run_in_executor(None, run_batches)
    total = contar_embeddings(db, modelo)
    restantes = len(hashes_sem_embedding(db, modelo, limit=1))
    auditoria_crud.registrar_evento(
        db, "indexar_embeddings", usuario.id_usu,
        {"modelo": modelo, "indexadas": indexadas, "falhas": falhas},
    )
    db.commit()
    return JSONResponse(
        {
            "modelo": modelo,
            "indexadas": indexadas,
            "falhas": falhas,
            "total_indexadas": total,
            "pendentes": restantes,
        }
    )


@router.post("/profiler/start")
async def profiler_start(request: Request):
    require_admin(request)
    if _profiling["active"]:
        raise HTTPException(409, "Profiler já ativo.")
    import jax

    jax.profiler.start_trace(_PROFILE_DIR)
    _profiling["active"] = True
    return JSONResponse({"message": "trace iniciado", "dir": _PROFILE_DIR})


@router.post("/profiler/stop")
async def profiler_stop(request: Request):
    require_admin(request)
    if not _profiling["active"]:
        raise HTTPException(409, "Profiler não está ativo.")
    import jax

    jax.profiler.stop_trace()
    _profiling["active"] = False
    return JSONResponse({"message": "trace finalizado", "dir": _PROFILE_DIR})
