"""Classify-on-sync (VERDICT r1 item 10): the sync engine is the TPU
ingestion front — every image it downloads gets a model suggestion row,
surfaced in the paging payload.

Hermetic: fake NextCloud + tiny model on the CPU backend.
"""

import asyncio

import httpx
import pytest

from ics_tpu.core import timezone as tz
from ics_tpu.core.security import hash_password
from ics_tpu.db.engine import Database
from ics_tpu.db.models import (
    Ambiente,
    AmbienteConjuntoImagens,
    ConjuntoImagens,
    Opcao,
    SugestaoModelo,
    UsuarioAmbiente,
    UsuarioConvencional,
    Usuario,
)
from ics_tpu.sync.nextcloud_client import NextCloudClient
from ics_tpu.sync.service import NextCloudSyncService

from tests.fake_nextcloud import FakeState, make_fake_nextcloud, make_jpeg


@pytest.fixture()
async def app(tmp_path):
    from ics_tpu.core.config import reload_settings
    from ics_tpu.main import create_app

    reload_settings(
        TPU_ENABLE_INFERENCE="true",
        TPU_MESH_SHAPE="1",
        TPU_DEFAULT_MODEL="resnet_tiny",
        TPU_NUM_CLASSES="16",
        TPU_PRECISION="fp32",
        TPU_CANVAS="64",
        TPU_BATCH_BUCKETS="4",
        TPU_BATCH_DEADLINE_US="5000",
        TPU_WARMUP_ON_STARTUP="false",
        TPU_DEVICE_DECODE="false",
    )
    try:
        db = Database(f"sqlite:///{tmp_path}/cos.db")
        a = create_app(db=db)
        await a.startup()
        yield a
        await a.shutdown()
    finally:
        reload_settings()


@pytest.mark.anyio
async def test_sync_stores_and_surfaces_suggestions(app):
    from ics_tpu.main import _make_classify_on_sync

    state = FakeState()
    state.add_folder("plantas")
    state.add_image("plantas", "a.jpg", make_jpeg(1))
    state.add_image("plantas", "b.jpg", make_jpeg(2))
    client = NextCloudClient(
        base_url="http://fake.test", username="tester", password="pw",
        user_path="/files/tester", max_retries=2, retry_delay=0.01,
        transport=httpx.ASGITransport(app=make_fake_nextcloud(state)),
    )
    db = app.state.db

    # the app-lifespan wiring under test: sync engine with the TPU hook
    sync = NextCloudSyncService(
        db, client=client, on_image_bytes=_make_classify_on_sync(app)
    )
    stats = await sync.sync_initial()
    assert stats.get("images_created", 0) == 2 or stats.get("mode")

    # classification tasks are fire-and-forget; let them drain
    for _ in range(100):
        await asyncio.sleep(0.1)
        with db.session() as s:
            n = s.query(SugestaoModelo).count()
        if n >= 2:
            break
    assert n == 2, f"expected 2 suggestion rows, got {n}"
    with db.session() as s:
        rows = s.query(SugestaoModelo).all()
        assert all(r.modelo == "resnet_tiny" for r in rows)
        assert all(r.id_amb is None for r in rows)  # generic suggestions
        assert all(r.score is not None and r.classes for r in rows)

    # surface check: specialist pages through an ambiente over the synced
    # conjunto and sees the generic suggestion on each image
    now = tz.utcnow()
    with db.session() as s:
        cnj = s.query(ConjuntoImagens).first()
        adm = s.fetchone("SELECT id_adm FROM usuarios_administradores LIMIT 1")
        esp = Usuario(
            nome_completo="Especialista Um", email="esp@x.com",
            senha_hash=hash_password("SenhaBoa1"), data_criado=now, id_tipo=1,
        )
        s.add(esp)
        s.flush()
        con = UsuarioConvencional(cpf="2" * 11, id_usu=esp.id_usu)
        s.add(con)
        s.flush()
        amb = Ambiente(
            titulo_amb="P", descricao_questionario="d",
            data_criado=now, id_adm=adm["id_adm"],
        )
        s.add(amb)
        s.flush()
        s.add(AmbienteConjuntoImagens(
            id_amb=amb.id_amb, id_cnj=cnj.id_cnj, data_associado=now,
        ))
        s.add(UsuarioAmbiente(
            id_con=con.id_con, id_amb=amb.id_amb, data_associado=now,
        ))
        s.add_all([
            Opcao(texto="x", id_amb=amb.id_amb),
            Opcao(texto="y", id_amb=amb.id_amb),
        ])
        s.commit()
        id_amb = str(amb.id_amb)

    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        r = await c.post(
            "/auth/login",
            data={"username": "esp@x.com", "password": "SenhaBoa1"},
        )
        assert r.status_code == 200, r.text
        r = await c.get(f"/classificacoes/ambiente/{id_amb}/inicializar")
        assert r.status_code == 200, r.text
        imagens = r.json()["imagens"]
        assert len(imagens) == 2
        for img in imagens:
            sug = img["sugestao_modelo"]
            assert sug is not None
            assert sug["modelo"] == "resnet_tiny"
            assert sug["classes"]
    await client.aclose()


@pytest.mark.anyio
async def test_embed_on_sync_indexes_embeddings(tmp_path):
    """TPU_EMBED_ON_SYNC: the ingestion hook also writes an L2-normalized
    embedding per synced image — the similarity index is current the
    moment sync lands the bytes (no backfill pass needed)."""
    import numpy as np

    from ics_tpu.core.config import reload_settings
    from ics_tpu.crud.embedding_crud import carregar_corpus
    from ics_tpu.main import _make_classify_on_sync, create_app

    reload_settings(
        TPU_ENABLE_INFERENCE="true",
        TPU_MESH_SHAPE="1",
        TPU_DEFAULT_MODEL="resnet_tiny",
        TPU_NUM_CLASSES="16",
        TPU_PRECISION="fp32",
        TPU_CANVAS="64",
        TPU_BATCH_BUCKETS="4",
        TPU_BATCH_DEADLINE_US="5000",
        TPU_WARMUP_ON_STARTUP="false",
        TPU_DEVICE_DECODE="false",
        TPU_EMBED_ON_SYNC="true",
    )
    try:
        db = Database(f"sqlite:///{tmp_path}/eos.db")
        app = create_app(db=db)
        await app.startup()
        state = FakeState()
        state.add_folder("fotos")
        state.add_image("fotos", "a.jpg", make_jpeg(7))
        state.add_image("fotos", "b.jpg", make_jpeg(8))
        client = NextCloudClient(
            base_url="http://fake.test", username="tester", password="pw",
            user_path="/files/tester", max_retries=2, retry_delay=0.01,
            transport=httpx.ASGITransport(app=make_fake_nextcloud(state)),
        )
        sync = NextCloudSyncService(
            db, client=client, on_image_bytes=_make_classify_on_sync(app)
        )
        await sync.sync_initial()
        for _ in range(100):
            await asyncio.sleep(0.1)
            with db.session() as s:
                hashes, mat = carregar_corpus(s, "resnet_tiny")
            if len(hashes) >= 2:
                break
        assert len(hashes) == 2
        norms = np.linalg.norm(mat.astype(np.float32), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=5e-3)
        # suggestions were written too (the hook does both)
        with db.session() as s:
            assert s.query(SugestaoModelo).count() == 2
        await client.aclose()
        await app.shutdown()
    finally:
        reload_settings()
