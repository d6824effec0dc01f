"""End-to-end train-then-serve loop (VERDICT r1 items 2+3+10 'done' tests).

Hermetic: seed specialist labels -> POST /treinamento (tiny model, 3 steps)
-> model registered + promoted -> classificar-tpu serves THAT ambiente's
option labels with a weights version -> suggestion persisted and surfaced
in the paging payload.
"""

import asyncio

import httpx
import numpy as np
import pytest

from ics_tpu.core import timezone as tz
from ics_tpu.core.security import hash_password, sha256_hex
from ics_tpu.db.engine import Database
from ics_tpu.db.models import (
    Ambiente,
    AmbienteConjuntoImagens,
    Classificacao,
    ConjuntoImagens,
    Imagem,
    Opcao,
    UsuarioAmbiente,
    UsuarioConvencional,
    Usuario,
)
from tests.fake_nextcloud import make_jpeg

ADMIN = {"username": "admin@seudominio.com", "password": "senha_super_secreta"}


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
        TPU_BATCH_DEADLINE_US="20000",
        TPU_WARMUP_ON_STARTUP="false",
        TPU_DEVICE_DECODE="false",
        TPU_WEIGHTS_DIR=str(tmp_path / "weights"),
    )
    try:
        db = Database(f"sqlite:///{tmp_path}/e2e.db")
        a = create_app(db=db)
        await a.startup()
        blobs = _seed(db, a)
        # hermetic byte source for the trainer (no NextCloud in tests)
        assert a.state.trainer is not None
        a.state.trainer.fetch_bytes = lambda h, path: blobs[h]
        a.state.blobs = blobs
        yield a
        await a.shutdown()
    finally:
        reload_settings()


def _seed(db: Database, a) -> dict[str, bytes]:
    """Specialist + ambiente with 2 options + 8 labeled images."""
    now = tz.utcnow()
    blobs: dict[str, bytes] = {}
    with db.session() as s:
        esp = Usuario(
            nome_completo="Especialista Um", email="esp@x.com",
            senha_hash=hash_password("SenhaBoa1"), data_criado=now, id_tipo=1,
        )
        s.add(esp)
        s.flush()
        con = UsuarioConvencional(cpf="2" * 11, id_usu=esp.id_usu)
        s.add(con)
        s.flush()
        adm_row = s.fetchone(
            "SELECT id_adm FROM usuarios_administradores LIMIT 1"
        )
        cnj = ConjuntoImagens(
            nome_conj="f", caminho_conj="/f", file_id="1",
            imagens_sincronizadas=True, data_proc=now, data_sinc=now,
        )
        s.add(cnj)
        s.flush()
        amb = Ambiente(
            titulo_amb="Treino", descricao_questionario="d",
            data_criado=now, id_adm=adm_row["id_adm"],
        )
        s.add(amb)
        s.flush()
        s.add(AmbienteConjuntoImagens(
            id_amb=amb.id_amb, id_cnj=cnj.id_cnj, data_associado=now,
        ))
        s.add(UsuarioAmbiente(
            id_con=con.id_con, id_amb=amb.id_amb, data_associado=now,
        ))
        op1 = Opcao(texto="gato", id_amb=amb.id_amb)
        op2 = Opcao(texto="cão", id_amb=amb.id_amb)
        s.add_all([op1, op2])
        s.flush()
        unlabeled = []
        for i in range(10):
            data = make_jpeg(i, size=(60, 60))
            h = sha256_hex(data)
            blobs[h] = data
            s.add(Imagem(
                content_hash=h, nome_img=f"{i}.jpg", caminho_img=f"f/{i}.jpg",
                data_proc=now, data_sinc=now, id_cnj=cnj.id_cnj,
            ))
            if i < 8:  # last 2 stay unclassified (paging returns those)
                s.add(Classificacao(
                    id_con=con.id_con, id_img=h,
                    id_opc=op1.id_opc if i % 2 == 0 else op2.id_opc,
                    data_criado=now, ativo=True,
                ))
            else:
                unlabeled.append(h)
        s.commit()
        a.state.unlabeled = unlabeled
        a.state.id_amb = str(amb.id_amb)
        a.state.opcoes = {str(op1.id_opc): "gato", str(op2.id_opc): "cão"}
    return blobs


async def _login(client, username, password) -> dict:
    r = await client.post(
        "/auth/login", data={"username": username, "password": password}
    )
    assert r.status_code == 200, r.text
    return {"Authorization": f"Bearer {r.json()['access_token']}"}


@pytest.mark.anyio
async def test_train_register_serve_suggest(app):
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb

        # 1. start a fine-tune job (tiny model, 3 steps)
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 3, "batch_size": 4,
                  "epochs": 50, "canvas": 64},
            headers=admin,
        )
        assert r.status_code == 202, r.text
        id_job = r.json()["id_job"]

        # a second job while one runs is a 409
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}", json={}, headers=admin
        )
        assert r.status_code == 409

        # 2. poll until done (training thread; CPU tiny model)
        for _ in range(240):
            r = await c.get(f"/treinamento/jobs/{id_job}", headers=admin)
            assert r.status_code == 200
            job = r.json()
            if job["status"] in ("concluido", "falhou"):
                break
            await asyncio.sleep(0.5)
        assert job["status"] == "concluido", job
        assert job["passos"] == 3
        assert job["versao"] == 1
        assert all(np.isfinite(h["loss"]) for h in job["historico"])

        # 3. registry lists the promoted version
        r = await c.get(
            f"/treinamento/modelos?id_amb={id_amb}", headers=admin
        )
        assert r.status_code == 200
        modelos = r.json()["modelos"]
        assert len(modelos) == 1 and modelos[0]["ativo"]
        assert modelos[0]["num_classes"] == 2
        assert modelos[0]["metricas"]["exemplos"] == 8
        # held-out eval ran (8 labels -> 7 train / 1 eval at 0.2)
        acc = modelos[0]["metricas"]["eval_accuracy"]
        assert acc is not None and 0.0 <= acc <= 1.0
        assert modelos[0]["metricas"]["exemplos_eval"] == 1
        assert job["eval_accuracy"] == acc
        # temperature calibration ran on the eval logits; a 1-example
        # split falls back to the identity (min-examples gate)
        assert modelos[0]["metricas"]["temperatura"] == 1.0
        assert modelos[0]["metricas"]["eval_calibracao"]["exemplos"] == 1
        # per-class diagnostics: 2x2 confusion matrix over the 1-example
        # split, each class row labeled with its option id
        pc = modelos[0]["metricas"]["eval_por_classe"]
        cm = np.asarray(pc["matriz_confusao"])
        assert cm.shape == (2, 2) and cm.sum() == 1
        assert {r["id_opc"] for r in pc["por_classe"]} == set(app.state.opcoes)
        assert sum(r["suporte"] for r in pc["por_classe"]) == 1

        # 4. specialist classifies via TPU: response carries the ambiente's
        #    option labels + the weights version
        esp = await _login(c, "esp@x.com", "SenhaBoa1")
        some_hash = app.state.unlabeled[0]
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb}/classificar-tpu",
            files={"file": ("x.jpg", app.state.blobs[some_hash], "image/jpeg")},
            headers=esp,
        )
        assert r.status_code == 200, r.text
        body = r.json()
        assert body["modelo_versao"] == 1
        assert body["model"] == "resnet_tiny"
        textos = {o["texto_opcao"] for o in body["opcoes"]}
        assert textos <= {"gato", "cão"} and textos
        ids = {o["id_opc"] for o in body["opcoes"]}
        assert ids <= set(app.state.opcoes)

        # 4b. saliency explanation on the trained model: 16x16 map in
        #     [0,1], options labeled, specific-option and error paths
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb}/explicar",
            files={"file": ("x.jpg", app.state.blobs[some_hash], "image/jpeg")},
            headers=esp,
        )
        assert r.status_code == 200, r.text
        exp = r.json()
        mapa = np.asarray(exp["mapa_saliencia"])
        assert mapa.shape == (16, 16) and exp["grade"] == 16
        assert mapa.min() >= 0.0 and mapa.max() <= 1.0 + 1e-6
        assert exp["metodo"] == "gradiente-entrada"
        assert exp["modelo_versao"] == 1
        assert {o["texto_opcao"] for o in exp["opcoes"]} <= {"gato", "cão"}
        # explain a SPECIFIC option
        alvo = next(iter(app.state.opcoes))
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb}/explicar?id_opc={alvo}",
            files={"file": ("x.jpg", app.state.blobs[some_hash], "image/jpeg")},
            headers=esp,
        )
        assert r.status_code == 200, r.text
        assert r.json()["id_opc_explicado"] == alvo
        # an option that is not part of the model -> 422
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb}/explicar?id_opc=nao-existe",
            files={"file": ("x.jpg", app.state.blobs[some_hash], "image/jpeg")},
            headers=esp,
        )
        assert r.status_code == 422
        # SmoothGrad: ?suavizar=N averages gradients over N noisy copies
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb}/explicar?suavizar=3",
            files={"file": ("x.jpg", app.state.blobs[some_hash], "image/jpeg")},
            headers=esp,
        )
        assert r.status_code == 200, r.text
        sg = r.json()
        assert sg["metodo"] == "smoothgrad"
        assert sg["suavizacao"] == 4  # quantized up to the bucket
        assert np.asarray(sg["mapa_saliencia"]).shape == (16, 16)
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb}/explicar?suavizar=99",
            files={"file": ("x.jpg", app.state.blobs[some_hash], "image/jpeg")},
            headers=esp,
        )
        assert r.status_code == 422
        # garbage bytes -> 422
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb}/explicar",
            files={"file": ("x.jpg", b"not an image", "image/jpeg")},
            headers=esp,
        )
        assert r.status_code == 422

        # 5. suggestion persisted and surfaced in the paging payload
        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/inicializar", headers=esp
        )
        assert r.status_code == 200, r.text
        sugestoes = [
            img["sugestao_modelo"]
            for img in r.json()["imagens"]
            if img["sugestao_modelo"] is not None
        ]
        assert sugestoes, "suggestion did not surface in the paging payload"
        assert sugestoes[0]["versao"] == 1
        assert sugestoes[0]["texto_opcao"] in {"gato", "cão"}

        # 5b. bulk suggestion refresh: every other image of the ambiente
        #     gets a version-1 suggestion in one admin call
        c.cookies.clear()
        id_mod0 = modelos[0]["id_mod"]
        r = await c.post(
            f"/treinamento/modelos/{id_mod0}/sugerir", headers=admin
        )
        assert r.status_code == 200, r.text
        lote = r.json()
        # 10 seeded images, 1 already suggested by classificar-tpu
        assert lote["sugeridas"] == 9
        assert lote["pendentes"] == 0 and lote["versao"] == 1
        # idempotent: nothing left to suggest
        r = await c.post(
            f"/treinamento/modelos/{id_mod0}/sugerir", headers=admin
        )
        assert r.json()["sugeridas"] == 0
        # the paging payload now carries a suggestion for EVERY image
        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/inicializar", headers=esp
        )
        for img in r.json()["imagens"]:
            assert img["sugestao_modelo"] is not None
            assert img["sugestao_modelo"]["versao"] == 1

        # 6. audit trail records the training + versioned inference
        c.cookies.clear()  # cookie-first auth: drop the specialist cookie
        r = await c.get("/auditoria/logs?page_size=100", headers=admin)
        assert r.status_code == 200
        eventos = {log["nome_evento"] for log in r.json()["logs"]}
        assert "iniciar_treinamento" in eventos
        assert "inferencia_tpu" in eventos
        assert "sugestoes_em_lote" in eventos

        # 7. export the version, import it into a SECOND ambiente with the
        #    same option texts, and serve from the imported weights there
        id_mod = modelos[0]["id_mod"]
        r = await c.get(
            f"/treinamento/modelos/{id_mod}/exportar", headers=admin
        )
        assert r.status_code == 200
        assert r.headers["content-type"] == "application/gzip"
        pacote = r.content
        assert len(pacote) > 1000

        id_amb2 = _seed_second_ambiente(app)
        r = await c.post(
            f"/treinamento/ambiente/{id_amb2}/importar",
            files={"file": ("m.tar.gz", pacote, "application/gzip")},
            headers=admin,
        )
        assert r.status_code == 201, r.text
        imported = r.json()
        assert imported["ativo"] and imported["versao"] == 1
        assert imported["metricas"]["importado"] is True

        esp2 = await _login(c, "esp@x.com", "SenhaBoa1")
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb2}/classificar-tpu",
            files={"file": ("x.jpg", app.state.blobs[some_hash], "image/jpeg")},
            headers=esp2,
        )
        assert r.status_code == 200, r.text
        body2 = r.json()
        assert body2["id_mod"] == imported["id_mod"]
        # rebinding by option text: suggested ids belong to ambiente 2 but
        # the ranking matches ambiente 1's (same weights, same image)
        assert {o["texto_opcao"] for o in body2["opcoes"]} == textos
        assert [o["texto_opcao"] for o in body2["opcoes"]] == [
            o["texto_opcao"] for o in body["opcoes"]
        ]
        assert {o["id_opc"] for o in body2["opcoes"]}.isdisjoint(
            set(app.state.opcoes)
        )

        # importing into an ambiente missing an option text is a 422
        id_amb3 = _seed_second_ambiente(app, textos=("gato", "peixe"))
        c.cookies.clear()
        r = await c.post(
            f"/treinamento/ambiente/{id_amb3}/importar",
            files={"file": ("m.tar.gz", pacote, "application/gzip")},
            headers=admin,
        )
        assert r.status_code == 422
        assert "cão" in r.json()["detail"]


def _seed_second_ambiente(app, textos=("gato", "cão")) -> str:
    db = app.state.db
    now = tz.utcnow()
    with db.session() as s:
        adm = s.fetchone("SELECT id_adm FROM usuarios_administradores LIMIT 1")
        con = s.fetchone("SELECT id_con FROM usuarios_convencionais LIMIT 1")
        cnj = s.fetchone("SELECT id_cnj FROM conjuntos_imagens LIMIT 1")
        amb = Ambiente(
            titulo_amb=f"Importado-{textos[1]}", descricao_questionario="d",
            data_criado=now, id_adm=adm["id_adm"],
        )
        s.add(amb)
        s.flush()
        s.add(AmbienteConjuntoImagens(
            id_amb=amb.id_amb, id_cnj=cnj["id_cnj"], data_associado=now,
        ))
        s.add(UsuarioAmbiente(
            id_con=con["id_con"], id_amb=amb.id_amb, data_associado=now,
        ))
        s.add_all([Opcao(texto=t, id_amb=amb.id_amb) for t in textos])
        s.commit()
        return str(amb.id_amb)


@pytest.mark.anyio
async def test_finetune_from_pretrained_backbone(app, tmp_path):
    """VERDICT r2 item 1 'done' condition: a fine-tune job accepts an
    imported pretrained backbone (head re-initialized to the ambiente's
    option count) through the product surface. lr=0 pins every update to
    zero, so the registered weights must equal the imported backbone
    leaf-for-leaf — proof the job actually STARTED from the checkpoint."""
    import numpy as np

    from ics_tpu.models.registry import get_model
    from ics_tpu.train import pretrained as pt

    # synthesize a "pretrained" checkpoint with a 9-class head (the
    # ambiente has 2 options -> the head must be re-initialized)
    spec = get_model("resnet_tiny")
    donor = spec.build(num_classes=9)
    import jax

    donor_vars = donor.init(jax.random.PRNGKey(42))
    pre_dir = tmp_path / "weights" / "pretrained"
    pre_dir.mkdir(parents=True, exist_ok=True)
    pt.save_npz(pre_dir / "tiny_imagenet.npz", donor_vars)

    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb

        # missing weights file is the operator's typo -> 422, no job
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "pesos_iniciais": "nope.npz"},
            headers=admin,
        )
        assert r.status_code == 422, r.text
        assert "não encontrados" in r.json()["detail"]

        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 2, "batch_size": 4,
                  "epochs": 50, "canvas": 64, "lr": 0.0,
                  "pesos_iniciais": "tiny_imagenet.npz"},
            headers=admin,
        )
        assert r.status_code == 202, r.text
        id_job = r.json()["id_job"]
        for _ in range(240):
            r = await c.get(f"/treinamento/jobs/{id_job}", headers=admin)
            job = r.json()
            if job["status"] in ("concluido", "falhou"):
                break
            await asyncio.sleep(0.5)
        assert job["status"] == "concluido", job
        assert job["pesos_iniciais"].endswith("tiny_imagenet.npz")

        # the registered checkpoint's backbone == the imported backbone
        # (lr=0), and its head has the ambiente's 2 classes, not 9
        r = await c.get(
            f"/treinamento/modelos?id_amb={id_amb}", headers=admin
        )
        modelo = r.json()["modelos"][0]
        assert modelo["num_classes"] == 2
        with app.state.db.session() as s:
            row = s.fetchone(
                "SELECT dir_checkpoint FROM modelos_treinados "
                "WHERE id_mod = ?", (modelo["id_mod"],),
            )
        from ics_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(row["dir_checkpoint"])
        try:
            restored = mgr.restore()
        finally:
            mgr.close()
        trained = restored["variables"]
        np.testing.assert_allclose(
            np.asarray(trained["params"]["stem"]["conv"]["w"]),
            np.asarray(donor_vars["params"]["stem"]["conv"]["w"]),
            atol=1e-6,
        )
        assert trained["params"]["head"]["w"].shape[-1] == 2


@pytest.mark.anyio
async def test_augmentation_route_params_validate(app):
    """The augmentation knobs 422 loudly instead of silently training with
    a misconfigured recipe (same contract style as remat/usar_sugestoes)."""
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb
        # bool("false") is True — strings must be rejected
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "augmentar": "false"},
            headers=admin,
        )
        assert r.status_code == 422
        assert "augmentar" in r.json()["detail"]
        # mixup without augmentation has nothing to attach to
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "augmentar": False,
                  "mixup_alpha": 0.2},
            headers=admin,
        )
        assert r.status_code == 422
        assert "augmentar" in r.json()["detail"]
        # out-of-range smoothing fails AugmentConfig validation up front
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "suavizacao_rotulo": 1.5},
            headers=admin,
        )
        assert r.status_code == 422
        assert "label_smoothing" in r.json()["detail"]
        # cutmix mirrors mixup: requires augmentation, rejects negatives
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "augmentar": False,
                  "cutmix_alpha": 1.0},
            headers=admin,
        )
        assert r.status_code == 422
        assert "augmentar" in r.json()["detail"]
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "cutmix_alpha": -1.0},
            headers=admin,
        )
        assert r.status_code == 422
        assert "cutmix_alpha" in r.json()["detail"]
        # no job was ever created by the rejected requests
        r = await c.get("/treinamento/jobs", headers=admin)
        assert r.json()["jobs"] == []


@pytest.mark.anyio
async def test_optimizer_route_params_validate(app):
    """otimizador/ema_decaimento/acumular_gradientes 422 loudly up front
    (validated in TrainingJobManager.start before any thread launches)."""
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "otimizador": "lion"},
            headers=admin,
        )
        assert r.status_code == 422
        assert "otimizador" in r.json()["detail"]
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "ema_decaimento": 1.5},
            headers=admin,
        )
        assert r.status_code == 422
        assert "ema_decaimento" in r.json()["detail"]
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "ema_decaimento": "x"},
            headers=admin,
        )
        assert r.status_code == 422
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "acumular_gradientes": 0},
            headers=admin,
        )
        assert r.status_code == 422
        assert "acumular_gradientes" in r.json()["detail"]
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "acumular_gradientes": "x"},
            headers=admin,
        )
        assert r.status_code == 422
        # no job was ever created by the rejected requests
        r = await c.get("/treinamento/jobs", headers=admin)
        assert r.json()["jobs"] == []


@pytest.mark.anyio
async def test_early_stopping_registers_best_snapshot(app):
    """paciencia>0: periodic eval on the held-out split. The 1-example
    eval metric is binary (0/1), so with paciencia=1 and avaliar_cada=1
    the loop MUST stop by step 3 (step 1 sets best; the first equal-or-
    worse eval exhausts patience) — deterministically short of
    max_steps=8. The BEST snapshot is what gets registered."""
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb

        # validation first: negative paciencia / paciencia without an
        # eval split / bad avaliar_cada are 422s before any thread starts
        for bad in (
            {"paciencia": -1},
            {"paciencia": 2, "eval_fraction": 0.0},
            {"paciencia": 2, "avaliar_cada": 0},
            {"paciencia": "x"},
            {"avaliar_cada": 2, "eval_fraction": 0.0},
            {"llrd": 1.5},
            {"llrd": -0.2},
            {"llrd": "x"},
        ):
            r = await c.post(
                f"/treinamento/ambiente/{id_amb}",
                json={"modelo": "resnet_tiny", **bad}, headers=admin,
            )
            assert r.status_code == 422, (bad, r.text)
        r = await c.get("/treinamento/jobs", headers=admin)
        assert r.json()["jobs"] == []

        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 8, "batch_size": 4,
                  "epochs": 50, "canvas": 64, "paciencia": 1,
                  "avaliar_cada": 1},
            headers=admin,
        )
        assert r.status_code == 202, r.text
        id_job = r.json()["id_job"]
        for _ in range(240):
            r = await c.get(f"/treinamento/jobs/{id_job}", headers=admin)
            job = r.json()
            if job["status"] in ("concluido", "falhou"):
                break
            await asyncio.sleep(0.5)
        assert job["status"] == "concluido", job
        assert job["passos"] <= 3  # binary metric -> early stop by step 3
        assert job["parou_cedo"] is True
        assert job["melhor_passo"] >= 1
        assert job["melhor_eval"] in (0.0, 1.0)
        # every step's history record carries the periodic eval
        assert all("eval" in h for h in job["historico"])

        # the registry row carries the early-stopping provenance
        r = await c.get(
            f"/treinamento/modelos?id_amb={id_amb}", headers=admin
        )
        m = r.json()["modelos"][-1]
        assert m["metricas"]["parou_cedo"] is True
        assert m["metricas"]["melhor_passo"] == job["melhor_passo"]
        assert m["metricas"]["melhor_eval"] == job["melhor_eval"]

        # the registered checkpoint (best snapshot) actually serves
        esp = await _login(c, "esp@x.com", "SenhaBoa1")
        some_hash = app.state.unlabeled[0]
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb}/classificar-tpu",
            files={"file": ("x.jpg", app.state.blobs[some_hash],
                            "image/jpeg")},
            headers=esp,
        )
        assert r.status_code == 200, r.text
        assert r.json()["modelo_versao"] == m["versao"]


@pytest.mark.anyio
async def test_reevaluate_registered_model_on_current_labels(app):
    """POST /treinamento/modelos/{id}/avaliar: train, label MORE images,
    re-evaluate — fresh accuracy + per-class diagnostics land in the job
    and in metricas.reavaliacao (previous one preserved)."""
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb

        # unknown model id -> 404 before any job starts
        r = await c.post("/treinamento/modelos/nao-existe/avaliar",
                         headers=admin)
        assert r.status_code == 404

        # 1. train on the 8 seeded labels
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 2, "batch_size": 4,
                  "epochs": 50, "canvas": 64},
            headers=admin,
        )
        assert r.status_code == 202, r.text
        id_job = r.json()["id_job"]
        for _ in range(240):
            r = await c.get(f"/treinamento/jobs/{id_job}", headers=admin)
            if r.json()["status"] in ("concluido", "falhou"):
                break
            await asyncio.sleep(0.5)
        assert r.json()["status"] == "concluido", r.json()
        id_mod = r.json()["id_mod"]

        # 2. the specialists label the 2 remaining images AFTER training
        from ics_tpu.core import timezone as tz
        from ics_tpu.db.models import Classificacao, Opcao

        db = app.state.db
        with db.session() as s:
            op = s.query(Opcao).filter(
                Opcao.id_amb == id_amb
            ).all()[0]
            con = s.fetchone(
                "SELECT id_con FROM usuarios_convencionais LIMIT 1"
            )
            for h in app.state.unlabeled:
                s.add(Classificacao(
                    id_con=con["id_con"], id_img=h, id_opc=op.id_opc,
                    data_criado=tz.utcnow(), ativo=True,
                ))
            s.commit()

        # 3. re-evaluate on the CURRENT (10-label) truth
        r = await c.post(f"/treinamento/modelos/{id_mod}/avaliar",
                         headers=admin)
        assert r.status_code == 202, r.text
        body = r.json()
        assert body["tipo"] == "avaliacao"
        assert body["versao_avaliada"] == 1
        id_eval = body["id_job"]
        for _ in range(240):
            r = await c.get(f"/treinamento/jobs/{id_eval}", headers=admin)
            job = r.json()
            if job["status"] in ("concluido", "falhou"):
                break
            await asyncio.sleep(0.5)
        assert job["status"] == "concluido", job
        assert job["exemplos"] == 10  # 8 original + 2 fresh labels
        assert 0.0 <= job["eval_accuracy"] <= 1.0
        res = job["resultado"]
        assert res["exemplos"] == 10
        pc = res["eval_por_classe"]
        assert np.asarray(pc["matriz_confusao"]).sum() == 10
        assert all("id_opc" in row for row in pc["por_classe"])

        # 4. the registry row carries the timestamped re-evaluation
        r = await c.get(
            f"/treinamento/modelos?id_amb={id_amb}", headers=admin
        )
        m = next(x for x in r.json()["modelos"] if x["id_mod"] == id_mod)
        reav = m["metricas"]["reavaliacao"]
        assert reav["exemplos"] == 10 and "avaliado_em" in reav
        assert reav["eval_accuracy"] == job["eval_accuracy"]
        # the ORIGINAL training-time eval metrics are untouched
        assert m["metricas"]["exemplos"] == 8

        # 5. a second re-evaluation preserves the previous one
        r = await c.post(f"/treinamento/modelos/{id_mod}/avaliar",
                         headers=admin)
        assert r.status_code == 202
        id_eval2 = r.json()["id_job"]
        for _ in range(240):
            r = await c.get(f"/treinamento/jobs/{id_eval2}", headers=admin)
            if r.json()["status"] in ("concluido", "falhou"):
                break
            await asyncio.sleep(0.5)
        assert r.json()["status"] == "concluido"
        r = await c.get(
            f"/treinamento/modelos?id_amb={id_amb}", headers=admin
        )
        m = next(x for x in r.json()["modelos"] if x["id_mod"] == id_mod)
        assert "reavaliacao_anterior" in m["metricas"]
        assert (m["metricas"]["reavaliacao_anterior"]["avaliado_em"]
                == reav["avaliado_em"])

        # audit trail recorded both re-evaluations
        ev = await c.get("/auditoria/?nome_evento=reavaliar_modelo_treinado",
                         headers=admin)
        if ev.status_code == 200:
            assert len(ev.json().get("logs", [])) >= 1


@pytest.mark.anyio
async def test_job_progress_sse_stream(app):
    """GET /treinamento/jobs/{id}/stream: SSE events — one `passo` per
    training step, then `fim` with the terminal job payload."""
    import json

    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb

        r = await c.get("/treinamento/jobs/nao-existe/stream",
                        headers=admin)
        assert r.status_code == 404

        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 3, "batch_size": 4,
                  "epochs": 50, "canvas": 64},
            headers=admin,
        )
        assert r.status_code == 202, r.text
        id_job = r.json()["id_job"]

        passos, fim = [], None
        async with c.stream(
            "GET", f"/treinamento/jobs/{id_job}/stream", headers=admin,
            timeout=120.0,
        ) as resp:
            assert resp.status_code == 200
            assert resp.headers["content-type"].startswith(
                "text/event-stream"
            )
            event = None
            async for line in resp.aiter_lines():
                if line.startswith("event: "):
                    event = line[len("event: "):]
                elif line.startswith("data: "):
                    data = json.loads(line[len("data: "):])
                    if event == "passo":
                        passos.append(data)
                    elif event == "fim":
                        fim = data
                        break
        assert len(passos) == 3
        assert [p["step"] for p in passos] == [1, 2, 3]
        assert all(np.isfinite(p["loss"]) for p in passos)
        assert fim is not None and fim["status"] == "concluido"
        assert fim["id_job"] == id_job and fim["versao"] == 1


@pytest.mark.anyio
async def test_labeled_dataset_export_jsonl(app):
    """GET /treinamento/ambiente/{id}/dataset: header line + one JSONL
    row per labeled image with every active label."""
    import json

    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb

        r = await c.get("/treinamento/ambiente/nao-existe/dataset",
                        headers=admin)
        assert r.status_code == 404

        r = await c.get(f"/treinamento/ambiente/{id_amb}/dataset",
                        headers=admin)
        assert r.status_code == 200, r.text
        assert r.headers["content-type"].startswith("application/x-ndjson")
        assert "attachment" in r.headers.get("content-disposition", "")
        lines = [json.loads(l) for l in r.text.strip().split("\n")]
        header, rows = lines[0], lines[1:]
        assert header["ambiente"] == id_amb
        assert header["imagens_rotuladas"] == 8
        assert {o["texto"] for o in header["opcoes"]} == {"gato", "cão"}
        assert len(rows) == 8
        for row in rows:
            assert row["caminho"].startswith("/nextcloud/images/")
            assert row["rotulos"] and all(
                lab["texto"] in {"gato", "cão"} for lab in row["rotulos"]
            )
        # label distribution round-trips (4 gato / 4 cão seeded)
        textos = [lab["texto"] for row in rows for lab in row["rotulos"]]
        assert textos.count("gato") == 4 and textos.count("cão") == 4

        # specialists cannot export (admin-only)
        esp = await _login(c, "esp@x.com", "SenhaBoa1")
        r = await c.get(f"/treinamento/ambiente/{id_amb}/dataset",
                        headers=esp)
        assert r.status_code == 403


@pytest.mark.anyio
async def test_avaliar_cada_without_paciencia_registers_best(app):
    """avaliar_cada alone = periodic eval + best-snapshot registration,
    NO stop rule: the job runs all max_steps (binary metric would stop
    by step 3 if paciencia were on) and still registers melhor_passo."""
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        admin = await _login(c, **ADMIN)
        id_amb = app.state.id_amb
        r = await c.post(
            f"/treinamento/ambiente/{id_amb}",
            json={"modelo": "resnet_tiny", "max_steps": 4, "batch_size": 4,
                  "epochs": 50, "canvas": 64, "avaliar_cada": 1},
            headers=admin,
        )
        assert r.status_code == 202, r.text
        id_job = r.json()["id_job"]
        for _ in range(240):
            r = await c.get(f"/treinamento/jobs/{id_job}", headers=admin)
            job = r.json()
            if job["status"] in ("concluido", "falhou"):
                break
            await asyncio.sleep(0.5)
        assert job["status"] == "concluido", job
        assert job["passos"] == 4          # no early stop
        assert job["parou_cedo"] is False
        assert job["melhor_passo"] >= 1    # best snapshot still recorded
        assert all("eval" in h for h in job["historico"])
