"""Active-learning prioritized paging (net-new TPU-tier capability).

The reference pages in sync order only; with a trained model in the loop,
labeling the images the model is most UNSURE about teaches the next
fine-tune the most per human click. Covers the uncertainty measure, its
write-time persistence on suggestion rows, the migration backfill, and the
``GET /classificacoes/ambiente/{id}/priorizadas`` route contract.
"""

import httpx
import pytest

from ics_tpu.core import timezone as tz
from ics_tpu.core.security import hash_password
from ics_tpu.crud.modelo_crud import (
    calcular_incerteza,
    registrar_modelo,
    registrar_sugestao,
)
from ics_tpu.db.engine import Database
from ics_tpu.db.models import (
    Ambiente,
    AmbienteConjuntoImagens,
    Classificacao,
    ConjuntoImagens,
    Imagem,
    Opcao,
    SugestaoModelo,
    Usuario,
    UsuarioAmbiente,
    UsuarioConvencional,
)
from ics_tpu.main import create_app

ADMIN = {"username": "admin@seudominio.com", "password": "senha_super_secreta"}


class TestCalcularIncerteza:
    def test_single_label_margin(self):
        # margin 0.85 -> uncertainty 0.15
        inc = calcular_incerteza(
            [{"classe": 0, "score": 0.9}, {"classe": 1, "score": 0.05}]
        )
        assert inc == pytest.approx(0.15)

    def test_single_label_tie_is_max_uncertainty(self):
        inc = calcular_incerteza(
            [{"classe": 0, "score": 0.5}, {"classe": 1, "score": 0.5}]
        )
        assert inc == pytest.approx(1.0)

    def test_single_score_falls_back_to_confidence(self):
        assert calcular_incerteza([{"score": 0.6}]) == pytest.approx(0.4)

    def test_empty_and_scoreless(self):
        assert calcular_incerteza(None) is None
        assert calcular_incerteza([]) is None
        assert calcular_incerteza([{"classe": 3}]) is None

    def test_multilabel_boundary_is_max(self):
        inc = calcular_incerteza(
            [{"score": 0.5}], multi_rotulo=True, limiar=0.5
        )
        assert inc == pytest.approx(1.0)

    def test_multilabel_confident_rows_are_certain(self):
        inc = calcular_incerteza(
            [{"score": 1.0}, {"score": 0.0}], multi_rotulo=True, limiar=0.5
        )
        assert inc == pytest.approx(0.0)

    def test_multilabel_asymmetric_threshold_normalized(self):
        # limiar 0.2: p=0.6 sits halfway up the [0.2, 1.0] side -> 0.5
        inc = calcular_incerteza(
            [{"score": 0.6}], multi_rotulo=True, limiar=0.2
        )
        assert inc == pytest.approx(0.5)
        # the most ambiguous class dominates
        inc = calcular_incerteza(
            [{"score": 0.6}, {"score": 0.2}], multi_rotulo=True, limiar=0.2
        )
        assert inc == pytest.approx(1.0)


@pytest.fixture()
async def app(tmp_path):
    db = Database(f"sqlite:///{tmp_path}/al.db")
    a = create_app(db=db)
    await a.startup()
    _seed(db, a)
    yield a
    await a.shutdown()


def _seed(db: Database, a) -> None:
    """Specialist + ambiente + 6 images: 4 unclassified with ambiente
    suggestions at staggered uncertainty, 1 CLASSIFIED with max
    uncertainty (must be excluded), 1 unclassified with only a
    generic-model suggestion (must be excluded)."""
    now = tz.utcnow()
    with db.session() as s:
        esp = Usuario(
            nome_completo="Especialista Dois", email="esp@x.com",
            senha_hash=hash_password("SenhaBoa1"), data_criado=now, id_tipo=1,
        )
        s.add(esp)
        s.flush()
        con = UsuarioConvencional(cpf="3" * 11, id_usu=esp.id_usu)
        s.add(con)
        s.flush()
        adm = s.fetchone("SELECT id_adm FROM usuarios_administradores LIMIT 1")
        cnj = ConjuntoImagens(
            nome_conj="al", caminho_conj="/al", file_id="7",
            imagens_sincronizadas=True, data_proc=now, data_sinc=now,
        )
        s.add(cnj)
        s.flush()
        amb = Ambiente(
            titulo_amb="AL", descricao_questionario="d",
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
        op = Opcao(texto="sim", id_amb=amb.id_amb)
        s.add(op)
        s.flush()
        modelo = registrar_modelo(
            s, id_amb=str(amb.id_amb), nome_modelo="resnet_tiny",
            num_classes=2, class_map={str(op.id_opc): 0},
            dir_checkpoint="/tmp/none", metricas={},
        )
        hashes = []
        for i in range(6):
            h = f"{i:02d}" + "b" * 62
            hashes.append(h)
            s.add(Imagem(
                content_hash=h, nome_img=f"{i}.jpg",
                caminho_img=f"al/{i}.jpg",
                data_proc=now, data_sinc=now, id_cnj=cnj.id_cnj,
            ))
        s.flush()
        # ambiente suggestions: top-1 margins give uncertainty
        # 0.2 / 0.9 / 0.5 / 0.7 for images 0-3
        for h, (p1, p2) in zip(hashes[:4],
                               [(0.9, 0.1), (0.55, 0.45),
                                (0.75, 0.25), (0.65, 0.35)]):
            registrar_sugestao(
                s, h, modelo="resnet_tiny",
                classes=[{"classe": 0, "score": p1},
                         {"classe": 1, "score": p2}],
                score=p1, id_amb=str(amb.id_amb), id_mod=str(modelo.id_mod),
                id_opc=str(op.id_opc), versao=1,
            )
        # image 4: max uncertainty but ALREADY classified by this user
        registrar_sugestao(
            s, hashes[4], modelo="resnet_tiny",
            classes=[{"classe": 0, "score": 0.5}, {"classe": 1, "score": 0.5}],
            score=0.5, id_amb=str(amb.id_amb), id_mod=str(modelo.id_mod),
            id_opc=str(op.id_opc), versao=1,
        )
        s.add(Classificacao(
            id_con=con.id_con, id_img=hashes[4], id_opc=op.id_opc,
            data_criado=now, ativo=True,
        ))
        # image 5: generic-model suggestion only (no ambiente ranking)
        registrar_sugestao(
            s, hashes[5], modelo="resnet50",
            classes=[{"classe": 3, "score": 0.5}, {"classe": 9, "score": 0.5}],
            score=0.5,
        )
        s.commit()
        a.state.id_amb = str(amb.id_amb)
        a.state.hashes = hashes


async def _login(client, username, password) -> dict:
    r = await client.post(
        "/auth/login", data={"username": username, "password": password}
    )
    assert r.status_code == 200, r.text
    client.cookies.clear()
    return {"Authorization": f"Bearer {r.json()['access_token']}"}


@pytest.mark.anyio
async def test_priorizadas_ranks_by_uncertainty(app):
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        esp = await _login(c, "esp@x.com", "SenhaBoa1")
        id_amb = app.state.id_amb
        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/priorizadas", headers=esp
        )
        assert r.status_code == 200, r.text
        body = r.json()
        assert body["ordenado_por"] == "incerteza"
        got = [img["content_hash"] for img in body["imagens"]]
        h = app.state.hashes
        # most-uncertain-first: margins 0.1 < 0.3 < 0.5 < 0.8
        assert got == [h[1], h[3], h[2], h[0]]
        incs = [img["incerteza"] for img in body["imagens"]]
        assert incs == sorted(incs, reverse=True)
        assert incs[0] == pytest.approx(0.9)
        # classified image (h[4]) and generic-only image (h[5]) excluded
        assert h[4] not in got and h[5] not in got
        # payload parity with the paging surface + the ranking key
        first = body["imagens"][0]
        assert first["download_url"].startswith("/nextcloud/images/")
        assert first["sugestao_modelo"]["incerteza"] == pytest.approx(0.9)


@pytest.mark.anyio
async def test_priorizadas_limite_and_validation(app):
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        esp = await _login(c, "esp@x.com", "SenhaBoa1")
        id_amb = app.state.id_amb
        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/priorizadas?limite=2",
            headers=esp,
        )
        assert r.status_code == 200
        assert len(r.json()["imagens"]) == 2
        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/priorizadas?limite=abc",
            headers=esp,
        )
        assert r.status_code == 422
        # admins are not specialists: 403 like the other paging routes
        admin = await _login(c, **ADMIN)
        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/priorizadas", headers=admin
        )
        assert r.status_code == 403


@pytest.mark.anyio
async def test_classifying_removes_from_queue(app):
    """The loop closes: labeling the top-ranked image removes it from the
    next priorizadas page."""
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        esp = await _login(c, "esp@x.com", "SenhaBoa1")
        id_amb = app.state.id_amb
        top = app.state.hashes[1]
        with app.state.db.session() as s:
            opcoes = s.query(Opcao).all()
        r = await c.post(
            f"/classificacoes/ambiente/{id_amb}/classificar",
            json={"content_hash": top, "id_opc": [str(opcoes[0].id_opc)]},
            headers=esp,
        )
        assert r.status_code == 200, r.text
        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/priorizadas", headers=esp
        )
        got = [img["content_hash"] for img in r.json()["imagens"]]
        assert top not in got
        assert got[0] == app.state.hashes[3]


def test_migration_backfills_incerteza(tmp_path):
    """Rows written before the column existed get their uncertainty
    recomputed from the persisted score lists (multi-label rows with the
    model's calibrated threshold)."""
    from ics_tpu.db.migrations import m0004_sugestao_incerteza as mig

    db = Database(f"sqlite:///{tmp_path}/mig.db")
    db.create_all()
    now_dt = tz.utcnow()
    now = now_dt.isoformat()
    with db.session() as s:
        # FK parents (tipos/admin/ambiente/conjunto/imagens)
        s.execute(
            "INSERT INTO tipo_usuarios (id_tipo, nome) VALUES (2, 'admin')"
        )
        adm_user = Usuario(
            nome_completo="Admin Mig", email="mig@x.com",
            senha_hash="x", data_criado=now_dt, id_tipo=2,
        )
        s.add(adm_user)
        s.flush()
        s.execute(
            "INSERT INTO usuarios_administradores (id_adm, id_usu, cpf) "
            "VALUES (?, ?, ?)", ("adm" + "0" * 33, adm_user.id_usu, "4" * 11),
        )
        amb_like = "a" * 36
        s.execute(
            "INSERT INTO ambientes (id_amb, titulo_amb, "
            "descricao_questionario, data_criado, id_adm, ativo, "
            "multipla_escolha, utilizavel) VALUES (?, ?, ?, ?, ?, 1, 1, 1)",
            (amb_like, "Mig", "d", now, "adm" + "0" * 33),
        )
        cnj = ConjuntoImagens(
            nome_conj="m", caminho_conj="/m", file_id="9",
            imagens_sincronizadas=True, data_proc=now_dt, data_sinc=now_dt,
        )
        s.add(cnj)
        s.flush()
        for h in ("h" * 64, "g" * 64):
            s.add(Imagem(
                content_hash=h, nome_img="x.jpg", caminho_img="m/x.jpg",
                data_proc=now_dt, data_sinc=now_dt, id_cnj=cnj.id_cnj,
            ))
        s.flush()
        s.execute(
            "INSERT INTO modelos_treinados (id_mod, id_amb, nome_modelo, "
            "versao, num_classes, class_map, dir_checkpoint, passo, "
            "metricas, ativo, data_criado) "
            "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)",
            ("m" * 36, amb_like, "resnet_tiny", 1, 2, "{}", "/tmp/x", 0,
             '{"multi_rotulo": true, "limiar": 0.2}', 1, now),
        )
        s.execute(
            "INSERT INTO sugestoes_modelo (id_sug, id_img, id_amb, id_mod, "
            "modelo, classes, score, data_criado) "
            "VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
            ("s1" + "0" * 34, "h" * 64, amb_like, "m" * 36, "resnet_tiny",
             '[{"classe": 0, "score": 0.6}]', 0.6, now),
        )
        s.execute(
            "INSERT INTO sugestoes_modelo (id_sug, id_img, id_amb, id_mod, "
            "modelo, classes, score, data_criado) "
            "VALUES (?, ?, ?, ?, ?, ?, ?, ?)",
            ("s2" + "0" * 34, "g" * 64, None, None, "resnet50",
             '[{"classe": 1, "score": 0.8}, {"classe": 2, "score": 0.1}]',
             0.8, now),
        )
        s.execute("UPDATE sugestoes_modelo SET incerteza = NULL")
        mig.upgrade(s)
        s.commit()
    with db.session() as s:
        rows = {
            r.id_img: r.incerteza for r in s.query(SugestaoModelo).all()
        }
    # multi-label @ limiar 0.2: p=0.6 -> 1 - 0.4/0.8 = 0.5
    assert rows["h" * 64] == pytest.approx(0.5)
    # single-label margin 0.7 -> 0.3
    assert rows["g" * 64] == pytest.approx(0.3, abs=1e-6)
