"""kNN label suggestions over the embedding index (net-new TPU tier).

Cold-start of the suggestion loop: labeled neighbours vote before any
fine-tune exists. Covers the vote math (weighting, ambiente-scoped
labels, multi-label fractions) and the route contract incl. suggestion
persistence into the priorizadas ranking.
"""

import httpx
import numpy as np
import pytest

from ics_tpu.core import timezone as tz
from ics_tpu.core.security import hash_password
from ics_tpu.crud.embedding_crud import upsert_embedding
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
from ics_tpu.runtime.embedding_index import EmbeddingIndex
from ics_tpu.runtime.knn_suggest import knn_sugerir, rotulos_por_imagens


def _unit(*coords):
    v = np.zeros(8, np.float32)
    for i, x in zip((0, 1, 2, 3), coords):
        v[i] = x
    return v / np.linalg.norm(v)


def _fresh_db(path) -> Database:
    from ics_tpu.db import seed

    db = Database(f"sqlite:///{path}")
    db.create_all()
    seed.seed_all(db)
    return db


def _seed(db: Database, multi: bool = False):
    """Ambiente with options A/B; labeled images clustered on two axes of
    the embedding space + one unlabeled query next to cluster A."""
    now = tz.utcnow()
    with db.session() as s:
        esp = Usuario(
            nome_completo="Esp kNN", email="knn@x.com",
            senha_hash=hash_password("SenhaBoa1"), data_criado=now, id_tipo=1,
        )
        s.add(esp)
        s.flush()
        con = UsuarioConvencional(cpf="5" * 11, id_usu=esp.id_usu)
        s.add(con)
        s.flush()
        adm = s.fetchone("SELECT id_adm FROM usuarios_administradores LIMIT 1")
        cnj = ConjuntoImagens(
            nome_conj="knn", caminho_conj="/knn", file_id="11",
            imagens_sincronizadas=True, data_proc=now, data_sinc=now,
        )
        s.add(cnj)
        s.flush()
        amb = Ambiente(
            titulo_amb="kNN", descricao_questionario="d", data_criado=now,
            id_adm=adm["id_adm"], multipla_escolha=multi,
        )
        s.add(amb)
        s.flush()
        s.add(AmbienteConjuntoImagens(
            id_amb=amb.id_amb, id_cnj=cnj.id_cnj, data_associado=now,
        ))
        s.add(UsuarioAmbiente(
            id_con=con.id_con, id_amb=amb.id_amb, data_associado=now,
        ))
        op_a = Opcao(texto="A", id_amb=amb.id_amb)
        op_b = Opcao(texto="B", id_amb=amb.id_amb)
        s.add_all([op_a, op_b])
        s.flush()

        def add_img(tag, vec, opcoes=()):
            h = tag * 32  # 64-char hash from a 2-char tag
            s.add(Imagem(
                content_hash=h, nome_img=f"{tag}.jpg",
                caminho_img=f"knn/{tag}.jpg", data_proc=now, data_sinc=now,
                id_cnj=cnj.id_cnj,
            ))
            s.flush()
            upsert_embedding(s, h, "m", vec)
            for opc in opcoes:
                s.add(Classificacao(
                    id_con=con.id_con, id_img=h, id_opc=opc.id_opc,
                    data_criado=now, ativo=True,
                ))
            return h

        # cluster A along axis 0; cluster B along axis 1
        a1 = add_img("a1", _unit(1.0, 0.0), [op_a])
        a2 = add_img("a2", _unit(0.98, 0.2), [op_a])
        b1 = add_img("b1", _unit(0.0, 1.0), [op_b])
        if multi:
            ab = add_img("ab", _unit(0.9, 0.45), [op_a, op_b])
        # query: near cluster A, unlabeled
        q = add_img("qq", _unit(0.99, 0.1))
        # unlabeled noise: must not influence the vote
        add_img("zz", _unit(0.97, 0.15))
        s.commit()
        out = {
            "id_amb": str(amb.id_amb), "id_con": str(con.id_con),
            "q": q, "a1": a1, "a2": a2, "b1": b1,
            "op_a": str(op_a.id_opc), "op_b": str(op_b.id_opc),
        }
        if multi:
            out["ab"] = ab
        return out


class TestVote:
    def test_vote_prefers_near_cluster(self, tmp_path):
        db = _fresh_db(f"{tmp_path}/knn.db")
        ctx = _seed(db)
        index = EmbeddingIndex(db, "m")
        with db.session() as s:
            res = knn_sugerir(s, index, ctx["id_amb"], ctx["q"], k=3)
        assert res["vizinhos"] == 3
        assert res["opcoes"][0]["id_opc"] == ctx["op_a"]
        # cosine-weighted: A's two close neighbours dominate B's one
        assert res["opcoes"][0]["score"] > 0.6
        scores = {o["id_opc"]: o["score"] for o in res["opcoes"]}
        assert scores[ctx["op_a"]] + scores[ctx["op_b"]] == pytest.approx(1.0)

    def test_unindexed_is_none_and_unlabeled_is_empty(self, tmp_path):
        db = _fresh_db(f"{tmp_path}/knn2.db")
        ctx = _seed(db)
        index = EmbeddingIndex(db, "m")
        with db.session() as s:
            assert knn_sugerir(s, index, ctx["id_amb"], "f" * 64) is None
            # wrong ambiente: labels are scoped, so the vote is empty
            res = knn_sugerir(s, index, "0" * 36, ctx["q"])
        assert res["vizinhos"] == 0 and res["opcoes"] == []

    def test_labels_scoped_to_ambiente_options(self, tmp_path):
        db = _fresh_db(f"{tmp_path}/knn3.db")
        ctx = _seed(db)
        with db.session() as s:
            labels = rotulos_por_imagens(
                s, [ctx["a1"], ctx["b1"], ctx["q"]], ctx["id_amb"]
            )
        assert labels[ctx["a1"]] == {ctx["op_a"]}
        assert labels[ctx["b1"]] == {ctx["op_b"]}
        assert ctx["q"] not in labels

    def test_multilabel_fractions_independent(self, tmp_path):
        db = _fresh_db(f"{tmp_path}/knn4.db")
        ctx = _seed(db, multi=True)
        index = EmbeddingIndex(db, "m")
        with db.session() as s:
            res = knn_sugerir(
                s, index, ctx["id_amb"], ctx["q"], k=3, multi_label=True
            )
        scores = {o["id_opc"]: o["score"] for o in res["opcoes"]}
        # every near neighbour carries A; only the 'ab' image carries B
        assert scores[ctx["op_a"]] == pytest.approx(1.0)
        assert 0.0 < scores[ctx["op_b"]] < 0.6


ADMIN = {"username": "admin@seudominio.com", "password": "senha_super_secreta"}


@pytest.fixture()
async def app(tmp_path):
    from ics_tpu.core.config import reload_settings
    from ics_tpu.main import create_app

    reload_settings(
        TPU_ENABLE_INFERENCE="true",
        TPU_MESH_SHAPE="1",
        TPU_DEFAULT_MODEL="resnet_tiny",
        TPU_NUM_CLASSES="8",
        TPU_PRECISION="fp32",
        TPU_CANVAS="64",
        TPU_BATCH_BUCKETS="2",
        TPU_BATCH_DEADLINE_US="20000",
        TPU_WARMUP_ON_STARTUP="false",
        TPU_DEVICE_DECODE="false",
        TPU_WEIGHTS_DIR=str(tmp_path / "w"),
    )
    try:
        db = Database(f"sqlite:///{tmp_path}/knnapi.db")
        a = create_app(db=db)
        await a.startup()
        # embeddings seeded under the DEFAULT model's name so the route's
        # index (keyed by engine model) finds them
        a.state.ctx = _seed(db)
        with db.session() as s:
            s.execute(
                "UPDATE embeddings_imagem SET modelo = ?", ("resnet_tiny",)
            )
            s.commit()
        yield a
        await a.shutdown()
    finally:
        reload_settings()


@pytest.mark.anyio
async def test_route_vote_and_persistence(app):
    transport = httpx.ASGITransport(app=app)
    async with httpx.AsyncClient(transport=transport, base_url="http://t") as c:
        r = await c.post(
            "/auth/login",
            data={"username": "knn@x.com", "password": "SenhaBoa1"},
        )
        assert r.status_code == 200
        c.cookies.clear()
        esp = {"Authorization": f"Bearer {r.json()['access_token']}"}
        ctx = app.state.ctx
        id_amb, q = ctx["id_amb"], ctx["q"]

        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/sugerir-vizinhos/{q}?k=3",
            headers=esp,
        )
        assert r.status_code == 200, r.text
        body = r.json()
        assert body["modelo"] == "knn:resnet_tiny"
        assert body["vizinhos"] == 3
        assert body["opcoes"][0]["id_opc"] == ctx["op_a"]
        assert body["opcoes"][0]["texto_opcao"] == "A"

        # persisted as a regular suggestion -> shows up in paging payload
        with app.state.db.session() as s:
            row = (
                s.query(SugestaoModelo)
                .filter(SugestaoModelo.id_img == q)
                .first()
            )
            assert row is not None
            assert row.modelo == "knn:resnet_tiny"
            assert row.incerteza is not None  # feeds priorizadas
        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/priorizadas", headers=esp
        )
        assert r.status_code == 200
        got = {img["content_hash"] for img in r.json()["imagens"]}
        assert q in got

        # contract edges: unknown image 404; unindexed-but-synced 404
        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/sugerir-vizinhos/{'f' * 64}",
            headers=esp,
        )
        assert r.status_code == 404
        r = await c.get(
            f"/classificacoes/ambiente/{id_amb}/sugerir-vizinhos/{q}?k=zz",
            headers=esp,
        )
        assert r.status_code == 422
