"""End-to-end API contract tests for the full endpoint surface.

Exercises the product loop exactly as the reference defines it: admin
whitelists a specialist -> specialist signs up -> admin creates an ambiente
over synced conjuntos with options -> associates the specialist ->
specialist pages through images (keyset), classifies (multi-option delta),
checks counts/history -> audit log reflects everything.
"""

import httpx
import pytest

from ics_tpu.core import timezone as tz
from ics_tpu.core.config import settings
from ics_tpu.db.engine import Database
from ics_tpu.db.models import ConjuntoImagens, Imagem
from ics_tpu.main import create_app

VALID_CPF = "52998224725"
VALID_CPF2 = "15350946056"


@pytest.fixture()
async def app(tmp_path):
    db = Database(f"sqlite:///{tmp_path}/api.db")
    a = create_app(db=db)
    await a.startup()
    # seed 2 conjuntos with images (as the sync engine would)
    with db.session() as s:
        now = tz.utcnow()
        c1 = ConjuntoImagens(
            nome_conj="pasta-a", caminho_conj="/pasta-a", file_id="101",
            imagens_sincronizadas=True, data_proc=now, data_sinc=now,
        )
        c2 = ConjuntoImagens(
            nome_conj="pasta-b", caminho_conj="/pasta-b", file_id="102",
            imagens_sincronizadas=True, data_proc=now, data_sinc=now,
        )
        s.add_all([c1, c2])
        s.flush()
        for i in range(30):
            s.add(
                Imagem(
                    content_hash=f"{i:02d}" + "a" * 62,
                    nome_img=f"img{i:02d}.jpg",
                    caminho_img=f"pasta-a/img{i:02d}.jpg",
                    metadados={"width": 100, "height": 100},
                    data_proc=now, data_sinc=now, id_cnj=c1.id_cnj,
                )
            )
        s.commit()
        a.state.c1 = c1.id_cnj
        a.state.c2 = c2.id_cnj
    yield a
    await a.shutdown()


@pytest.fixture()
def client(app):
    return httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app), base_url="http://test"
    )


async def login(client, email, senha):
    r = await client.post("/auth/login", data={"username": email, "password": senha})
    assert r.status_code == 200, r.text
    # token extraction is cookie-first (reference parity); clear the shared
    # jar so each request authenticates via its explicit Bearer header
    client.cookies.clear()
    return {"Authorization": f"Bearer {r.json()['access_token']}"}


async def admin_headers(client):
    return await login(client, settings.ADMIN_EMAIL, settings.ADMIN_SENHA)


async def make_specialist(client, adminh, email="spec@x.com", cpf=VALID_CPF):
    r = await client.post(
        "/whitelist/", json={"email": email, "id_tipo": 1}, headers=adminh
    )
    assert r.status_code == 201, r.text
    r = await client.post(
        "/auth/cadastro",
        json={
            "nome_completo": "Spec Ialista",
            "email": email,
            "cpf": cpf,
            "senha": "Senha123",
        },
    )
    assert r.status_code == 201, r.text
    client.cookies.clear()
    return {"Authorization": f"Bearer {r.json()['access_token']}"}


async def make_ambiente(client, adminh, app, titulo="Projeto A", multipla=True):
    r = await client.post(
        "/ambientes/importar",
        json={
            "titulo_amb": titulo,
            "titulo_questionario": "Q1",
            "descricao_questionario": "Classifique as imagens",
            "ids_conjuntos": [app.state.c1],
            "opcoes": ["gato", "cachorro", "pássaro"],
            "multipla_escolha": multipla,
        },
        headers=adminh,
    )
    assert r.status_code == 201, r.text
    return r.json()


class TestAmbientesAndOpcoes:
    @pytest.mark.anyio
    async def test_create_list_patch_delete_reactivate(self, app, client):
        async with client:
            adminh = await admin_headers(client)
            amb = await make_ambiente(client, adminh, app)
            assert amb["total_imagens"] == 30
            assert amb["multipla_escolha"] is True

            # duplicate title
            r = await client.post(
                "/ambientes/importar",
                json={
                    "titulo_amb": "Projeto A",
                    "descricao_questionario": "x",
                    "ids_conjuntos": [app.state.c1],
                    "opcoes": ["a", "b"],
                },
                headers=adminh,
            )
            assert r.status_code == 409

            # opcoes must be a list of STRINGS (reference pydantic contract
            # `opcoes: list[str]`): object entries 422, never 500
            r = await client.post(
                "/ambientes/importar",
                json={
                    "titulo_amb": "Projeto B",
                    "descricao_questionario": "x",
                    "ids_conjuntos": [app.state.c1],
                    "opcoes": [{"texto": "a"}, {"texto": "b"}],
                },
                headers=adminh,
            )
            assert r.status_code == 422
            r = await client.patch(
                f"/ambientes/{amb['id_amb']}/opcoes",
                json={"opcoes": ["a", 7]},
                headers=adminh,
            )
            assert r.status_code == 422

            # list
            r = await client.get("/ambientes/", headers=adminh)
            assert len(r.json()) == 1

            # options listing (any authenticated)
            r = await client.get(
                f"/opcoes/ambiente/{amb['id_amb']}", headers=adminh
            )
            assert r.json()["total"] == 3
            # create option
            r = await client.post(
                f"/opcoes/ambiente/{amb['id_amb']}",
                json={"texto": "peixe"},
                headers=adminh,
            )
            assert r.status_code == 201
            # duplicate option text
            r = await client.post(
                f"/opcoes/ambiente/{amb['id_amb']}",
                json={"texto": "peixe"},
                headers=adminh,
            )
            assert r.status_code == 400

            # patch titulo
            r = await client.patch(
                f"/ambientes/{amb['id_amb']}/titulo",
                json={"titulo_amb": "Projeto A2"},
                headers=adminh,
            )
            assert r.json()["titulo_amb"] == "Projeto A2"
            # invalid titulo
            r = await client.patch(
                f"/ambientes/{amb['id_amb']}/titulo",
                json={"titulo_amb": "ab"},
                headers=adminh,
            )
            assert r.status_code == 400

            # preview
            r = await client.get(
                f"/ambientes/{amb['id_amb']}/preview-imagens", headers=adminh
            )
            assert len(r.json()["imagens"]) == 5

            # replace options while no specialists
            r = await client.patch(
                f"/ambientes/{amb['id_amb']}/opcoes",
                json={"opcoes": ["sim", "não"]},
                headers=adminh,
            )
            assert r.status_code == 200

            # soft delete + reactivate
            r = await client.delete(f"/ambientes/{amb['id_amb']}", headers=adminh)
            assert r.status_code == 204
            r = await client.delete(f"/ambientes/{amb['id_amb']}", headers=adminh)
            assert r.status_code == 404
            r = await client.patch(
                f"/ambientes/{amb['id_amb']}/reativar", headers=adminh
            )
            assert r.status_code == 200
            assert r.json()["ambiente"]["ativo"] is True

    @pytest.mark.anyio
    async def test_requires_admin(self, app, client):
        async with client:
            adminh = await admin_headers(client)
            spech = await make_specialist(client, adminh)
            r = await client.get("/ambientes/", headers=spech)
            assert r.status_code == 403
            r = await client.get("/ambientes/")
            assert r.status_code == 401


class TestClassificationLoop:
    @pytest.mark.anyio
    async def test_full_loop(self, app, client):
        async with client:
            adminh = await admin_headers(client)
            spech = await make_specialist(client, adminh)
            amb = await make_ambiente(client, adminh, app)
            id_amb = amb["id_amb"]

            # not associated yet -> 403
            r = await client.get(
                f"/classificacoes/ambiente/{id_amb}/inicializar", headers=spech
            )
            assert r.status_code == 403

            # associate specialist
            with app.state.db.session() as s:
                id_con = s.fetchone("SELECT id_con FROM usuarios_convencionais")[
                    "id_con"
                ]
            r = await client.post(
                f"/usuarios-ambientes/{id_amb}/associar",
                json={"ids_usuarios": [id_con]},
                headers=adminh,
            )
            assert r.status_code == 200, r.text
            assert r.json()["total"] == 1

            # meus-ambientes shows it with totals
            r = await client.get(
                "/usuarios-ambientes/meus-ambientes", headers=spech
            )
            body = r.json()
            assert body["ambientes"][0]["total_imagens"] == 30
            assert body["ambientes"][0]["total_classificadas"] == 0

            # inicializar: first 20
            r = await client.get(
                f"/classificacoes/ambiente/{id_amb}/inicializar", headers=spech
            )
            page1 = r.json()
            assert page1["total"] == 20 and page1["tem_mais"] is True
            first_hash = page1["imagens"][0]["content_hash"]
            assert page1["imagens"][0]["download_url"].startswith(
                "/nextcloud/images/"
            )

            # avancar from image 10 -> next 20 (19 left)
            ref = page1["imagens"][10]["content_hash"]
            r = await client.post(
                f"/classificacoes/ambiente/{id_amb}/avancar",
                json={"content_hash": ref},
                headers=spech,
            )
            nxt = r.json()
            assert nxt["total"] == 19 and nxt["tem_mais"] is False

            # voltar from that ref -> previous 10
            r = await client.post(
                f"/classificacoes/ambiente/{id_amb}/voltar",
                json={"content_hash": ref},
                headers=spech,
            )
            assert r.json()["total"] == 10

            # avancar past the end -> 404
            last_hash = nxt["imagens"][-1]["content_hash"]
            r = await client.post(
                f"/classificacoes/ambiente/{id_amb}/avancar",
                json={"content_hash": last_hash},
                headers=spech,
            )
            assert r.status_code == 404

            # classify image with 2 options
            opcoes = (
                await client.get(f"/opcoes/ambiente/{id_amb}", headers=spech)
            ).json()["opcoes"]
            ids = [opcoes[0]["id_opc"], opcoes[1]["id_opc"]]
            r = await client.post(
                f"/classificacoes/ambiente/{id_amb}/classificar",
                json={"content_hash": first_hash, "id_opc": ids},
                headers=spech,
            )
            body = r.json()
            assert r.status_code == 200, body
            assert len(body["classificacoes"]) == 2
            assert body["total_classificadas"] == 1

            # reclassify: drop one, keep one, add one -> delta semantics
            ids2 = [opcoes[1]["id_opc"], opcoes[2]["id_opc"]]
            r = await client.post(
                f"/classificacoes/ambiente/{id_amb}/classificar",
                json={"content_hash": first_hash, "id_opc": ids2},
                headers=spech,
            )
            body = r.json()
            assert len(body["classificacoes"]) == 2
            assert body["total_classificadas"] == 1  # same image

            # per-image lookup shows only active classifications
            r = await client.get(
                f"/classificacoes/imagem/{first_hash}", headers=spech
            )
            textos = {c["texto_opcao"] for c in r.json()["classificacoes"]}
            assert textos == {opcoes[1]["texto"], opcoes[2]["texto"]}

            # contagem
            r = await client.get("/classificacoes/contagem", headers=spech)
            assert r.json()["total"] == 1

            # inicializar now skips the classified image
            r = await client.get(
                f"/classificacoes/ambiente/{id_amb}/inicializar", headers=spech
            )
            hashes = {i["content_hash"] for i in r.json()["imagens"]}
            assert first_hash not in hashes

            # historico groups options per image
            r = await client.get("/classificacoes/historico", headers=spech)
            hist = r.json()
            assert hist["total"] == 2  # two active classification rows
            assert len(hist["items"]) == 1
            assert "," in hist["items"][0]["opcao_escolhida"]

            # single-choice enforcement on multipla_escolha=False
            amb2 = await make_ambiente(
                client, adminh, app, titulo="Single", multipla=False
            )
            r = await client.post(
                f"/usuarios-ambientes/{amb2['id_amb']}/associar-todos",
                headers=adminh,
            )
            assert r.json()["total_associados"] == 1
            r = await client.post(
                f"/classificacoes/ambiente/{amb2['id_amb']}/classificar",
                json={"content_hash": first_hash, "id_opc": ids2},
                headers=spech,
            )
            assert r.status_code == 422

            # admins cannot classify
            r = await client.get(
                f"/classificacoes/ambiente/{id_amb}/inicializar", headers=adminh
            )
            assert r.status_code == 403

    @pytest.mark.anyio
    async def test_option_from_other_ambiente_rejected(self, app, client):
        async with client:
            adminh = await admin_headers(client)
            spech = await make_specialist(client, adminh)
            amb1 = await make_ambiente(client, adminh, app, titulo="A1")
            amb2 = await make_ambiente(client, adminh, app, titulo="A2")
            with app.state.db.session() as s:
                id_con = s.fetchone("SELECT id_con FROM usuarios_convencionais")[
                    "id_con"
                ]
            for amb in (amb1, amb2):
                await client.post(
                    f"/usuarios-ambientes/{amb['id_amb']}/associar",
                    json={"ids_usuarios": [id_con]},
                    headers=adminh,
                )
            opcoes2 = (
                await client.get(
                    f"/opcoes/ambiente/{amb2['id_amb']}", headers=spech
                )
            ).json()["opcoes"]
            # classify in amb1 with an option belonging to amb2 -> rejected
            r = await client.post(
                f"/classificacoes/ambiente/{amb1['id_amb']}/classificar",
                json={
                    "content_hash": "00" + "a" * 62,
                    "id_opc": [opcoes2[0]["id_opc"]],
                },
                headers=spech,
            )
            assert r.status_code == 400


class TestUsuariosWhitelistAuditoria:
    @pytest.mark.anyio
    async def test_user_management(self, app, client):
        async with client:
            adminh = await admin_headers(client)
            await make_specialist(client, adminh)
            r = await client.get("/usuarios/", headers=adminh)
            users = r.json()
            assert len(users) == 2
            spec = next(u for u in users if not u["is_admin"])
            assert spec["id_con"] is not None

            # soft delete / reactivate
            r = await client.delete(f"/usuarios/{spec['id_usu']}", headers=adminh)
            assert r.status_code == 204
            r = await client.post(
                "/auth/login",
                data={"username": "spec@x.com", "password": "Senha123"},
            )
            assert r.status_code == 403  # inactive account
            r = await client.patch(
                f"/usuarios/{spec['id_usu']}/reativar", headers=adminh
            )
            assert r.status_code == 200

            # self-deactivation forbidden
            admin_id = next(u for u in users if u["is_admin"])["id_usu"]
            r = await client.delete(f"/usuarios/{admin_id}", headers=adminh)
            assert r.status_code == 403

    @pytest.mark.anyio
    async def test_me_endpoints(self, app, client):
        async with client:
            adminh = await admin_headers(client)
            r = await client.get("/usuarios/me", headers=adminh)
            assert r.json()["is_admin"] is True
            r = await client.patch(
                "/usuarios/me", json={"telefone": "119999"}, headers=adminh
            )
            assert r.json()["telefone"] == "119999"
            r = await client.patch(
                "/usuarios/me/senha",
                json={"senha_atual": "errada", "nova_senha": "Nova1234"},
                headers=adminh,
            )
            assert r.status_code == 400
            r = await client.patch(
                "/usuarios/me/senha",
                json={
                    "senha_atual": settings.ADMIN_SENHA,
                    "nova_senha": "Nova1234",
                },
                headers=adminh,
            )
            assert r.status_code == 200
            r = await client.post(
                "/auth/login",
                data={"username": settings.ADMIN_EMAIL, "password": "Nova1234"},
            )
            assert r.status_code == 200

    @pytest.mark.anyio
    async def test_whitelist_lifecycle(self, app, client):
        async with client:
            adminh = await admin_headers(client)
            r = await client.post(
                "/whitelist/", json={"email": "w@x.com", "id_tipo": 1},
                headers=adminh,
            )
            id_cad = r.json()["id_cad"]
            # duplicate
            r = await client.post(
                "/whitelist/", json={"email": "w@x.com", "id_tipo": 1},
                headers=adminh,
            )
            assert r.status_code == 409
            # bad tipo
            r = await client.post(
                "/whitelist/", json={"email": "t@x.com", "id_tipo": 9},
                headers=adminh,
            )
            assert r.status_code == 422
            # list
            r = await client.get("/whitelist/", headers=adminh)
            assert len(r.json()) == 1
            # delete + reactivate
            r = await client.delete(f"/whitelist/{id_cad}", headers=adminh)
            assert r.status_code == 204
            r = await client.patch(
                f"/whitelist/{id_cad}/reativar", headers=adminh
            )
            assert r.status_code == 200

    @pytest.mark.anyio
    async def test_auditoria(self, app, client):
        async with client:
            adminh = await admin_headers(client)
            await client.post(
                "/whitelist/", json={"email": "w@x.com", "id_tipo": 1},
                headers=adminh,
            )
            r = await client.get("/auditoria/logs", headers=adminh)
            body = r.json()
            assert body["total"] >= 2  # login + whitelist create
            nomes = {log["nome_evento"] for log in body["logs"]}
            assert "cadastrar_email_permitido" in nomes
            r = await client.get("/auditoria/eventos", headers=adminh)
            eventos = {e["nome"] for e in r.json()}
            assert "logout" in eventos  # complete catalogue (ref defect fixed)


class TestPublicRoutes:
    @pytest.mark.anyio
    async def test_test_sync_routes(self, app, client):
        async with client:
            r = await client.get("/test/conjuntos")
            assert r.json()["total"] == 2
            r = await client.get(
                f"/test/conjuntos/{app.state.c1}/imagens?page=1&page_size=10"
            )
            body = r.json()
            assert body["total"] == 30 and body["total_pages"] == 3
            assert body["has_next"] is True
            r = await client.get(f"/test/conjuntos/{app.state.c2}/imagens")
            assert r.json()["total"] == 0

    @pytest.mark.anyio
    async def test_hash_lookup(self, app, client):
        from ics_tpu.core.security import sha256_hex

        data = b"\xff\xd8\xfffake-jpeg-bytes"
        h = sha256_hex(data)
        with app.state.db.session() as s:
            now = tz.utcnow()
            s.add(
                Imagem(
                    content_hash=h, nome_img="up.jpg", caminho_img="p/up.jpg",
                    data_proc=now, data_sinc=now, id_cnj=app.state.c1,
                )
            )
            s.commit()
        async with client:
            r = await client.post(
                "/images/buscar-por-hash",
                files=[
                    ("files", ("up.jpg", data, "image/jpeg")),
                    ("files", ("other.jpg", b"unknown", "image/jpeg")),
                    ("files", ("not-img.txt", b"x", "text/plain")),
                ],
            )
            body = r.json()
            assert body["total_enviadas"] == 3
            assert body["total_encontradas"] == 1
            assert body["resultados"][0]["encontrada"] is True
            assert body["resultados"][2]["hash"] == ""
            # empty upload
            r = await client.post("/images/buscar-por-hash", data={"x": "1"})
            assert r.status_code == 400


class TestSharedConjuntoScoping:
    """Two ambientes sharing ONE conjunto: classifications, work queues
    and history must stay ambiente-scoped (self-review r3 — classifying
    in B used to soft-delete the same user's classification in A, hide
    the image from B's queue, and duplicate/misattribute history)."""

    @pytest.mark.anyio
    async def test_cross_ambiente_isolation(self, app, client):
        async with client:
            adminh = await admin_headers(client)
            amb_a = await make_ambiente(client, adminh, app, titulo="Amb A",
                                        multipla=False)
            amb_b = await make_ambiente(client, adminh, app, titulo="Amb B",
                                        multipla=False)
            spech = await make_specialist(client, adminh)
            for amb in (amb_a, amb_b):
                r = await client.post(
                    f"/usuarios-ambientes/{amb['id_amb']}/associar-todos",
                    headers=adminh,
                )
                assert r.status_code in (200, 201), r.text

            # image + option ids
            r = await client.get(
                f"/classificacoes/ambiente/{amb_a['id_amb']}/inicializar",
                headers=spech,
            )
            img = r.json()["imagens"][0]["content_hash"]
            async def opcoes_de(amb):
                r = await client.get(
                    f"/opcoes/ambiente/{amb['id_amb']}", headers=spech
                )
                return [o["id_opc"] for o in r.json()["opcoes"]]

            op_a = (await opcoes_de(amb_a))[0]
            op_b = (await opcoes_de(amb_b))[0]

            # classify the SAME image in A, then in B
            for amb, op in ((amb_a, op_a), (amb_b, op_b)):
                r = await client.post(
                    f"/classificacoes/ambiente/{amb['id_amb']}/classificar",
                    json={"content_hash": img, "id_opc": [op]},
                    headers=spech,
                )
                assert r.status_code == 200, r.text

            # A's classification SURVIVES B's (was soft-deleted)
            r = await client.get(
                f"/classificacoes/imagem/{img}", headers=spech
            )
            ids = {c["id_opc"] for c in r.json()["classificacoes"]}
            assert {op_a, op_b} <= ids

            # history: exactly one row per ambiente, correctly attributed
            r = await client.get(
                f"/classificacoes/historico?id_amb={amb_a['id_amb']}",
                headers=spech,
            )
            hist_a = r.json()
            rows_a = [
                h for grp in hist_a.get("historico", hist_a.get("itens", []))
                for h in (grp.get("classificacoes", [grp])
                          if isinstance(grp, dict) else [grp])
            ]
            assert hist_a.get("total", len(rows_a)) == 1

            # B's queue no longer shows the image; a FRESH image is still
            # offered in B even though the user classified IT in A only
            r = await client.get(
                f"/classificacoes/ambiente/{amb_b['id_amb']}/inicializar",
                headers=spech,
            )
            hashes_b = {i["content_hash"] for i in r.json()["imagens"]}
            assert img not in hashes_b
            outro = next(iter(hashes_b))
            r = await client.post(
                f"/classificacoes/ambiente/{amb_a['id_amb']}/classificar",
                json={"content_hash": outro, "id_opc": [op_a]},
                headers=spech,
            )
            assert r.status_code == 200
            r = await client.get(
                f"/classificacoes/ambiente/{amb_b['id_amb']}/inicializar",
                headers=spech,
            )
            assert outro in {
                i["content_hash"] for i in r.json()["imagens"]
            }  # classified in A only -> still in B's queue
