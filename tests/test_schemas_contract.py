"""Contract tests: live API responses validate against the pydantic
schemas (the typed public contract, reference schema parity)."""

import httpx
import pytest

from ics_tpu.core.config import settings
from ics_tpu.schemas.auth_schema import (
    AmbienteOut,
    CadastroPermitidoOut,
    LogAuditoriaPage,
    OpcoesListResponse,
    Token,
    UsuarioAmbientesOut,
    UsuarioOut,
)
from ics_tpu.schemas.classificacao_schema import (
    ClassificarResponse,
    HistoricoResponse,
    ImagensClassificacaoResponse,
)
from ics_tpu.schemas.nextcloud_schema import (
    ConjuntoImagensListResponse,
    ImagemListResponse,
    RespostaBuscaImagens,
)

from tests.test_api_full import (  # reuse fixtures/helpers
    admin_headers,
    app,  # noqa: F401
    client,  # noqa: F401
    make_ambiente,
    make_specialist,
)


class TestContracts:
    @pytest.mark.anyio
    async def test_full_loop_responses_validate(self, app, client):  # noqa: F811
        async with client:
            adminh = await admin_headers(client)
            r = await client.post(
                "/auth/login",
                data={
                    "username": settings.ADMIN_EMAIL,
                    "password": settings.ADMIN_SENHA,
                },
            )
            Token.model_validate(r.json())
            client.cookies.clear()

            spech = await make_specialist(client, adminh)
            amb = await make_ambiente(client, adminh, app)
            AmbienteOut.model_validate(amb)

            r = await client.get("/usuarios/", headers=adminh)
            for u in r.json():
                UsuarioOut.model_validate(u)

            r = await client.post(
                "/whitelist/", json={"email": "w2@x.com", "id_tipo": 1},
                headers=adminh,
            )
            CadastroPermitidoOut.model_validate(
                {**r.json(), "usado": False, "ativo": True}
            )

            r = await client.get(
                f"/opcoes/ambiente/{amb['id_amb']}", headers=adminh
            )
            OpcoesListResponse.model_validate(r.json())

            with app.state.db.session() as s:
                id_con = s.fetchone("SELECT id_con FROM usuarios_convencionais")[
                    "id_con"
                ]
            await client.post(
                f"/usuarios-ambientes/{amb['id_amb']}/associar",
                json={"ids_usuarios": [id_con]},
                headers=adminh,
            )
            r = await client.get(
                "/usuarios-ambientes/meus-ambientes", headers=spech
            )
            UsuarioAmbientesOut.model_validate(r.json())

            r = await client.get(
                f"/classificacoes/ambiente/{amb['id_amb']}/inicializar",
                headers=spech,
            )
            page = ImagensClassificacaoResponse.model_validate(r.json())
            opc = (
                await client.get(
                    f"/opcoes/ambiente/{amb['id_amb']}", headers=spech
                )
            ).json()["opcoes"][0]["id_opc"]
            r = await client.post(
                f"/classificacoes/ambiente/{amb['id_amb']}/classificar",
                json={
                    "content_hash": page.imagens[0].content_hash,
                    "id_opc": [opc],
                },
                headers=spech,
            )
            ClassificarResponse.model_validate(r.json())

            r = await client.get("/classificacoes/historico", headers=spech)
            HistoricoResponse.model_validate(r.json())

            r = await client.get("/auditoria/logs", headers=adminh)
            LogAuditoriaPage.model_validate(r.json())

            r = await client.get("/test/conjuntos")
            ConjuntoImagensListResponse.model_validate(r.json())
            r = await client.get(f"/test/conjuntos/{app.state.c1}/imagens")
            ImagemListResponse.model_validate(r.json())

            r = await client.post(
                "/images/buscar-por-hash",
                files=[("files", ("x.jpg", b"\xff\xd8\xff00", "image/jpeg"))],
            )
            RespostaBuscaImagens.model_validate(r.json())
