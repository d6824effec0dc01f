"""Mechanical endpoint-inventory parity check.

Every (METHOD, path) the reference exposes must exist in this app's
router — a missing surface is a parity regression, caught here rather
than by a line-by-line sweep.

The inventory below is a HAND-FROZEN transcription of the reference's
decorators + router prefixes (``/root/reference/app/api/routes/*.py``,
``app/main.py``), reviewed against the source at the time of writing. It
does not track reference drift automatically (the reference is a pinned
snapshot, so drift cannot happen here); if the snapshot is ever updated,
re-transcribe this list.
"""

import re

import pytest

from ics_tpu.main import create_app

# reference inventory (45 router endpoints + root/health/monitor),
# SURVEY.md §2.1 items 17-27
REFERENCE_ENDPOINTS = [
    ("DELETE", "/ambientes/{id_amb}"),
    ("DELETE", "/usuarios-ambientes/{id_amb}/usuario/{id_con}"),
    ("DELETE", "/usuarios/{id_usu}"),
    ("DELETE", "/whitelist/{id_cad}"),
    ("GET", "/ambientes/"),
    ("GET", "/ambientes/{id_amb}/preview-imagens"),
    ("GET", "/auditoria/eventos"),
    ("GET", "/auditoria/logs"),
    ("GET", "/classificacoes/ambiente/{id_amb}/inicializar"),
    ("GET", "/classificacoes/contagem"),
    ("GET", "/classificacoes/historico"),
    ("GET", "/classificacoes/imagem/{content_hash}"),
    ("GET", "/nextcloud/images"),
    ("GET", "/nextcloud/images/{file_path:path}"),
    ("GET", "/opcoes/ambiente/{id_amb}"),
    ("GET", "/test/conjuntos"),
    ("GET", "/test/conjuntos/{id_cnj}/imagens"),
    ("GET", "/usuarios-ambientes/ambiente/{id_amb}/usuarios"),
    ("GET", "/usuarios-ambientes/meus-ambientes"),
    ("GET", "/usuarios-ambientes/usuario/{id_con}/ambientes"),
    ("GET", "/usuarios/"),
    ("GET", "/usuarios/me"),
    ("GET", "/whitelist/"),
    ("PATCH", "/ambientes/{id_amb}/descricao-questionario"),
    ("PATCH", "/ambientes/{id_amb}/opcoes"),
    ("PATCH", "/ambientes/{id_amb}/reativar"),
    ("PATCH", "/ambientes/{id_amb}/titulo"),
    ("PATCH", "/ambientes/{id_amb}/titulo-questionario"),
    ("PATCH", "/usuarios-ambientes/{id_amb}/usuario/{id_con}/reativar"),
    ("PATCH", "/usuarios/me"),
    ("PATCH", "/usuarios/me/senha"),
    ("PATCH", "/usuarios/{id_usu}/reativar"),
    ("PATCH", "/whitelist/{id_cad}/reativar"),
    ("POST", "/ambientes/importar"),
    ("POST", "/auth/cadastro"),
    ("POST", "/auth/login"),
    ("POST", "/auth/logout"),
    ("POST", "/classificacoes/ambiente/{id_amb}/avancar"),
    ("POST", "/classificacoes/ambiente/{id_amb}/classificar"),
    ("POST", "/classificacoes/ambiente/{id_amb}/voltar"),
    ("POST", "/images/buscar-por-hash"),
    ("POST", "/opcoes/ambiente/{id_amb}"),
    ("POST", "/usuarios-ambientes/{id_amb}/associar"),
    ("POST", "/usuarios-ambientes/{id_amb}/associar-todos"),
    ("POST", "/whitelist/"),
    # app/main.py root endpoints
    ("GET", "/"),
    ("GET", "/health"),
]

# net-new TPU tier this framework adds on top of parity
NET_NEW_ENDPOINTS = [
    ("POST", "/classificacoes/ambiente/{id_amb}/classificar-tpu"),
    ("POST", "/classificacoes/ambiente/{id_amb}/explicar"),
    ("GET", "/classificacoes/ambiente/{id_amb}/priorizadas"),
    ("GET", "/classificacoes/ambiente/{id_amb}/sugerir-vizinhos/{hash}"),
    ("GET", "/inferencia/modelos"),
    ("POST", "/inferencia/classificar"),
    ("POST", "/inferencia/indexar"),
    ("POST", "/images/buscar-similares"),
    ("GET", "/images/{content_hash}/similares"),
    ("POST", "/treinamento/ambiente/{id_amb}"),
    ("GET", "/treinamento/ambiente/{id_amb}/dataset"),
    ("GET", "/treinamento/jobs"),
    ("GET", "/treinamento/jobs/{id_job}/stream"),
    ("GET", "/treinamento/modelos"),
    ("POST", "/treinamento/modelos/{id_mod}/ativar"),
    ("POST", "/treinamento/modelos/{id_mod}/avaliar"),
    ("POST", "/treinamento/modelos/{id_mod}/sugerir"),
    ("GET", "/treinamento/modelos/{id_mod}/exportar"),
    ("POST", "/treinamento/ambiente/{id_amb}/importar"),
    ("GET", "/monitor/metrics"),
    ("GET", "/monitor/painel"),
    ("GET", "/monitor/status"),
]


def _normalize(path: str) -> str:
    """Compare shapes, not param names: {id_amb} == {x}; trailing-slash
    insensitive ('/usuarios/' and '/usuarios' route the same here)."""
    path = re.sub(r"\{[^}:]*(:path)?\}", r"{p\1}", path)
    return path.rstrip("/") or "/"


@pytest.fixture(scope="module")
def route_set():
    app = create_app()
    out = set()
    for route in app.router.routes:
        for method in route.methods:
            out.add((method, _normalize(route.path)))
    return out


def test_reference_inventory_complete(route_set):
    missing = [
        (m, p) for m, p in REFERENCE_ENDPOINTS
        if (m, _normalize(p)) not in route_set
    ]
    assert not missing, f"reference endpoints missing: {missing}"


def test_net_new_tier_present(route_set):
    missing = [
        (m, p) for m, p in NET_NEW_ENDPOINTS
        if (m, _normalize(p)) not in route_set
    ]
    assert not missing, f"net-new endpoints missing: {missing}"
