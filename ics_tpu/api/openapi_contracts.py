"""Request/response contracts per (METHOD, path) for /openapi.json.

One reviewable table instead of scattering annotations through 13 route
modules (VERDICT r2 item 6: the reference's documented workflow is the
interactive Swagger console at /docs — an operator must be able to see
each route's body and exercise it from the browser).

Values:
- ``request``: a pydantic model from ``ics_tpu.schemas`` OR a plain
  OpenAPI schema dict for ad-hoc bodies the reference also left untyped
- ``response``: pydantic model / schema dict for the 200 body
- ``body``: "json" (default) | "form" | "multipart"
- ``query``: {name: description} of accepted query parameters
"""

from __future__ import annotations

from ics_tpu.schemas import auth_schema as a
from ics_tpu.schemas import classificacao_schema as c
from ics_tpu.schemas import nextcloud_schema as n


def _obj(props: dict, required: list[str] | None = None) -> dict:
    return {
        "type": "object",
        "properties": {
            k: ({"type": v} if isinstance(v, str) else v)
            for k, v in props.items()
        },
        **({"required": required} if required else {}),
    }


_PAGING = {"page": "página (1-based)", "page_size": "itens por página"}
_UPLOAD = _obj({"files": {"type": "string", "format": "binary"}}, ["files"])

CONTRACTS: dict[tuple[str, str], dict] = {
    # -- auth ---------------------------------------------------------------
    ("POST", "/auth/login"): {
        "body": "form",
        "request": _obj({"username": "string", "password": "string"},
                        ["username", "password"]),
        "response": a.Token,
    },
    ("POST", "/auth/cadastro"): {"request": a.UsuarioCreate,
                                 "response": a.UsuarioOut},
    ("POST", "/auth/logout"): {},
    # -- usuarios -----------------------------------------------------------
    ("GET", "/usuarios/"): {"response": a.UsuarioOut,
                            "response_list": True},
    ("GET", "/usuarios/me"): {"response": a.UsuarioOut},
    ("PATCH", "/usuarios/me"): {"request": a.UsuarioUpdatePerfil,
                                "response": a.UsuarioOut},
    ("PATCH", "/usuarios/me/senha"): {"request": a.UsuarioUpdateSenha},
    ("DELETE", "/usuarios/{id_usu}"): {},
    ("PATCH", "/usuarios/{id_usu}/reativar"): {"response": a.UsuarioOut},
    # -- whitelist ----------------------------------------------------------
    ("POST", "/whitelist/"): {"request": a.CadastroPermitidoCreate,
                              "response": a.CadastroPermitidoOut},
    ("GET", "/whitelist/"): {"response": a.CadastroPermitidoOut,
                             "response_list": True},
    ("DELETE", "/whitelist/{id_cad}"): {},
    ("PATCH", "/whitelist/{id_cad}/reativar"): {
        "response": a.CadastroPermitidoOut},
    # -- ambientes ----------------------------------------------------------
    ("GET", "/ambientes/"): {"response": a.AmbienteOut,
                             "response_list": True},
    ("POST", "/ambientes/importar"): {"request": a.AmbienteCreate,
                                      "response": a.AmbienteOut},
    ("DELETE", "/ambientes/{id_amb}"): {},
    ("PATCH", "/ambientes/{id_amb}/titulo"): {
        "request": _obj({"titulo_amb": "string"}, ["titulo_amb"]),
        "response": a.AmbienteOut,
    },
    ("PATCH", "/ambientes/{id_amb}/titulo-questionario"): {
        "request": _obj({"titulo_questionario": "string"}),
        "response": a.AmbienteOut,
    },
    ("PATCH", "/ambientes/{id_amb}/descricao-questionario"): {
        "request": _obj({"descricao_questionario": "string"}),
        "response": a.AmbienteOut,
    },
    ("PATCH", "/ambientes/{id_amb}/opcoes"): {
        "request": _obj({"opcoes": {"type": "array",
                                    "items": {"type": "string"}}}),
        "response": a.OpcoesListResponse,
    },
    ("PATCH", "/ambientes/{id_amb}/reativar"): {"response": a.AmbienteOut},
    ("GET", "/ambientes/{id_amb}/preview-imagens"): {
        "query": {"limite": "máximo de imagens"}},
    # -- opcoes -------------------------------------------------------------
    ("POST", "/opcoes/ambiente/{id_amb}"): {"request": a.OpcaoCreate,
                                            "response": a.OpcaoOut},
    ("GET", "/opcoes/ambiente/{id_amb}"): {
        "response": a.OpcoesListResponse},
    # -- usuarios-ambientes -------------------------------------------------
    ("POST", "/usuarios-ambientes/{id_amb}/associar"): {
        "request": _obj({"ids_usuarios": {"type": "array",
                                          "items": {"type": "string"}}},
                        ["ids_usuarios"]),
    },
    ("POST", "/usuarios-ambientes/{id_amb}/associar-todos"): {},
    ("DELETE", "/usuarios-ambientes/{id_amb}/usuario/{id_con}"): {},
    ("PATCH", "/usuarios-ambientes/{id_amb}/usuario/{id_con}/reativar"): {},
    ("GET", "/usuarios-ambientes/meus-ambientes"): {
        "response": a.UsuarioAmbientesOut},
    ("GET", "/usuarios-ambientes/usuario/{id_con}/ambientes"): {
        "response": a.UsuarioAmbientesOut},
    ("GET", "/usuarios-ambientes/ambiente/{id_amb}/usuarios"): {
        "response": a.AmbienteUsuariosOut},
    # -- classificacoes -----------------------------------------------------
    ("GET", "/classificacoes/ambiente/{id_amb}/inicializar"): {
        "response": c.ImagensClassificacaoResponse},
    ("POST", "/classificacoes/ambiente/{id_amb}/avancar"): {
        "request": c.AvancarRequest,
        "response": c.ImagensClassificacaoResponse},
    ("POST", "/classificacoes/ambiente/{id_amb}/voltar"): {
        "request": c.VoltarRequest,
        "response": c.ImagensClassificacaoResponse},
    ("POST", "/classificacoes/ambiente/{id_amb}/classificar"): {
        "request": c.ClassificarRequest, "response": c.ClassificarResponse},
    ("POST", "/classificacoes/ambiente/{id_amb}/classificar-tpu"): {
        "body": "multipart",
        "request": _obj({"file": {"type": "string", "format": "binary"}},
                        ["file"]),
        "response": c.InferenciaTPUOut,
    },
    ("POST", "/classificacoes/ambiente/{id_amb}/explicar"): {
        "body": "multipart",
        "request": _obj({"file": {"type": "string", "format": "binary"}},
                        ["file"]),
        "query": {"id_opc": "explica esta opção do modelo ativo "
                            "(default: a classe top do modelo)",
                  "suavizar": "SmoothGrad: média dos gradientes sobre N "
                              "cópias ruidosas (1-16; quantizado para "
                              "{1,4,8,16})"},
    },
    ("GET", "/classificacoes/ambiente/{id_amb}/priorizadas"): {
        "query": {"limite": "máx. de imagens (1-100, default 20)"},
        "response": c.ImagensClassificacaoResponse,
    },
    ("GET",
     "/classificacoes/ambiente/{id_amb}/sugerir-vizinhos/{content_hash}"): {
        "query": {"k": "vizinhos no voto (1-50, default 10)"},
    },
    ("GET", "/classificacoes/contagem"): {
        "query": {"id_amb": "ambiente"}},
    ("GET", "/classificacoes/historico"): {
        "query": {**_PAGING, "id_amb": "ambiente"},
        "response": c.HistoricoResponse},
    ("GET", "/classificacoes/imagem/{content_hash}"): {
        "response": c.ClassificacoesImagemResponse},
    # -- nextcloud / images -------------------------------------------------
    ("GET", "/nextcloud/images"): {"query": dict(_PAGING),
                                   "response": n.ImageListResponse},
    ("GET", "/nextcloud/images/{file_path:path}"): {},
    ("POST", "/images/buscar-similares"): {
        "body": "multipart",
        "request": _obj({"file": {"type": "string", "format": "binary"}},
                        ["file"]),
        "query": {"limite": "máx. de resultados (1-50, default 10)",
                  "apenas_duplicatas": "true = só score >= limiar de "
                                       "quase-duplicata"},
    },
    ("GET", "/images/{content_hash}/similares"): {
        "query": {"limite": "máx. de resultados (1-50, default 10)"},
    },
    ("POST", "/images/buscar-por-hash"): {
        "request": _obj({"hashes": {"type": "array",
                                    "items": {"type": "string"}}},
                        ["hashes"]),
        "response": n.RespostaBuscaImagens,
    },
    ("GET", "/test/conjuntos"): {"response": n.ConjuntoImagensListResponse},
    ("GET", "/test/conjuntos/{id_cnj}/imagens"): {
        "query": dict(_PAGING), "response": n.ImagemListResponse},
    # -- auditoria ----------------------------------------------------------
    ("GET", "/auditoria/logs"): {
        "query": {**_PAGING, "id_usuario": "filtro por usuário",
                  "id_evento": "filtro por evento",
                  "data_inicio": "ISO", "data_fim": "ISO"},
        "response": a.LogAuditoriaPage,
    },
    ("GET", "/auditoria/eventos"): {"response": a.EventoAuditoriaOut,
                                    "response_list": True},
    # -- inferencia (net-new) -----------------------------------------------
    ("GET", "/inferencia/modelos"): {},
    ("GET", "/inferencia/status"): {},
    ("POST", "/inferencia/warmup"): {},
    ("POST", "/inferencia/indexar"): {
        "request": _obj({"limite": {"type": "integer"}}, []),
    },
    ("POST", "/inferencia/classificar"): {
        "body": "multipart", "request": _UPLOAD,
        "query": {"modelo": "nome do modelo do registry"},
    },
    ("POST", "/inferencia/profiler/start"): {},
    ("POST", "/inferencia/profiler/stop"): {},
    # -- treinamento (net-new) ----------------------------------------------
    ("POST", "/treinamento/ambiente/{id_amb}"): {
        "request": _obj({
            "modelo": "string", "max_steps": "integer",
            "batch_size": "integer", "lr": "number", "epochs": "integer",
            "canvas": "integer", "eval_fraction": "number",
            "remat": "boolean", "usar_sugestoes": "boolean",
            "sugestao_min_score": "number", "retomar_de": "string",
            "pesos_iniciais": "string", "augmentar": "boolean",
            "mixup_alpha": "number", "suavizacao_rotulo": "number",
            "agenda_lr": "string", "treinar_apenas_cabeca": "boolean",
            "otimizador": "string", "ema_decaimento": "number",
            "acumular_gradientes": "integer",
            "cutmix_alpha": "number", "paciencia": "integer",
            "avaliar_cada": "integer", "llrd": "number",
        }),
    },
    ("GET", "/treinamento/jobs"): {},
    ("GET", "/treinamento/jobs/{id_job}"): {},
    ("POST", "/treinamento/jobs/{id_job}/cancelar"): {},
    ("GET", "/treinamento/ambiente/{id_amb}/dataset"): {},
    ("GET", "/treinamento/jobs/{id_job}/stream"): {},
    ("GET", "/treinamento/modelos"): {"query": {"id_amb": "ambiente"}},
    ("POST", "/treinamento/modelos/{id_mod}/ativar"): {},
    ("POST", "/treinamento/modelos/{id_mod}/avaliar"): {},
    ("POST", "/treinamento/modelos/{id_mod}/sugerir"): {
        "request": _obj({"limite": {"type": "integer"}}, []),
    },
    ("GET", "/treinamento/modelos/{id_mod}/exportar"): {},
    ("POST", "/treinamento/ambiente/{id_amb}/importar"): {
        "body": "multipart",
        "request": _obj({"file": {"type": "string", "format": "binary"}},
                        ["file"]),
    },
    ("POST", "/treinamento/gc"): {},
    # -- monitor / misc -----------------------------------------------------
    ("GET", "/"): {},
    ("GET", "/health"): {},
    ("GET", "/monitor/metrics"): {},
    ("GET", "/monitor/painel"): {},
    ("GET", "/monitor/status"): {},
    ("POST", "/monitor/latency-budget"): {},
    ("GET", "/docs"): {},
    ("GET", "/openapi.json"): {},
}
