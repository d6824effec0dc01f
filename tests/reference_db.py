"""Synthesize a reference-created database for adoption tests.

The real thing is produced by the reference's SQLAlchemy ``create_all``
plus its alembic chain (``/root/reference/app/db/models.py:10-283``,
``alembic/versions/``). Our 16 parity models are column-identical by
verified contract, so the synthesizer builds the tables from OUR model
DDL and then strips exactly what postdates the simulated reference
revision — the inverse of what ``db/adopt.py`` must put back:

- ``sync_status.last_activity_id`` never existed in the reference
  (our m0002)
- at alembic ``b4e5c6d7e8f9`` (pre-head), ``ambientes.multipla_escolha``
  doesn't exist yet (the head revision adds it)

Demo data mirrors a small production reference install: a bcrypt-hashed
admin + conventional user (hashes from the reference's ``bcrypt.hashpw``,
``app/core/utils.py:5-10``; fixed $2b$ vectors), an ambiente with
options, a synced folder with images and classifications, the singleton
sync_status row, and ONLY the 17 audit events the reference seeds
(``app/db/database.py:74-92`` — adoption must complete the catalogue).
"""

from __future__ import annotations

from ics_tpu.db.adopt import PARITY_TABLES
from ics_tpu.db.engine import Database
from ics_tpu.db.orm import MODEL_REGISTRY, create_table_sql

# fixed bcrypt vectors (see tests/test_bcrypt_compat.py)
ADMIN_EMAIL = "admin@referencia.example"
ADMIN_PASSWORD = "senha_Forte123"
ADMIN_BCRYPT = "$2b$06$abcdefghijklmnopqrstuuExfrxfmDW7laMu/qVQM54kltkq3Ji3."
USER_EMAIL = "usuario@referencia.example"
USER_PASSWORD = "password"
USER_BCRYPT = "$2b$04$abcdefghijklmnopqrstuughE8Ev8uGFaUgY2cNEySvxngrb/Jzdm"

ADMIN_ID = "11111111-1111-1111-1111-111111111111"
USER_ID = "22222222-2222-2222-2222-222222222222"
ADM_ID = "33333333-3333-3333-3333-333333333333"
CON_ID = "44444444-4444-4444-4444-444444444444"
AMB_ID = "55555555-5555-5555-5555-555555555555"
OPC_IDS = (
    "66666666-6666-6666-6666-666666666661",
    "66666666-6666-6666-6666-666666666662",
)
CNJ_ID = "77777777-7777-7777-7777-777777777777"
IMG_HASHES = ("a" * 64, "b" * 64, "c" * 64)
T0 = "2026-01-05T12:00:00+00:00"

# the 17 names the reference actually seeds (database.py:74-92)
REFERENCE_SEEDED_EVENTS = [
    "login",
    "cadastrar_usuario_convencional",
    "cadastrar_usuario_administrador",
    "listar_usuarios",
    "excluir_usuario",
    "reativar_usuario",
    "cadastrar_email_permitido",
    "listar_cadastros_permitidos",
    "excluir_cadastro_permitido",
    "reativar_cadastro_permitido",
    "criar_ambiente",
    "excluir_ambiente",
    "reativar_ambiente",
    "associar_todos_usuarios_ambiente",
    "associar_usuario_ambiente",
    "excluir_vinculo_usuario_ambiente",
    "reativar_vinculo_usuario_ambiente",
]


def make_reference_db(
    db: Database,
    alembic_revision: str | None = "e7efd594e4cd",
) -> None:
    """Populate ``db`` as a reference install at ``alembic_revision``
    (None = a create_all-only dev DB with no alembic_version table)."""
    import ics_tpu.db.models  # noqa: F401 — populate registry

    with db.session() as s:
        for t in PARITY_TABLES:
            for stmt in create_table_sql(MODEL_REGISTRY[t]):
                s.execute(stmt)
        # strip what postdates the reference
        s.execute("ALTER TABLE sync_status DROP COLUMN last_activity_id")
        if alembic_revision == "b4e5c6d7e8f9":
            s.execute("ALTER TABLE ambientes DROP COLUMN multipla_escolha")
        if alembic_revision is not None:
            s.execute(
                "CREATE TABLE alembic_version (version_num VARCHAR(32) "
                "NOT NULL, PRIMARY KEY (version_num))"
            )
            s.execute(
                "INSERT INTO alembic_version (version_num) VALUES (?)",
                (alembic_revision,),
            )

        s.execute(
            "INSERT INTO tipo_usuarios (id_tipo, nome) "
            "VALUES (1, 'convencional'), (2, 'admin')"
        )
        for uid, email, nome, pw_hash, tipo in (
            (ADMIN_ID, ADMIN_EMAIL, "Administrador Legado", ADMIN_BCRYPT, 2),
            (USER_ID, USER_EMAIL, "Usuario Legado", USER_BCRYPT, 1),
        ):
            s.execute(
                "INSERT INTO usuarios (id_usu, nome_completo, email, "
                "senha_hash, data_criado, ativo, id_tipo) "
                "VALUES (?, ?, ?, ?, ?, 1, ?)",
                (uid, nome, email, pw_hash, T0, tipo),
            )
        s.execute(
            "INSERT INTO usuarios_administradores (id_adm, cpf, id_usu) "
            "VALUES (?, '52998224725', ?)",
            (ADM_ID, ADMIN_ID),
        )
        s.execute(
            "INSERT INTO usuarios_convencionais (id_con, cpf, id_usu) "
            "VALUES (?, '15350946056', ?)",
            (CON_ID, USER_ID),
        )
        multipla = (
            ""
            if alembic_revision == "b4e5c6d7e8f9"
            else ", multipla_escolha"
        )
        mv = "" if alembic_revision == "b4e5c6d7e8f9" else ", 0"
        s.execute(
            "INSERT INTO ambientes (id_amb, titulo_amb, "
            "descricao_questionario, data_criado, id_adm, ativo, "
            f"utilizavel{multipla}) VALUES (?, 'Fauna', 'Que animal?', ?, "
            f"?, 1, 1{mv})",
            (AMB_ID, T0, ADM_ID),
        )
        for opc_id, texto in zip(OPC_IDS, ("gato", "cachorro")):
            s.execute(
                "INSERT INTO opcoes (id_opc, texto, id_amb) VALUES (?, ?, ?)",
                (opc_id, texto, AMB_ID),
            )
        s.execute(
            "INSERT INTO usuarios_ambientes (id_con, id_amb, "
            "data_associado, ativo) VALUES (?, ?, ?, 1)",
            (CON_ID, AMB_ID, T0),
        )
        s.execute(
            "INSERT INTO conjuntos_imagens (id_cnj, nome_conj, "
            "caminho_conj, file_id, imagens_sincronizadas, "
            "existe_no_nextcloud, data_proc, data_sinc) "
            "VALUES (?, 'fotos', '/fotos', '9001', 1, 1, ?, ?)",
            (CNJ_ID, T0, T0),
        )
        s.execute(
            "INSERT INTO ambientes_conjuntos_imagens (id_amb, id_cnj, "
            "data_associado, ativo) VALUES (?, ?, ?, 1)",
            (AMB_ID, CNJ_ID, T0),
        )
        for i, h in enumerate(IMG_HASHES):
            s.execute(
                "INSERT INTO imagens (content_hash, nome_img, caminho_img, "
                "existe_no_nextcloud, data_proc, data_sinc, id_cnj) "
                "VALUES (?, ?, ?, 1, ?, ?, ?)",
                (h, f"img{i}.jpg", f"/fotos/img{i}.jpg", T0, T0, CNJ_ID),
            )
        s.execute(
            "INSERT INTO classificacoes (id_cla, data_criado, id_con, "
            "id_img, id_opc, ativo) VALUES "
            "('88888888-8888-8888-8888-888888888888', ?, ?, ?, ?, 1)",
            (T0, CON_ID, IMG_HASHES[0], OPC_IDS[0]),
        )
        for i, nome in enumerate(REFERENCE_SEEDED_EVENTS, start=1):
            s.execute(
                "INSERT INTO eventos_auditoria (id_evento, nome) "
                "VALUES (?, ?)",
                (i, nome),
            )
        s.execute(
            "INSERT INTO logs_auditoria (id_log, id_usu, evento_id, "
            "data_evento) VALUES "
            "('99999999-9999-9999-9999-999999999999', ?, 1, ?)",
            (ADMIN_ID, T0),
        )
        s.execute(
            "INSERT INTO sync_status (id, activity_api_available, "
            "activity_api_failures, webdav_failures, server_offline, "
            "sync_in_progress, created_at, updated_at) "
            "VALUES (1, 1, 0, 0, 0, 0, ?, ?)",
            (T0, T0),
        )
        s.commit()
