"""Live-PostgreSQL integration tests (VERDICT r2 item 5).

These run ONLY when ``ICS_TPU_TEST_PG_URL`` points at a real server
(``docker compose up db``; recipe in docs/banco-de-dados.md) — the image
this repo is built in has no PostgreSQL binary, so they skip with one line
here. They target exactly the surfaces the protocol fake cannot prove:

- SCRAM-SHA-256 against a real server's nonce/iteration choices
- type OIDs beyond the fake's set (numeric, timestamptz, name, ...)
- transaction semantics: rollback, error recovery inside a tx, integrity
  errors surfacing as PGIntegrityError
- full product schema: create_all + migrations + seed on the real dialect

The rest of the suite ALSO runs against the server under this profile
(conftest redirects every file-backed test Database onto a fresh PG
database), so `pytest tests/` with the env var set is the full parity run.
"""

import os

import pytest

pytestmark = pytest.mark.postgres

PG_URL = os.environ.get("ICS_TPU_TEST_PG_URL", "")


def _conn():
    from ics_tpu.db import pg_wire

    return pg_wire.PGConnection(**pg_wire.parse_dsn(PG_URL))


class TestWireProtocolLive:
    def test_scram_handshake_and_select(self):
        conn = _conn()
        try:
            cols, rows, tag = conn.execute("SELECT 1 AS um, 'x' AS texto")
            assert cols == ["um", "texto"]
            assert rows[0][0] == 1 and rows[0][1] == "x"
        finally:
            conn.close()

    def test_type_oids_beyond_fake(self):
        """The fake translates to sqlite and only ever emits its small OID
        set; a real server exercises numeric/timestamptz/name/oid/float8."""
        conn = _conn()
        try:
            _, rows, _ = conn.execute(
                "SELECT 1.5::float8, 2.25::numeric, now()::timestamptz, "
                "current_database()::name, 42::oid, NULL::text"
            )
            row = rows[0]
            assert float(row[0]) == 1.5
            assert float(row[1]) == 2.25
            assert row[2] is not None
            assert isinstance(row[3], str)
            assert row[5] is None
        finally:
            conn.close()

    def test_error_recovery_and_rollback(self):
        from ics_tpu.db.pg_wire import PGError

        conn = _conn()
        try:
            conn.execute("CREATE TEMP TABLE t (a INTEGER PRIMARY KEY)")
            conn.execute("BEGIN")
            conn.execute("INSERT INTO t VALUES (1)")
            with pytest.raises(PGError):
                conn.execute("SELECT definitely_not_a_column FROM t")
            # after an in-tx error the tx is aborted; ROLLBACK must recover
            conn.execute("ROLLBACK")
            _, rows, _ = conn.execute("SELECT count(*) FROM t")
            assert int(rows[0][0]) == 0
        finally:
            conn.close()

    def test_integrity_error_class(self):
        from ics_tpu.db.pg_wire import PGIntegrityError

        conn = _conn()
        try:
            conn.execute("CREATE TEMP TABLE u (a INTEGER PRIMARY KEY)")
            conn.execute("INSERT INTO u VALUES (1)")
            with pytest.raises(PGIntegrityError):
                conn.execute("INSERT INTO u VALUES (1)")
            conn.execute("ROLLBACK")
        finally:
            conn.close()


class TestProductSchemaLive:
    def test_create_all_migrate_seed_and_crud(self, tmp_path):
        """The whole boot path on the real dialect: schema + 3-revision
        migration chain + seed, then an ORM round-trip with aware-UTC
        timestamps and soft-delete semantics."""
        from ics_tpu.core import timezone as tz
        from ics_tpu.db import migrate, seed
        from ics_tpu.db.engine import Database
        from ics_tpu.db.models import Usuario

        # conftest redirects this sqlite URL onto a fresh PG database
        db = Database(f"sqlite:///{tmp_path}/live.db")
        assert db.dialect == "postgres", "profile not active?"
        db.create_all()
        migrate.stamp_head(db)
        seed.seed_all(db)
        with db.session() as s:
            users = s.query(Usuario).all()
            assert users, "seed created the initial admin"
            now = tz.utcnow()
            u = Usuario(
                nome_completo="PG Vivo", email="pg@x.com",
                senha_hash="h", data_criado=now, id_tipo=1,
            )
            s.add(u)
            s.commit()
        with db.session() as s:
            got = s.query(Usuario).filter(Usuario.email == "pg@x.com").first()
            assert got is not None
            assert got.data_criado.isoformat() == now.isoformat()
