import pytest

from ics_tpu.core import timezone as tz
from ics_tpu.db.engine import Database, IntegrityError
from ics_tpu.db.migrate import applied_revisions, stamp_head, upgrade_head
from ics_tpu.db.models import (
    Ambiente,
    Classificacao,
    ConjuntoImagens,
    EventoAuditoria,
    Imagem,
    Opcao,
    SyncStatus,
    TipoUsuario,
    Usuario,
    UsuarioAdministrador,
)
from ics_tpu.db.orm import MODEL_REGISTRY, or_
from ics_tpu.db import seed


@pytest.fixture()
def db(tmp_path):
    d = Database(f"sqlite:///{tmp_path}/test.db")
    d.create_all()
    return d


def _now():
    return tz.local_to_utc(tz.now())


class TestSchema:
    def test_all_16_tables_plus_registry(self, db):
        # TipoUsuario..SyncStatus — 16 reference-parity tables plus the
        # net-new TPU tier (modelos_treinados, sugestoes_modelo,
        # embeddings_imagem)
        assert len(MODEL_REGISTRY) == 19
        with db.session() as s:
            names = {
                r["name"]
                for r in s.fetchall(
                    "SELECT name FROM sqlite_master WHERE type='table'"
                )
            }
        for t in MODEL_REGISTRY:
            assert t in names

    def test_indexes_created(self, db):
        with db.session() as s:
            idx = {
                r["name"]
                for r in s.fetchall("SELECT name FROM sqlite_master WHERE type='index'")
            }
        assert "idx_imagem_id_cnj_existe" in idx
        assert "idx_classificacao_usuario_imagem_ativo" in idx


class TestCrudBasics:
    def test_insert_get_update(self, db):
        with db.session() as s:
            s.add(TipoUsuario(id_tipo=1, nome="convencional"))
            u = Usuario(
                nome_completo="Maria Silva",
                email="m@x.com",
                senha_hash="h",
                data_criado=_now(),
                id_tipo=1,
            )
            s.add(u)
            s.commit()
            uid = u.id_usu

        with db.session() as s:
            got = s.get(Usuario, uid)
            assert got.email == "m@x.com"
            assert got.ativo is True
            assert got.data_criado.tzinfo is not None
            got.telefone = "119999"
            s.commit()

        with db.session() as s:
            assert s.get(Usuario, uid).telefone == "119999"

    def test_unique_violation(self, db):
        with db.session() as s:
            s.add(TipoUsuario(id_tipo=1, nome="x"))
            s.commit()
        with pytest.raises(IntegrityError):
            with db.session() as s:
                s.add(TipoUsuario(id_tipo=2, nome="x"))
                s.commit()

    def test_query_filters_order_count(self, db):
        with db.session() as s:
            for i in range(5):
                s.add(TipoUsuario(id_tipo=i + 1, nome=f"t{i}"))
            s.commit()
        with db.session() as s:
            q = s.query(TipoUsuario).filter(TipoUsuario.id_tipo > 2)
            assert q.count() == 3
            rows = (
                s.query(TipoUsuario)
                .order_by(TipoUsuario.id_tipo.desc())
                .limit(2)
                .all()
            )
            assert [r.id_tipo for r in rows] == [5, 4]
            assert (
                s.query(TipoUsuario)
                .filter(or_(TipoUsuario.nome == "t0", TipoUsuario.nome == "t4"))
                .count()
                == 2
            )
            assert s.query(TipoUsuario).filter(TipoUsuario.id_tipo.in_([1, 2])).count() == 2
            assert s.query(TipoUsuario).filter(TipoUsuario.id_tipo.in_([])).count() == 0

    def test_jsonb_roundtrip(self, db):
        with db.session() as s:
            s.add(
                ConjuntoImagens(
                    nome_conj="f",
                    caminho_conj="/f",
                    file_id="42",
                    data_proc=_now(),
                    data_sinc=_now(),
                )
            )
            s.flush()
            cnj = s.query(ConjuntoImagens).first()
            s.add(
                Imagem(
                    content_hash="a" * 64,
                    nome_img="x.jpg",
                    caminho_img="/f/x.jpg",
                    metadados={"width": 640, "tags": ["a", "b"]},
                    data_proc=_now(),
                    data_sinc=_now(),
                    id_cnj=cnj.id_cnj,
                )
            )
            s.commit()
        with db.session() as s:
            img = s.get(Imagem, "a" * 64)
            assert img.metadados == {"width": 640, "tags": ["a", "b"]}

    def test_opcao_texto_immutable(self, db):
        opc = Opcao(texto="gato", id_amb="x")
        assert opc.texto == "gato"
        with pytest.raises(ValueError):
            opc.texto = "cachorro"

    def test_rollback(self, db):
        with pytest.raises(RuntimeError):
            with db.session() as s:
                s.add(TipoUsuario(id_tipo=1, nome="a"))
                s.flush()
                raise RuntimeError("abort")
        with db.session() as s:
            assert s.query(TipoUsuario).count() == 0

    def test_delete(self, db):
        with db.session() as s:
            s.add(TipoUsuario(id_tipo=1, nome="a"))
            s.commit()
        with db.session() as s:
            t = s.get(TipoUsuario, 1)
            s.delete(t)
            s.commit()
        with db.session() as s:
            assert s.get(TipoUsuario, 1) is None


class TestMigrations:
    def test_upgrade_head_from_empty(self, tmp_path):
        db = Database(f"sqlite:///{tmp_path}/mig.db")
        applied = upgrade_head(db)
        assert applied == [
            "0001_initial_schema",
            "0002_activity_id_watermark",
            "0003_model_registry",
            "0004_sugestao_incerteza",
            "0005_embeddings",
        ]
        with db.session() as s:
            assert "usuarios" in {
                r["name"]
                for r in s.fetchall("SELECT name FROM sqlite_master WHERE type='table'")
            }
        # idempotent
        assert upgrade_head(db) == []

    def test_stamp_head(self, tmp_path):
        db = Database(f"sqlite:///{tmp_path}/stamp.db")
        db.create_all()
        stamped = stamp_head(db)
        assert "0001_initial_schema" in stamped
        with db.session() as s:
            assert "0001_initial_schema" in applied_revisions(s)


class TestSeed:
    def test_seed_all(self, db):
        seed.seed_all(db)
        with db.session() as s:
            eventos = s.query(EventoAuditoria).all()
            assert len(eventos) == len(seed.AUDIT_EVENTS) if hasattr(seed, "AUDIT_EVENTS") else True
            assert s.query(EventoAuditoria).filter(
                EventoAuditoria.nome == "logout"
            ).exists()
            admin = s.query(Usuario).first()
            assert admin.id_tipo == seed.TIPO_ADMINISTRADOR
            assert s.query(UsuarioAdministrador).count() == 1
        # idempotent
        seed.seed_all(db)
        with db.session() as s:
            assert s.query(Usuario).count() == 1


class TestSelfReviewR3Fixes:
    """Regression tests for the r3 DB-tier security/correctness review."""

    def test_ddl_emitted_in_fk_order(self):
        """Every REFERENCES target table must be created BEFORE its
        referrers — PostgreSQL validates FK targets at CREATE TABLE."""
        from ics_tpu.db.orm import models_in_fk_order

        seen = set()
        for model in models_in_fk_order():
            for col in model.__columns__.values():
                if col.foreign_key:
                    target = col.foreign_key.partition(".")[0]
                    if target != model.__tablename__:
                        assert target in seen, (
                            f"{model.__tablename__} references {target} "
                            "before it exists"
                        )
            seen.add(model.__tablename__)
        assert len(seen) == len(MODEL_REGISTRY)

    def test_count_ignores_offset_and_limit(self, tmp_path):
        db = Database(f"sqlite:///{tmp_path}/c.db")
        db.create_all()
        with db.session() as s:
            for i in range(1, 3):
                s.add(TipoUsuario(id_tipo=i, nome=f"t{i}"))
            s.flush()
            q = s.query(TipoUsuario).offset(10)
            assert q.count() == 2  # was: TypeError (fetchone() -> None)
            q2 = s.query(TipoUsuario)
            q2.first()  # sets _limit=1 internally
            assert q2.count() == 2

    def test_delete_of_pending_object_not_resurrected(self, tmp_path):
        db = Database(f"sqlite:///{tmp_path}/d.db")
        db.create_all()
        with db.session() as s:
            t = TipoUsuario(id_tipo=9, nome="fantasma")
            s.add(t)
            s.delete(t)  # before flush: must cancel the pending INSERT
            s.commit()
        with db.session() as s:
            assert s.get(TipoUsuario, 9) is None

    def test_datetime_string_inputs_normalized_to_utc(self):
        """The storage invariant is aware-UTC ISO text (CLAUDE.md): a
        '-03:00' offset or naive string must normalize, not pass through
        (it would sort incorrectly against '+00:00' rows)."""
        from ics_tpu.db.orm import DateTime

        dt = DateTime()
        assert dt.encode("2026-08-17T12:00:00-03:00") == (
            "2026-08-17T15:00:00+00:00"
        )
        assert dt.encode("2026-08-17 12:00:00") == (
            "2026-08-17T12:00:00+00:00"
        )

    def test_placeholder_translation_skips_comments(self):
        from ics_tpu.db.pg_wire import translate_placeholders

        sql = (
            "SELECT 1 -- why inactive?\n"
            "/* multi ? line */ FROM t WHERE a = ? AND b = ?"
        )
        out = translate_placeholders(sql)
        assert "$1" in out and "$2" in out and "$3" not in out
        assert "-- why inactive?" in out
        assert "/* multi ? line */" in out

    def test_memory_sessions_have_isolated_transactions(self):
        """sqlite:///:memory: hands each session its OWN connection to a
        shared-cache DB: one session's rollback must not erase another's
        committed work (was: one shared connection for everyone)."""
        db = Database("sqlite:///:memory:")
        db.create_all()
        with db.session() as s1:
            s1.add(TipoUsuario(id_tipo=1, nome="a"))
            s1.commit()
        # one session rolls back; another's committed view is unaffected
        with db.session() as s3:
            s3.add(TipoUsuario(id_tipo=2, nome="b"))
            s3.flush()
            s3.rollback()
        with db.session() as s4:
            assert s4.get(TipoUsuario, 1) is not None
            assert s4.get(TipoUsuario, 2) is None
