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
