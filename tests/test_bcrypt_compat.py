"""bcrypt verification (pure-stdlib) — reference-DB adoption parity.

The reference stores bcrypt hashes (``app/core/utils.py:5-10``); an
adopted database must keep logging users in. Vectors below were generated
with libxcrypt's native bcrypt (authoritative implementation) plus the
three widely-published OpenWall test vectors; they are hard-coded so this
test never depends on the deprecated ``crypt`` module being present.
"""

from __future__ import annotations

import pytest

from ics_tpu.core import bcrypt_compat as bc
from ics_tpu.core import security
from ics_tpu.db import seed
from ics_tpu.db.engine import Database


@pytest.fixture()
def db(tmp_path):
    d = Database(f"sqlite:///{tmp_path}/test.db")
    d.create_all()
    seed.seed_all(d)
    return d

# (password, full modular-crypt hash). Costs 4-6 keep the pure-Python
# path fast enough for the suite; generation provenance: libxcrypt via
# ``crypt.crypt`` on this host, except the three $2a$ OpenWall vectors.
VECTORS = [
    ("U*U", "$2b$05$abcdefghijklmnopqrstuuMpLhh66NJUQMuZ6FwRQX0sqAEKeWcKW"),
    ("U*U*", "$2b$05$abcdefghijklmnopqrstuueqZzwRqX8BEsrV2jF8gx70v6bcd1qAG"),
    ("password", "$2b$04$abcdefghijklmnopqrstuughE8Ev8uGFaUgY2cNEySvxngrb/Jzdm"),
    (
        "correct horse battery staple",
        "$2b$05$abcdefghijklmnopqrstuuFiPhXf1sVd3pCCRO.uVh34H/qI/ZsuS",
    ),
    ("", "$2b$04$abcdefghijklmnopqrstuubyCG3zY1GIXMyxfivm.ClDiInHzxjiq"),
    ("senha_Forte123", "$2b$06$abcdefghijklmnopqrstuuExfrxfmDW7laMu/qVQM54kltkq3Ji3."),
    # utf-8 multibyte password
    ("ação-café-ñ", "$2b$04$abcdefghijklmnopqrstuudNpki4zdyM/azfmhrCHo/ne1vfyrq5i"),
    # exactly 72 bytes
    ("a" * 72, "$2b$04$abcdefghijklmnopqrstuuBzzIgyKkz7xMWYSzkIjUSnxEQFQ0WNe"),
    # OpenWall published vectors ($2a$)
    ("U*U", "$2a$05$CCCCCCCCCCCCCCCCCCCCC.E5YPO9kmyuRGyh0XouQYb4YMJKvyOeW"),
    ("U*U*", "$2a$05$CCCCCCCCCCCCCCCCCCCCC.VGOzA784oUp/Z0DY336zx7pLYAy0lwK"),
    ("U*U*U", "$2a$05$XXXXXXXXXXXXXXXXXXXXXOAcXxm9kjPGEMsLznoKqmqw7tc8WCx4a"),
    # $2y$ (crypt_blowfish alias of $2a$ semantics)
    ("password", "$2y$05$abcdefghijklmnopqrstuuWG29KuyeAicPCJODk1zjyGvyQUU2awu"),
]


class TestPiState:
    def test_constants_match_published_blowfish_init(self):
        p, s0, s1, s2, s3 = bc._initial_state()
        # first P words of Blowfish are the leading hex digits of pi
        assert p[0] == 0x243F6A88
        assert p[1] == 0x85A308D3
        assert p[17] == 0x8979FB1B  # last P word (published)
        assert s0[0] == 0xD1310BA6  # first S-box word (published)
        assert s3[255] == 0x3AC372E6  # very last S-box word (published)
        assert len(s0) == len(s1) == len(s2) == len(s3) == 256


class TestPureVectors:
    @pytest.mark.parametrize("password,expected", VECTORS)
    def test_pure_hash_matches(self, password, expected):
        assert bc.bcrypt_hash_pure(password, expected) == expected

    def test_truncation_at_72_bytes(self):
        h72 = bc.bcrypt_hash_pure("a" * 72, "$2b$04$abcdefghijklmnopqrstuv")
        hlong = bc.bcrypt_hash_pure(
            "a" * 72 + "IGNORED-TAIL", "$2b$04$abcdefghijklmnopqrstuv"
        )
        assert h72 == hlong

    def test_wrong_password_rejected(self):
        assert not bc.bcrypt_verify("wrong", VECTORS[0][1])
        assert not bc.bcrypt_verify("U*U ", VECTORS[0][1])

    def test_malformed_hashes_rejected(self):
        for bad in [
            "",
            "$2b$04$short",
            "$2c$04$abcdefghijklmnopqrstuuBzzIgyKkz7xMWYSzkIjUSnxEQFQ0WNe",
            "$2b$xx$abcdefghijklmnopqrstuuBzzIgyKkz7xMWYSzkIjUSnxEQFQ0WNe",
            "scrypt$16384$8$1$c2FsdA==$ZGln",
        ]:
            assert not bc.is_bcrypt_hash(bad)
            assert not bc.bcrypt_verify("password", bad)

    def test_cost_out_of_range_rejected(self):
        assert bc.bcrypt_hash_pure("x", "$2b$03$abcdefghijklmnopqrstuv") is None

    @pytest.mark.skipif(
        not bc._HAVE_LIBCRYPT_BCRYPT, reason="host libcrypt lacks bcrypt"
    )
    def test_fast_path_agrees_with_pure(self):
        # a cost-12 hash (the reference's bcrypt default) via the native
        # fast path; pure-path equivalence for this salt/password pair is
        # covered at cost 4-6 above
        h = "$2b$12$abcdefghijklmnopqrstuuVpjgokMnG.mP0RN0DFrriZG47BzIZLC"
        assert bc.bcrypt_verify("admin@Sistema1", h)
        assert not bc.bcrypt_verify("admin@Sistema2", h)


class TestSecurityIntegration:
    def test_verify_password_dispatches_bcrypt(self):
        pw, h = VECTORS[2]
        assert security.verify_password(pw, h)
        assert not security.verify_password("x" + pw, h)

    def test_needs_rehash(self):
        assert security.password_needs_rehash(VECTORS[0][1])
        assert not security.password_needs_rehash(security.hash_password("Abc12345"))

    def test_scrypt_still_primary(self):
        h = security.hash_password("Abc12345")
        assert h.startswith("scrypt$")
        assert security.verify_password("Abc12345", h)


class TestLoginRehash:
    def test_bcrypt_login_rehashes_to_scrypt(self, db):
        from ics_tpu.crud import user_crud
        from ics_tpu.db.models import TipoUsuario
        from ics_tpu.services import auth_service

        with db.session() as s:
            tipo = s.query(TipoUsuario).filter_by(nome="convencional").first()
            user = user_crud.create_usuario_convencional(
                s,
                email="legado@ref.db",
                nome_completo="Usuario Legado",
                cpf="52998224725",
                senha="placeholder1A",
                id_tipo=tipo.id_tipo,
            )
            # simulate a row adopted from the reference DB: bcrypt digest
            user.senha_hash = (
                "$2b$04$abcdefghijklmnopqrstuughE8Ev8uGFaUgY2cNEySvxngrb/Jzdm"
            )
            s.commit()
            uid = user.id_usu

        with db.session() as s:
            got = auth_service.authenticate_user(s, "legado@ref.db", "password")
            assert got is not None and got != auth_service.INACTIVE
            assert got.senha_hash.startswith("scrypt$")  # upgraded in place
            s.commit()

        with db.session() as s:
            from ics_tpu.db.models import Usuario

            row = s.get(Usuario, uid)
            assert row.senha_hash.startswith("scrypt$")
            # and the upgraded hash still authenticates
            assert auth_service.authenticate_user(s, "legado@ref.db", "password")

    def test_wrong_password_does_not_rehash(self, db):
        from ics_tpu.crud import user_crud
        from ics_tpu.db.models import TipoUsuario, Usuario
        from ics_tpu.services import auth_service

        bhash = "$2b$04$abcdefghijklmnopqrstuubyCG3zY1GIXMyxfivm.ClDiInHzxjiq"
        with db.session() as s:
            tipo = s.query(TipoUsuario).filter_by(nome="convencional").first()
            user = user_crud.create_usuario_convencional(
                s,
                email="legado2@ref.db",
                nome_completo="Usuario Legado",
                cpf="15350946056",
                senha="placeholder1A",
                id_tipo=tipo.id_tipo,
            )
            user.senha_hash = bhash
            s.commit()
            uid = user.id_usu

        with db.session() as s:
            assert auth_service.authenticate_user(s, "legado2@ref.db", "nope") is None
            s.commit()
        with db.session() as s:
            assert s.get(Usuario, uid).senha_hash == bhash
