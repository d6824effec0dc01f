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

    def test_non_canonical_salt_verifies_on_every_host(self):
        """The 22nd salt char carries 4 padding bits. crypt_blowfish/pyca
        bcrypt accept settings with nonzero padding and echo them verbatim
        into the digest, while libxcrypt canonicalises the salt in its
        output — so the native fast path would string-compare a DIFFERENT
        salt spelling and reject the correct password (review r5).
        bcrypt_verify must route non-canonical hashes to the pure path."""
        setting = "$2b$04$abcdefghijklmnopqrstu"
        last = "u"
        v = bc._B64_INDEX[last]
        assert v & 0xF == 0  # the vector's salt is canonical
        nc = bc._B64[v | 1]  # same 16 decoded bytes, non-canonical spelling
        assert bc._b64_decode("abcdefghijklmnopqrstu" + nc, 16) == \
            bc._b64_decode("abcdefghijklmnopqrstu" + last, 16)
        assert not bc._salt_is_canonical("abcdefghijklmnopqrstu" + nc)
        # a foreign tool that echoes the setting verbatim produces:
        stored = bc.bcrypt_hash_pure("password", setting + nc)
        assert stored is not None and stored[28] == nc
        assert bc.bcrypt_verify("password", stored)
        assert not bc.bcrypt_verify("wrong", stored)

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
    @pytest.mark.anyio
    async def test_bcrypt_login_rehashes_to_scrypt(self, db):
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
            got = await auth_service.authenticate_user(
                s, "legado@ref.db", "password"
            )
            assert got is not None and got != auth_service.INACTIVE
            assert got.senha_hash.startswith("scrypt$")  # upgraded in place
            s.commit()

        with db.session() as s:
            from ics_tpu.db.models import Usuario

            row = s.get(Usuario, uid)
            assert row.senha_hash.startswith("scrypt$")
            # and the upgraded hash still authenticates
            assert await auth_service.authenticate_user(
                s, "legado@ref.db", "password"
            )

    @pytest.mark.anyio
    async def test_wrong_password_does_not_rehash(self, db):
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
            assert (
                await auth_service.authenticate_user(s, "legado2@ref.db", "nope")
            ) is None
            s.commit()
        with db.session() as s:
            assert s.get(Usuario, uid).senha_hash == bhash

    @pytest.mark.anyio
    async def test_bcrypt_verify_runs_off_the_event_loop(self, monkeypatch):
        """The pure bcrypt path costs seconds of CPU; a synchronous check
        in the async login route would stall every in-flight request on
        the single-core host (review r5). verify_password_async must keep
        the loop responsive while the hash computation runs."""
        import asyncio
        import time

        def slow_verify(password, stored):
            time.sleep(0.4)  # stands in for a cost-12 pure-Python bcrypt
            return True

        monkeypatch.setattr(security, "verify_password", slow_verify)

        ticks = []

        async def heartbeat():
            for _ in range(8):
                ticks.append(time.perf_counter())
                await asyncio.sleep(0.05)

        hb = asyncio.ensure_future(heartbeat())
        ok = await security.verify_password_async("pw", "$2b$12$" + "a" * 53)
        await hb
        assert ok
        # while the 0.4 s verification ran, the loop kept ticking: at
        # least half the heartbeats landed before it finished
        assert sum(1 for _ in ticks) == 8
        gaps = [b - a for a, b in zip(ticks, ticks[1:])]
        assert max(gaps) < 0.35, f"event loop starved: gaps={gaps}"

    @pytest.mark.anyio
    async def test_bcrypt_checks_are_serialized(self, monkeypatch):
        """Concurrent bcrypt verifications queue on one gate instead of
        piling N multi-second computations onto the single core."""
        import asyncio

        active = [0]
        peak = [0]

        def tracked_verify(password, stored):
            active[0] += 1
            peak[0] = max(peak[0], active[0])
            import time

            time.sleep(0.05)
            active[0] -= 1
            return False

        monkeypatch.setattr(security, "verify_password", tracked_verify)
        stored = "$2b$12$" + "a" * 53
        await asyncio.gather(
            *(security.verify_password_async("pw", stored) for _ in range(4))
        )
        assert peak[0] == 1, f"bcrypt checks overlapped (peak={peak[0]})"
