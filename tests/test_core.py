import time
from datetime import datetime, timezone as dt_tz

import pytest

from ics_tpu.core import security
from ics_tpu.core.config import Settings
from ics_tpu.core import timezone as tz
from ics_tpu.core.validators import (
    validar_cpf,
    validar_email,
    validar_forca_senha,
    validar_nome,
)


class TestValidators:
    def test_cpf_valid(self):
        assert validar_cpf("529.982.247-25")
        assert validar_cpf("52998224725")

    def test_cpf_invalid(self):
        assert not validar_cpf("11111111111")
        assert not validar_cpf("52998224724")
        assert not validar_cpf("123")
        assert not validar_cpf("")

    def test_nome(self):
        assert validar_nome("Maria Silva")
        assert not validar_nome("Maria")
        assert not validar_nome("  ")

    def test_email(self):
        # mirrors pydantic EmailStr / email-validator acceptance
        # (reference app/schemas/auth_schema.py:47,64,92)
        assert validar_email("maria@example.com")
        assert validar_email("first.last+tag@sub.domain.co")
        assert not validar_email("a@")          # no domain
        assert not validar_email("a@b")         # domain needs a period
        assert not validar_email("@b.com")      # no local part
        assert not validar_email("a..b@c.com")  # double dot in local
        assert not validar_email("a b@c.com")   # space
        assert not validar_email("a@-b.com")    # label starts with hyphen
        assert not validar_email("a@b.c0m1")    # non-alphabetic TLD
        assert not validar_email("")

    def test_senha(self):
        assert validar_forca_senha("Senha123")
        assert not validar_forca_senha("senha123")
        assert not validar_forca_senha("SENHA123")
        assert not validar_forca_senha("SenhaForte")
        assert not validar_forca_senha("Ab1")


class TestSecurity:
    def test_password_roundtrip(self):
        h = security.hash_password("Secreta1")
        assert h.startswith("scrypt$")
        assert security.verify_password("Secreta1", h)
        assert not security.verify_password("errada", h)

    def test_password_salted(self):
        assert security.hash_password("x") != security.hash_password("x")

    def test_jwt_roundtrip(self):
        claims = {"sub": "abc", "tipo": "administrador", "exp": time.time() + 60}
        token = security.jwt_encode(claims, "s3cret")
        out = security.jwt_decode(token, "s3cret")
        assert out["sub"] == "abc"

    def test_jwt_expired(self):
        token = security.jwt_encode({"sub": "a", "exp": time.time() - 1}, "k")
        with pytest.raises(security.TokenError):
            security.jwt_decode(token, "k")

    def test_jwt_tampered(self):
        token = security.jwt_encode({"sub": "a", "exp": time.time() + 60}, "k")
        with pytest.raises(security.TokenError):
            security.jwt_decode(token, "other")
        with pytest.raises(security.TokenError):
            security.jwt_decode(token[:-2] + "zz", "k")

    def test_sha256(self):
        assert security.sha256_hex(b"") == (
            "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
        )


class TestTimezone:
    def test_now_is_aware(self):
        assert tz.now().tzinfo is not None

    def test_local_to_utc_roundtrip(self):
        local = tz.now()
        utc = tz.local_to_utc(local)
        assert utc.tzinfo is not None
        assert abs((tz.utc_to_local(utc) - local).total_seconds()) < 1e-6

    def test_naive_utc_conversion(self):
        naive = datetime(2026, 1, 1, 12, 0, 0)
        out = tz.utc_to_local(naive)
        assert out.tzinfo is not None
        assert tz.local_to_utc(out).replace(tzinfo=None) == naive


class TestSettings:
    def test_defaults(self):
        s = Settings()
        assert s.JWT_ALGORITHM == "HS256"
        assert s.NEXTCLOUD_SYNC_BATCH_SIZE == 50
        assert s.get_batch_buckets() == (1, 8, 32, 128)
        assert s.get_mesh_shape() is None  # "auto" -> all devices

    def test_cors_filtering(self):
        s = Settings(CORS_ORIGINS="http://a.com, ftp://bad, https://b.com ,")
        assert s.get_cors_origins_list() == ["http://a.com", "https://b.com"]

    def test_cors_schemeless_override_rejects_all(self):
        """Operator SET origins but none carry a scheme ('*' or a bare
        host): reject-all with a warning — silently serving the dev
        localhost list hid the misconfiguration (self-review r3)."""
        assert Settings(CORS_ORIGINS="*").get_cors_origins_list() == []
        assert Settings(
            CORS_ORIGINS="app.example.com"
        ).get_cors_origins_list() == []
        # the untouched default still yields the dev origins
        assert Settings().get_cors_origins_list() == [
            "http://localhost:5173", "http://127.0.0.1:5173"
        ]

    def test_allowed_extensions_string_override(self):
        """env/.env overrides arrive as STRINGS; the bare `list` field
        made any override crash at import (self-review r3). Both the
        comma form and a JSON list must parse."""
        s = Settings(ALLOWED_EXTENSIONS=".jpg, .png")
        assert s.ALLOWED_EXTENSIONS == [".jpg", ".png"]
        s = Settings(ALLOWED_EXTENSIONS='[".webp", ".gif"]')
        assert s.ALLOWED_EXTENSIONS == [".webp", ".gif"]
        assert Settings().ALLOWED_EXTENSIONS[0] == ".jpg"  # default intact

    def test_env_file(self, tmp_path):
        f = tmp_path / ".env"
        f.write_text("# comment\nAPI_PORT=9001\nTIMEZONE='UTC'\nUNKNOWN=x\n")
        s = Settings.load(env_file=f)
        assert s.API_PORT == 9001
        assert s.TIMEZONE == "UTC"
