"""Auth API contract tests (reference behavior: app/api/routes/auth.py)."""

import httpx
import pytest

from ics_tpu.core.config import settings
from ics_tpu.db.engine import Database
from ics_tpu.db.models import CadastroPermitido, LogAuditoria
from ics_tpu.main import create_app


@pytest.fixture()
async def app(tmp_path):
    db = Database(f"sqlite:///{tmp_path}/app.db")
    a = create_app(db=db)
    await a.startup()
    yield a
    await a.shutdown()


@pytest.fixture()
def client(app):
    return httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app), base_url="http://test"
    )


async def login_admin(client) -> str:
    r = await client.post(
        "/auth/login",
        data={"username": settings.ADMIN_EMAIL, "password": settings.ADMIN_SENHA},
    )
    assert r.status_code == 200, r.text
    return r.json()["access_token"]


VALID_CPF = "52998224725"


class TestLogin:
    @pytest.mark.anyio
    async def test_login_success_sets_cookie_and_audits(self, app, client):
        async with client:
            r = await client.post(
                "/auth/login",
                data={
                    "username": settings.ADMIN_EMAIL,
                    "password": settings.ADMIN_SENHA,
                },
            )
            assert r.status_code == 200
            body = r.json()
            assert body["token_type"] == "bearer"
            assert body["user_type"] == 2
            assert "access_token" in r.cookies
        with app.state.db.session() as s:
            logs = s.query(LogAuditoria).all()
            assert len(logs) == 1

    @pytest.mark.anyio
    async def test_login_wrong_password(self, client):
        async with client:
            r = await client.post(
                "/auth/login",
                data={"username": settings.ADMIN_EMAIL, "password": "errada"},
            )
            assert r.status_code == 401
            assert r.json()["detail"] == "Email ou senha incorretos"
            assert r.headers.get("www-authenticate") == "Bearer"

    @pytest.mark.anyio
    async def test_login_unknown_user(self, client):
        async with client:
            r = await client.post(
                "/auth/login", data={"username": "x@y.com", "password": "a"}
            )
            assert r.status_code == 401


class TestCadastro:
    async def _whitelist(self, app, email, id_tipo=1):
        from ics_tpu.core import timezone as tz

        with app.state.db.session() as s:
            adm = s.fetchone("SELECT id_adm FROM usuarios_administradores")
            s.add(
                CadastroPermitido(
                    email=email,
                    data_criado=tz.utcnow(),
                    id_tipo=id_tipo,
                    id_adm=adm["id_adm"],
                )
            )
            s.commit()

    PAYLOAD = {
        "nome_completo": "Maria da Silva",
        "email": "maria@x.com",
        "cpf": VALID_CPF,
        "senha": "SenhaBoa1",
        "telefone": "11999990000",
    }

    @pytest.mark.anyio
    async def test_cadastro_not_whitelisted(self, client):
        async with client:
            r = await client.post("/auth/cadastro", json=self.PAYLOAD)
            assert r.status_code == 403

    @pytest.mark.anyio
    async def test_cadastro_success_conventional(self, app, client):
        await self._whitelist(app, "maria@x.com", id_tipo=1)
        async with client:
            r = await client.post("/auth/cadastro", json=self.PAYLOAD)
            assert r.status_code == 201, r.text
            assert r.json()["user_type"] == 1
            # whitelist marked used -> second signup conflicts
            r2 = await client.post(
                "/auth/cadastro", json={**self.PAYLOAD, "cpf": "15350946056"}
            )
            assert r2.status_code == 400  # email already registered

    @pytest.mark.anyio
    async def test_cadastro_used_whitelist(self, app, client):
        await self._whitelist(app, "maria@x.com")
        async with client:
            await client.post("/auth/cadastro", json=self.PAYLOAD)
        # different email, same (now used) whitelist entry is irrelevant;
        # reuse same whitelist email with new user data
        async with httpx.AsyncClient(
            transport=httpx.ASGITransport(app=app), base_url="http://test"
        ) as c2:
            r = await c2.post(
                "/auth/cadastro",
                json={**self.PAYLOAD, "cpf": "15350946056"},
            )
            assert r.status_code == 400

    @pytest.mark.anyio
    async def test_cadastro_validation_errors(self, app, client):
        await self._whitelist(app, "maria@x.com")
        async with client:
            r = await client.post(
                "/auth/cadastro", json={**self.PAYLOAD, "nome_completo": "Maria"}
            )
            assert r.status_code == 422
            r = await client.post(
                "/auth/cadastro", json={**self.PAYLOAD, "cpf": "11111111111"}
            )
            assert r.status_code == 422
            r = await client.post(
                "/auth/cadastro", json={**self.PAYLOAD, "senha": "fraca"}
            )
            assert r.status_code == 422
            # RFC email syntax, like the reference's EmailStr: "a@" and
            # dotless domains are 422 (auth_schema.py:92)
            for bad in ("a@", "a@b", "not-an-email", "a b@c.com"):
                r = await client.post(
                    "/auth/cadastro", json={**self.PAYLOAD, "email": bad}
                )
                assert r.status_code == 422, bad

    @pytest.mark.anyio
    async def test_cadastro_admin_type(self, app, client):
        await self._whitelist(app, "chefe@x.com", id_tipo=2)
        async with client:
            r = await client.post(
                "/auth/cadastro",
                json={**self.PAYLOAD, "email": "chefe@x.com", "cpf": "15350946056"},
            )
            assert r.status_code == 201
            assert r.json()["user_type"] == 2


class TestLogoutAndGuards:
    @pytest.mark.anyio
    async def test_logout_clears_cookie(self, client):
        async with client:
            token = await login_admin(client)
            r = await client.post(
                "/auth/logout", headers={"Authorization": f"Bearer {token}"}
            )
            assert r.status_code == 200
            assert "Max-Age=0" in r.headers.get("set-cookie", "")

    @pytest.mark.anyio
    async def test_logout_requires_auth(self, client):
        async with client:
            r = await client.post("/auth/logout")
            assert r.status_code == 401

    @pytest.mark.anyio
    async def test_invalid_token_is_401_not_500(self, client):
        """Reference defect §2.4.2 (NameError -> 500) must be fixed."""
        async with client:
            r = await client.post(
                "/auth/logout", headers={"Authorization": "Bearer abc.def.ghi"}
            )
            assert r.status_code == 401

    @pytest.mark.anyio
    async def test_cookie_auth_works(self, client):
        async with client:
            await login_admin(client)  # cookie now in jar
            r = await client.post("/auth/logout")
            assert r.status_code == 200


class TestHealth:
    @pytest.mark.anyio
    async def test_health_and_root(self, client):
        async with client:
            r = await client.get("/health")
            assert r.json()["status"] == "healthy"
            r = await client.get("/")
            assert r.status_code == 200
            # operator surfaces expose live data -> admin-gated (VERDICT
            # r3 weak #6); /health stays the public LB probe
            r = await client.get("/monitor/status")
            assert r.status_code == 401
            r = await client.get("/monitor/painel")
            assert r.status_code == 401
            await login_admin(client)  # cookie in jar
            r = await client.get("/monitor/status")
            assert r.status_code == 200
            assert "sync" in r.json() and "tpu" in r.json()
            r = await client.get("/monitor/painel")
            assert r.status_code == 200


class TestLoginRateLimit:
    def test_window_unit(self):
        """AttemptWindow: atomic check+record, blocks at the limit,
        unblocks as attempts age out, clear() lifts immediately."""
        from ics_tpu.core.ratelimit import AttemptWindow

        t = [0.0]
        fw = AttemptWindow(clock=lambda: t[0])
        key = "a@b.c|127.0.0.1"
        for _ in range(3):
            assert fw.attempt(key, 3, 60) == 0.0
        wait = fw.attempt(key, 3, 60)  # 4th attempt in the window
        assert 0.0 < wait <= 60.0
        t[0] = 61.0  # window passed
        assert fw.attempt(key, 3, 60) == 0.0
        fw.clear(key)  # successful login wipes the slate
        for _ in range(3):
            assert fw.attempt(key, 3, 60) == 0.0
        # limit 0 = disabled regardless of history
        assert fw.attempt(key, 0, 60) == 0.0

    def test_burst_cannot_exceed_limit(self):
        """check+record is ONE atomic op: of a 50-request burst only
        `limit` attempts proceed (the old check-then-record shape let
        the whole burst through while the first scrypt ran)."""
        from ics_tpu.core.ratelimit import AttemptWindow

        fw = AttemptWindow(clock=lambda: 0.0)
        allowed = sum(
            1 for _ in range(50) if fw.attempt("k", 5, 60) == 0.0
        )
        assert allowed == 5

    def test_flood_cannot_evict_an_active_block(self):
        """A full table only drops EXPIRED keys: flooding unique keys
        must not erase someone's fresh block (weaponized-eviction fix)."""
        from ics_tpu.core.ratelimit import AttemptWindow

        t = [0.0]
        fw = AttemptWindow(clock=lambda: t[0], max_keys=50)
        for _ in range(3):
            fw.attempt("victim", 3, 600)
        assert fw.attempt("victim", 3, 600) > 0  # blocked
        for i in range(200):  # flood with unique fresh keys
            fw.attempt(f"flood{i}", 3, 600)
        assert fw.attempt("victim", 3, 600) > 0  # STILL blocked
        # expired keys DO get reclaimed once their window passes
        t[0] = 601.0
        assert fw.attempt("new", 3, 600) == 0.0

    def test_flood_key_still_accumulates_under_eviction(self):
        """Full table with nothing expired evicts the oldest UNBLOCKED
        key (not fail-open for new keys): an attacker flooding unique
        keys cannot keep their OWN key permanently untracked — repeat
        attempts against one identity still hit the limit
        (self-review r3 round 2)."""
        from ics_tpu.core.ratelimit import AttemptWindow

        t = [0.0]
        fw = AttemptWindow(clock=lambda: t[0], max_keys=10)
        for i in range(20):  # fill well past max_keys, nothing expires
            t[0] += 0.01
            fw.attempt(f"chaff{i}", 3, 600)
        blocked_at = None
        for n in range(1, 6):  # interleave the real target with chaff
            t[0] += 0.01
            wait = fw.attempt("attacker@x|1.2.3.4", 3, 600)
            t[0] += 0.01
            fw.attempt(f"more{n}", 3, 600)
            if wait > 0:
                blocked_at = n
                break
        assert blocked_at == 4  # 3 allowed, 4th blocked — tracking held
        # and the block itself is never the eviction victim
        for i in range(50):
            t[0] += 0.01
            fw.attempt(f"late{i}", 3, 600)
        t[0] += 0.01
        assert fw.attempt("attacker@x|1.2.3.4", 3, 600) > 0

    @pytest.mark.anyio
    async def test_429_after_attempts_and_reset_on_success(self, tmp_path):
        """Route behavior with the limiter ON: the window fills -> 429
        (even with the CORRECT password), window expiry unblocks
        (deterministic via an injected clock), success clears the
        counter. Default settings keep parity (no 429s — covered by
        every other auth test running with limit 0)."""
        from ics_tpu.core.config import reload_settings
        from ics_tpu.core import ratelimit

        reload_settings(LOGIN_RATE_LIMIT="3", LOGIN_RATE_WINDOW_S="60")
        fake_now = [0.0]
        ratelimit.login_failures = ratelimit.AttemptWindow(
            clock=lambda: fake_now[0]
        )
        try:
            db = Database(f"sqlite:///{tmp_path}/rl.db")
            a = create_app(db=db)
            await a.startup()
            try:
                async with httpx.AsyncClient(
                    transport=httpx.ASGITransport(app=a),
                    base_url="http://test",
                ) as c:
                    bad = {"username": settings.ADMIN_EMAIL,
                           "password": "errada"}
                    good = {"username": settings.ADMIN_EMAIL,
                            "password": settings.ADMIN_SENHA}
                    for _ in range(3):
                        r = await c.post("/auth/login", data=bad)
                        assert r.status_code == 401
                    # window full — even the correct password gets 429
                    r = await c.post("/auth/login", data=good)
                    assert r.status_code == 429, r.text
                    assert "Retry-After" in r.headers
                    # window expires (fake clock) -> correct password in
                    fake_now[0] = 61.0
                    r = await c.post("/auth/login", data=good)
                    assert r.status_code == 200, r.text
                    # success cleared the slate: 3 fresh attempts fit
                    for _ in range(2):
                        r = await c.post("/auth/login", data=bad)
                        assert r.status_code == 401
                    r = await c.post("/auth/login", data=good)
                    assert r.status_code == 200
            finally:
                await a.shutdown()
        finally:
            ratelimit.login_failures = ratelimit.AttemptWindow()
            reload_settings()

    @pytest.mark.anyio
    async def test_forwarded_for_keying_opt_in(self, tmp_path):
        """LOGIN_RATE_TRUST_FORWARDED: distinct X-Forwarded-For client
        IPs get independent windows (reverse-proxy deployments); without
        the flag the header is ignored."""
        from ics_tpu.core.config import reload_settings
        from ics_tpu.core import ratelimit

        reload_settings(LOGIN_RATE_LIMIT="2", LOGIN_RATE_WINDOW_S="60",
                        LOGIN_RATE_TRUST_FORWARDED="true")
        ratelimit.login_failures = ratelimit.AttemptWindow(
            clock=lambda: 0.0
        )
        try:
            db = Database(f"sqlite:///{tmp_path}/rlx.db")
            a = create_app(db=db)
            await a.startup()
            try:
                async with httpx.AsyncClient(
                    transport=httpx.ASGITransport(app=a),
                    base_url="http://test",
                ) as c:
                    bad = {"username": settings.ADMIN_EMAIL,
                           "password": "errada"}
                    for _ in range(2):
                        r = await c.post(
                            "/auth/login", data=bad,
                            headers={"X-Forwarded-For": "10.0.0.1"},
                        )
                        assert r.status_code == 401
                    # 10.0.0.1 exhausted its window...
                    r = await c.post(
                        "/auth/login", data=bad,
                        headers={"X-Forwarded-For": "10.0.0.1"},
                    )
                    assert r.status_code == 429
                    # ...but a DIFFERENT forwarded client is unaffected
                    r = await c.post(
                        "/auth/login", data=bad,
                        headers={"X-Forwarded-For": "10.0.0.2"},
                    )
                    assert r.status_code == 401
            finally:
                await a.shutdown()
        finally:
            ratelimit.login_failures = ratelimit.AttemptWindow()
            reload_settings()

    @pytest.mark.anyio
    async def test_forged_first_hop_cannot_rotate_key(self, tmp_path):
        """ADVICE r3 (medium): behind an APPENDING proxy the first XFF
        element is client-supplied — keying on it lets an attacker rotate
        forged values for unlimited attempts. The limiter must key on the
        LAST element (the hop the trusted proxy appended): rotating forged
        first hops shares one window; XFF_HOPS=2 keys one element deeper."""
        from ics_tpu.core.config import reload_settings
        from ics_tpu.core import ratelimit

        reload_settings(LOGIN_RATE_LIMIT="2", LOGIN_RATE_WINDOW_S="60",
                        LOGIN_RATE_TRUST_FORWARDED="true")
        ratelimit.login_failures = ratelimit.AttemptWindow(
            clock=lambda: 0.0
        )
        try:
            db = Database(f"sqlite:///{tmp_path}/rlf.db")
            a = create_app(db=db)
            await a.startup()
            try:
                async with httpx.AsyncClient(
                    transport=httpx.ASGITransport(app=a),
                    base_url="http://test",
                ) as c:
                    bad = {"username": settings.ADMIN_EMAIL,
                           "password": "errada"}
                    # attacker rotates the forged first hop; the trusted
                    # proxy appended the real client 10.9.9.9 last —
                    # all three land in ONE window, so the third is 429
                    for forged in ("6.6.6.1", "6.6.6.2"):
                        r = await c.post(
                            "/auth/login", data=bad,
                            headers={
                                "X-Forwarded-For": f"{forged}, 10.9.9.9"
                            },
                        )
                        assert r.status_code == 401
                    r = await c.post(
                        "/auth/login", data=bad,
                        headers={"X-Forwarded-For": "6.6.6.3, 10.9.9.9"},
                    )
                    assert r.status_code == 429
            finally:
                await a.shutdown()
        finally:
            ratelimit.login_failures = ratelimit.AttemptWindow()
            reload_settings()

    @pytest.mark.anyio
    async def test_xff_hops_selects_deeper_trusted_element(self, tmp_path):
        """LOGIN_RATE_XFF_HOPS=2 (two trusted proxies): the limiter keys
        on the second-from-last element; a header shorter than the hop
        count falls back to the first element rather than crashing."""
        from ics_tpu.core.config import reload_settings
        from ics_tpu.core import ratelimit

        reload_settings(LOGIN_RATE_LIMIT="2", LOGIN_RATE_WINDOW_S="60",
                        LOGIN_RATE_TRUST_FORWARDED="true",
                        LOGIN_RATE_XFF_HOPS="2")
        ratelimit.login_failures = ratelimit.AttemptWindow(
            clock=lambda: 0.0
        )
        try:
            db = Database(f"sqlite:///{tmp_path}/rlh.db")
            a = create_app(db=db)
            await a.startup()
            try:
                async with httpx.AsyncClient(
                    transport=httpx.ASGITransport(app=a),
                    base_url="http://test",
                ) as c:
                    bad = {"username": settings.ADMIN_EMAIL,
                           "password": "errada"}
                    # client 7.7.7.7 seen by inner proxy, outer proxy
                    # appended 192.168.0.1 — key must be 7.7.7.7
                    for _ in range(2):
                        r = await c.post(
                            "/auth/login", data=bad,
                            headers={
                                "X-Forwarded-For": "7.7.7.7, 192.168.0.1"
                            },
                        )
                        assert r.status_code == 401
                    r = await c.post(
                        "/auth/login", data=bad,
                        headers={"X-Forwarded-For": "7.7.7.7, 192.168.0.1"},
                    )
                    assert r.status_code == 429
                    # short header (fewer hops than configured): falls
                    # back to the first element, no crash, separate key
                    r = await c.post(
                        "/auth/login", data=bad,
                        headers={"X-Forwarded-For": "8.8.8.8"},
                    )
                    assert r.status_code == 401
            finally:
                await a.shutdown()
        finally:
            ratelimit.login_failures = ratelimit.AttemptWindow()
            reload_settings()


class TestXffShortChainFallback:
    @pytest.mark.anyio
    async def test_chain_shorter_than_hops_keys_on_socket_ip(self, tmp_path):
        """review r4: with LOGIN_RATE_XFF_HOPS=2 but a 1-element chain,
        the old fallback keyed on parts[0] — fully client-forgeable.
        Rotating forged XFF values must NOT grant fresh windows: the key
        falls back to the socket IP, so all attempts share one window."""
        from ics_tpu.core import ratelimit
        from ics_tpu.core.config import reload_settings

        reload_settings(LOGIN_RATE_LIMIT="2", LOGIN_RATE_WINDOW_S="60",
                        LOGIN_RATE_TRUST_FORWARDED="true",
                        LOGIN_RATE_XFF_HOPS="2")
        ratelimit.login_failures = ratelimit.AttemptWindow(
            clock=lambda: 0.0
        )
        try:
            db = Database(f"sqlite:///{tmp_path}/rlg.db")
            a = create_app(db=db)
            await a.startup()
            try:
                async with httpx.AsyncClient(
                    transport=httpx.ASGITransport(app=a),
                    base_url="http://test",
                ) as c:
                    bad = {"username": settings.ADMIN_EMAIL,
                           "password": "errada"}
                    # 1-element chains (shorter than hops=2), rotating
                    # forged values — all must land in ONE socket-IP window
                    for forged in ("6.6.6.1", "6.6.6.2"):
                        r = await c.post(
                            "/auth/login", data=bad,
                            headers={"X-Forwarded-For": forged},
                        )
                        assert r.status_code == 401
                    r = await c.post(
                        "/auth/login", data=bad,
                        headers={"X-Forwarded-For": "6.6.6.3"},
                    )
                    assert r.status_code == 429
            finally:
                await a.shutdown()
        finally:
            ratelimit.login_failures = ratelimit.AttemptWindow()
            reload_settings()
