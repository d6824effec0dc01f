"""Test bootstrap.

MUST run before anything imports jax: forces the CPU backend with 8 virtual
devices so mesh/pjit/sharding tests exercise real multi-device code paths
without TPU hardware (SURVEY.md §4 implication (d)).
"""

import os

# The image's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (the TPU tunnel), so env vars alone are too late.
# jax.config.update before first backend use still wins; XLA_FLAGS is read
# lazily at CPU-backend creation, so setting it here works.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

os.environ.setdefault("ENV", "test")
os.environ.setdefault("DATABASE_URL", "sqlite:///:memory:")
os.environ.setdefault("JWT_SECRET_KEY", "test-secret")
os.environ.setdefault("NEXTCLOUD_SYNC_INITIAL_ON_STARTUP", "false")
# app-fixture startup must not build/warm a full inference engine on CPU;
# the TPU tier has its own dedicated tests
os.environ.setdefault("TPU_ENABLE_INFERENCE", "false")
os.environ.setdefault("TPU_WARMUP_ON_STARTUP", "false")

import pytest  # noqa: E402

# -- real-PostgreSQL profile (VERDICT r2 item 5) ----------------------------
# With ICS_TPU_TEST_PG_URL set (a postgresql:// admin DSN), the WHOLE suite
# runs against that server: every file-backed sqlite Database the tests
# construct is transparently redirected onto a fresh, uniquely-named
# database there (zero test-code forks). Without it, `-m postgres` tests
# skip with one line and everything else stays on sqlite. Recipe:
# docs/banco-de-dados.md (docker compose up db; no PG binary in this image).
PG_TEST_URL = os.environ.get("ICS_TPU_TEST_PG_URL", "")
_pg_created_dbs: list[str] = []

if PG_TEST_URL:
    import itertools
    import urllib.parse

    from ics_tpu.db import engine as _engine_mod
    from ics_tpu.db import pg_wire as _pg_wire

    _orig_db_init = _engine_mod.Database.__init__
    _db_counter = itertools.count()

    def _fresh_pg_url() -> str:
        name = f"ics_test_{os.getpid()}_{next(_db_counter)}"
        admin = _pg_wire.PGConnection(**_pg_wire.parse_dsn(PG_TEST_URL))
        try:
            admin.execute(f'CREATE DATABASE "{name}"')
        finally:
            admin.close()
        _pg_created_dbs.append(name)
        # swap only the path — a naive regex would eat the query string or
        # mangle a path-less DSN's authority
        parts = urllib.parse.urlsplit(PG_TEST_URL)
        return urllib.parse.urlunsplit(parts._replace(path=f"/{name}"))

    def _pg_redirect_init(self, url: str):
        if url.startswith("sqlite") and ":memory:" not in url:
            url = _fresh_pg_url()
        _orig_db_init(self, url)

    _engine_mod.Database.__init__ = _pg_redirect_init


def pytest_collection_modifyitems(config, items):
    if PG_TEST_URL:
        return
    skip = pytest.mark.skip(
        reason="needs a live PostgreSQL server: set ICS_TPU_TEST_PG_URL "
               "(docs/banco-de-dados.md)"
    )
    for item in items:
        if "postgres" in item.keywords:
            item.add_marker(skip)


def pytest_sessionfinish(session, exitstatus):
    if not (PG_TEST_URL and _pg_created_dbs):
        return
    from ics_tpu.db import pg_wire as _pg_wire

    try:
        admin = _pg_wire.PGConnection(**_pg_wire.parse_dsn(PG_TEST_URL))
    except Exception:
        return
    try:
        for name in _pg_created_dbs:
            try:
                admin.execute(f'DROP DATABASE IF EXISTS "{name}"')
            except Exception:
                pass
    finally:
        admin.close()


@pytest.fixture()
def anyio_backend():
    return "asyncio"
