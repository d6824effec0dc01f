"""Route-level tests for the public NextCloud proxy against the fake server."""

import httpx
import pytest

import ics_tpu.sync.nextcloud_client as ncmod
from ics_tpu.db.engine import Database
from ics_tpu.main import create_app
from ics_tpu.sync.nextcloud_client import NextCloudClient

from tests.fake_nextcloud import FakeState, make_fake_nextcloud, make_jpeg


@pytest.fixture()
async def app(tmp_path, monkeypatch):
    state = FakeState()
    state.add_image("pasta", "a.jpg", make_jpeg(1))
    state.add_image("pasta", "b.jpg", make_jpeg(2))
    fake_client = NextCloudClient(
        base_url="http://fake.test", username="tester", password="pw",
        user_path="/files/tester", max_retries=1, retry_delay=0.01,
        transport=httpx.ASGITransport(app=make_fake_nextcloud(state)),
    )
    monkeypatch.setattr(ncmod, "_client_singleton", fake_client)
    db = Database(f"sqlite:///{tmp_path}/proxy.db")
    a = create_app(db=db)
    await a.startup()
    a.state.fake_nc = state
    yield a
    await a.shutdown()
    ncmod.reset_nextcloud_client()


@pytest.fixture()
def client(app):
    return httpx.AsyncClient(
        transport=httpx.ASGITransport(app=app), base_url="http://t"
    )


class TestProxyRoutes:
    @pytest.mark.anyio
    async def test_live_listing(self, app, client):
        async with client:
            r = await client.get("/nextcloud/images?folder_path=pasta")
            assert r.status_code == 200, r.text
            body = r.json()
            assert body["total"] == 2
            assert {i["name"] for i in body["images"]} == {"a.jpg", "b.jpg"}
            assert body["images"][0]["download_url"]

    @pytest.mark.anyio
    async def test_listing_page_out_of_range(self, app, client):
        async with client:
            r = await client.get("/nextcloud/images?folder_path=pasta&page=9")
            assert r.status_code == 404

    @pytest.mark.anyio
    async def test_streaming_proxy_bytes_and_cache_header(self, app, client):
        expected = app.state.fake_nc.folders["pasta"]["a.jpg"].data
        async with client:
            r = await client.get("/nextcloud/images/pasta/a.jpg")
            assert r.status_code == 200
            assert r.content == expected
            assert r.headers["cache-control"] == "public, max-age=3600"
            assert r.headers["content-type"] == "image/jpeg"

    @pytest.mark.anyio
    async def test_proxy_missing_file_404(self, app, client):
        async with client:
            r = await client.get("/nextcloud/images/pasta/nope.jpg")
            assert r.status_code == 404

    @pytest.mark.anyio
    async def test_proxy_upstream_down_502(self, app, client):
        app.state.fake_nc.fail_webdav = True
        async with client:
            r = await client.get("/nextcloud/images/pasta/a.jpg")
            assert r.status_code == 502
