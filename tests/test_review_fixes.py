"""Regression tests for the code-review findings (round 1)."""

import asyncio

import httpx
import numpy as np
import pytest

from ics_tpu.core.security import sha256_hex
from ics_tpu.db.engine import Database
from ics_tpu.db.models import ConjuntoImagens, Imagem, SyncStatus
from ics_tpu.sync.nextcloud_client import NextCloudClient
from ics_tpu.sync.service import NextCloudSyncService
from ics_tpu.sync.sync_cache import SyncCache
from ics_tpu.sync.webdav_sync import WebDAVSync, validate_image_entry
from ics_tpu.web.multipart import parse_multipart

from tests.fake_nextcloud import FakeState, make_fake_nextcloud, make_jpeg


@pytest.fixture()
def db(tmp_path):
    d = Database(f"sqlite:///{tmp_path}/fix.db")
    d.create_all()
    return d


def _client(state):
    return NextCloudClient(
        base_url="http://fake.test", username="tester", password="pw",
        user_path="/files/tester", max_retries=2, retry_delay=0.01,
        transport=httpx.ASGITransport(app=make_fake_nextcloud(state)),
    )


class TestMultipartByteExactness:
    def test_trailing_newline_preserved(self):
        # file content that ends with \r\n and begins with \n must survive
        payload = b"\nline1\r\nline2\r\n"
        boundary = "BB"
        body = (
            b"--BB\r\n"
            b'content-disposition: form-data; name="files"; filename="f.txt"\r\n'
            b"content-type: text/plain\r\n\r\n"
            + payload
            + b"\r\n--BB--\r\n"
        )
        form = parse_multipart(body, "multipart/form-data; boundary=BB")
        assert form.files[0][1].data == payload
        assert sha256_hex(form.files[0][1].data) == sha256_hex(payload)


class TestChunkedDecoded:
    @pytest.mark.anyio
    async def test_chunked_te_decoded(self):
        """Round 1 refused chunked bodies with 501; round 2 de-chunks them
        (reference parity: uvicorn accepts streamed uploads)."""
        from ics_tpu.web import App, JSONResponse, Router
        from ics_tpu.web.server import Server

        app = App()
        r = Router()

        @r.post("/echo")
        async def echo(request):
            return JSONResponse({"n": len(await request.body())})

        app.include_router(r)
        server = Server(app, "127.0.0.1", 0)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            try:
                writer.write(
                    b"POST /echo HTTP/1.1\r\nhost: x\r\n"
                    b"transfer-encoding: chunked\r\n\r\n"
                    b"5\r\nhello\r\n0\r\n\r\n"
                )
                await writer.drain()
                line = await reader.readline()
                assert b"200" in line
                raw = await reader.readuntil(b"\r\n\r\n")
                length = int(
                    [h for h in raw.lower().split(b"\r\n")
                     if h.startswith(b"content-length")][0].split(b":")[1]
                )
                body = await reader.readexactly(length)
                assert b'"n": 5' in body or b'"n":5' in body
            finally:
                # close BEFORE stop(): wait_closed() waits for live
                # keep-alive connections on 3.12+
                writer.close()
        finally:
            await server.stop()


class TestStaleSyncMutex:
    def test_crash_leaves_flag_cleared_on_next_start(self, db):
        cache = SyncCache(db)
        assert cache.try_acquire_sync() is True
        # simulate crash: flag stays set, new process constructs a new cache
        cache2 = SyncCache(db)
        assert cache2.is_sync_in_progress() is False
        assert cache2.try_acquire_sync() is True


class TestActivityIdWatermark:
    @pytest.mark.anyio
    async def test_incremental_uses_activity_id(self, db):
        state = FakeState()
        state.add_image("pasta", "a.jpg", make_jpeg(1))
        client = _client(state)
        service = NextCloudSyncService(db, client=client)
        await service.sync_initial()

        new_data = make_jpeg(7)
        state.add_image("pasta", "b.jpg", new_data)
        state.record_event("file_created", "pasta/b.jpg")
        result = await service.sync_periodic()
        assert result["mode"] == "activity_api"
        assert result["images_created"] == 1
        with db.session() as s:
            assert s.get(Imagem, sha256_hex(new_data)) is not None
            assert s.get(SyncStatus, 1).last_activity_id >= 1

        # second periodic: watermark advanced, the same event is NOT refetched
        result2 = await service.sync_periodic()
        assert result2.get("events", 0) == 0

    @pytest.mark.anyio
    async def test_initial_sync_sets_id_watermark(self, db):
        state = FakeState()
        state.add_image("pasta", "a.jpg", make_jpeg(1))
        state.record_event("file_created", "pasta/a.jpg")
        client = _client(state)
        service = NextCloudSyncService(db, client=client)
        await service.sync_initial()
        with db.session() as s:
            assert (s.get(SyncStatus, 1).last_activity_id or 0) >= 1


class TestNestedConjuntoSurvivesScan:
    @pytest.mark.anyio
    async def test_scan_does_not_tombstone_nested(self, db):
        state = FakeState()
        state.add_image("raiz", "a.jpg", make_jpeg(1))
        client = _client(state)
        sync = WebDAVSync(client, db)
        await sync.sync_all_folders()
        # simulate a nested conjunto created via Activity events
        from ics_tpu.core import timezone as tz

        now = tz.utcnow()
        with db.session() as s:
            s.add(
                ConjuntoImagens(
                    nome_conj="sub", caminho_conj="raiz/sub", file_id="9999",
                    existe_no_nextcloud=True, data_proc=now, data_sinc=now,
                )
            )
            s.commit()
        await sync.sync_all_folders()
        with db.session() as s:
            nested = (
                s.query(ConjuntoImagens)
                .filter(ConjuntoImagens.file_id == "9999")
                .first()
            )
            assert nested.existe_no_nextcloud is True


class TestValidateImageEntry:
    def test_missing_content_type_accepted(self):
        assert validate_image_entry({"name": "x.jpg", "content_type": ""})
        assert not validate_image_entry({"name": "x.txt", "content_type": ""})
        assert not validate_image_entry(
            {"name": "x.jpg", "content_type": "text/html"}
        )


class TestBatcherResilience:
    @pytest.mark.anyio
    async def test_flusher_survives_predict_failure(self):
        from ics_tpu.runtime.batcher import DynamicBatcher

        calls = {"n": 0}

        def bad_then_good(canvas, sizes):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("device hiccup")
            n = canvas.shape[0]
            return np.zeros((n, 5), np.int32), np.zeros((n, 5), np.float32)

        def stage(images):
            n = len(images)
            return (
                np.zeros((n, 8, 8, 3), np.uint8),
                np.full((n, 2), 8, np.int32),
            )

        b = DynamicBatcher(bad_then_good, stage, max_batch=4, deadline_us=500)
        await b.start()
        img = np.zeros((8, 8, 3), np.uint8)
        with pytest.raises(RuntimeError):
            await b.submit(img)
        # flusher must still be alive and serve the next request
        idx, scores = await b.submit(img)
        assert idx.shape == (5,)
        await b.stop()

    @pytest.mark.anyio
    async def test_backlog_drained_into_one_batch(self):
        """Requests piling up during a slow flush must coalesce into the
        next batch even though they are older than the deadline."""
        import asyncio
        import time as _time

        from ics_tpu.runtime.batcher import DynamicBatcher

        batch_sizes = []

        def predict(canvas, sizes):
            batch_sizes.append(canvas.shape[0])
            _time.sleep(0.05)  # slow device step -> backlog builds
            n = canvas.shape[0]
            return np.zeros((n, 5), np.int32), np.zeros((n, 5), np.float32)

        def stage(images):
            n = len(images)
            return (
                np.zeros((n, 4, 4, 3), np.uint8),
                np.full((n, 2), 4, np.int32),
            )

        b = DynamicBatcher(predict, stage, max_batch=8, deadline_us=1000)
        await b.start()
        img = np.zeros((4, 4, 3), np.uint8)
        await asyncio.gather(*(b.submit(img) for _ in range(9)))
        await b.stop()
        # first flush grabs some small batch; the backlog must arrive as a
        # coalesced batch, not nine singletons
        assert max(batch_sizes) >= 4, batch_sizes
        assert len(batch_sizes) <= 4, batch_sizes

    @pytest.mark.anyio
    async def test_stop_fails_queued_futures(self):
        from ics_tpu.runtime.batcher import DynamicBatcher

        async def never_start():
            pass

        def stage(images):
            raise AssertionError("should not stage")

        b = DynamicBatcher(lambda c, s: (None, None), stage, max_batch=4,
                           deadline_us=10_000_000)
        # do NOT start the flusher: submissions sit in the queue
        task = asyncio.ensure_future(b.submit(np.zeros((4, 4, 3), np.uint8)))
        await asyncio.sleep(0.05)
        await b.stop()
        with pytest.raises(RuntimeError):
            await task
