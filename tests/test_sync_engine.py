"""Hermetic sync-engine tests against the fake NextCloud server."""

import httpx
import pytest

from ics_tpu.core.security import sha256_hex
from ics_tpu.db.engine import Database
from ics_tpu.db.models import ConjuntoImagens, Imagem
from ics_tpu.sync.activity_sync import ActivityAPISync
from ics_tpu.sync.nextcloud_client import NextCloudClient
from ics_tpu.sync.service import NextCloudSyncService
from ics_tpu.sync.sync_cache import SyncCache
from ics_tpu.sync.webdav_sync import WebDAVSync

from tests.fake_nextcloud import FakeState, make_fake_nextcloud, make_jpeg


@pytest.fixture()
def state():
    st = FakeState()
    st.add_folder("plantas")
    st.add_image("plantas", "a.jpg", make_jpeg(1))
    st.add_image("plantas", "b.jpg", make_jpeg(2))
    st.add_folder("animais")
    st.add_image("animais", "c.jpg", make_jpeg(3))
    return st


@pytest.fixture()
def nc_client(state):
    app = make_fake_nextcloud(state)
    return NextCloudClient(
        base_url="http://fake.test",
        username="tester",
        password="pw",
        user_path="/files/tester",
        max_retries=2,
        retry_delay=0.01,
        transport=httpx.ASGITransport(app=app),
    )


@pytest.fixture()
def db(tmp_path):
    d = Database(f"sqlite:///{tmp_path}/sync.db")
    d.create_all()
    return d


class TestClient:
    @pytest.mark.anyio
    async def test_list_root_folders(self, nc_client):
        items = await nc_client.list_folder("", depth=1)
        folders = nc_client.filter_folders(items)
        assert {f["name"] for f in folders} == {"plantas", "animais"}

    @pytest.mark.anyio
    async def test_list_images_and_download(self, nc_client, state):
        items = await nc_client.list_folder("plantas", depth=1)
        images = nc_client.filter_images(items)
        assert {i["name"] for i in images} == {"a.jpg", "b.jpg"}
        assert all(i["file_id"] for i in images)
        data = await nc_client.get_file("plantas/a.jpg")
        assert data == state.folders["plantas"]["a.jpg"].data

    @pytest.mark.anyio
    async def test_activity_fetch_and_health(self, nc_client, state):
        state.record_event("file_created", "plantas/a.jpg")
        events = await nc_client.fetch_activities(since=0)
        assert len(events) == 1
        health = await nc_client.check_server_health()
        assert health["server_online"] is True
        state.fail_webdav = True
        state.fail_activity = True
        health = await nc_client.check_server_health()
        assert health["server_online"] is False

    @pytest.mark.anyio
    async def test_retry_then_fail(self, nc_client, state):
        state.fail_webdav = True
        with pytest.raises(Exception):
            await nc_client.list_folder("", depth=1)


class TestWebDAVSync:
    @pytest.mark.anyio
    async def test_full_scan(self, nc_client, db, state):
        sync = WebDAVSync(nc_client, db)
        stats = await sync.sync_all_folders()
        assert stats["folders_processed"] == 2
        assert stats["images_created"] == 3
        with db.session() as s:
            assert s.query(ConjuntoImagens).count() == 2
            imgs = s.query(Imagem).all()
            assert len(imgs) == 3
            # content-hash identity
            expected = sha256_hex(state.folders["plantas"]["a.jpg"].data)
            assert s.get(Imagem, expected) is not None
            # PIL metadata extracted
            img = s.get(Imagem, expected)
            assert img.metadados["image"]["width"] == 64
            # crash-safety flag set
            assert all(
                c.imagens_sincronizadas for c in s.query(ConjuntoImagens).all()
            )

    @pytest.mark.anyio
    async def test_rescan_idempotent_and_tombstones(self, nc_client, db, state):
        sync = WebDAVSync(nc_client, db)
        await sync.sync_all_folders()
        # second scan: updates, no new rows
        stats = await sync.sync_all_folders()
        assert stats["images_created"] == 0
        assert stats["images_updated"] == 3
        # remove an image + a folder on the server
        del state.folders["plantas"]["b.jpg"]
        removed_folder_imgs = state.folders.pop("animais")
        state.folder_ids.pop("animais")
        stats = await sync.sync_all_folders()
        with db.session() as s:
            b_hash = sha256_hex(make_jpeg(2))
            assert s.get(Imagem, b_hash).existe_no_nextcloud is False
            c_hash = sha256_hex(removed_folder_imgs["c.jpg"].data)
            assert s.get(Imagem, c_hash).existe_no_nextcloud is False
            pasta = (
                s.query(ConjuntoImagens)
                .filter(ConjuntoImagens.nome_conj == "animais")
                .first()
            )
            assert pasta.existe_no_nextcloud is False
            # rows never hard-deleted
            assert s.query(Imagem).count() == 3

    @pytest.mark.anyio
    async def test_duplicate_content_single_row(self, nc_client, db, state):
        # same bytes under two names -> one Imagem row (content identity)
        state.add_image("plantas", "dup.jpg", state.folders["plantas"]["a.jpg"].data)
        sync = WebDAVSync(nc_client, db)
        stats = await sync.sync_all_folders()
        with db.session() as s:
            assert s.query(Imagem).count() == 3  # a==dup merged


class TestActivitySync:
    @pytest.mark.anyio
    async def test_file_created_event(self, nc_client, db, state):
        await WebDAVSync(nc_client, db).sync_all_folders()
        new_data = make_jpeg(9)
        state.add_image("plantas", "novo.jpg", new_data)
        state.record_event("file_created", "plantas/novo.jpg")
        activity = ActivityAPISync(nc_client, db)
        events = await activity.fetch_events_since(0)
        stats = await activity.process_events(events)
        assert stats["images_created"] == 1
        with db.session() as s:
            img = s.get(Imagem, sha256_hex(new_data))
            assert img is not None
            assert img.metadados["sync"]["sync_method"] == "activity_api"

    @pytest.mark.anyio
    async def test_file_deleted_and_changed(self, nc_client, db, state):
        await WebDAVSync(nc_client, db).sync_all_folders()
        state.record_event("file_deleted", "plantas/a.jpg")
        state.folders["plantas"]["b.jpg"].etag = "v2"
        state.record_event("file_changed", "plantas/b.jpg")
        activity = ActivityAPISync(nc_client, db)
        stats = await activity.process_events(
            await activity.fetch_events_since(0)
        )
        assert stats["images_removed"] == 1
        assert stats["images_updated"] == 1
        with db.session() as s:
            a_hash = sha256_hex(state.folders["plantas"]["a.jpg"].data)
            assert s.get(Imagem, a_hash).existe_no_nextcloud is False
            b_hash = sha256_hex(make_jpeg(2))
            assert (
                s.get(Imagem, b_hash).metadados["nextcloud"]["etag"] == "v2"
            )

    @pytest.mark.anyio
    async def test_folder_created_syncs_contents(self, nc_client, db, state):
        await WebDAVSync(nc_client, db).sync_all_folders()
        state.add_image("nova-pasta", "x.jpg", make_jpeg(42))
        state.record_event("folder_created", "nova-pasta")
        activity = ActivityAPISync(nc_client, db)
        stats = await activity.process_events(
            await activity.fetch_events_since(0)
        )
        assert stats["folders_created"] == 1
        with db.session() as s:
            pasta = (
                s.query(ConjuntoImagens)
                .filter(ConjuntoImagens.nome_conj == "nova-pasta")
                .first()
            )
            assert pasta is not None
            assert s.query(Imagem).filter(Imagem.id_cnj == pasta.id_cnj).count() == 1

    @pytest.mark.anyio
    async def test_irrelevant_events_skipped(self, nc_client, db, state):
        activity = ActivityAPISync(nc_client, db)
        stats = await activity.process_events(
            [{"type": "comments", "object_name": "x"}]
        )
        assert stats["events_skipped"] == 1


class TestHybridService:
    @pytest.mark.anyio
    async def test_initial_sync_empty_db_with_replay(self, nc_client, db, state):
        service = NextCloudSyncService(db, client=nc_client)
        result = await service.sync_initial()
        assert result["mode"] == "initial_full"
        assert result["images_created"] == 3
        status = service.get_sync_status()
        assert status["last_webdav_sync"] is not None
        assert status["last_sync_method"] == "initial"
        assert status["sync_in_progress"] is False

    @pytest.mark.anyio
    async def test_initial_sync_nonempty_db_uses_activity(
        self, nc_client, db, state
    ):
        service = NextCloudSyncService(db, client=nc_client)
        await service.sync_initial()
        result = await service.sync_initial()
        assert result["mode"] == "activity_catchup"

    @pytest.mark.anyio
    async def test_periodic_activity_then_failure_fallback(
        self, nc_client, db, state
    ):
        service = NextCloudSyncService(db, client=nc_client)
        await service.sync_initial()
        result = await service.sync_periodic()
        assert result["mode"] == "activity_api"
        # break the activity API -> counter grows, falls back to webdav
        state.fail_activity = True
        result = await service.sync_periodic()
        assert result["mode"] == "webdav"
        # three consecutive activity failures mark it unavailable
        status = service.cache.get()
        assert status.activity_api_failures >= 1

    @pytest.mark.anyio
    async def test_server_offline_detection_and_recovery(
        self, nc_client, db, state
    ):
        service = NextCloudSyncService(db, client=nc_client)
        await service.sync_initial()
        state.fail_activity = True
        state.fail_webdav = True
        for _ in range(3):
            await service.sync_periodic()
        assert service.cache.is_server_offline() is True
        # recovery via health check
        state.fail_activity = False
        state.fail_webdav = False
        health = await service.run_health_check()
        assert health["server_online"] is True
        assert service.cache.is_server_offline() is False

    @pytest.mark.anyio
    async def test_sync_mutex(self, nc_client, db, state):
        service = NextCloudSyncService(db, client=nc_client)
        assert service.cache.try_acquire_sync() is True
        result = await service.sync_periodic()
        assert result.get("skipped") is True
        service.cache.release_sync()


class TestSyncCache:
    def test_failure_threshold_marks_unavailable(self, db):
        cache = SyncCache(db)
        assert cache.is_activity_api_available() is True
        for _ in range(3):
            cache.record_activity_failure()
        assert cache.is_activity_api_available() is False
        cache.record_activity_success()
        assert cache.is_activity_api_available() is True
        assert cache.get().activity_api_failures == 0


class TestSelfReviewR3SyncFixes:
    """Regression tests for the r3 sync-tier review (real-NextCloud
    semantics: sort order, pagination, move handling, tombstone scope)."""

    @pytest.mark.anyio
    async def test_incremental_channel_advances_past_watermark(
        self, nc_client, db, state
    ):
        """The client must request sort=asc: under the API's desc default
        since=<watermark> pages BACKWARD through history. The fake now
        honors both sorts, so a regression to no-sort breaks this."""
        await WebDAVSync(nc_client, db).sync_all_folders()
        state.add_image("plantas", "n1.jpg", make_jpeg(41))
        state.record_event("file_created", "plantas/n1.jpg")
        activity = ActivityAPISync(nc_client, db)
        events = await activity.fetch_events_since(0)
        watermark = max(e["activity_id"] for e in events)
        # nothing new: the drained feed returns empty, NOT history
        assert await activity.fetch_events_since(watermark) == []
        state.add_image("plantas", "n2.jpg", make_jpeg(42))
        state.record_event("file_created", "plantas/n2.jpg")
        newer = await activity.fetch_events_since(watermark)
        assert [e["object_name"] for e in newer] == ["plantas/n2.jpg"]

    @pytest.mark.anyio
    async def test_fetch_paginates_beyond_one_page(self, db):
        """A 450-event burst between polls must drain fully — a single
        capped fetch dropped everything past the newest 200 and then
        jumped the watermark over them."""
        class StubClient:
            async def fetch_activities(self, since=0, limit=200):
                ids = [i for i in range(1, 451) if i > since][:200]
                return [
                    {"activity_id": i, "type": "file_changed",
                     "object_name": f"f/{i}.jpg"}
                    for i in ids
                ]

        activity = ActivityAPISync(StubClient(), db)
        events = await activity.fetch_events_since(0)
        assert len(events) == 450
        assert events[-1]["activity_id"] == 450

    @pytest.mark.anyio
    async def test_events_applied_chronologically(self, nc_client, db,
                                                  state):
        """delete(folder) then re-create(folder) arriving newest-first
        must NOT leave the recreated folder tombstoned."""
        await WebDAVSync(nc_client, db).sync_all_folders()
        state.record_event("folder_deleted", "plantas")
        state.record_event("folder_created", "plantas")
        activity = ActivityAPISync(nc_client, db)
        # hand the events in DESC order (the API's default presentation)
        events = sorted(
            await activity.fetch_events_since(0),
            key=lambda e: -e["activity_id"],
        )
        await activity.process_events(events)
        with db.session() as s:
            cnj = (
                s.query(ConjuntoImagens)
                .filter(ConjuntoImagens.nome_conj == "plantas")
                .first()
            )
            assert cnj.existe_no_nextcloud is True  # create came LAST

    @pytest.mark.anyio
    async def test_nested_delete_cannot_tombstone_root_namesake(
        self, nc_client, db, state
    ):
        """Deleting 'archive/plantas' must not tombstone the root
        conjunto 'plantas' via the basename fallback."""
        await WebDAVSync(nc_client, db).sync_all_folders()
        activity = ActivityAPISync(nc_client, db)
        assert not activity.process_folder_deleted(
            {"type": "folder_deleted", "object_name": "archive/plantas"}
        )
        with db.session() as s:
            cnj = (
                s.query(ConjuntoImagens)
                .filter(ConjuntoImagens.nome_conj == "plantas")
                .first()
            )
            assert cnj.existe_no_nextcloud is True

    @pytest.mark.anyio
    async def test_moved_image_follows_its_new_conjunto(
        self, nc_client, db, state
    ):
        """An image moved between folders must change id_cnj — keeping
        the old conjunto made every later scan of the old folder
        re-tombstone it."""
        await WebDAVSync(nc_client, db).sync_all_folders()
        data = state.folders["plantas"]["a.jpg"].data
        h = sha256_hex(data)
        # move a.jpg: plantas -> insetos (same bytes, same hash)
        del state.folders["plantas"]["a.jpg"]
        state.add_image("insetos", "a.jpg", data)
        await WebDAVSync(nc_client, db).sync_all_folders()
        with db.session() as s:
            img = s.get(Imagem, h)
            cnj = (
                s.query(ConjuntoImagens)
                .filter(ConjuntoImagens.nome_conj == "insetos")
                .first()
            )
            assert img.id_cnj == cnj.id_cnj
            assert img.existe_no_nextcloud is True
        # and the next scan does NOT re-tombstone it
        await WebDAVSync(nc_client, db).sync_all_folders()
        with db.session() as s:
            assert s.get(Imagem, h).existe_no_nextcloud is True
