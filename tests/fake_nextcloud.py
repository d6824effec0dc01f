"""In-process fake NextCloud server (WebDAV PROPFIND + file GET + Activity
API), built on the framework's own ASGI App — the hermetic test double
SURVEY.md §4 calls for.

State is a dict of folders -> files; tests mutate it and record activity
events; the sync engine talks to it through httpx.ASGITransport.
"""

from __future__ import annotations

import io
import time
from dataclasses import dataclass, field
from xml.sax.saxutils import escape

import numpy as np
from PIL import Image as PILImage

from ics_tpu.web import App, JSONResponse, Request, Response, Router

USER_PATH = "/files/tester"
DAV_PREFIX = f"/remote.php/dav{USER_PATH}"


def make_jpeg(seed: int, size=(64, 48)) -> bytes:
    rng = np.random.default_rng(seed)
    img = PILImage.fromarray(
        rng.integers(0, 256, (size[1], size[0], 3), np.uint8)
    )
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=85)
    return buf.getvalue()


@dataclass
class FakeFile:
    name: str
    data: bytes
    file_id: str
    content_type: str = "image/jpeg"
    etag: str = "v1"


@dataclass
class FakeState:
    # folder name -> {filename: FakeFile}
    folders: dict = field(default_factory=dict)
    folder_ids: dict = field(default_factory=dict)
    events: list = field(default_factory=list)
    next_id: int = 1000
    fail_webdav: bool = False
    fail_activity: bool = False

    def new_id(self) -> str:
        self.next_id += 1
        return str(self.next_id)

    def add_folder(self, name: str) -> str:
        if name not in self.folders:
            self.folders[name] = {}
            self.folder_ids[name] = self.new_id()
        return self.folder_ids[name]

    def add_image(self, folder: str, name: str, data: bytes) -> FakeFile:
        self.add_folder(folder)
        f = FakeFile(name=name, data=data, file_id=self.new_id())
        self.folders[folder][name] = f
        return f

    def record_event(self, type_: str, object_name: str) -> None:
        self.events.append(
            {
                "activity_id": len(self.events) + 1,
                "type": type_,
                "object_type": "files",
                "object_name": object_name,
                "datetime": time.time(),
            }
        )


def _propfind_entry(href: str, name: str, is_dir: bool, file_id: str,
                    content_type: str = "", length: int = 0,
                    etag: str = "") -> str:
    resourcetype = "<d:resourcetype><d:collection/></d:resourcetype>" if is_dir else "<d:resourcetype/>"
    ctype = f"<d:getcontenttype>{escape(content_type)}</d:getcontenttype>" if content_type else ""
    return f"""
  <d:response>
    <d:href>{escape(href)}</d:href>
    <d:propstat>
      <d:prop>
        <d:displayname>{escape(name)}</d:displayname>
        {ctype}
        <d:getcontentlength>{length}</d:getcontentlength>
        <d:getlastmodified>Mon, 01 Jun 2026 10:00:00 GMT</d:getlastmodified>
        {resourcetype}
        <d:getetag>"{escape(etag or file_id)}"</d:getetag>
        <oc:fileid>{escape(file_id)}</oc:fileid>
      </d:prop>
      <d:status>HTTP/1.1 200 OK</d:status>
    </d:propstat>
  </d:response>"""


def make_fake_nextcloud(state: FakeState) -> App:
    app = App(title="fake-nextcloud")
    router = Router()

    @router.route(f"/remote.php/dav/files/tester", ["PROPFIND"])
    @router.route(f"/remote.php/dav/files/tester/{{path:path}}", ["PROPFIND"])
    async def propfind(request: Request):
        if state.fail_webdav:
            return Response(b"down", 503)
        path = request.path_params.get("path", "").strip("/")
        entries = [
            _propfind_entry(f"{DAV_PREFIX}/{path}".rstrip("/") + "/",
                            path or "tester", True,
                            state.folder_ids.get(path, "root"))
        ]
        if path == "":
            for fname, fid in state.folder_ids.items():
                entries.append(
                    _propfind_entry(f"{DAV_PREFIX}/{fname}/", fname, True, fid)
                )
        elif path in state.folders:
            for f in state.folders[path].values():
                entries.append(
                    _propfind_entry(
                        f"{DAV_PREFIX}/{path}/{f.name}", f.name, False,
                        f.file_id, f.content_type, len(f.data), f.etag,
                    )
                )
        else:
            return Response(b"not found", 404)
        xml = (
            '<?xml version="1.0"?>\n'
            '<d:multistatus xmlns:d="DAV:" xmlns:oc="http://owncloud.org/ns">'
            + "".join(entries)
            + "\n</d:multistatus>"
        )
        return Response(xml.encode(), 207, media_type="application/xml")

    @router.get("/remote.php/dav/files/tester/{path:path}")
    async def get_file(request: Request):
        if state.fail_webdav:
            return Response(b"down", 503)
        path = request.path_params["path"].strip("/")
        folder, _, name = path.rpartition("/")
        f = state.folders.get(folder, {}).get(name)
        if f is None:
            return Response(b"not found", 404)
        return Response(f.data, 200, media_type=f.content_type)

    @router.get("/ocs/v2.php/apps/activity/api/v2/activity")
    async def activity(request: Request):
        if state.fail_activity:
            return Response(b"down", 503)
        # NextCloud semantics: ``since`` is the last-seen activity ID;
        # the DEFAULT sort is desc (newest first) and pages move BACKWARD
        # through history under it — the client must send sort=asc for
        # the incremental channel to work (exactly like the real server)
        since = int(float(request.query_params.get("since", 0) or 0))
        limit = int(request.query_params.get("limit", 200) or 200)
        sort = (request.query_params.get("sort") or "desc").lower()
        if sort == "asc":
            events = [e for e in state.events if e["activity_id"] > since]
            events = sorted(events, key=lambda e: e["activity_id"])[:limit]
        else:
            events = [e for e in state.events if e["activity_id"] < since] \
                if since else list(state.events)
            events = sorted(events, key=lambda e: -e["activity_id"])[:limit]
        return JSONResponse({"ocs": {"data": events}})

    app.include_router(router)
    return app
