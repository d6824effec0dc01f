import asyncio
import contextlib

import httpx
import pytest

from ics_tpu.web import App, HTTPException, JSONResponse, Response, Router
from ics_tpu.web.responses import StreamingResponse
from ics_tpu.web.routing import compile_path


def make_app():
    app = App(cors_origins=["http://localhost:5173"])
    router = Router(prefix="/items")

    @router.get("/")
    async def list_items(request):
        return JSONResponse([{"id": 1}])

    @router.get("/{item_id}")
    async def get_item(request):
        return JSONResponse({"id": request.path_params["item_id"]})

    @router.post("/")
    async def create_item(request):
        body = await request.json()
        return JSONResponse(body, 201)

    @router.get("/{item_id}/fail")
    async def fail(request):
        raise HTTPException(418, "teapot")

    @router.get("/{item_id}/boom")
    async def boom(request):
        raise RuntimeError("kaput")

    files = Router(prefix="/files")

    @files.get("/{file_path:path}")
    async def file_path(request):
        return JSONResponse({"path": request.path_params["file_path"]})

    @files.post("/upload")
    async def upload(request):
        form = await request.form()
        f = form.getfiles("files")[0]
        return JSONResponse(
            {"name": f.filename, "size": f.size, "extra": form.get("extra")}
        )

    misc = Router()

    @misc.get("/no-content")
    async def no_content(request):
        from ics_tpu.web import Response

        return Response(b"", 204)

    @misc.get("/cookie")
    async def cookie(request):
        resp = JSONResponse({"got": request.cookies.get("tok")})
        resp.set_cookie("tok", "abc", httponly=True, samesite="lax", max_age=60)
        return resp

    @misc.get("/stream")
    async def stream(request):
        async def gen():
            for i in range(3):
                yield f"chunk{i}".encode()

        return StreamingResponse(gen(), media_type="text/plain")

    @misc.get("/q")
    async def query(request):
        return JSONResponse(
            {"page": request.query_int("page", 1, lo=1, hi=10),
             "s": request.query_params.get("s")}
        )

    app.include_router(router)
    app.include_router(files)
    app.include_router(misc)
    return app


@pytest.fixture()
def client():
    app = make_app()
    transport = httpx.ASGITransport(app=app)
    return httpx.AsyncClient(transport=transport, base_url="http://test")


class TestRouting:
    def test_compile_path(self):
        p = compile_path("/a/{x}/b/{rest:path}")
        m = p.match("/a/1/b/c/d/e.jpg")
        assert m.group("x") == "1"
        assert m.group("rest") == "c/d/e.jpg"
        assert p.match("/a/1/b/") is None or p.match("/a/1/b/").group("rest")

    @pytest.mark.anyio
    async def test_basic_routes(self, client):
        async with client:
            r = await client.get("/items/")
            assert r.status_code == 200 and r.json() == [{"id": 1}]
            r = await client.get("/items/42")
            assert r.json() == {"id": "42"}
            r = await client.post("/items/", json={"a": 1})
            assert r.status_code == 201 and r.json() == {"a": 1}

    @pytest.mark.anyio
    async def test_non_object_json_body_is_422_not_500(self, client):
        """Every route body in the app is an object; the reference stack
        (FastAPI + pydantic) 422s a top-level array/scalar. A crafted
        ``[1,2]`` body must not reach ``body.get`` and 500."""
        async with client:
            for payload in ("[1, 2]", '"texto"', "5", "null", "true"):
                r = await client.post(
                    "/items/", content=payload,
                    headers={"content-type": "application/json"},
                )
                assert r.status_code == 422, (payload, r.status_code)
                assert r.json()["detail"] == "Corpo JSON deve ser um objeto"
            r = await client.post(
                "/items/", content="{not json",
                headers={"content-type": "application/json"},
            )
            assert r.status_code == 422
            assert r.json()["detail"] == "JSON inválido"

    @pytest.mark.anyio
    async def test_head_served_by_get_handler(self, client):
        async with client:
            r = await client.head("/items/42")
            assert r.status_code == 200
            assert r.content == b""

    @pytest.mark.anyio
    async def test_404_405(self, client):
        async with client:
            assert (await client.get("/nope")).status_code == 404
            r = await client.delete("/items/")
            assert r.status_code == 405

    @pytest.mark.anyio
    async def test_errors(self, client):
        async with client:
            r = await client.get("/items/1/fail")
            assert r.status_code == 418 and r.json()["detail"] == "teapot"
            r = await client.get("/items/1/boom")
            assert r.status_code == 500
            assert "Erro interno" in r.json()["detail"]

    @pytest.mark.anyio
    async def test_path_param(self, client):
        async with client:
            r = await client.get("/files/folder/sub/img.jpg")
            assert r.json() == {"path": "folder/sub/img.jpg"}

    @pytest.mark.anyio
    async def test_multipart_upload(self, client):
        async with client:
            r = await client.post(
                "/files/upload",
                files={"files": ("x.jpg", b"\xff\xd8\xff" + b"0" * 100, "image/jpeg")},
                data={"extra": "meta"},
            )
            assert r.status_code == 200
            out = r.json()
            assert out == {"name": "x.jpg", "size": 103, "extra": "meta"}

    @pytest.mark.anyio
    async def test_cookies(self, client):
        async with client:
            r = await client.get("/cookie", headers={"cookie": "tok=prev"})
            assert r.json() == {"got": "prev"}
            sc = r.headers["set-cookie"]
            assert "tok=abc" in sc and "HttpOnly" in sc and "Max-Age=60" in sc

    @pytest.mark.anyio
    async def test_streaming(self, client):
        async with client:
            r = await client.get("/stream")
            assert r.content == b"chunk0chunk1chunk2"

    @pytest.mark.anyio
    async def test_query_validation(self, client):
        async with client:
            r = await client.get("/q?page=3&s=x")
            assert r.json() == {"page": 3, "s": "x"}
            r = await client.get("/q?page=0")
            assert r.status_code == 422
            r = await client.get("/q?page=999")
            assert r.json()["page"] == 10

    @pytest.mark.anyio
    async def test_cors(self, client):
        async with client:
            r = await client.get(
                "/items/", headers={"origin": "http://localhost:5173"}
            )
            assert r.headers["access-control-allow-origin"] == "http://localhost:5173"
            r = await client.get("/items/", headers={"origin": "http://evil.com"})
            assert "access-control-allow-origin" not in r.headers
            r = await client.options(
                "/items/",
                headers={
                    "origin": "http://localhost:5173",
                    "access-control-request-method": "POST",
                },
            )
            assert r.status_code == 204


class TestRealServer:
    """End-to-end over a real TCP socket: our asyncio HTTP/1.1 server."""

    @pytest.mark.anyio
    async def test_server_roundtrip(self):
        from ics_tpu.web.server import Server

        app = make_app()
        server = Server(app, host="127.0.0.1", port=0)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}"
            ) as client:
                r = await client.get("/items/17")
                assert r.status_code == 200 and r.json() == {"id": "17"}
                r = await client.post("/items/", json={"k": "v"})
                assert r.status_code == 201 and r.json() == {"k": "v"}
                # keep-alive: second request on same client
                r = await client.get("/stream")
                assert r.content == b"chunk0chunk1chunk2"
                r = await client.get("/cookie")
                assert "tok=abc" in r.headers.get("set-cookie", "")
        finally:
            with contextlib.suppress(Exception):
                await server.stop()

    @pytest.mark.anyio
    async def test_chunked_request_body(self):
        """Streamed (Transfer-Encoding: chunked) uploads must work like they
        do under the reference's uvicorn — httpx streams an iterator body."""
        from ics_tpu.web.server import Server

        app = make_app()
        server = Server(app, host="127.0.0.1", port=0)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            async with httpx.AsyncClient(
                base_url=f"http://127.0.0.1:{port}"
            ) as client:
                payload = b'{"streamed": true, "n": 42}'

                async def gen():
                    yield payload[:10]
                    yield payload[10:]

                r = await client.post(
                    "/items/", content=gen(),
                    headers={"content-type": "application/json"},
                )
                assert r.status_code == 201
                assert r.json() == {"streamed": True, "n": 42}
                # keep-alive stream stays in sync after a chunked request
                r = await client.get("/items/5")
                assert r.json() == {"id": "5"}
        finally:
            with contextlib.suppress(Exception):
                await server.stop()

    @pytest.mark.anyio
    async def test_chunked_malformed_and_raw(self):
        from ics_tpu.web.server import Server

        app = make_app()
        server = Server(app, host="127.0.0.1", port=0)
        await server.start()
        port = server._server.sockets[0].getsockname()[1]
        try:
            # hand-rolled chunked request with extension + trailer
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            body = b'{"a":1}'
            writer.write(
                b"POST /items/ HTTP/1.1\r\nhost: t\r\n"
                b"transfer-encoding: chunked\r\n"
                b"content-type: application/json\r\n\r\n"
                + b"4;ext=1\r\n" + body[:4] + b"\r\n"
                + b"3\r\n" + body[4:] + b"\r\n"
                + b"0\r\nx-trailer: v\r\n\r\n"
            )
            await writer.drain()
            status = await reader.readuntil(b"\r\n")
            assert b"201" in status
            writer.close()

            # malformed chunk size -> 400
            reader, writer = await asyncio.open_connection("127.0.0.1", port)
            writer.write(
                b"POST /items/ HTTP/1.1\r\nhost: t\r\n"
                b"transfer-encoding: chunked\r\n\r\nzz\r\n"
            )
            await writer.drain()
            status = await reader.readuntil(b"\r\n")
            assert b"400" in status
            writer.close()
        finally:
            with contextlib.suppress(Exception):
                await server.stop()


class TestMultipartFuzz:
    """Adversarial multipart bodies: the parser either parses or raises
    ValueError — never UnicodeDecodeError/IndexError/500 material."""

    def test_missing_boundary_is_value_error(self):
        from ics_tpu.web.multipart import parse_multipart

        with pytest.raises(ValueError, match="boundary"):
            parse_multipart(b"anything", "multipart/form-data")

    def test_adversarial_bodies_never_crash(self):
        from ics_tpu.web.multipart import parse_multipart

        ctype = 'multipart/form-data; boundary="B"'
        bodies = [
            b"",                                  # empty
            b"--B--",                             # no parts
            b"--B\r\n\r\n\r\n--B--",              # empty headers/content
            b"--B\r\nheaders without colon\r\n\r\nx\r\n--B--",
            b"--B\r\ncontent-disposition: form-data\r\n\r\nx\r\n--B--",
            # non-UTF8 bytes in header values (latin-1 filename)
            b"--B\r\ncontent-disposition: form-data; name=\"f\"; "
            b"filename=\"caf\xe9.jpg\"\r\n\r\nDATA\r\n--B--",
            # header block never terminated by blank line
            b"--B\r\ncontent-disposition: form-data; name=x\r\n--B--",
            # boundary-like bytes inside a part's binary payload
            b"--B\r\ncontent-disposition: form-data; name=\"f\"; "
            b"filename=\"a\"\r\n\r\n\x00\x01--not-the-boundary\xff\r\n--B--",
            b"\r\n".join([b"--B"] * 50) + b"--B--",  # many empty parts
        ]
        for body in bodies:
            form = parse_multipart(body, ctype)  # must not raise
            assert form is not None
        # the latin-1 filename round-trips losslessly
        form = parse_multipart(bodies[5], ctype)
        (f,) = form.getfiles("f")
        assert f.filename == "caf\xe9.jpg" and f.data == b"DATA"
        # and the COMMON case: browsers send filenames as raw UTF-8 —
        # utf-8 decodes first, latin-1 is only the never-crash fallback
        form = parse_multipart(
            b"--B\r\ncontent-disposition: form-data; name=\"f\"; "
            b"filename=\"caf\xc3\xa9.jpg\"\r\n\r\nDATA\r\n--B--", ctype
        )
        (f,) = form.getfiles("f")
        assert f.filename == "caf\xe9.jpg"

    def test_binary_payload_preserved_exactly(self):
        from ics_tpu.web.multipart import parse_multipart

        payload = bytes(range(256)) * 3
        body = (
            b"--B\r\ncontent-disposition: form-data; name=\"file\"; "
            b"filename=\"bin\"\r\ncontent-type: application/octet-stream"
            b"\r\n\r\n" + payload + b"\r\n--B--\r\n"
        )
        form = parse_multipart(body, "multipart/form-data; boundary=B")
        (f,) = form.getfiles("file")
        assert f.data == payload


@pytest.mark.anyio
async def test_malformed_multipart_is_422_not_500(client):
    """Route-level: a multipart Content-Type with no boundary on an
    upload route must 422 (client error), never the generic 500."""
    async with client:
        r = await client.post(
            "/files/upload",
            content=b"definitely not multipart",
            headers={"content-type": "multipart/form-data"},  # no boundary
        )
        assert r.status_code == 422, r.text
        assert "multipart" in r.json()["detail"]


class TestSelfReviewR3WebFixes:
    def test_duplicate_headers_comma_joined(self):
        """RFC 9110 §5.2: repeated field lines combine — last-wins would
        drop earlier X-Forwarded-For hops and mis-key the rate limiter."""
        from ics_tpu.web.requests import Request

        scope = {
            "type": "http", "method": "GET", "path": "/",
            "headers": [
                (b"x-forwarded-for", b"1.2.3.4"),
                (b"x-forwarded-for", b"10.0.0.1"),
            ],
        }
        req = Request(scope, None)
        assert req.headers["x-forwarded-for"] == "1.2.3.4, 10.0.0.1"

    def test_split_cookie_lines_join_with_semicolon(self):
        """RFC 6265: Cookie's pair separator is '; ', and HTTP/2→1.1
        intermediaries legitimately split Cookie into multiple lines —
        a ', ' join would corrupt the session token value (ADVICE r3)."""
        from ics_tpu.web.requests import Request

        scope = {
            "type": "http", "method": "GET", "path": "/",
            "headers": [
                (b"cookie", b"access_token=abc123"),
                (b"cookie", b"outro=valor"),
            ],
        }
        req = Request(scope, None)
        assert req.cookies["access_token"] == "abc123"
        assert req.cookies["outro"] == "valor"

    def test_slash_variant_method_fallback(self):
        """A method-mismatched exact match must NOT short-circuit the
        trailing-slash candidate that does accept the method."""
        from ics_tpu.web.routing import Router

        r = Router()

        @r.get("/painel")
        async def g(request):  # pragma: no cover - routing only
            pass

        @r.post("/painel/")
        async def p(request):  # pragma: no cover - routing only
            pass

        route, params = r.find("POST", "/painel")
        assert route is not None and "POST" in route.methods
        route, _ = r.find("GET", "/painel/")
        assert route is not None and "GET" in route.methods

    @pytest.mark.anyio
    async def test_mixed_case_multipart_content_type(self, client):
        """Media types are case-insensitive (RFC 2045): legal
        'Multipart/Form-Data' must parse as multipart, not urlencoded."""
        body = (
            b"--B\r\ncontent-disposition: form-data; name=\"files\"; "
            b"filename=\"x.jpg\"\r\n\r\n\xff\xd8\xffDATA\r\n--B--\r\n"
        )
        async with client:
            r = await client.post(
                "/files/upload", content=body,
                headers={"content-type":
                         'Multipart/Form-Data; boundary="B"'},
            )
            assert r.status_code == 200, r.text
            assert r.json()["name"] == "x.jpg"
