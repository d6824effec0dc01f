"""Adversarial framing inputs against the from-scratch HTTP server.

Raw-socket tests: malformed Content-Length, oversized declared bodies,
huge chunk sizes — each must produce a clean HTTP status, never a silent
connection drop or an unhandled exception.
"""

import asyncio
import contextlib

import pytest

from tests.test_web import make_app


async def _raw(server_port, payload: bytes, read_n: int = 512) -> bytes:
    reader, writer = await asyncio.open_connection("127.0.0.1", server_port)
    try:
        writer.write(payload)
        await writer.drain()
        return await asyncio.wait_for(reader.read(read_n), 10)
    finally:
        writer.close()
        with contextlib.suppress(Exception):
            await writer.wait_closed()


@pytest.fixture()
async def server_port():
    from ics_tpu.web.server import Server

    server = Server(make_app(), host="127.0.0.1", port=0)
    await server.start()
    yield server._server.sockets[0].getsockname()[1]
    with contextlib.suppress(Exception):
        await server.stop()


@pytest.mark.anyio
async def test_non_numeric_content_length(server_port):
    out = await _raw(
        server_port,
        b"POST /items/ HTTP/1.1\r\nHost: x\r\nContent-Length: abc\r\n\r\n",
    )
    assert b"400" in out.split(b"\r\n")[0]


@pytest.mark.anyio
async def test_negative_content_length(server_port):
    out = await _raw(
        server_port,
        b"POST /items/ HTTP/1.1\r\nHost: x\r\nContent-Length: -5\r\n\r\n",
    )
    assert b"400" in out.split(b"\r\n")[0]


@pytest.mark.anyio
async def test_oversized_content_length(server_port):
    out = await _raw(
        server_port,
        b"POST /items/ HTTP/1.1\r\nHost: x\r\n"
        b"Content-Length: 99999999999\r\n\r\n",
    )
    assert b"413" in out.split(b"\r\n")[0]


@pytest.mark.anyio
async def test_huge_chunk_size(server_port):
    out = await _raw(
        server_port,
        b"POST /items/ HTTP/1.1\r\nHost: x\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"FFFFFFFFFFFF\r\n",
    )
    status = out.split(b"\r\n")[0]
    assert b"413" in status or b"400" in status


@pytest.mark.anyio
async def test_garbage_chunk_size(server_port):
    out = await _raw(
        server_port,
        b"POST /items/ HTTP/1.1\r\nHost: x\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"zzz\r\n",
    )
    assert b"400" in out.split(b"\r\n")[0]


@pytest.mark.anyio
@pytest.mark.parametrize("token", [b"+5", b"0x5", b"5_0", b""])
async def test_non_rfc_chunk_size_forms_rejected(server_port, token):
    """RFC 9112 chunk sizes are 1*HEXDIG ONLY: int(x, 16)-isms like
    '+5'/'0x5'/'5_0' are the proxy-desync class Content-Length is already
    hardened against (self-review r3)."""
    out = await _raw(
        server_port,
        b"POST /items/ HTTP/1.1\r\nHost: x\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        + token + b"\r\nhello\r\n0\r\n\r\n",
    )
    assert b"400" in out.split(b"\r\n")[0]


@pytest.mark.anyio
async def test_expect_100_continue_gets_interim_response(server_port):
    """curl sends Expect: 100-continue for bodies >1KB and waits: the
    server must emit the interim 100 before reading the body."""
    reader, writer = await asyncio.open_connection("127.0.0.1", server_port)
    try:
        writer.write(
            b"POST /items/ HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Expect: 100-continue\r\nContent-Length: 8\r\n\r\n"
        )
        await writer.drain()
        interim = await asyncio.wait_for(reader.readuntil(b"\r\n\r\n"), 10)
        assert interim.startswith(b"HTTP/1.1 100")
        writer.write(b'{"a": 1}')
        await writer.drain()
        final = await asyncio.wait_for(reader.read(512), 10)
        assert b"201" in final.split(b"\r\n")[0]
    finally:
        writer.close()
        with contextlib.suppress(Exception):
            await writer.wait_closed()


@pytest.mark.anyio
async def test_204_keeps_the_connection_alive(server_port):
    """204 is self-delimiting (RFC 9110): no forced connection: close —
    a second request must succeed on the SAME connection."""
    reader, writer = await asyncio.open_connection("127.0.0.1", server_port)
    try:
        writer.write(b"GET /no-content HTTP/1.1\r\nHost: x\r\n\r\n")
        await writer.drain()
        head = await asyncio.wait_for(reader.readuntil(b"\r\n\r\n"), 10)
        assert head.startswith(b"HTTP/1.1 204")
        assert b"connection: close" not in head.lower()
        writer.write(b"GET /items/ HTTP/1.1\r\nHost: x\r\n\r\n")
        await writer.drain()
        second = await asyncio.wait_for(reader.read(512), 10)
        assert b"200" in second.split(b"\r\n")[0]
    finally:
        writer.close()
        with contextlib.suppress(Exception):
            await writer.wait_closed()


@pytest.mark.anyio
async def test_programmatic_stop_without_signals_returns_cleanly():
    """The no-signal-handler branch (worker threads / Windows): stop()
    must make serve_forever() RETURN, not raise CancelledError."""
    from unittest import mock

    from ics_tpu.web.server import Server

    server = Server(make_app(), host="127.0.0.1", port=0)
    loop = asyncio.get_running_loop()
    with mock.patch.object(
        type(loop), "add_signal_handler",
        side_effect=NotImplementedError,
    ):
        task = asyncio.ensure_future(server.serve_forever())
        await asyncio.sleep(0.2)  # server is up, waiting in the else branch
        await server.stop()
        await asyncio.wait_for(task, 10)  # returns; CancelledError = fail
        assert task.exception() is None
