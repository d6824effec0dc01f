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
