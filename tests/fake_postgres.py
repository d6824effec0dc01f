"""In-process fake PostgreSQL server for hermetic dialect tests.

Speaks the real frontend/backend protocol v3 (startup, SCRAM-SHA-256 auth,
extended query Parse/Bind/Describe/Execute/Sync) over a localhost socket and
executes the statements against an in-memory sqlite database ($N params
translated back to ?). This exercises ics_tpu.db.pg_wire byte-for-byte —
framing, auth, parameter binding, OID decoding, error mapping — without a
postgres install (none exists in this image).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import os
import re
import socket
import sqlite3
import struct
import threading

USER = "ics"
PASSWORD = "segredo"
_ITERATIONS = 4096


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class FakePostgres:
    def __init__(self):
        self.db = sqlite3.connect(":memory:", check_same_thread=False)
        self.db.isolation_level = None  # explicit BEGIN/COMMIT only
        self.db.row_factory = sqlite3.Row
        self._db_lock = threading.Lock()
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(8)
        self.port = self._sock.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        self.auth_attempts = 0

    def close(self):
        self._stop = True
        try:
            self._sock.close()
        except OSError:
            pass

    # -- protocol helpers ------------------------------------------------
    @staticmethod
    def _send(conn, type_byte: bytes, payload: bytes):
        conn.sendall(type_byte + struct.pack("!I", len(payload) + 4) + payload)

    @staticmethod
    def _recv_exact(conn, n: int, buf: bytearray) -> bytes:
        while len(buf) < n:
            chunk = conn.recv(65536)
            if not chunk:
                raise ConnectionError("client gone")
            buf.extend(chunk)
        out = bytes(buf[:n])
        del buf[:n]
        return out

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self._sock.accept()
            except OSError:
                return
            threading.Thread(
                target=self._handle, args=(conn,), daemon=True
            ).start()

    # -- connection ---------------------------------------------------------
    def _handle(self, conn: socket.socket):
        buf = bytearray()
        try:
            self._startup(conn, buf)
            self._query_loop(conn, buf)
        except ConnectionError:
            pass
        finally:
            conn.close()

    def _startup(self, conn, buf):
        (length,) = struct.unpack("!I", self._recv_exact(conn, 4, buf))
        payload = self._recv_exact(conn, length - 4, buf)
        (proto,) = struct.unpack("!I", payload[:4])
        assert proto == 196608, f"unexpected protocol {proto}"
        self.auth_attempts += 1

        # SASL SCRAM-SHA-256 handshake (what postgres >= 10 defaults to)
        self._send(conn, b"R", struct.pack("!I", 10) + _cstr("SCRAM-SHA-256"))
        type_byte, body = self._recv_message(conn, buf)
        assert type_byte == b"p"
        mech_end = body.index(b"\x00")
        assert body[:mech_end] == b"SCRAM-SHA-256"
        (first_len,) = struct.unpack("!I", body[mech_end + 1:mech_end + 5])
        client_first = body[mech_end + 5:mech_end + 5 + first_len].decode()
        client_first_bare = client_first.split(",", 2)[2]
        client_nonce = dict(
            kv.split("=", 1) for kv in client_first_bare.split(",")
        )["r"]

        salt = os.urandom(16)
        server_nonce = client_nonce + base64.b64encode(os.urandom(9)).decode()
        server_first = (
            f"r={server_nonce},s={base64.b64encode(salt).decode()},"
            f"i={_ITERATIONS}"
        )
        self._send(
            conn, b"R", struct.pack("!I", 11) + server_first.encode()
        )

        type_byte, body = self._recv_message(conn, buf)
        assert type_byte == b"p"
        client_final = body.decode()
        attrs = dict(kv.split("=", 1) for kv in client_final.split(","))
        proof = base64.b64decode(attrs["p"])
        without_proof = client_final.rsplit(",p=", 1)[0]
        auth_message = (
            client_first_bare + "," + server_first + "," + without_proof
        ).encode()

        salted = hashlib.pbkdf2_hmac(
            "sha256", PASSWORD.encode(), salt, _ITERATIONS
        )
        client_key = hmac.new(salted, b"Client Key", hashlib.sha256).digest()
        stored_key = hashlib.sha256(client_key).digest()
        signature = hmac.new(stored_key, auth_message, hashlib.sha256).digest()
        expected_key = bytes(a ^ b for a, b in zip(proof, signature))
        if hashlib.sha256(expected_key).digest() != stored_key:
            self._send_error(conn, "28P01", "password authentication failed")
            raise ConnectionError("bad password")
        server_key = hmac.new(salted, b"Server Key", hashlib.sha256).digest()
        server_sig = hmac.new(server_key, auth_message, hashlib.sha256).digest()
        final = f"v={base64.b64encode(server_sig).decode()}"
        self._send(conn, b"R", struct.pack("!I", 12) + final.encode())
        self._send(conn, b"R", struct.pack("!I", 0))  # AuthenticationOk
        self._send(conn, b"S", _cstr("server_version") + _cstr("15.0-fake"))
        self._send(conn, b"Z", b"I")

    @classmethod
    def _recv_message(cls, conn, buf):
        header = cls._recv_exact(conn, 5, buf)
        (length,) = struct.unpack("!I", header[1:5])
        return header[:1], cls._recv_exact(conn, length - 4, buf)

    def _send_error(self, conn, code: str, message: str):
        payload = (
            b"S" + _cstr("ERROR") + b"C" + _cstr(code)
            + b"M" + _cstr(message) + b"\x00"
        )
        self._send(conn, b"E", payload)

    # -- extended query protocol ------------------------------------------
    def _query_loop(self, conn, buf):
        in_tx = False
        sql = ""
        params: list = []
        failed = False
        aborted = False  # error inside a tx: stays aborted until COMMIT/ROLLBACK
        while True:
            type_byte, body = self._recv_message(conn, buf)
            if type_byte == b"X":
                return
            if type_byte == b"P":  # Parse
                off = body.index(b"\x00") + 1  # unnamed statement
                end = body.index(b"\x00", off)
                sql = body[off:end].decode()
                self._send(conn, b"1", b"")
            elif type_byte == b"B":  # Bind
                off = body.index(b"\x00") + 1
                off = body.index(b"\x00", off) + 1
                (n_fmt,) = struct.unpack("!H", body[off:off + 2])
                off += 2 + 2 * n_fmt
                (n_params,) = struct.unpack("!H", body[off:off + 2])
                off += 2
                params = []
                for _ in range(n_params):
                    (plen,) = struct.unpack("!i", body[off:off + 4])
                    off += 4
                    if plen == -1:
                        params.append(None)
                    else:
                        params.append(body[off:off + plen].decode())
                        off += plen
                self._send(conn, b"2", b"")
            elif type_byte == b"D":  # Describe — deferred to Execute
                pass
            elif type_byte == b"E":  # Execute
                failed, in_tx, aborted = self._run(
                    conn, sql, params, in_tx, aborted
                )
            elif type_byte == b"S":  # Sync
                self._send(
                    conn, b"Z",
                    b"E" if (failed or aborted)
                    else (b"T" if in_tx else b"I"),
                )
                failed = False

    @staticmethod
    def _tag_for(upper: str, rowcount: int) -> str:
        """Real postgres CommandComplete tags (review r4: the fake said
        'OK', hiding the COMMIT-in-aborted-tx -> ROLLBACK conversion the
        adapter must detect)."""
        verb = upper.split(None, 1)[0] if upper else ""
        if verb == "INSERT":
            return f"INSERT 0 {max(rowcount, 0)}"
        if verb in ("UPDATE", "DELETE"):
            return f"{verb} {max(rowcount, 0)}"
        if verb in ("CREATE", "DROP", "ALTER"):
            parts = upper.split()
            return " ".join(parts[:2]) if len(parts) > 1 else verb
        return verb or "OK"

    def _run(self, conn, sql: str, params: list, in_tx: bool,
             aborted: bool = False):
        stmt = re.sub(r"\$\d+", "?", sql)
        upper = stmt.strip().upper()
        if upper.startswith("BEGIN"):
            in_tx = True
            with self._db_lock:
                try:
                    self.db.execute("BEGIN")
                except sqlite3.Error:
                    pass  # a tx is already open on the shared handle
            self._send(conn, b"n", b"")
            self._send(conn, b"C", _cstr("BEGIN"))
            return False, in_tx, aborted
        if upper.startswith(("COMMIT", "ROLLBACK")):
            # real postgres: COMMIT inside an aborted tx becomes ROLLBACK
            # and reports SUCCESS via the tag
            rolled = aborted or upper.startswith("ROLLBACK")
            with self._db_lock:
                try:
                    self.db.execute("ROLLBACK" if rolled else "COMMIT")
                except sqlite3.Error:
                    pass  # no underlying sqlite tx open
            self._send(conn, b"n", b"")
            self._send(conn, b"C", _cstr("ROLLBACK" if rolled else "COMMIT"))
            return False, False, False
        if in_tx and aborted:
            self._send_error(
                conn, "25P02",
                "current transaction is aborted, commands ignored until "
                "end of transaction block",
            )
            return True, in_tx, True
        # emulate the introspection views the dialect uses
        if "FROM pg_tables" in stmt:
            with self._db_lock:
                rows = self.db.execute(
                    "SELECT name FROM sqlite_master WHERE type='table'"
                ).fetchall()
            self._send_rows(conn, ["name"], [[r["name"]] for r in rows])
            self._send(conn, b"C", _cstr("SELECT 1"))
            return False, in_tx, aborted
        if "information_schema.columns" in stmt:
            table = re.search(r"table_name = '(\w+)'", stmt).group(1)
            with self._db_lock:
                rows = self.db.execute(f"PRAGMA table_info({table})").fetchall()
            self._send_rows(
                conn, ["column_name"], [[r["name"]] for r in rows]
            )
            self._send(conn, b"C", _cstr("SELECT 1"))
            return False, in_tx, aborted
        if upper.startswith("DROP TABLE"):
            stmt = stmt.replace(" CASCADE", "")  # sqlite has no DROP CASCADE
        try:
            with self._db_lock:
                cur = self.db.execute(stmt, params)
                rows = cur.fetchall() if cur.description else []
                cols = (
                    [d[0] for d in cur.description] if cur.description else []
                )
                rowcount = cur.rowcount
        except sqlite3.IntegrityError as exc:
            self._send_error(conn, "23505", str(exc))
            return True, in_tx, in_tx or aborted
        except sqlite3.Error as exc:
            self._send_error(conn, "42601", str(exc))
            return True, in_tx, in_tx or aborted
        if cols:
            self._send_rows(conn, cols, [list(r) for r in rows])
        else:
            self._send(conn, b"n", b"")  # NoData
        self._send(
            conn, b"C",
            _cstr(f"SELECT {len(rows)}" if cols
                  else self._tag_for(upper, rowcount)),
        )
        return False, in_tx, aborted

    def _send_rows(self, conn, cols, rows):
        # RowDescription with OIDs sniffed from the first row's python types
        def oid_for(col_idx: int) -> int:
            for row in rows:
                v = row[col_idx]
                if v is None:
                    continue
                if isinstance(v, bool):
                    return 16
                if isinstance(v, int):
                    return 20
                if isinstance(v, float):
                    return 701
                return 25
            return 25

        desc = struct.pack("!H", len(cols))
        for i, name in enumerate(cols):
            desc += _cstr(name)
            desc += struct.pack("!IHIhih", 0, 0, oid_for(i), -1, -1, 0)
        self._send(conn, b"T", desc)
        for row in rows:
            payload = struct.pack("!H", len(row))
            for v in row:
                if v is None:
                    payload += struct.pack("!i", -1)
                else:
                    if isinstance(v, bool):
                        raw = b"t" if v else b"f"
                    elif isinstance(v, float):
                        raw = repr(v).encode()
                    elif isinstance(v, bytes):
                        raw = v
                    else:
                        raw = str(v).encode()
                    payload += struct.pack("!i", len(raw)) + raw
            self._send(conn, b"D", payload)
