"""PG-wire SQL endpoint (SURVEY Q2) — PostgreSQL v3 wire protocol over the
Spark engine.

Re-expresses the reference's interactive workspace SQL surface
(src/pgwire_server.py:64-657): a psql/JDBC/any-PG-driver client connects
with user = workspace, database = project, authenticates with the
workspace credential (or a project API key), and queries the project's
tables under the same ``{bucket}_{table}`` names the reference ATTACHes —
here they are Spark temp views registered by
``engine.register_project_views`` and executed by ``engine.execute_query``
(row cap + statement timeout enforced engine-side).

Protocol subset (the part every driver's simple-query path uses):
  * SSLRequest → 'N' (plaintext), GSSENCRequest → 'N'
  * StartupMessage (proto 3.0) → AuthenticationCleartextPassword →
    PasswordMessage → AuthenticationOk + ParameterStatus + BackendKeyData +
    ReadyForQuery
  * Simple Query 'Q' → RowDescription / DataRow* / CommandComplete /
    ReadyForQuery (all values text-format, like the reference's stringified
    ExecuteQuery marshaling)
  * ErrorResponse on failure, then ReadyForQuery (session survives errors)
  * Terminate 'X'

Connection limit + live-session registry mirror the reference's
``max_connections`` and session tracking. Extended-protocol messages
(Parse/Bind/Execute) are answered with ErrorResponse asking for simple
mode — psycopg2/psql use simple mode for plain queries.
"""

from __future__ import annotations

import socket
import struct
import threading
import uuid


def _msg(type_byte: bytes, payload: bytes) -> bytes:
    return type_byte + struct.pack("!I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


class PgWireServer:
    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0,
                 max_connections: int = 20, query_timeout: float = 300.0,
                 max_rows: int = 10_000) -> None:
        self.engine = engine
        self.host = host
        self._requested_port = port
        self.max_connections = max_connections
        self.query_timeout = query_timeout
        self.max_rows = max_rows
        self.sessions: dict[str, dict] = {}
        self._lock = threading.Lock()
        self._sock: socket.socket | None = None
        self._accept_thread: threading.Thread | None = None
        self._running = False

    # ---------------------------------------------------------- lifecycle
    @property
    def port(self) -> int:
        assert self._sock is not None, "server not started"
        return self._sock.getsockname()[1]

    def start(self) -> None:
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._sock.bind((self.host, self._requested_port))
        self._sock.listen(16)
        self._running = True
        self._accept_thread = threading.Thread(target=self._accept_loop,
                                               daemon=True)
        self._accept_thread.start()

    def stop(self) -> None:
        self._running = False
        if self._sock:
            try:
                self._sock.close()
            except OSError:
                pass
        with self._lock:
            self.sessions.clear()

    def _accept_loop(self) -> None:
        while self._running:
            try:
                conn, addr = self._sock.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn, addr),
                             daemon=True).start()

    # ------------------------------------------------------------ protocol
    @staticmethod
    def _recv_exact(conn: socket.socket, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = conn.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("client closed")
            buf += chunk
        return buf

    def _error(self, conn: socket.socket, code: str, message: str,
               severity: str = "ERROR") -> None:
        fields = (b"S" + _cstr(severity) + b"C" + _cstr(code)
                  + b"M" + _cstr(message) + b"\x00")
        conn.sendall(_msg(b"E", fields))

    def _ready(self, conn: socket.socket) -> None:
        conn.sendall(_msg(b"Z", b"I"))

    def _serve(self, conn: socket.socket, addr) -> None:
        session_id = uuid.uuid4().hex[:12]
        try:
            # refuse before the handshake so the client's first read is the
            # FATAL 53300 (reference enforces max_connections at accept)
            with self._lock:
                over = len(self.sessions) >= self.max_connections
                if not over:
                    self.sessions[session_id] = {
                        "user": None, "project": None, "addr": addr[0],
                        "queries": 0}
            if over:
                self._error(conn, "53300", "too many connections",
                            severity="FATAL")
                return
            params = self._handshake(conn)
            if params is None:
                with self._lock:
                    self.sessions.pop(session_id, None)
                return
            user = params.get("user", "")
            project = params.get("database", user)
            with self._lock:
                self.sessions[session_id].update(user=user, project=project)
            try:
                self._query_loop(conn, session_id, project)
            finally:
                with self._lock:
                    self.sessions.pop(session_id, None)
        except (ConnectionError, OSError):
            pass
        finally:
            try:
                conn.close()
            except OSError:
                pass

    def _handshake(self, conn: socket.socket) -> dict | None:
        """Startup + auth; returns startup params or None if rejected."""
        while True:
            (length,) = struct.unpack("!I", self._recv_exact(conn, 4))
            body = self._recv_exact(conn, length - 4)
            (code,) = struct.unpack("!I", body[:4])
            if code == 80877103 or code == 80877104:   # SSL / GSSENC probe
                conn.sendall(b"N")
                continue
            if code == 80877102:                       # CancelRequest
                return None
            if code != 196608:                         # protocol 3.0
                self._error(conn, "0A000",
                            f"unsupported protocol {code >> 16}.{code & 0xffff}",
                            severity="FATAL")
                return None
            parts = body[4:].split(b"\x00")
            params = {parts[i].decode(): parts[i + 1].decode()
                      for i in range(0, len(parts) - 1, 2) if parts[i]}
            break
        # cleartext password auth (reference: workspace credential check)
        conn.sendall(_msg(b"R", struct.pack("!I", 3)))
        t = self._recv_exact(conn, 1)
        (length,) = struct.unpack("!I", self._recv_exact(conn, 4))
        body = self._recv_exact(conn, length - 4)
        if t != b"p":
            self._error(conn, "08P01", "expected PasswordMessage",
                        severity="FATAL")
            return None
        password = body.rstrip(b"\x00").decode()
        user = params.get("user", "")
        ok = (self.engine.verify_workspace_password(user, password)
              or self.engine.verify_api_key(password) is not None)
        if not ok:
            self._error(conn, "28P01",
                        f'password authentication failed for user "{user}"',
                        severity="FATAL")
            return None
        conn.sendall(_msg(b"R", struct.pack("!I", 0)))       # AuthenticationOk
        for k, v in (("server_version", "15.0 (spark-storage)"),
                     ("client_encoding", "UTF8"),
                     ("server_encoding", "UTF8"),
                     ("DateStyle", "ISO")):
            conn.sendall(_msg(b"S", _cstr(k) + _cstr(v)))
        conn.sendall(_msg(b"K", struct.pack("!II", 0, 0)))   # BackendKeyData
        self._ready(conn)
        return params

    def _query_loop(self, conn: socket.socket, session_id: str,
                    project: str) -> None:
        while True:
            t = self._recv_exact(conn, 1)
            (length,) = struct.unpack("!I", self._recv_exact(conn, 4))
            body = self._recv_exact(conn, length - 4)
            if t == b"X":                                    # Terminate
                return
            if t != b"Q":
                self._error(conn, "0A000",
                            "extended protocol not supported; "
                            "use simple query mode")
                self._ready(conn)
                continue
            sql = body.rstrip(b"\x00").decode()
            with self._lock:
                if session_id in self.sessions:
                    self.sessions[session_id]["queries"] += 1
            if not sql.strip():
                conn.sendall(_msg(b"I", b""))                # EmptyQuery
                self._ready(conn)
                continue
            try:
                rows = self.engine.execute_query(
                    project, sql, stringify=True,
                    timeout_seconds=self.query_timeout,
                    max_rows=self.max_rows)
            except Exception as e:  # surfaced to the client, session lives
                self._error(conn, "42601", str(e)[:500])
                self._ready(conn)
                continue
            cols = list(rows[0].keys()) if rows else []
            # RowDescription: every column as text (oid 25) — the
            # reference stringifies all ExecuteQuery values the same way
            desc = struct.pack("!H", len(cols))
            for c in cols:
                desc += (_cstr(c)
                         + struct.pack("!IHIhih", 0, 0, 25, -1, -1, 0))
            conn.sendall(_msg(b"T", desc))
            for r in rows:
                payload = struct.pack("!H", len(cols))
                for c in cols:
                    v = r[c]
                    if v is None:
                        payload += struct.pack("!i", -1)
                    else:
                        b = str(v).encode()
                        payload += struct.pack("!i", len(b)) + b
                conn.sendall(_msg(b"D", payload))
            conn.sendall(_msg(b"C", _cstr(f"SELECT {len(rows)}")))
            self._ready(conn)
