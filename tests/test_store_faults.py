"""Fault injection for the Redis (RESP2) backend: dropped connections
mid-stream must reconnect with the reference's retry discipline
(/root/reference/circuits/input/mod.rs:60-78) and replay the command.
The reference has no fault-injection tests at all (SURVEY.md §5); this
exercises the path hermetically against an in-process RESP2 server."""

import socket
import threading

import pytest

from vectorx_tpu.io.store import JustificationStore, RespBackend


class FlakyRedis:
    """In-process RESP2 server storing keys in a dict.  Drops the client
    connection (mid-session) after every `drop_every` commands."""

    def __init__(self, drop_every=0):
        self.data = {}
        self.drop_every = drop_every
        self.commands = 0
        self.accepts = 0
        self.srv = socket.socket()
        self.srv.bind(("127.0.0.1", 0))
        self.srv.listen(4)
        self.port = self.srv.getsockname()[1]
        self.alive = True
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        while self.alive:
            try:
                conn, _ = self.srv.accept()
            except OSError:
                return
            self.accepts += 1
            threading.Thread(target=self._client, args=(conn,),
                             daemon=True).start()

    def _client(self, conn):
        buf = b""
        while True:
            try:
                chunk = conn.recv(4096)
            except OSError:
                return
            if not chunk:
                conn.close()
                return
            buf += chunk
            while True:
                parts, rest = self._parse(buf)
                if parts is None:
                    break
                buf = rest
                self.commands += 1
                if self.drop_every and self.commands % self.drop_every == 0:
                    conn.close()     # injected fault: drop mid-session
                    return
                conn.sendall(self._exec(parts))

    @staticmethod
    def _parse(buf):
        if not buf.startswith(b"*") or b"\r\n" not in buf:
            return None, buf
        head, rest = buf.split(b"\r\n", 1)
        n = int(head[1:])
        parts = []
        for _ in range(n):
            if not rest.startswith(b"$") or b"\r\n" not in rest:
                return None, buf
            lhead, rest = rest.split(b"\r\n", 1)
            ln = int(lhead[1:])
            if len(rest) < ln + 2:
                return None, buf
            parts.append(rest[:ln].decode())
            rest = rest[ln + 2:]
        return parts, rest

    def _exec(self, parts):
        cmd = parts[0].upper()
        if cmd == "SET":
            self.data[parts[1]] = parts[2]
            return b"+OK\r\n"
        if cmd == "GET":
            v = self.data.get(parts[1])
            if v is None:
                return b"$-1\r\n"
            return f"${len(v)}\r\n{v}\r\n".encode()
        if cmd == "ZADD":
            self.data.setdefault(parts[1], []).append(
                (float(parts[2]), parts[3]))
            return b":1\r\n"
        if cmd == "ZRANGEBYSCORE":
            zs = self.data.get(parts[1], [])
            lo, hi = float(parts[2]), float(parts[3])
            hits = [m for s, m in sorted(zs) if lo <= s <= hi]
            out = f"*{len(hits)}\r\n".encode()
            for m in hits:
                out += f"${len(m)}\r\n{m}\r\n".encode()
            return out
        return b"-ERR unknown\r\n"

    def close(self):
        self.alive = False
        self.srv.close()


@pytest.fixture
def flaky():
    servers = []

    def make(drop_every=0):
        s = FlakyRedis(drop_every=drop_every)
        servers.append(s)
        return s

    yield make
    for s in servers:
        s.close()


def _backend(server):
    b = RespBackend.__new__(RespBackend)
    b.host, b.port, b.timeout = "127.0.0.1", server.port, 2.0
    b.sock, b.buf = None, b""
    RespBackend.RECONNECT_DELAY_S = 0.0
    b._connect()
    return b


def test_roundtrip_against_real_resp2(flaky):
    srv = flaky()
    b = _backend(srv)
    b.set("k", "v1")
    assert b.get("k") == "v1"
    assert b.get("missing") is None
    b.zadd("z", 3, "c")
    b.zadd("z", 1, "a")
    assert b.zrangebyscore("z", 0, 5) == ["a", "c"]


def test_dropped_connection_reconnects_and_replays(flaky):
    srv = flaky(drop_every=3)
    b = _backend(srv)
    # every 3rd command drops the socket mid-session; all ops still succeed
    for i in range(10):
        b.set(f"k{i}", f"v{i}")
    for i in range(10):
        assert b.get(f"k{i}") == f"v{i}"
    assert srv.accepts >= 3          # reconnects actually happened


def test_justification_store_survives_faults(flaky):
    from vectorx_tpu.io.store import StoredJustificationData

    srv = flaky(drop_every=4)
    store = JustificationStore(backend=_backend(srv))
    for bn in (5, 6, 9):
        store.add_justification("avail", StoredJustificationData(
            block_number=bn, signed_message=b"\x01".hex(),
            pubkeys=[], signatures=[], validator_signed=[],
            num_authorities=0, authority_set_id=1))
    got = store.get_justification("avail", 6)
    assert got.block_number == 6
    assert store.get_blocks_in_range("avail", 5, 9) == [5, 6, 9]


def test_connect_failure_raises_after_retries():
    RespBackend.RECONNECT_DELAY_S = 0.0
    with pytest.raises(ConnectionError, match="after 3 attempts"):
        RespBackend("127.0.0.1", 1)      # port 1: nothing listens