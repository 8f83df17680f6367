"""Loopback tests for the live block-feed edge (sources/ws.py +
sources/livefeed.py): a fake Tendermint WebSocket endpoint implemented
server-side from the same public RFC 6455 spec, driven over 127.0.0.1.

Covers (round-4 verdict task 1): handshake accept/reject, masked-frame
round-trip, fragmentation reassembly, ping->pong, close handshake,
16-/64-bit length frames, retry backoff counts, circuit-breaker abort,
queue backpressure, gap reconciliation, the reconnect supervisor with a
kill-the-server-mid-stream recovery, the HTTP JSON-RPC fetcher, and an
e2e run_live_session -> landing parquet -> Spark read. The frame codec
also gets a hypothesis property test (payload x fragmentation x length
boundary), per verdict task 7. wss:// runs against a loopback TLS
endpoint with a self-signed SAN-IP cert — full certificate + hostname
verification on the trust path, and a rejection test proving the
client never silently downgrades verification.
"""

from __future__ import annotations

import base64
import hashlib
import http.server
import json
import socket
import struct
import threading
import time
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from extract_transform_load_spark.sources.livefeed import (
    bronze_rows_from_block_results,
    http_block_fetcher,
    iter_heights,
    land_block,
    landing_heights,
    missing_heights,
    reconcile_gaps,
    run_live_session,
    run_supervised,
    subscribe,
)
from extract_transform_load_spark.sources.ws import (
    OP_CLOSE,
    OP_CONT,
    OP_PING,
    OP_PONG,
    OP_TEXT,
    CircuitBreaker,
    WSClient,
    WSClosed,
    WSError,
    _mask,
    with_retry,
)

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"


# -- server-side RFC 6455, written independently against the spec --------


class ServerConn:
    """One accepted WebSocket connection, server role (frames unmasked
    out, masked frames unmasked in)."""

    def __init__(self, sock: socket.socket) -> None:
        self.sock = sock
        self.sock.settimeout(15)
        self.buf = b""
        self.pongs: list[bytes] = []
        self.pings: list[bytes] = []

    def _read_until(self, delim: bytes) -> bytes:
        while delim not in self.buf:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("EOF")
            self.buf += chunk
        head, self.buf = self.buf.split(delim, 1)
        return head

    def _read_exact(self, n: int) -> bytes:
        while len(self.buf) < n:
            chunk = self.sock.recv(4096)
            if not chunk:
                raise ConnectionError("EOF")
            self.buf += chunk
        out, self.buf = self.buf[:n], self.buf[n:]
        return out

    def handshake(self, mode: str = "accept") -> None:
        head = self._read_until(b"\r\n\r\n")
        key = None
        for line in head.split(b"\r\n"):
            name, _, val = line.partition(b":")
            if name.strip().lower() == b"sec-websocket-key":
                key = val.strip().decode()
        assert key, "client sent no Sec-WebSocket-Key"
        if mode == "reject":
            self.sock.sendall(b"HTTP/1.1 403 Forbidden\r\n\r\n")
            return
        accept = base64.b64encode(hashlib.sha1((key + _GUID).encode()).digest()).decode()
        if mode == "bad-accept":
            accept = ("B" if accept[0] != "B" else "C") + accept[1:]
        self.sock.sendall(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {accept}\r\n\r\n"
            ).encode()
        )

    def recv_frame(self) -> tuple[bool, int, bytes]:
        b0, b1 = self._read_exact(2)
        fin, opcode = bool(b0 & 0x80), b0 & 0x0F
        masked, n = bool(b1 & 0x80), b1 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", self._read_exact(2))
        elif n == 127:
            (n,) = struct.unpack(">Q", self._read_exact(8))
        key = self._read_exact(4) if masked else b""
        payload = self._read_exact(n)
        if masked:
            payload = bytes(c ^ key[i % 4] for i, c in enumerate(payload))
        return fin, opcode, payload

    def recv_message(self) -> tuple[int, bytes]:
        """Next data/close message; answers pings, records pongs."""
        parts: list[bytes] = []
        first_op = None
        while True:
            fin, op, payload = self.recv_frame()
            if op == OP_PING:
                self.pings.append(payload)
                self.send_frame(OP_PONG, payload)
                continue
            if op == OP_PONG:
                self.pongs.append(payload)
                continue
            if op == OP_CLOSE:
                return OP_CLOSE, payload
            if op != OP_CONT:
                first_op = op
            parts.append(payload)
            if fin:
                return first_op, b"".join(parts)

    def send_frame(self, opcode: int, payload: bytes, fin: bool = True) -> None:
        head = bytes([(0x80 if fin else 0) | opcode])
        n = len(payload)
        if n < 126:
            head += bytes([n])
        elif n < 1 << 16:
            head += bytes([126]) + struct.pack(">H", n)
        else:
            head += bytes([127]) + struct.pack(">Q", n)
        self.sock.sendall(head + payload)

    def send_text(self, text: str | bytes, fragments: int = 1) -> None:
        data = text.encode() if isinstance(text, str) else text
        if fragments <= 1:
            self.send_frame(OP_TEXT, data)
            return
        step = max(1, len(data) // fragments)
        chunks = [data[i : i + step] for i in range(0, len(data), step)] or [b""]
        self.send_frame(OP_TEXT, chunks[0], fin=len(chunks) == 1)
        for i, ch in enumerate(chunks[1:], start=2):
            self.send_frame(OP_CONT, ch, fin=i == len(chunks))

    def send_close(self, code: int = 1000) -> None:
        self.send_frame(OP_CLOSE, struct.pack(">H", code))

    def drain_until_close(self) -> None:
        try:
            while True:
                op, _ = self.recv_message()
                if op == OP_CLOSE:
                    return
        except (ConnectionError, OSError):
            return


class FakeServer:
    """Loopback WS endpoint running one handler per accepted connection."""

    def __init__(self, handlers, handshake: str = "accept", tls=None) -> None:
        self.handlers = list(handlers)
        self.handshake = handshake
        self.tls = tls
        self.errors: list[BaseException] = []
        self.conns: list[ServerConn] = []
        self.lsock = socket.socket()
        self.lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.lsock.bind(("127.0.0.1", 0))
        self.lsock.listen(len(self.handlers) + 1)
        self.lsock.settimeout(30)
        self.port = self.lsock.getsockname()[1]
        self.thread = threading.Thread(target=self._run, daemon=True)
        self.thread.start()

    @property
    def url(self) -> str:
        return f"ws://127.0.0.1:{self.port}/websocket"

    def _run(self) -> None:
        try:
            for handler in self.handlers:
                sock, _ = self.lsock.accept()
                if self.tls is not None:
                    try:
                        sock = self.tls.wrap_socket(sock, server_side=True)
                    except BaseException:
                        # client aborted the TLS handshake (e.g. an
                        # untrusted-cert test) — nothing to serve
                        sock.close()
                        continue
                conn = ServerConn(sock)
                self.conns.append(conn)
                try:
                    conn.handshake(self.handshake)
                    if self.handshake == "accept":
                        handler(conn)
                except BaseException as exc:  # surfaced by .finish()
                    self.errors.append(exc)
                finally:
                    sock.close()
        except BaseException as exc:
            self.errors.append(exc)
        finally:
            self.lsock.close()

    def finish(self) -> None:
        self.thread.join(timeout=30)
        assert not self.thread.is_alive(), "fake server wedged"
        if self.errors:
            raise AssertionError(f"server-side failures: {self.errors!r}")


def new_block_msg(height: int) -> str:
    return json.dumps(
        {
            "jsonrpc": "2.0",
            "id": 1,
            "result": {
                "query": "tm.event='NewBlock'",
                "data": {
                    "type": "tendermint/event/NewBlock",
                    "value": {"block": {"header": {"height": str(height)}}},
                },
            },
        }
    )


def ack_subscribe(conn: ServerConn) -> None:
    op, payload = conn.recv_message()
    assert op == OP_TEXT
    req = json.loads(payload.decode())
    assert req["method"] == "subscribe"
    assert req["params"]["query"] == "tm.event='NewBlock'"
    conn.send_text(json.dumps({"jsonrpc": "2.0", "id": req["id"], "result": {}}))


def tendermint_session(heights, close: str = "frame", fragments: int = 1):
    """Standard scripted session: ack subscribe, stream NewBlock events,
    then close (clean frame or abrupt socket kill)."""

    def run(conn: ServerConn) -> None:
        ack_subscribe(conn)
        for h in heights:
            conn.send_text(new_block_msg(h), fragments=fragments)
        if close == "frame":
            conn.send_close()
            conn.drain_until_close()
        # close == "abrupt": just return; FakeServer closes the socket

    return run


def fake_rows(height: int) -> list:
    ts = 1_700_000_000_000_000 + height * 6_000_000
    return [
        (height, f"hash{height}", 0, "wasm-ls-open", ts, {"height": str(height)}),
        (height, f"hash{height}", 1, "wasm-ls-repay", ts, {"k": "v"}),
    ]


# -- ws.py: handshake + frame codec ---------------------------------------


def test_handshake_and_boundary_length_echo():
    """Masked client frames -> server, unmasked server frames -> client,
    at every length-encoding boundary (125/126/65535/65536)."""
    sizes = [0, 1, 125, 126, 65535, 65536]
    received: list[bytes] = []

    def echo(conn: ServerConn) -> None:
        for _ in sizes:
            op, payload = conn.recv_message()
            assert op == OP_TEXT
            received.append(payload)
            conn.send_text(payload)
        op, _ = conn.recv_message()
        assert op == OP_CLOSE

    srv = FakeServer([echo])
    ws = WSClient(srv.url, timeout=15)
    try:
        for n in sizes:
            msg = ("x" * n) if n else ""
            ws.send_text(msg)
            assert ws.recv() == msg
    finally:
        ws.close()
    srv.finish()
    assert [len(p) for p in received] == sizes


def test_handshake_rejected_status():
    srv = FakeServer([lambda conn: None], handshake="reject")
    with pytest.raises(WSError, match="handshake rejected"):
        WSClient(srv.url, timeout=5)
    srv.thread.join(timeout=10)


def test_handshake_bad_accept_key():
    srv = FakeServer([lambda conn: None], handshake="bad-accept")
    with pytest.raises(WSError, match="Accept mismatch"):
        WSClient(srv.url, timeout=5)
    srv.thread.join(timeout=10)


def test_scheme_validation():
    with pytest.raises(WSError, match="unsupported scheme"):
        WSClient("http://127.0.0.1:1/")
    with pytest.raises(WSError, match="host:port"):
        WSClient("ws://:0")


def test_fragmentation_reassembly():
    msg = "fragmented-" * 50

    def frag(conn: ServerConn) -> None:
        ack_subscribe(conn)
        conn.send_text(msg, fragments=7)
        conn.send_close()
        conn.drain_until_close()

    srv = FakeServer([frag])
    ws = WSClient(srv.url, timeout=10)
    try:
        subscribe(ws)
        assert ws.recv() == msg
        with pytest.raises(WSClosed):
            ws.recv()
    finally:
        ws.close()
    srv.finish()


def test_ping_pong_transparent():
    def pinger(conn: ServerConn) -> None:
        ack_subscribe(conn)
        conn.send_frame(OP_PING, b"are-you-there")
        conn.send_text("after-ping")
        # client's pong must arrive (possibly before the next data read)
        op, payload = conn.recv_message()
        assert op == OP_CLOSE
        assert conn.pongs == [b"are-you-there"]

    srv = FakeServer([pinger])
    ws = WSClient(srv.url, timeout=10)
    try:
        subscribe(ws)
        assert ws.recv() == "after-ping"
    finally:
        ws.close()
    srv.finish()


def test_close_handshake_echoes_code():
    def closer(conn: ServerConn) -> None:
        ack_subscribe(conn)
        conn.send_frame(OP_CLOSE, struct.pack(">H", 1001))
        fin, op, payload = conn.recv_frame()
        assert op == OP_CLOSE and payload[:2] == struct.pack(">H", 1001)

    srv = FakeServer([closer])
    ws = WSClient(srv.url, timeout=10)
    subscribe(ws)
    with pytest.raises(WSClosed):
        ws.recv()
    ws.close()
    srv.finish()


def test_unexpected_continuation_raises():
    def bad(conn: ServerConn) -> None:
        conn.send_frame(OP_CONT, b"orphan")
        conn.drain_until_close()

    srv = FakeServer([bad])
    ws = WSClient(srv.url, timeout=10)
    with pytest.raises(WSError, match="unexpected opcode"):
        ws.recv()
    ws.close()
    srv.thread.join(timeout=10)


def test_mask_involution():
    key = b"\x01\x02\x03\x04"
    for payload in (b"", b"a", b"abc", b"abcdefghij" * 100):
        assert _mask(_mask(payload, key), key) == payload


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    payload=st.one_of(
        st.binary(min_size=0, max_size=200),
        st.integers(min_value=120, max_value=130).map(lambda n: b"y" * n),
        st.sampled_from([b"z" * 65534, b"z" * 65535, b"z" * 65536, b"z" * 65540]),
    ),
    fragments=st.integers(min_value=1, max_value=5),
)
def test_frame_codec_property(payload, fragments):
    """Property (verdict task 7): arbitrary payloads x fragmentation
    points x length-encoding boundaries round-trip server->client AND
    client->server over a real socketpair, no listener needed."""
    # latin-1 -> utf-8 maps arbitrary bytes to a valid text payload, so
    # the client's .decode() is exercised on every input
    data = payload.decode("latin-1").encode()
    cli_sock, srv_sock = socket.socketpair()
    try:
        cli = WSClient.__new__(WSClient)  # skip handshake: codec only
        cli._sock = cli_sock
        cli._buf = b""
        cli_sock.settimeout(10)
        srv = ServerConn(srv_sock)

        # sends run in a thread: a 64KB+ payload fills the socketpair
        # buffer and would block until the peer reads
        t = threading.Thread(target=srv.send_text, args=(data, fragments))
        t.start()
        got_cli = cli.recv()
        t.join(timeout=10)
        assert got_cli.encode() == data
        t = threading.Thread(target=cli._send_frame, args=(OP_TEXT, data))
        t.start()
        op, got = srv.recv_message()
        t.join(timeout=10)
        assert op == OP_TEXT and got == data
    finally:
        cli_sock.close()
        srv_sock.close()


# -- ws.py: retry + breaker ------------------------------------------------


def test_with_retry_backoff_schedule(monkeypatch):
    sleeps: list[float] = []
    monkeypatch.setattr(time, "sleep", sleeps.append)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] <= 3:
            raise OSError("boom")
        return "ok"

    assert with_retry(flaky, retries=3, backoff=0.2) == "ok"
    assert calls["n"] == 4
    assert sleeps == [0.2, 0.4, 0.8]  # exponential: backoff * 2**attempt

    calls["n"] = -10  # always failing now
    sleeps.clear()
    with pytest.raises(OSError):
        with_retry(lambda: (_ for _ in ()).throw(OSError("x")), retries=2, backoff=1.0)
    assert sleeps == [1.0, 2.0]  # retries spent, then re-raise


def test_with_retry_non_retryable_propagates():
    with pytest.raises(ValueError):
        with_retry(lambda: (_ for _ in ()).throw(ValueError("no")), retries=5)


def test_circuit_breaker_threshold_and_reset():
    br = CircuitBreaker(threshold=3)
    br.fail(RuntimeError("a"))
    br.fail(RuntimeError("b"))
    br.ok()  # streak resets
    br.fail(RuntimeError("c"))
    br.fail(RuntimeError("d"))
    with pytest.raises(WSError, match="circuit breaker open"):
        br.fail(RuntimeError("e"))


# -- livefeed: subscription + height iteration -----------------------------


def test_subscribe_rejected():
    def reject(conn: ServerConn) -> None:
        op, _ = conn.recv_message()
        conn.send_text(json.dumps({"jsonrpc": "2.0", "id": 1, "error": {"code": -1}}))
        conn.drain_until_close()

    srv = FakeServer([reject])
    ws = WSClient(srv.url, timeout=10)
    with pytest.raises(ConnectionError, match="subscribe rejected"):
        subscribe(ws)
    ws.close()
    srv.thread.join(timeout=10)


def test_iter_heights_skips_noise():
    def noisy(conn: ServerConn) -> None:
        ack_subscribe(conn)
        conn.send_text("not json at all")
        conn.send_text(json.dumps({"jsonrpc": "2.0", "result": {}}))  # heartbeat
        conn.send_text(new_block_msg(7))
        conn.send_text(json.dumps({"result": {"data": {"value": {"other": 1}}}}))
        conn.send_text(new_block_msg(8), fragments=3)
        conn.send_close()
        conn.drain_until_close()

    srv = FakeServer([noisy])
    ws = WSClient(srv.url, timeout=10)
    subscribe(ws)
    assert list(iter_heights(ws)) == [7, 8]
    ws.close()
    srv.finish()


def test_iter_heights_quiet_feed_pings_not_crashes():
    """ADVICE (medium): recv timeout on a quiet-but-healthy feed must
    not crash the session — the client pings and keeps waiting."""

    def quiet(conn: ServerConn) -> None:
        ack_subscribe(conn)
        time.sleep(0.9)  # > 2 client timeouts of 0.4s: forces ping path
        conn.send_text(new_block_msg(42))
        conn.send_close()
        conn.drain_until_close()
        assert conn.pings, "client never pinged during the quiet period"

    srv = FakeServer([quiet])
    ws = WSClient(srv.url, timeout=0.4)
    subscribe(ws)
    assert list(iter_heights(ws)) == [42]
    ws.close()
    srv.finish()


# -- livefeed: landing + session e2e ---------------------------------------


def test_land_block_and_landing_heights(tmp_path):
    land_block(str(tmp_path), 5, fake_rows(5))
    land_block(str(tmp_path), 2, fake_rows(2))
    land_block(str(tmp_path), 5, fake_rows(5))  # replay: second file, same height
    (tmp_path / "compacted_0_10.parquet").touch()  # ignored: not the contract
    (tmp_path / "block_bogus_x.parquet").touch()  # ignored: unparsable height
    assert landing_heights(str(tmp_path)) == [2, 5]


def test_missing_heights_windowing():
    assert missing_heights([1, 2, 5, 7]) == [3, 4, 6]
    assert missing_heights([]) == []
    assert missing_heights([3]) == []
    # scan window bounds the scan to the last N heights, reference's
    # full-at-startup / last-100k-after policy
    assert missing_heights([1, 5, 98, 100], scan_window=5) == [99]
    assert missing_heights([1, 5, 98, 100], scan_window=None) == [2, 3, 4] + list(
        range(6, 98)
    ) + [99]


def test_run_live_session_e2e_landing(tmp_path, spark):
    srv = FakeServer([tendermint_session([1, 2, 3, 4, 5])])
    stats = run_live_session(
        srv.url, fake_rows, str(tmp_path), propagation_delay=0, ws_timeout=10
    )
    srv.finish()
    assert stats.delivered == [1, 2, 3, 4, 5]
    assert stats.skipped == [] and not stats.aborted and stats.error is None
    assert landing_heights(str(tmp_path)) == [1, 2, 3, 4, 5]

    # the landing zone IS the Spark-side contract: plain read + the
    # bronze schema the blockfeed source expects
    df = spark.read.parquet(str(tmp_path))
    assert df.count() == 10  # 2 events per block
    assert [f.name for f in df.schema.fields] == [
        "block",
        "tx_hash",
        "event_index",
        "event_type",
        "timestamp",
        "attributes",
    ]
    got = {r["block"] for r in df.select("block").distinct().collect()}
    assert got == {1, 2, 3, 4, 5}


def test_run_live_session_retry_then_success(tmp_path):
    attempts: dict[int, int] = {}

    def flaky_fetch(height: int):
        attempts[height] = attempts.get(height, 0) + 1
        if attempts[height] <= 2:
            raise RuntimeError(f"transient {height}")
        return fake_rows(height)

    srv = FakeServer([tendermint_session([9])])
    stats = run_live_session(
        srv.url, flaky_fetch, str(tmp_path), propagation_delay=0, backoff=0, ws_timeout=10
    )
    srv.finish()
    assert attempts[9] == 3  # 2 failures + success, within max_retries=3
    assert stats.delivered == [9] and stats.skipped == []


def test_run_live_session_skip_then_breaker_abort(tmp_path):
    """Always-failing fetch: every height is skipped after max_retries,
    and the breaker aborts the session after `breaker_threshold`
    consecutive skips even though the server keeps streaming."""

    def always_fail(height: int):
        raise RuntimeError("down")

    def streamer(conn: ServerConn) -> None:
        ack_subscribe(conn)
        for h in range(1, 31):
            try:
                conn.send_text(new_block_msg(h))
            except OSError:
                return  # client hung up after abort — expected
        conn.drain_until_close()

    srv = FakeServer([streamer])
    # ws_timeout=0.5 exercises the quiet-abort path: the server streams
    # all 30 heights at once and then goes quiet, so the producer only
    # notices the dead consumer at the next recv timeout
    stats = run_live_session(
        srv.url,
        always_fail,
        str("/tmp/never-used"),
        propagation_delay=0,
        backoff=0,
        breaker_threshold=3,
        ws_timeout=0.5,
    )
    srv.thread.join(timeout=30)
    assert stats.aborted is True
    assert stats.skipped == [1, 2, 3]
    assert stats.delivered == []


def test_run_live_session_landing_failure_hits_breaker(tmp_path):
    """ADVICE (low): a dead sink must go through the retry/breaker path,
    not kill the consumer silently with aborted=False."""
    bad_dir = str(tmp_path / "does" / "not" / "exist")
    srv = FakeServer([tendermint_session(list(range(1, 8)), close="abrupt")])
    stats = run_live_session(
        srv.url,
        fake_rows,
        bad_dir,
        propagation_delay=0,
        backoff=0,
        breaker_threshold=2,
        ws_timeout=10,
    )
    srv.thread.join(timeout=30)
    assert stats.aborted is True
    assert stats.delivered == []
    assert stats.skipped == [1, 2]
    assert stats.error is None  # breaker abort is a CLEAN outcome


def test_backpressure_no_loss_with_tiny_channel(tmp_path):
    """channel_size=1 + slow consumer: the bounded queue blocks the
    producer (TCP backpressure), nothing is dropped."""

    def slow_fetch(height: int):
        time.sleep(0.02)
        return fake_rows(height)

    heights = list(range(1, 21))
    srv = FakeServer([tendermint_session(heights)])
    stats = run_live_session(
        srv.url,
        slow_fetch,
        str(tmp_path),
        propagation_delay=0,
        channel_size=1,
        ws_timeout=10,
    )
    srv.finish()
    assert stats.delivered == heights
    assert landing_heights(str(tmp_path)) == heights


# -- gap reconciliation + supervisor ----------------------------------------


def test_reconcile_gaps_backfills(tmp_path):
    for h in (1, 2, 5, 7):
        land_block(str(tmp_path), h, fake_rows(h))

    fetched: list[int] = []

    def fetch(height: int):
        fetched.append(height)
        if height == 6:
            raise RuntimeError("node pruned it")
        return fake_rows(height)

    done, failed = reconcile_gaps(str(tmp_path), fetch, backoff=0)
    assert done == [3, 4] and failed == [6]
    assert fetched == [3, 4, 6, 6, 6]  # 6 retried max_retries times
    assert landing_heights(str(tmp_path)) == [1, 2, 3, 4, 5, 7]
    # second pass: only the still-missing height is retried
    done2, failed2 = reconcile_gaps(
        str(tmp_path), lambda h: fake_rows(h), backoff=0
    )
    assert done2 == [6] and failed2 == []
    assert landing_heights(str(tmp_path)) == [1, 2, 3, 4, 5, 6, 7]


def test_run_supervised_server_killed_mid_stream_no_height_lost(tmp_path):
    """Verdict task 2's done-criterion: kill the server mid-stream; the
    supervisor reconnects and the A4 gap scan backfills everything the
    feed missed while disconnected — landing ends up contiguous."""
    srv = FakeServer(
        [
            # session 1 dies abruptly (no close frame) after height 3
            tendermint_session([1, 2, 3], close="abrupt"),
            # chain advanced to 6 while we were reconnecting: the feed
            # only announces the current head now
            tendermint_session([6], close="abrupt"),
            # final session announces 7 then closes cleanly; the
            # reconcile BEFORE this session must have filled 4-5
            tendermint_session([7]),
        ]
    )
    sessions = run_supervised(
        srv.url,
        fake_rows,
        str(tmp_path),
        reconnect_interval=0,
        max_sessions=3,
        propagation_delay=0,
        ws_timeout=10,
    )
    srv.finish()
    assert [s.delivered for s in sessions] == [[1, 2, 3], [6], [7]]
    assert all(not s.aborted and s.error is None for s in sessions)
    assert landing_heights(str(tmp_path)) == [1, 2, 3, 4, 5, 6, 7]


def test_run_supervised_connect_failure_counts_as_session(tmp_path):
    # nothing listens on this port: connect raises, supervisor records
    # the error and stops at max_sessions instead of crashing
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()  # free the port; nothing listens now
    sessions = run_supervised(
        f"ws://127.0.0.1:{port}/websocket",
        fake_rows,
        str(tmp_path),
        reconnect_interval=0,
        max_sessions=2,
        ws_timeout=1,
    )
    assert len(sessions) == 2
    assert all(s.error is not None for s in sessions)


def test_run_supervised_stops_on_breaker_abort(tmp_path):
    def always_fail(height: int):
        raise RuntimeError("down")

    srv = FakeServer([tendermint_session([1, 2, 3, 4], close="abrupt")])
    sessions = run_supervised(
        srv.url,
        always_fail,
        str(tmp_path),
        reconnect_interval=0,
        max_sessions=5,
        propagation_delay=0,
        backoff=0,
        breaker_threshold=2,
        ws_timeout=10,
    )
    srv.thread.join(timeout=30)
    assert len(sessions) == 1 and sessions[0].aborted  # reference's process abort


# -- HTTP JSON-RPC fetcher ---------------------------------------------------


BLOCK_JSON = {
    "block": {
        "header": {"height": "12", "time": "2024-03-05T10:20:30.123456789Z"},
        "data": {"txs": ["b64tx0==", "b64tx1=="]},
    }
}
RESULTS_JSON = {
    "height": "12",
    "txs_results": [
        {
            "events": [
                {
                    "type": "wasm-ls-open",
                    "attributes": [
                        {"key": "id", "value": "lease1"},
                        {"key": "amount", "value": "100"},
                    ],
                },
                {"type": "transfer", "attributes": []},
            ]
        },
        {"events": [{"type": "wasm-ls-repay", "attributes": [{"key": "id", "value": "x"}]}]},
    ],
}


def test_bronze_rows_from_block_results():
    rows = bronze_rows_from_block_results(12, BLOCK_JSON, RESULTS_JSON)
    assert [(r[0], r[1], r[2], r[3]) for r in rows] == [
        (12, "b64tx0==", 0, "wasm-ls-open"),
        (12, "b64tx0==", 1, "transfer"),
        (12, "b64tx1==", 2, "wasm-ls-repay"),
    ]
    assert rows[0][5] == {"id": "lease1", "amount": "100"}
    # nanosecond RFC 3339 truncated to micros, UTC
    from datetime import datetime, timezone

    want = datetime(2024, 3, 5, 10, 20, 30, 123456, tzinfo=timezone.utc)
    assert rows[0][4] == int(want.timestamp() * 1_000_000)
    # empty block
    assert bronze_rows_from_block_results(1, {"block": {"header": {}}}, {}) == []


def test_http_block_fetcher_and_cli_live(tmp_path, capsys):
    """e2e across both public wire surfaces: fake HTTP RPC (stdlib
    http.server) + fake WS feed, driven through the `live` CLI."""

    class RPC(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path.startswith("/status"):
                body = {"sync_info": {"latest_block_height": "12"}}
            elif self.path.startswith("/block_results"):
                body = RESULTS_JSON
            elif self.path.startswith("/block"):
                body = BLOCK_JSON
            else:
                body = {"error": {"code": -32601, "message": "no such method"}}
            payload = json.dumps({"jsonrpc": "2.0", "id": -1, "result": body}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # quiet
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RPC)
    http_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    http_thread.start()
    rpc_url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        fetch = http_block_fetcher(rpc_url)
        rows = fetch(12)
        assert len(rows) == 3 and rows[0][3] == "wasm-ls-open"

        srv = FakeServer([tendermint_session([12])])
        from extract_transform_load_spark.__main__ import main

        rc = main(
            [
                "live",
                srv.url,
                "--rpc",
                rpc_url,
                "--landing",
                str(tmp_path / "landing"),
                "--max-sessions",
                "1",
                "--propagation-delay",
                "0",
                "--reconnect-interval",
                "0",
            ]
        )
        srv.finish()
        assert rc == 0
        assert landing_heights(str(tmp_path / "landing")) == [12]
        captured = capsys.readouterr()
        # human lines go to stderr; the final stdout line is the
        # machine-consumable FeedStats rollup
        assert "delivered=1" in captured.err and "aborted=False" in captured.err
        agg = json.loads(captured.out.strip().splitlines()[-1])
        assert agg["sessions"] == 1 and agg["delivered"] == 1
        assert agg["aborted"] is False and agg["errors"] == []
        assert (agg["min_height"], agg["max_height"]) == (12, 12)

        # the head probe rides the same fake RPC
        from extract_transform_load_spark.sources.livefeed import http_head_fetcher

        assert http_head_fetcher(rpc_url)() == 12
    finally:
        httpd.shutdown()
        http_thread.join(timeout=10)


def test_http_block_fetcher_rpc_error_raises():
    class RPC(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            payload = json.dumps(
                {"jsonrpc": "2.0", "id": -1, "error": {"code": -32603, "message": "pruned"}}
            ).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RPC)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        fetch = http_block_fetcher(f"http://127.0.0.1:{httpd.server_address[1]}")
        with pytest.raises(ConnectionError, match="rpc error"):
            fetch(5)
    finally:
        httpd.shutdown()
        t.join(timeout=10)


# -- landing-zone compaction -------------------------------------------------


def test_compact_landing_preserves_heights_and_rows(tmp_path, spark):
    from extract_transform_load_spark.sources.livefeed import compact_landing

    heights = [1, 2, 4, 5, 6, 9]  # gaps at 3, 7, 8 survive compaction
    for h in heights:
        land_block(str(tmp_path), h, fake_rows(h))
    before = landing_heights(str(tmp_path))
    before_rows = spark.read.parquet(str(tmp_path)).orderBy("block", "event_index").collect()

    out = compact_landing(str(tmp_path), min_files=2)
    assert out is not None and Path(out).exists()
    # per-block files are gone; one range file + manifest remain
    assert list(Path(str(tmp_path)).glob("block_*.parquet")) == []
    manifests = list(Path(str(tmp_path)).glob(".blocks_*.manifest.json"))
    assert len(manifests) == 1
    runs = json.loads(manifests[0].read_text())["runs"]
    assert runs == [[1, 2], [4, 6], [9, 9]]

    # heights contract intact (gap scan still sees 3, 7, 8 missing)
    assert landing_heights(str(tmp_path)) == before
    assert missing_heights(landing_heights(str(tmp_path))) == [3, 7, 8]
    # Spark reads identical rows through the compacted layout
    after_rows = spark.read.parquet(str(tmp_path)).orderBy("block", "event_index").collect()
    assert after_rows == before_rows


def test_compact_landing_crash_leaves_no_visible_partial(tmp_path):
    """A mid-stream failure (corrupt input file here) must not leave a
    visible half-populated blocks_* file beside the un-unlinked
    originals — a listing would then double-count every row already
    copied. The compactor writes to a dot-prefixed temp name and renames
    only on success (round-7 ADVICE fix)."""
    from extract_transform_load_spark.sources.livefeed import compact_landing

    for h in (1, 2, 4):
        land_block(str(tmp_path), h, fake_rows(h))
    (tmp_path / "block_000000000003_x.parquet").write_bytes(b"not parquet")

    with pytest.raises(Exception):
        compact_landing(str(tmp_path), min_files=2)

    # no visible compacted output, no lingering temp, originals intact
    assert list(tmp_path.glob("blocks_*.parquet")) == []
    assert list(tmp_path.glob(".blocks_*.inprogress")) == []
    assert len(list(tmp_path.glob("block_*.parquet"))) == 4
    assert landing_heights(str(tmp_path)) == [1, 2, 3, 4]

    # a stale temp from a HARD crash (unlink path skipped) is swept by
    # the next run instead of accumulating on the edge host — but only
    # past the age gate: a FRESH temp may belong to a concurrently
    # running compactor and must be left alone
    import os as _os
    import time as _time

    stale = tmp_path / ".blocks_000000000000_000000000009_dead.parquet.inprogress"
    stale.write_bytes(b"half-written")
    fresh = tmp_path / ".blocks_000000000000_000000000009_live.parquet.inprogress"
    fresh.write_bytes(b"still-writing")
    _os.utime(stale, (0, _time.time() - 7200))
    (tmp_path / "block_000000000003_x.parquet").unlink()
    out = compact_landing(str(tmp_path), min_files=2)
    assert out is not None and not stale.exists() and fresh.exists()


def test_compact_landing_error_path_survives_close_failure(tmp_path, monkeypatch):
    """On the failure path writer.close() can itself raise (ENOSPC while
    flushing the footer) — that must not mask the original exception or
    skip the temp unlink (round-8 ADVICE fix)."""
    import pyarrow.parquet as pq
    from extract_transform_load_spark.sources.livefeed import compact_landing

    for h in (1, 2):
        land_block(str(tmp_path), h, fake_rows(h))
    (tmp_path / "block_000000000003_x.parquet").write_bytes(b"not parquet")

    real_close = pq.ParquetWriter.close

    def bad_close(self):
        real_close(self)  # release the handle so unlink works on all OSes
        raise OSError(28, "No space left on device")

    monkeypatch.setattr(pq.ParquetWriter, "close", bad_close)
    # the ORIGINAL corrupt-parquet error propagates, not the ENOSPC mask
    with pytest.raises(Exception) as exc:
        compact_landing(str(tmp_path), min_files=2)
    assert "No space left" not in str(exc.value)
    assert list(tmp_path.glob(".blocks_*.inprogress")) == []
    assert len(list(tmp_path.glob("block_*.parquet"))) == 3  # originals intact


def test_compact_landing_noop_below_min_files(tmp_path):
    from extract_transform_load_spark.sources.livefeed import compact_landing

    land_block(str(tmp_path), 1, fake_rows(1))
    assert compact_landing(str(tmp_path), min_files=16) is None
    assert landing_heights(str(tmp_path)) == [1]


def test_compact_landing_then_live_and_reconcile(tmp_path):
    """Compaction composes with the live loop: new blocks keep landing
    as per-block files beside the range file, gap reconciliation fills
    holes INSIDE the compacted range, and a second compaction folds
    everything into a fresh range file."""
    from extract_transform_load_spark.sources.livefeed import compact_landing

    for h in (1, 2, 5):
        land_block(str(tmp_path), h, fake_rows(h))
    compact_landing(str(tmp_path), min_files=2)

    done, failed = reconcile_gaps(str(tmp_path), fake_rows, backoff=0)
    assert done == [3, 4] and failed == []
    land_block(str(tmp_path), 6, fake_rows(6))
    assert landing_heights(str(tmp_path)) == [1, 2, 3, 4, 5, 6]

    out2 = compact_landing(str(tmp_path), min_files=2)
    assert out2 is not None
    # the first range file + both manifests still tell the full story
    assert landing_heights(str(tmp_path)) == [1, 2, 3, 4, 5, 6]
    assert missing_heights(landing_heights(str(tmp_path))) == []


def test_compact_landing_crash_between_write_and_unlink(tmp_path):
    """Crash-sim: the merged file + manifest exist but inputs were not
    unlinked — heights unchanged (set union), rows duplicated (the A5
    dedup contract's job), nothing lost."""
    from extract_transform_load_spark.sources import livefeed

    for h in (1, 2, 3):
        land_block(str(tmp_path), h, fake_rows(h))

    real_unlink = Path.unlink

    def no_unlink(self, *a, **k):  # crash before cleanup
        if self.name.startswith("block_"):
            return None
        return real_unlink(self, *a, **k)

    try:
        Path.unlink = no_unlink
        livefeed.compact_landing(str(tmp_path), min_files=2)
    finally:
        Path.unlink = real_unlink
    assert landing_heights(str(tmp_path)) == [1, 2, 3]
    # duplicate rows exist, but every height is still derivable and the
    # gap scan sees no false holes
    assert missing_heights(landing_heights(str(tmp_path))) == []


def test_blockfeed_source_reads_compacted_landing(tmp_path, spark):
    """The Spark streaming source keeps working after compaction: the
    chain head comes from the range file's footer stats, the hidden
    manifest is invisible to dataset discovery, and a microbatch pulls
    the compacted rows."""
    from extract_transform_load_spark.sources.blockfeed import _head
    from extract_transform_load_spark.sources.livefeed import compact_landing
    from extract_transform_load_spark.sources import subscribe_blocks

    for h in (1, 2, 3, 4):
        land_block(str(tmp_path), h, fake_rows(h))
    compact_landing(str(tmp_path), min_files=2)
    land_block(str(tmp_path), 5, fake_rows(5))  # live file beside the range file
    assert _head(str(tmp_path)) == 5

    stream = subscribe_blocks(spark, str(tmp_path), blocks_per_batch=64)
    q = (
        stream.writeStream.format("memory")
        .queryName("compacted_feed")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT DISTINCT block FROM compacted_feed ORDER BY block").collect()
    assert [r["block"] for r in got] == [1, 2, 3, 4, 5]


def test_full_live_path_ws_to_silver(tmp_path, spark):
    """The reference's §3.1 lifecycle end-to-end across real process
    boundaries: fake Tendermint WS (RFC 6455 over loopback) announces
    blocks -> run_live_session fetches + lands bronze parquet ->
    subscribe_blocks streams it -> pipeline.parsers produces silver
    LS_Opening rows identical to the batch parse of the same landing."""
    from extract_transform_load_spark.pipeline.parsers import parse_ls_opening
    from extract_transform_load_spark.sources import subscribe_blocks

    def fetch(height: int):
        ts = 1_700_000_000_000_000 + height * 6_000_000
        return [
            (
                height,
                f"tx{height:04d}",
                0,
                "wasm-ls-open",
                ts,
                {
                    "height": str(height),
                    "id": f"lease{height}",
                    "customer": f"addr{height}",
                    "currency": "ATOM",
                    "air": "105",
                    "loan-pool-id": "pool1",
                    "loan-amount": "1000",
                    "loan-symbol": "USDC",
                    "downpayment-amount": "250",
                    "downpayment-symbol": "USDC",
                },
            )
        ]

    landing = tmp_path / "landing"
    landing.mkdir()
    srv = FakeServer([tendermint_session([1, 2, 3, 4, 5])])
    stats = run_live_session(
        srv.url, fetch, str(landing), propagation_delay=0, ws_timeout=10
    )
    srv.finish()
    assert stats.delivered == [1, 2, 3, 4, 5]

    stream = subscribe_blocks(spark, str(landing), blocks_per_batch=2)
    q = (
        parse_ls_opening(stream)
        .writeStream.format("memory")
        .queryName("live_silver_ls_open")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = spark.sql("select * from live_silver_ls_open")
    batch = parse_ls_opening(spark.read.parquet(str(landing)))
    assert streamed.count() == 5
    assert streamed.exceptAll(batch).count() == 0 and batch.exceptAll(streamed).count() == 0
    got = {r["LS_contract_id"] for r in streamed.select("LS_contract_id").collect()}
    assert got == {f"lease{h}" for h in range(1, 6)}


# -- ws.py: wss:// (TLS) ----------------------------------------------------


@pytest.fixture(scope="module")
def tls_pair(tmp_path_factory):
    """Self-signed cert for 127.0.0.1 (SAN IP, so the client's default
    hostname verification path runs) + server/client SSLContexts."""
    import datetime
    import ipaddress
    import ssl

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import rsa
    from cryptography.x509.oid import NameOID

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, "127.0.0.1")])
    now = datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc)
    cert = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now)
        .not_valid_after(now + datetime.timedelta(days=3650))
        .add_extension(
            x509.SubjectAlternativeName(
                [x509.IPAddress(ipaddress.ip_address("127.0.0.1"))]
            ),
            critical=False,
        )
        .sign(key, hashes.SHA256())
    )
    d = tmp_path_factory.mktemp("tls")
    cert_pem = d / "cert.pem"
    key_pem = d / "key.pem"
    cert_pem.write_bytes(cert.public_bytes(serialization.Encoding.PEM))
    key_pem.write_bytes(
        key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.TraditionalOpenSSL,
            serialization.NoEncryption(),
        )
    )
    server_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    server_ctx.load_cert_chain(str(cert_pem), str(key_pem))
    client_ctx = ssl.create_default_context(cafile=str(cert_pem))
    return server_ctx, client_ctx


def test_wss_round_trip_over_loopback_tls(tls_pair):
    """The wss:// branch (ws.py:79-82): TLS-wrapped socket, full
    handshake + subscribe + NewBlock stream + clean close, with real
    certificate + hostname verification against the test CA."""
    server_ctx, client_ctx = tls_pair
    srv = FakeServer([tendermint_session([7, 8])], tls=server_ctx)
    ws = WSClient(f"wss://127.0.0.1:{srv.port}/websocket", ssl_context=client_ctx)
    subscribe(ws)
    got = list(iter_heights(ws))
    srv.finish()
    assert got == [7, 8]


def test_wss_untrusted_cert_rejected(tls_pair):
    """Default trust store must REJECT the self-signed endpoint — the
    client may not silently downgrade verification."""
    import ssl

    server_ctx, _ = tls_pair
    srv = FakeServer([tendermint_session([1])], tls=server_ctx)
    with pytest.raises((ssl.SSLError, WSError, OSError)):
        WSClient(f"wss://127.0.0.1:{srv.port}/websocket")
    srv.lsock.close()


# -- supervisor long-haul hardening (round 6) ------------------------------


def test_reconcile_gaps_head_backfill(tmp_path):
    """The tail hole: heights past the last landed block are invisible
    to the internal gap scan; `head` closes them now instead of at the
    next-plus-one reconnect (`synchronization.rs:60-68`)."""
    for h in (1, 2, 3):
        land_block(str(tmp_path), h, fake_rows(h))
    done, failed = reconcile_gaps(str(tmp_path), fake_rows, backoff=0, head=6)
    assert done == [4, 5, 6] and failed == []
    assert landing_heights(str(tmp_path)) == [1, 2, 3, 4, 5, 6]

    # stale head (chain behind the landing zone) is a no-op
    done2, _ = reconcile_gaps(str(tmp_path), fake_rows, backoff=0, head=2)
    assert done2 == []

    # empty landing zone ignores head: nothing to anchor the range
    empty = tmp_path / "empty"
    empty.mkdir()
    done3, _ = reconcile_gaps(str(empty), fake_rows, backoff=0, head=9)
    assert done3 == [] and landing_heights(str(empty)) == []


def test_run_supervised_tail_backfill_on_reconnect(tmp_path):
    """ADVICE r5 (medium): heights missed DURING a disconnect must land
    at the NEXT reconnect, not the one after. Session 1 dies after 3;
    the chain advances to 6 while disconnected; session 2 announces
    only 7 — yet the landing is contiguous after just TWO sessions
    because the pre-session reconcile probes the RPC head."""
    heads = iter([3, 6])  # head at first connect, head at reconnect
    srv = FakeServer(
        [
            tendermint_session([1, 2, 3], close="abrupt"),
            tendermint_session([7]),
        ]
    )
    sessions = run_supervised(
        srv.url,
        fake_rows,
        str(tmp_path),
        reconnect_interval=0,
        max_sessions=2,
        propagation_delay=0,
        ws_timeout=10,
        backoff=0,
        fetch_head=lambda: next(heads),
    )
    srv.finish()
    assert [s.delivered for s in sessions] == [[1, 2, 3], [7]]
    assert landing_heights(str(tmp_path)) == [1, 2, 3, 4, 5, 6, 7]


def test_run_supervised_head_probe_failure_degrades(tmp_path):
    """A dead /status endpoint must not kill the supervisor: the
    reconcile degrades to internal-gaps-only and the session runs."""

    def bad_head() -> int:
        raise ConnectionError("status endpoint down")

    srv = FakeServer([tendermint_session([1, 2])])
    sessions = run_supervised(
        srv.url,
        fake_rows,
        str(tmp_path),
        reconnect_interval=0,
        max_sessions=1,
        propagation_delay=0,
        ws_timeout=10,
        backoff=0,
        fetch_head=bad_head,
    )
    srv.finish()
    assert sessions[0].delivered == [1, 2] and sessions[0].error is None
    assert landing_heights(str(tmp_path)) == [1, 2]


def test_run_supervised_max_wall_bounds_the_loop(tmp_path):
    """Long-haul guard: with nothing listening, sessions are instant
    connect failures and the loop would spin forever under
    max_sessions=None; max_wall must end it."""
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    t0 = time.monotonic()
    sessions = run_supervised(
        f"ws://127.0.0.1:{port}/websocket",
        fake_rows,
        str(tmp_path),
        reconnect_interval=0.02,
        max_sessions=None,
        max_wall=0.5,
        ws_timeout=1,
    )
    elapsed = time.monotonic() - t0
    assert len(sessions) >= 1
    assert all(s.error is not None for s in sessions)
    assert elapsed < 30  # returned, and nowhere near unbounded


def test_run_supervised_reconnect_jitter(tmp_path, monkeypatch):
    """Jittered backoff decorrelates a reconnecting fleet (deliberate
    departure from the reference's fixed sleep, event.rs:46-52);
    jitter=0 reproduces the reference exactly."""
    import random as _random
    import threading

    # Record only THIS thread's sleeps: the monkeypatch is process-global,
    # and long-lived background threads (py4j callback server, Spark
    # monitors from earlier tests in the session) call time.sleep(1) in
    # polling loops — under heavy tenant load this test runs long enough
    # to capture thousands of them (observed 2026-08-17: 11k stray 1s).
    sleeps: list[float] = []
    _tid = threading.get_ident()
    monkeypatch.setattr(
        time,
        "sleep",
        lambda s: sleeps.append(s) if threading.get_ident() == _tid else None,
    )

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    url = f"ws://127.0.0.1:{port}/websocket"

    run_supervised(
        tmp_path and url,
        fake_rows,
        str(tmp_path),
        reconnect_interval=1.0,
        reconnect_jitter=0.5,
        max_sessions=4,
        ws_timeout=1,
        rng=_random.Random(7),
    )
    jittered = [s for s in sleeps if s >= 1.0]
    assert len(jittered) == 3  # one sleep per reconnect
    assert all(1.0 <= s <= 1.5 for s in jittered)
    assert len(set(jittered)) > 1  # actually jittered, not fixed

    sleeps.clear()
    run_supervised(
        url,
        fake_rows,
        str(tmp_path),
        reconnect_interval=1.0,
        reconnect_jitter=0.0,
        max_sessions=3,
        ws_timeout=1,
    )
    assert [s for s in sleeps if s >= 1.0] == [1.0, 1.0]


def test_aggregate_stats_rollup():
    from extract_transform_load_spark.sources.livefeed import (
        FeedStats,
        aggregate_stats,
    )

    sessions = [
        FeedStats(delivered=[1, 2, 3], skipped=[4]),
        FeedStats(delivered=[5, 6], skipped=[], error="ConnectionError('x')"),
        FeedStats(delivered=[], skipped=[7], aborted=True),
    ]
    agg = aggregate_stats(sessions)
    assert agg == {
        "sessions": 3,
        "delivered": 5,
        "skipped": 2,
        "skipped_heights": [4, 7],
        "aborted": True,
        "errors": ["ConnectionError('x')"],
        "min_height": 1,
        "max_height": 6,
    }
    assert json.dumps(agg)  # JSON-serializable as printed by the CLI


def test_compact_landing_streams_with_bounded_buffer(tmp_path):
    """Compaction must not materialize the whole landing dir (ADVICE
    r5): the streaming writer flushes ~row_group_size rows per group,
    so row-group granularity — what footer pruning depends on — stays
    coarse, one group per height band, NOT one group per input file."""
    import pyarrow.parquet as pq

    for h in range(1, 21):  # 20 files x 2 rows
        land_block(str(tmp_path), h, fake_rows(h))
    from extract_transform_load_spark.sources.livefeed import compact_landing

    out = compact_landing(str(tmp_path), min_files=2, row_group_size=10)
    pf = pq.ParquetFile(out)
    assert pf.metadata.num_rows == 40
    assert pf.metadata.num_row_groups == 4  # 40 rows / 10-row buffer flushes
    # heights survive, sorted, via the manifest
    assert landing_heights(str(tmp_path)) == list(range(1, 21))


# -- the full lifecycle capstone: live WS -> gold -> JDBC (round 6) --------


def test_live_capstone_ws_to_gold_jdbc(tmp_path, spark):
    """VERDICT r5 task 4: extend the live capstone through gold + JDBC.
    Lifecycle §3.1→§3.3 end-to-end: fake Tendermint WS announces blocks
    -> run_live_session lands bronze parquet -> compact_landing ->
    subscribe_blocks streams the compacted layout -> silver parse +
    enrichment -> run_aggregation_round -> positions/daily endpoint ->
    Derby JDBC sink -> read back. The served rows must equal the same
    gold computed from a plain batch read of the landing zone — the
    streaming and batch paths converge on served results."""
    from datetime import date, datetime

    import pyspark.sql.functions as F

    from extract_transform_load_spark.api.endpoints import ENDPOINTS
    from extract_transform_load_spark.pipeline import parsers as P
    from extract_transform_load_spark.pipeline.enrich import enrich_ls_opening
    from extract_transform_load_spark.pipeline.pnl import compute_loan_closings
    from extract_transform_load_spark.pipeline.snapshots import run_aggregation_round
    from extract_transform_load_spark.sources import subscribe_blocks
    from extract_transform_load_spark.sources.livefeed import compact_landing
    from extract_transform_load_spark.sources.sinks import read_jdbc, write_jdbc

    def micros(day: int) -> int:
        from datetime import timedelta, timezone

        ts = datetime(2024, 1, day, 12, tzinfo=timezone.utc)
        return (ts - datetime(1970, 1, 1, tzinfo=timezone.utc)) // timedelta(
            microseconds=1
        )

    def fetch(height: int):
        if height <= 6:  # opens: 3 on Jan 1, 3 on Jan 2
            return [(height, f"tx{height}", 0, "wasm-ls-open",
                     micros(1 + (height - 1) // 3), {
                         "id": f"lease{height}", "customer": f"addr{height}",
                         "currency": "ATOM", "air": "105",
                         "loan-pool-id": "pool1", "loan-amount": "1000",
                         "loan-symbol": "USDC", "downpayment-amount": "250",
                         "downpayment-symbol": "USDC"})]
        if height <= 9:  # terminal repayments: leases 1-3 close on Jan 3
            return [(height, f"tx{height}", 0, "wasm-ls-repay", micros(3), {
                "height": str(height), "to": f"lease{height - 6}",
                "payment-symbol": "USDC", "payment-amount": "1200",
                "loan-close": "true", "principal": "1000"})]
        if height == 10:
            return [(height, f"tx{height}", 0, "wasm-lp-deposit", micros(3), {
                "height": str(height), "from": "addrX", "to": "pool1",
                "deposit-amount": "5000", "deposit-symbol": "USDC",
                "receipts": "5000"})]
        return [(height, f"tx{height}", 0, "wasm-tr-profit", micros(3), {
            "height": str(height), "profit-amount-symbol": "USDC",
            "profit-amount-amount": "700"})]

    landing = tmp_path / "landing"
    landing.mkdir()
    srv = FakeServer([tendermint_session(list(range(1, 12)))])
    stats = run_live_session(
        srv.url, fetch, str(landing), propagation_delay=0, ws_timeout=10
    )
    srv.finish()
    assert stats.delivered == list(range(1, 12))

    # gold is computed THROUGH the compacted layout
    assert compact_landing(str(landing), min_files=4) is not None

    stream = subscribe_blocks(spark, str(landing), blocks_per_batch=4)
    q = (
        stream.writeStream.format("memory")
        .queryName("capstone_bronze")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    bronze_stream = spark.table("capstone_bronze")
    assert bronze_stream.count() == 11

    prices = spark.createDataFrame(
        [("ATOM", datetime(2023, 12, 31), "7.0"),
         ("USDC", datetime(2023, 12, 31), "1.0")],
        "MP_asset_symbol string, MP_asset_timestamp timestamp, MP_price_in_stable string",
    ).withColumn("MP_price_in_stable", F.col("MP_price_in_stable").cast("decimal(38,18)"))

    def gold_from(bronze):
        """bronze -> silver -> aggregation round -> positions/daily —
        the SAME function runs on the streamed bronze and the batch
        read, so any divergence between the two paths fails below."""

        def pay(df):
            return df.withColumn(
                "LS_payment_amnt_stable",
                F.col("LS_payment_amnt"),  # USDC @ 1.0 in this fixture
            )

        opening = enrich_ls_opening(P.parse_ls_opening(bronze), prices)
        tables = {
            "LS_Opening": opening,
            "LS_Repayment": pay(P.parse_ls_repayment(bronze)),
            "LS_Close_Position": pay(P.parse_ls_close_position(bronze)),
            "LS_Liquidation": pay(P.parse_ls_liquidation(bronze)),
            "LS_Closing": P.parse_ls_closing(bronze),
            "LP_Deposit": P.parse_lp_deposit(bronze).withColumn(
                "LP_amnt_stable", F.col("LP_amnt_asset")
            ),
            "LP_Withdraw": P.parse_lp_withdraw(bronze).withColumn(
                "LP_amnt_stable", F.col("LP_amnt_asset")
            ),
            "TR_Profit": P.parse_tr_profit(bronze)
            .withColumn("TR_Profit_amnt_stable", F.col("TR_Profit_amnt"))
            .withColumn("TR_Profit_amnt_nls", F.col("TR_Profit_amnt")),
        }
        snap = run_aggregation_round(tables, datetime(2024, 1, 4))
        closings = compute_loan_closings(
            opening,
            tables["LS_Repayment"],
            tables["LS_Close_Position"],
            tables["LS_Liquidation"],
            tables["LS_Closing"],
        )
        daily = ENDPOINTS["positions/daily"](
            {"LS_Opening": opening, "LS_Loan_Closing": closings}
        )
        return snap, daily

    snap, daily_stream = gold_from(bronze_stream)
    assert snap["LS_State"].count() == 3  # leases 4-6 still open
    assert snap["LP_Pool_State"].collect()[0]["LP_Pool_id"] == "pool1"
    assert snap["TR_State"].collect()[0]["TR_amnt_stable"] == 700

    url = f"jdbc:derby:{tmp_path}/servingdb;create=true"
    driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    write_jdbc(daily_stream, url, "daily_positions", mode="overwrite", driver=driver)
    served = sorted(tuple(r) for r in
                    read_jdbc(spark, url, "daily_positions", driver=driver).collect())

    _, daily_batch = gold_from(spark.read.parquet(str(landing)))
    assert served == sorted(tuple(r) for r in daily_batch.collect())
    assert served == [
        (date(2024, 1, 1), 3, 0),
        (date(2024, 1, 2), 3, 0),
        (date(2024, 1, 3), 0, 3),
    ]


def test_aggregate_stats_caps_listed_skips():
    from extract_transform_load_spark.sources.livefeed import (
        FeedStats,
        aggregate_stats,
    )

    agg = aggregate_stats(
        [FeedStats(delivered=[], skipped=list(range(50)))], max_listed_skips=10
    )
    assert agg["skipped"] == 50  # full count survives
    assert agg["skipped_heights"] == list(range(10))  # listing capped, lowest first
