"""Minimal RFC 6455 WebSocket client + retry/circuit-breaker helpers
(SURVEY.md §2.A A1/A2).

The reference subscribes to Tendermint ``NewBlock`` events over
WebSocket (`provider/event.rs:108-152`) and wraps every network call in
retry-with-backoff plus a consecutive-failure circuit breaker
(`event.rs:20-29,157-205`, `grpc.rs:134-174`). No WebSocket library is
baked into this container, and the protocol is small enough that a
dependency is not worth it: this module implements the client side of
RFC 6455 (handshake, masked client frames, text/binary/ping/pong/close,
fragmentation) on raw ``socket`` + stdlib hashing — public-spec
behavior only.

Scope notes (deliberate, documented):

- Client role only. ``ws://`` and ``wss://`` (the latter wraps the
  socket with ``ssl.SSLContext`` before the handshake; pass
  ``ssl_context`` to pin CAs — the default uses the system store).
- Subprotocols and extensions (permessage-deflate) are not negotiated —
  Tendermint's RPC requires neither.
- Frames up to 2**63-1 are parsed per spec; outgoing payloads use the
  minimal length encoding.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct
import time
from collections.abc import Callable
from typing import TypeVar
from urllib.parse import urlparse

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"  # RFC 6455 §1.3

OP_CONT, OP_TEXT, OP_BINARY = 0x0, 0x1, 0x2
OP_CLOSE, OP_PING, OP_PONG = 0x8, 0x9, 0xA


class WSError(ConnectionError):
    """Handshake or protocol failure on the WebSocket."""


class WSClosed(WSError):
    """Peer sent a close frame (or the socket ended)."""


def _mask(payload: bytes, key: bytes) -> bytes:
    # XOR-mask per RFC 6455 §5.3; int-sized XOR via int.from_bytes is
    # the fastest pure-Python form and these frames are tiny (JSON-RPC).
    if not payload:
        return payload
    reps = -(-len(payload) // 4)
    keystream = (key * reps)[: len(payload)]
    return (
        int.from_bytes(payload, "big") ^ int.from_bytes(keystream, "big")
    ).to_bytes(len(payload), "big")


class WSClient:
    """Blocking WebSocket client for ``ws://host:port/path``.

    ``recv()`` returns one complete *message* (fragments reassembled),
    transparently answering pings. Raises :class:`WSClosed` on close /
    EOF and ``socket.timeout`` when ``timeout`` elapses with no frame.
    """

    def __init__(self, url: str, timeout: float = 5.0, ssl_context=None) -> None:
        u = urlparse(url)
        if u.scheme not in ("ws", "wss"):
            raise WSError(f"unsupported scheme {u.scheme!r} (ws:// or wss://)")
        if not u.hostname or not u.port:
            raise WSError(f"url must carry explicit host:port: {url!r}")
        self._sock = socket.create_connection((u.hostname, u.port), timeout=timeout)
        try:
            if u.scheme == "wss":
                import ssl

                ctx = ssl_context or ssl.create_default_context()
                self._sock = ctx.wrap_socket(self._sock, server_hostname=u.hostname)
            self._sock.settimeout(timeout)
            self._buf = b""
            self._handshake(u.hostname, u.port, u.path or "/")
        except BaseException:
            self._sock.close()
            raise

    # -- handshake ----------------------------------------------------
    def _handshake(self, host: str, port: int, path: str) -> None:
        key = base64.b64encode(os.urandom(16)).decode()
        req = (
            f"GET {path} HTTP/1.1\r\n"
            f"Host: {host}:{port}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        )
        self._sock.sendall(req.encode())
        head = self._read_until(b"\r\n\r\n")
        status = head.split(b"\r\n", 1)[0]
        if b"101" not in status:
            raise WSError(f"handshake rejected: {status.decode(errors='replace')}")
        accept = None
        for line in head.split(b"\r\n")[1:]:
            name, _, val = line.partition(b":")
            if name.strip().lower() == b"sec-websocket-accept":
                accept = val.strip().decode()
        want = base64.b64encode(hashlib.sha1((key + _GUID).encode()).digest()).decode()
        if accept != want:
            raise WSError("Sec-WebSocket-Accept mismatch")

    def _read_until(self, delim: bytes) -> bytes:
        while delim not in self._buf:
            chunk = self._sock.recv(4096)
            if not chunk:
                raise WSClosed("EOF during handshake")
            self._buf += chunk
        head, self._buf = self._buf.split(delim, 1)
        return head

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(max(4096, n - len(self._buf)))
            if not chunk:
                raise WSClosed("EOF mid-frame")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    # -- frames -------------------------------------------------------
    def _send_frame(self, opcode: int, payload: bytes) -> None:
        # Client frames MUST be masked (RFC 6455 §5.1).
        head = bytes([0x80 | opcode])
        n = len(payload)
        if n < 126:
            head += bytes([0x80 | n])
        elif n < 1 << 16:
            head += bytes([0x80 | 126]) + struct.pack(">H", n)
        else:
            head += bytes([0x80 | 127]) + struct.pack(">Q", n)
        key = os.urandom(4)
        self._sock.sendall(head + key + _mask(payload, key))

    def _recv_frame(self) -> tuple[bool, int, bytes]:
        b0, b1 = self._read_exact(2)
        fin, opcode = bool(b0 & 0x80), b0 & 0x0F
        masked, n = bool(b1 & 0x80), b1 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", self._read_exact(2))
        elif n == 127:
            (n,) = struct.unpack(">Q", self._read_exact(8))
        key = self._read_exact(4) if masked else b""
        payload = self._read_exact(n)
        if masked:  # servers shouldn't mask, but unmasking is harmless
            payload = _mask(payload, key)
        return fin, opcode, payload

    def send_text(self, text: str) -> None:
        self._send_frame(OP_TEXT, text.encode())

    def ping(self, payload: bytes = b"") -> None:
        """Probe liveness on a quiet connection. The peer's pong is
        consumed transparently by the next :meth:`recv`; a dead peer
        surfaces as ``OSError`` here or ``WSClosed`` there."""
        self._send_frame(OP_PING, payload)

    def recv(self) -> str:
        """Next text/binary message, reassembled; answers pings inline."""
        parts: list[bytes] = []
        while True:
            fin, opcode, payload = self._recv_frame()
            if opcode == OP_PING:
                self._send_frame(OP_PONG, payload)
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                try:
                    self._send_frame(OP_CLOSE, payload[:2])
                except OSError:
                    pass
                raise WSClosed("close frame received")
            if opcode in (OP_TEXT, OP_BINARY) or (opcode == OP_CONT and parts):
                parts.append(payload)
                if fin:
                    return b"".join(parts).decode()
            else:
                raise WSError(f"unexpected opcode {opcode:#x}")

    def close(self) -> None:
        try:
            self._send_frame(OP_CLOSE, struct.pack(">H", 1000))
        except OSError:
            pass
        self._sock.close()


T = TypeVar("T")


def with_retry(
    fn: Callable[[], T],
    retries: int = 3,
    backoff: float = 0.2,
    retryable: tuple[type[BaseException], ...] = (OSError, ConnectionError),
) -> T:
    """The reference's per-call retry loop (`grpc.rs:134-174`: bounded
    attempts, exponential backoff). Re-raises the last error once
    ``retries`` extra attempts are spent."""
    attempt = 0
    while True:
        try:
            return fn()
        except retryable:
            if attempt >= retries:
                raise
            time.sleep(backoff * (2**attempt))
            attempt += 1


class CircuitBreaker:
    """Consecutive-failure abort switch (`event.rs:20-29`: the consumer
    aborts after 10 consecutive block failures rather than spinning).

    ``ok()`` resets the streak; ``fail(exc)`` counts it and raises
    ``exc`` once the streak reaches ``threshold``. Callers decide what
    failing open means (for the streaming source: fail the query so the
    orchestrator restarts it — Spark's analog of the reference's
    process-level abort)."""

    def __init__(self, threshold: int = 10) -> None:
        self.threshold = threshold
        self.streak = 0

    def ok(self) -> None:
        self.streak = 0

    def fail(self, exc: BaseException) -> None:
        self.streak += 1
        if self.streak >= self.threshold:
            raise WSError(
                f"circuit breaker open after {self.streak} consecutive failures"
            ) from exc
