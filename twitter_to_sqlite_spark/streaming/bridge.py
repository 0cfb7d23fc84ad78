"""Socket → spool bridge for the live streaming source (S9).

The reference holds one long-lived filtered-stream HTTP connection
open and wraps it in a reconnect loop (``stream_filter``'s ``while
True`` + requests timeout handling, reference utils.py:603-633).
Spark Structured Streaming wants replayable, offset-addressable input
instead of a raw socket, so the live connection is *bridged*:

    tcp socket (line-JSON)  →  SocketLineBridge  →  spool dir of
        chunk files  →  capture.read_tweet_stream file source
        (checkpointed, watermarkable, resumable)

The bridge owns exactly the reconnect behavior the reference's loop
provides: any socket error or server EOF flushes the partial chunk,
sleeps a linearly-growing backoff (the Twitter streaming guidance for
TCP-level errors: start small, grow linearly, cap), and reconnects.
Chunk files are numbered monotonically and written tmp-then-rename, so
the Spark file source never observes a partial file, a restarted
bridge resumes numbering after the last durable chunk, and the
downstream pk-keyed upserts make any crash-window redelivery
idempotent — the same effectively-exactly-once story as the
checkpointed file stream itself.

Scale: the bridge is a single lightweight collector per stream
connection (Twitter allows one filtered connection per token — the
bottleneck is the API, not this process). Fan-out happens downstream:
N bridges can spool into one directory and the file source absorbs
them all.
"""

from __future__ import annotations

import http.client
import os
import re
import socket
import threading
import time
import urllib.parse
import urllib.request
from collections.abc import Callable
from contextlib import contextmanager

_CHUNK_RE = re.compile(r"^chunk-(\d{8})\.jsonl$")


class SocketLineBridge:
    """Line-JSON TCP reader with the reference's reconnect loop,
    spooling durable chunk files for the Structured Streaming source.

    Parameters
    ----------
    chunk_records: flush a chunk file every N records (the reference
        batches 100 tweets per progress tick, cli.py:312-320).
    max_reconnects: give up after this many consecutive failed
        connections (None = retry forever, the reference's behavior).
    stop_after: stop cleanly once this many records have been spooled
        (None = run until ``stop()``); a bounded-capture convenience
        mirroring the reference's Ctrl-C story, and the deterministic
        handle tests use.
    backoff / backoff_step / max_backoff: linear backoff schedule for
        TCP-level errors (0.25s, +0.25s per failure, capped).
    sleep_fn: injectable for tests.
    on_event: ``callable(kind: str, detail)`` observability hook —
        kinds: connect, error, reconnect, giveup, flush.
    """

    def __init__(self, host: str, port: int, spool_dir: str, *,
                 chunk_records: int = 100,
                 max_reconnects: int | None = None,
                 stop_after: int | None = None,
                 backoff: float = 0.25, backoff_step: float = 0.25,
                 max_backoff: float = 16.0,
                 connect_timeout: float = 10.0,
                 read_timeout: float | None = 90.0,
                 sleep_fn: Callable[[float], None] = time.sleep,
                 on_event: Callable[[str, object], None] | None = None):
        self.host, self.port = host, int(port)
        self.spool_dir = spool_dir
        self.chunk_records = int(chunk_records)
        self.max_reconnects = max_reconnects
        self.stop_after = stop_after
        self.backoff, self.backoff_step = backoff, backoff_step
        self.max_backoff = max_backoff
        self.connect_timeout = connect_timeout
        self.read_timeout = read_timeout
        self.sleep_fn = sleep_fn
        self.on_event = on_event
        self.records = 0
        self.reconnects = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        os.makedirs(spool_dir, exist_ok=True)
        # Resume numbering after the last durable chunk — a restarted
        # bridge never clobbers what the stream already consumed.
        existing = [
            int(m.group(1)) for f in os.listdir(spool_dir)
            if (m := _CHUNK_RE.match(f))
        ]
        self._seq = max(existing) + 1 if existing else 0

    @classmethod
    def from_url(cls, url: str, spool_dir: str, **kwargs) -> "SocketLineBridge":
        """``tcp://host:port`` / ``socket://host:port`` → bridge."""
        m = re.match(r"^(?:tcp|socket)://([^:/]+):(\d+)$", url)
        if not m:
            raise ValueError(f"not a socket url: {url!r}")
        return cls(m.group(1), int(m.group(2)), spool_dir, **kwargs)

    # ------------------------------------------------------- transport

    #: Exceptions one connection lifetime may raise; anything in this
    #: tuple falls through to flush-partial + backoff + reconnect.
    _ERRORS: tuple = (OSError,)

    def _endpoint(self):
        return (self.host, self.port)

    @contextmanager
    def _open(self):
        """One connection lifetime: yields an iterator of raw byte
        lines. Subclasses swap the transport (HttpLineBridge) — the
        spool/backoff/reconnect machinery is transport-agnostic."""
        with socket.create_connection(
            (self.host, self.port), timeout=self.connect_timeout
        ) as sock:
            if self.read_timeout is not None:
                sock.settimeout(self.read_timeout)
            with sock.makefile("rb") as f:
                yield f

    # ------------------------------------------------------------- io

    def _emit(self, kind: str, detail=None) -> None:
        if self.on_event is not None:
            self.on_event(kind, detail)

    def _flush(self, lines: list[str]) -> None:
        """Durable chunk write: dot-prefixed tmp (invisible to Spark's
        file source), fsync, atomic rename into place."""
        if not lines:
            return
        name = f"chunk-{self._seq:08d}.jsonl"
        tmp = os.path.join(self.spool_dir, f".{name}.tmp")
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self.spool_dir, name))
        self._seq += 1
        self._emit("flush", len(lines))

    # ------------------------------------------------------------ run

    def run(self, stop_after: int | None = None) -> int:
        """Blocking read loop; returns total records spooled.

        One iteration = one connection lifetime. EOF (server closed)
        and OSError both fall through to the reconnect path; partial
        chunks are flushed first so no received record is ever lost.
        """
        if stop_after is None:
            stop_after = self.stop_after
        delay = self.backoff
        while not self._stop.is_set():
            buf: list[str] = []
            try:
                with self._open() as f:
                    self._emit("connect", self._endpoint())
                    delay = self.backoff  # healthy connection resets backoff
                    for raw in f:
                        if self._stop.is_set():
                            break
                        line = raw.decode("utf-8", "replace").strip()
                        if not line:
                            continue  # stream keep-alive newline
                        buf.append(line)
                        self.records += 1
                        if len(buf) >= self.chunk_records:
                            self._flush(buf)
                            buf = []
                        if stop_after is not None and self.records >= stop_after:
                            self._stop.set()
            except self._ERRORS as exc:
                self._emit("error", exc)
            finally:
                # The flush itself can fail (disk full, spool dir
                # removed); an exception escaping here would kill the
                # daemon thread silently, breaking the retry-forever
                # contract — report it and let backoff retry.
                try:
                    self._flush(buf)
                except OSError as exc:
                    self._emit("error", exc)
            if self._stop.is_set():
                break
            # EOF or socket error → reconnect with linear backoff.
            self.reconnects += 1
            if self.max_reconnects is not None and self.reconnects > self.max_reconnects:
                self._emit("giveup", self.reconnects)
                break
            self._emit("reconnect", self.reconnects)
            self.sleep_fn(delay)
            delay = min(delay + self.backoff_step, self.max_backoff)
        return self.records

    def start(self, stop_after: int | None = None) -> threading.Thread:
        """Run the bridge on a daemon thread (the collector sidecar)."""
        self._thread = threading.Thread(
            target=self.run, kwargs={"stop_after": stop_after}, daemon=True
        )
        self._thread.start()
        return self._thread

    def stop(self, timeout: float = 10.0) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout)


class HttpLineBridge(SocketLineBridge):
    """The reference's actual transport (utils.py:603-633): one
    long-lived HTTP(S) POST whose chunked response body is an endless
    line-JSON stream, wrapped in the same flush/backoff/reconnect
    machinery as the socket bridge.

    ``data`` (dict → form-encoded, or raw bytes) makes the request a
    POST like the filtered-stream endpoint (track/follow/locations in
    the body); headers carry auth. ``opener`` is injectable — tests
    pass a plain ``urllib.request.urlopen`` against a local server; a
    production deployment passes an OAuth-signing opener. Mid-body
    drops surface as ``http.client.IncompleteRead`` (chunked transfer
    severed) or OSError — both reconnect.
    """

    _ERRORS = (OSError, http.client.HTTPException)

    def __init__(self, url: str, spool_dir: str, *,
                 data: dict | bytes | None = None,
                 headers: dict | None = None,
                 opener: Callable | None = None,
                 **kwargs):
        u = urllib.parse.urlsplit(url)
        port = u.port or (443 if u.scheme == "https" else 80)
        super().__init__(u.hostname or "", port, spool_dir, **kwargs)
        self.url = url
        if isinstance(data, dict):
            data = urllib.parse.urlencode(data).encode()
        self.data = data
        self.headers = dict(headers or {})
        self._opener = opener or urllib.request.urlopen

    def _endpoint(self):
        return self.url

    @contextmanager
    def _open(self):
        req = urllib.request.Request(
            self.url, data=self.data, headers=self.headers,
            method="POST" if self.data is not None else "GET",
        )
        resp = self._opener(req, timeout=self.connect_timeout)
        try:
            status = getattr(resp, "status", 200)
            if status and status >= 400:
                raise OSError(f"HTTP {status} from {self.url}")
            # urlopen's timeout covers the whole socket, not just the
            # connect — left at connect_timeout it would sever a
            # HEALTHY long-poll that is merely quiet for >10 s
            # (keep-alives arrive every ~30 s) and storm the endpoint
            # with reconnects. Re-arm the underlying socket
            # (HTTPResponse.fp.raw._sock) with the read timeout before
            # streaming the body; injected test openers may return
            # plain file-likes with no socket — skip quietly.
            sock = getattr(getattr(getattr(resp, "fp", None), "raw", None),
                           "_sock", None)
            if hasattr(sock, "settimeout") and self.read_timeout is not None:
                sock.settimeout(self.read_timeout)
            yield resp  # http responses iterate by line, chunk-decoded
        finally:
            resp.close()


def bridge_from_url(url: str, spool_dir: str, **kwargs):
    """Transport dispatch: tcp://, socket:// → SocketLineBridge;
    http://, https:// → HttpLineBridge."""
    if url.startswith(("tcp://", "socket://")):
        return SocketLineBridge.from_url(url, spool_dir, **kwargs)
    if url.startswith(("http://", "https://")):
        return HttpLineBridge(url, spool_dir, **kwargs)
    raise ValueError(f"no bridge transport for {url!r}")
