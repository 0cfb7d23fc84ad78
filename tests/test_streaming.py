"""Structured-Streaming capture tests (SURVEY §2.10): file-stream
source → track/follow filters → foreachBatch upsert with checkpoint,
including resume idempotence."""

from __future__ import annotations

import json
import os
import shutil
import socket
import threading

import pytest
from pyspark.sql import functions as F

from twitter_to_sqlite_spark.streaming import capture
from twitter_to_sqlite_spark.streaming.bridge import SocketLineBridge


def minimal_tweet(tid, text, user_id=101, screen_name="robinex",
                  reply_to_user=None, retweet_of_user=None):
    t = {
        "id": tid,
        "id_str": str(tid),
        "created_at": "Mon Feb 03 10:20:30 +0000 2020",
        "text": text[:20],
        "extended_tweet": {"full_text": text} if len(text) > 20 else None,
        "full_text": None,
        "entities": {"hashtags": [], "symbols": [], "user_mentions": [], "urls": []},
        "source": '<a href="https://mobile.example.com">Example Mobile</a>',
        "in_reply_to_user_id": reply_to_user,
        "user": {"id": user_id, "id_str": str(user_id), "screen_name": screen_name,
                 "name": "U", "created_at": "Tue Nov 15 13:18:50 +0000 2016",
                 "entities": {"url": {"urls": []}, "description": {"urls": []}}},
        "retweet_count": 0,
        "favorite_count": 0,
    }
    if retweet_of_user:
        t["retweeted_status"] = {
            "id": tid * 10,
            "id_str": str(tid * 10),
            "created_at": "Sun Feb 02 09:00:00 +0000 2020",
            "full_text": "original " + text,
            "entities": {"hashtags": [], "symbols": [], "user_mentions": [], "urls": []},
            "source": '<a href="https://web.example.com">Example Web</a>',
            "user": {"id": retweet_of_user, "id_str": str(retweet_of_user),
                     "screen_name": "orig", "name": "O",
                     "created_at": "Wed Mar 01 08:00:00 +0000 2017",
                     "entities": {"url": {"urls": []}, "description": {"urls": []}}},
        }
    return t


def write_chunk(src_dir, name, tweets):
    with open(os.path.join(src_dir, name), "w") as f:
        for t in tweets:
            f.write(json.dumps(t) + "\n")


def run_until_done(q):
    q.awaitTermination(120)


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    return str(src), str(tmp_path / "tables"), str(tmp_path / "ckpt")


def test_capture_track_filter_and_upsert(spark, dirs):
    src, tables, ckpt = dirs
    write_chunk(src, "chunk1.json", [
        minimal_tweet(1, "endangered kakapo parrot spotted on the ridge today"),
        minimal_tweet(2, "completely unrelated message about trains"),
        {"limit": {"track": 5}},  # maintenance message: no id → dropped (F3)
    ])
    q = capture.start_capture(
        spark, src, tables, ckpt, phrases=["kakapo parrot"], available_now=True
    )
    run_until_done(q)
    got = spark.read.parquet(f"{tables}/tweets")
    ids = sorted(r["id"] for r in got.collect())
    assert ids == [1]
    # P7 fixup: extended_tweet.full_text won
    assert got.collect()[0]["full_text"].startswith("endangered kakapo")
    users = spark.read.parquet(f"{tables}/users").collect()
    assert [u["id"] for u in users] == [101]


def test_capture_follow_filter(spark, dirs):
    src, tables, ckpt = dirs
    write_chunk(src, "chunk1.json", [
        minimal_tweet(1, "by the followed user", user_id=555),
        minimal_tweet(2, "reply to followed", reply_to_user=555),
        minimal_tweet(3, "retweet of followed", retweet_of_user=555),
        minimal_tweet(4, "unrelated", user_id=9),
    ])
    q = capture.start_capture(
        spark, src, tables, ckpt, follow_ids=[555], available_now=True
    )
    run_until_done(q)
    ids = sorted(r["id"] for r in spark.read.parquet(f"{tables}/tweets").collect())
    # tweet 3's retweeted_status also lands as its own row (id 30)
    assert ids == [1, 2, 3, 30]


def test_capture_resume_is_idempotent(spark, dirs):
    src, tables, ckpt = dirs
    write_chunk(src, "chunk1.json", [minimal_tweet(1, "kakapo one")])
    q = capture.start_capture(spark, src, tables, ckpt,
                              phrases=["kakapo"], available_now=True)
    run_until_done(q)
    # second chunk, restart from checkpoint: old file not reprocessed,
    # new rows upserted by pk
    write_chunk(src, "chunk2.json", [
        minimal_tweet(1, "kakapo one updated"),
        minimal_tweet(5, "kakapo five"),
    ])
    q2 = capture.start_capture(spark, src, tables, ckpt,
                               phrases=["kakapo"], available_now=True)
    run_until_done(q2)
    rows = {r["id"]: r["full_text"] for r in
            spark.read.parquet(f"{tables}/tweets").collect()}
    assert sorted(rows) == [1, 5]
    assert rows[1] == "kakapo one updated"  # K1 last-write-wins across batches


# ---------------------------------------------------------------- S9 bridge


class FlakyLineServer(threading.Thread):
    """Local stand-in for the streaming endpoint: serves ONE payload of
    line-JSON per connection then drops the connection — the failure
    mode the reference's reconnect loop (utils.py:603-633) exists for."""

    def __init__(self, payloads):
        super().__init__(daemon=True)
        self.payloads = [list(p) for p in payloads]
        self.sock = socket.create_server(("127.0.0.1", 0))
        self.port = self.sock.getsockname()[1]
        self.connections = 0

    def run(self):
        while self.payloads:
            conn, _ = self.sock.accept()
            self.connections += 1
            lines = self.payloads.pop(0)
            with conn:
                conn.sendall(("\n".join(lines) + "\n").encode())
        self.sock.close()


def test_bridge_reconnects_and_loses_nothing(tmp_path):
    """VERDICT r1 #5: dropped connection → partial chunk flushed,
    linear-backoff reconnect, remaining records picked up."""
    recs = [json.dumps({"id": i, "txt": f"t{i}"}) for i in range(5)]
    server = FlakyLineServer([recs[:3], recs[3:]])
    server.start()
    spool = tmp_path / "spool"
    sleeps = []
    events = []
    bridge = SocketLineBridge(
        "127.0.0.1", server.port, str(spool), chunk_records=2,
        sleep_fn=sleeps.append, on_event=lambda k, d: events.append(k),
    )
    total = bridge.run(stop_after=5)
    assert total == 5
    assert server.connections == 2
    assert bridge.reconnects >= 1 and sleeps  # backoff actually slept
    assert events.count("connect") == 2
    # every record durable, in order, across the connection drop
    chunks = sorted(f for f in os.listdir(spool) if f.startswith("chunk-"))
    got = []
    for c in chunks:
        got += open(spool / c).read().splitlines()
    assert got == recs
    # the partial chunk (record 3 alone) was flushed at the drop
    assert any(len(open(spool / c).read().splitlines()) == 1 for c in chunks)


def test_bridge_restart_resumes_chunk_numbering(tmp_path):
    spool = tmp_path / "spool"
    recs = [json.dumps({"id": i}) for i in range(3)]
    server = FlakyLineServer([recs])
    server.start()
    b1 = SocketLineBridge("127.0.0.1", server.port, str(spool),
                          chunk_records=1, sleep_fn=lambda d: None)
    b1.run(stop_after=3)
    n_before = len(os.listdir(spool))
    server2 = FlakyLineServer([[json.dumps({"id": 99})]])
    server2.start()
    b2 = SocketLineBridge("127.0.0.1", server2.port, str(spool),
                          chunk_records=1, sleep_fn=lambda d: None)
    b2.run(stop_after=1)
    names = sorted(os.listdir(spool))
    assert len(names) == n_before + 1
    # monotonic numbering continued — restarted bridge never clobbers
    assert names[-1] == f"chunk-{n_before:08d}.jsonl"


def test_bridge_gives_up_after_max_reconnects(tmp_path):
    # nothing listens on this port → every connect fails
    probe = socket.create_server(("127.0.0.1", 0))
    port = probe.getsockname()[1]
    probe.close()
    events = []
    bridge = SocketLineBridge(
        "127.0.0.1", port, str(tmp_path / "s"), max_reconnects=3,
        connect_timeout=0.2, sleep_fn=lambda d: None,
        on_event=lambda k, d: events.append(k),
    )
    assert bridge.run() == 0
    assert events.count("error") == 4  # initial + 3 retries
    assert events[-1] == "giveup"


def test_capture_from_socket_end_to_end(spark, dirs):
    """tcp:// source through start_capture: bridge spools, the file
    stream consumes, keyed upserts land — with a mid-stream drop."""
    _, tables, ckpt = dirs
    spool = os.path.join(os.path.dirname(tables), "spool")
    tweets = [minimal_tweet(i, f"kakapo number {i}") for i in (1, 2, 3)]
    lines = [json.dumps(t) for t in tweets]
    server = FlakyLineServer([lines[:2], lines[2:]])
    server.start()
    q = capture.start_capture(
        spark, f"tcp://127.0.0.1:{server.port}", tables, ckpt,
        phrases=["kakapo"], spool_dir=spool,
        bridge_kwargs={"chunk_records": 2, "stop_after": 3,
                       "sleep_fn": lambda d: None},
    )
    bridge = capture.active_bridge(spool)
    bridge._thread.join(30)
    assert bridge.records == 3 and bridge.reconnects >= 1
    q.processAllAvailable()
    q.stop()
    ids = sorted(r["id"] for r in spark.read.parquet(f"{tables}/tweets").collect())
    assert ids == [1, 2, 3]


def test_bridge_survives_flush_failure(tmp_path, monkeypatch):
    """ADVICE r2: an OSError from the finally-block flush (disk full,
    spool removed) must not kill the bridge thread — it reports an
    error event and the reconnect loop keeps running."""
    recs = [json.dumps({"id": i}) for i in range(4)]
    server = FlakyLineServer([recs[:2], recs[2:]])
    server.start()
    spool = tmp_path / "spool"
    events = []
    bridge = SocketLineBridge(
        "127.0.0.1", server.port, str(spool), chunk_records=10,
        sleep_fn=lambda d: None, on_event=lambda k, d: events.append(k),
        stop_after=4, max_reconnects=5,
    )
    real_flush = bridge._flush
    fails = {"n": 0}

    def flaky_flush(lines):
        if lines and fails["n"] == 0:
            fails["n"] += 1
            raise OSError("disk full")
        return real_flush(lines)

    monkeypatch.setattr(bridge, "_flush", flaky_flush)
    total = bridge.run()
    # first connection's partial flush failed (2 records lost to the
    # simulated disk error) but the loop reconnected and spooled the rest
    assert fails["n"] == 1
    assert "error" in events and "reconnect" in events
    assert total == 4
    files = [f for f in os.listdir(spool) if f.endswith(".jsonl")]
    assert files, "post-failure chunks still land"


# ----------------------------------------------------- S9 http bridge


def _flaky_http_server(payloads):
    """Local chunked-HTTP stand-in for the filtered-stream endpoint:
    each request streams one payload of line-JSON chunks; if more
    payloads remain the connection is severed WITHOUT the terminating
    chunk (the client sees IncompleteRead), else it ends cleanly."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    state = {"payloads": [list(p) for p in payloads], "posts": []}

    class Handler(BaseHTTPRequestHandler):
        def _serve(self):
            if self.command == "POST":
                n = int(self.headers.get("Content-Length", 0))
                state["posts"].append(self.rfile.read(n).decode())
            lines = state["payloads"].pop(0) if state["payloads"] else []
            self.send_response(200)
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            for line in lines:
                data = (line + "\n").encode()
                self.wfile.write(f"{len(data):x}\r\n".encode() + data + b"\r\n")
                self.wfile.flush()
            if state["payloads"]:
                self.connection.close()  # sever mid-stream: IncompleteRead
            else:
                self.wfile.write(b"0\r\n\r\n")

        do_GET = do_POST = _serve

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, srv.server_address[1], state


def test_http_bridge_resumes_after_dropped_connection(tmp_path):
    """VERDICT r2 #6: the reference's transport is a long-lived HTTPS
    POST (utils.py:603-633) — the http bridge must spool through a
    dropped chunked connection and resume, losing nothing."""
    from twitter_to_sqlite_spark.streaming.bridge import bridge_from_url

    recs = [json.dumps({"id": i, "txt": f"t{i}"}) for i in range(5)]
    srv, port, state = _flaky_http_server([recs[:3], recs[3:]])
    spool = tmp_path / "spool"
    events = []
    bridge = bridge_from_url(
        f"http://127.0.0.1:{port}/stream", str(spool),
        data={"track": "kakapo"}, headers={"X-Test": "1"},
        chunk_records=2, stop_after=5, max_reconnects=5,
        sleep_fn=lambda d: None, on_event=lambda k, d: events.append(k),
    )
    total = bridge.run()
    srv.shutdown()
    assert total == 5 and bridge.reconnects >= 1
    # a severed chunked body surfaces as either an error event or a
    # clean EOF — both fall through to the reconnect path
    assert "reconnect" in events
    got = []
    for f in sorted(os.listdir(spool)):
        if f.endswith(".jsonl"):
            got += open(os.path.join(spool, f)).read().splitlines()
    assert got == recs  # nothing lost, order preserved
    # the filtered-stream POST body reached the server on every connect
    assert state["posts"] and all("track=kakapo" in p for p in state["posts"])


def test_bridge_from_url_dispatch(tmp_path):
    from twitter_to_sqlite_spark.streaming import bridge as B

    s = B.bridge_from_url("tcp://h:9", str(tmp_path / "a"))
    assert type(s) is B.SocketLineBridge
    h = B.bridge_from_url("https://example.test/stream", str(tmp_path / "b"))
    assert isinstance(h, B.HttpLineBridge) and h.port == 443
    with pytest.raises(ValueError):
        B.bridge_from_url("ftp://nope", str(tmp_path / "c"))
