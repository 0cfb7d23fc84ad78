"""Unit tests for the API source loops (S1-S8) with a fake HTTP fetch —
the reference's pagination/retry/watermark semantics without a network."""

from __future__ import annotations

import pytest

from twitter_to_sqlite_spark.sources import api


def make_timeline_fetch(tweets, fail_first_with_88=0):
    """Serve tweets (desc by id) honoring count/max_id/since_id like the
    statuses endpoints; optionally fail the first N calls rate-limited."""
    state = {"calls": 0, "fails": fail_first_with_88}

    def fetch(url, params):
        state["calls"] += 1
        if state["fails"] > 0:
            state["fails"] -= 1
            return 429, {"errors": [{"code": 88, "message": "Rate limit exceeded"}]}
        rows = sorted(tweets, key=lambda t: -t["id"])
        if "max_id" in params:
            rows = [t for t in rows if t["id"] <= params["max_id"]]
        if "since_id" in params:
            rows = [t for t in rows if t["id"] > params["since_id"]]
        return 200, rows[: params["count"]]

    fetch.state = state
    return fetch


TWEETS = [{"id": i, "full_text": f"t{i}"} for i in range(1, 11)]


def test_timeline_scan_paginates_to_exhaustion():
    fetch = make_timeline_fetch(TWEETS)
    scan = api.TimelineScan(fetch, "statuses/user_timeline.json", page_size=3)
    pages = list(scan.pages())
    ids = [t["id"] for p in pages for t in p.rows]
    assert ids == [10, 9, 8, 7, 6, 5, 4, 3, 2, 1]
    # max_id descent: page mins drive the next request
    assert [p.min_id for p in pages] == [8, 5, 2, 1]


def test_timeline_scan_since_id_watermark():
    fetch = make_timeline_fetch(TWEETS)
    scan = api.TimelineScan(fetch, "u", page_size=5, since_id=7)
    ids = [t["id"] for p in scan.pages() for t in p.rows]
    assert ids == [10, 9, 8]


def test_timeline_scan_stop_after():
    fetch = make_timeline_fetch(TWEETS)
    scan = api.TimelineScan(fetch, "u", page_size=4, stop_after=4)
    ids = [t["id"] for p in scan.pages() for t in p.rows]
    assert ids == [10, 9, 8, 7]


def test_rate_limit_retry_then_success():
    slept = []
    fetch = make_timeline_fetch(TWEETS[:2], fail_first_with_88=2)
    scan = api.TimelineScan(fetch, "u", page_size=5, sleep_fn=slept.append)
    ids = [t["id"] for p in scan.pages() for t in p.rows]
    assert ids == [2, 1]
    assert slept == [api.RATE_LIMIT_SLEEP] * 2


def test_rate_limit_exhaustion_raises():
    fetch = make_timeline_fetch(TWEETS, fail_first_with_88=99)
    scan = api.TimelineScan(fetch, "u", sleep_fn=lambda s: None)
    with pytest.raises(api.ApiError):
        list(scan.pages())


def test_nested_key_payload():
    # search responses nest rows under "statuses" (cli.py:770-880)
    def fetch(url, params):
        rows = [t for t in sorted(TWEETS, key=lambda t: -t["id"])
                if t["id"] <= params.get("max_id", 99)]
        return 200, {"statuses": rows[: params["count"]]}

    scan = api.TimelineScan(fetch, "search/tweets.json", page_size=6, key="statuses")
    ids = [t["id"] for p in scan.pages() for t in p.rows]
    assert ids == [10, 9, 8, 7, 6, 5, 4, 3, 2, 1]


def test_cursor_paginate():
    pages = {
        -1: {"users": [{"id": 1}], "next_cursor": 42},
        42: {"users": [{"id": 2}], "next_cursor": 0},
    }

    def fetch(url, params):
        return 200, pages[params["cursor"]]

    got = list(api.cursor_paginate(fetch, "followers/list.json", {}, "users"))
    assert [[u["id"] for u in p] for p in got] == [[1], [2]]


def test_batch_lookup_chunks():
    calls = []

    def fetch(url, params):
        calls.append(params)
        ids = params["user_id"].split(",")
        return 200, [{"id": int(i)} for i in ids]

    out = [u for batch in api.batch_lookup(
        fetch, "users/lookup.json", list(range(100)), "user_id", 70
    ) for u in batch]
    assert len(out) == 100
    assert [len(c["user_id"].split(",")) for c in calls] == [70, 30]


def test_get_profile_user_does_not_exist():
    def fetch(url, params):
        return 404, {"errors": [{"code": 50, "message": "User not found."}]}

    with pytest.raises(api.UserDoesNotExist):
        api.get_profile(fetch, "users/show.json", screen_name="ghost")


def test_resolve_identifiers_sql(spark):
    df = spark.createDataFrame([(5,), (6,)], "id long")
    out = api.resolve_identifiers_sql(
        spark, [1], "SELECT id FROM idents ORDER BY id", {"idents": df}
    )
    assert out == [1, 5, 6]


def test_file_fetch_endpoint_envelopes(tmp_path):
    """ADVICE r1 (medium): --input-json must serve cursor-paginated
    endpoints as {'<key>': [...], 'next_cursor': 0} dicts, profile
    endpoints as a single dict — not bare lists."""
    import json as _json

    from twitter_to_sqlite_spark.cli import _file_fetch

    users = [
        {"id": 1, "screen_name": "alpha", "followers_count": 5},
        {"id": 2, "screen_name": "beta", "followers_count": 6},
    ]
    p = tmp_path / "users.json"
    p.write_text(_json.dumps(users))
    fetch = _file_fetch(str(p))

    status, body = fetch("https://api.twitter.com/1.1/followers/list.json",
                         {"cursor": -1, "count": 200})
    assert status == 200 and body["next_cursor"] == 0
    assert {u["id"] for u in body["users"]} == {1, 2}

    status, body = fetch("https://api.twitter.com/1.1/lists/ownerships.json",
                         {"cursor": -1})
    assert "lists" in body and body["next_cursor"] == 0

    status, body = fetch("https://api.twitter.com/1.1/users/show.json",
                         {"screen_name": "beta"})
    assert body["id"] == 2
    status, body = fetch("https://api.twitter.com/1.1/users/show.json",
                         {"user_id": 99})
    assert body["errors"][0]["code"] == 50
    status, body = fetch(
        "https://api.twitter.com/1.1/account/verify_credentials.json", {})
    assert body["id"] == 1

    ids_file = tmp_path / "ids.json"
    ids_file.write_text(_json.dumps([11, 12, 13]))
    status, body = _file_fetch(str(ids_file))(
        "https://api.twitter.com/1.1/followers/ids.json", {"cursor": -1})
    assert body == {"ids": [11, 12, 13], "next_cursor": 0}

    # cursor_paginate drives it end-to-end without TypeError
    from twitter_to_sqlite_spark.sources.api import cursor_paginate
    pages = list(cursor_paginate(
        fetch, "https://api.twitter.com/1.1/friends/list.json", {}, "users"))
    assert len(pages) == 1 and len(pages[0]) == 2
