"""Command-layer tests: each reference CLI entry point driven with a
fake fetch against a temp TweetDatabase (reference §3 lifecycles)."""

from __future__ import annotations

import json

import pytest

from twitter_to_sqlite_spark import commands as C
from twitter_to_sqlite_spark.database import TweetDatabase


def fixture_tweets():
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures", "tweets.json")
    return [json.loads(line) for line in open(path)]


def timeline_fetch(tweets):
    def fetch(url, params):
        rows = sorted(tweets, key=lambda t: -t["id"])
        if "max_id" in params:
            rows = [t for t in rows if t["id"] <= params["max_id"]]
        if "since_id" in params:
            rows = [t for t in rows if t["id"] > params["since_id"]]
        rows = rows[: params["count"]]
        if "search" in url:
            return 200, {"statuses": rows}
        return 200, rows
    return fetch


@pytest.fixture()
def db(spark, tmp_path):
    return TweetDatabase(spark, str(tmp_path / "db"))


def test_user_timeline_full_pipeline_and_watermark(spark, db):
    fetch = timeline_fetch(fixture_tweets())
    n = C.user_timeline(spark, fetch, db, 101)
    assert n == 3
    tweets = {r["id"] for r in db.read("tweets").collect()}
    assert tweets == {8001, 8002, 9001, 9002, 9003}  # nested flattened
    users = {r["id"] for r in db.read("users").collect()}
    assert users == {101, 501, 502}
    # watermark advanced to max id seen
    assert db.watermarks.get("user", "id:101") == 9003
    # incremental: nothing new above the watermark → 0 fetched
    assert C.user_timeline(spark, fetch, db, 101, since=True) == 0
    # count_history seeded for tracked types
    ch = db.read("count_history")
    assert ch is not None and ch.count() > 0


def test_home_timeline_bridges_provenance(spark, db):
    fetch = timeline_fetch(fixture_tweets())
    C.home_timeline(spark, fetch, db, auth_user_id=42)
    bridge = {(r["user"], r["tweet"]) for r in db.read("timeline_tweets").collect()}
    assert bridge == {(42, 9001), (42, 9002), (42, 9003)}


def test_mentions_timeline_bridge(spark, db):
    fetch = timeline_fetch(fixture_tweets())
    C.mentions_timeline(spark, fetch, db, auth_user_id=7)
    assert db.read("mentions_tweets").count() == 3


def test_favorites_bridge(spark, db):
    fetch = timeline_fetch(fixture_tweets())
    C.favorites(spark, fetch, db, user_id=42)
    fav = {(r["user"], r["tweet"]) for r in db.read("favorited_by").collect()}
    assert fav == {(42, 9001), (42, 9002), (42, 9003)}


def test_search_provenance(spark, db):
    fetch = timeline_fetch(fixture_tweets())
    n = C.search(spark, fetch, db, "tidal pools", lang="en")
    assert n == 3
    runs = db.read("search_runs").collect()
    assert len(runs) == 1
    assert runs[0]["name"] == "tidal pools"
    assert len(runs[0]["hash"]) == 40
    args = json.loads(runs[0]["args"])
    assert args == {"lang": "en", "q": "tidal pools"}
    bridged = {r["tweet"] for r in db.read("search_runs_tweets").collect()}
    assert bridged == {9001, 9002, 9003}
    # same args → same watermark key → incremental fetch is empty
    assert C.search(spark, fetch, db, "tidal pools", since=True, lang="en") == 0


def test_users_lookup(spark, db):
    profiles = [fixture_tweets()[0]["user"], fixture_tweets()[1]["retweeted_status"]]
    profiles = [fixture_tweets()[0]["user"],
                fixture_tweets()[0]["retweeted_status"]["user"]]

    def fetch(url, params):
        names = params["screen_name"].split(",")
        return 200, [p for p in profiles if p["screen_name"] in names]

    n = C.users_lookup(spark, fetch, db, ["robinex", "scenic_routes"])
    assert n == 2
    users = {r["screen_name"] for r in db.read("users").collect()}
    assert users == {"robinex", "scenic_routes"}


def test_statuses_lookup_skip_existing(spark, db):
    all_tweets = fixture_tweets()

    calls = []

    def fetch(url, params):
        ids = [int(i) for i in params["id"].split(",")]
        calls.append(ids)
        return 200, [t for t in all_tweets if t["id"] in ids]

    C.statuses_lookup(spark, fetch, db, [9001])
    assert db.read("tweets").filter("id = 9001").count() == 1
    # skip_existing drops already-present ids (F1)
    C.statuses_lookup(spark, fetch, db, [9001, 9002], skip_existing=True)
    assert calls[-1] == [9002]


def test_followers_and_edges_first_seen(spark, db):
    profile = dict(fixture_tweets()[0]["user"])
    pages = {
        -1: {"users": [fixture_tweets()[0]["retweeted_status"]["user"]],
             "next_cursor": 0},
    }

    def fetch(url, params):
        return 200, pages[params["cursor"]]

    n = C.followers(spark, fetch, db, profile)
    assert n == 1
    edges = [(r["followed_id"], r["follower_id"]) for r in db.read("following").collect()]
    assert edges == [(101, 501)]
    first = db.read("following").collect()[0]["first_seen"]
    # re-run: first_seen preserved (K2 ignore semantics)
    C.followers(spark, fetch, db, profile)
    assert db.read("following").collect()[0]["first_seen"] == first


def test_followers_ids(spark, db):
    pages = {
        -1: {"ids": [1, 2, 3], "next_cursor": 7},
        7: {"ids": [4], "next_cursor": 0},
    }

    def fetch(url, params):
        return 200, pages[params["cursor"]]

    n = C.followers_ids(spark, fetch, db, 101)
    assert n == 4
    edges = {(r["followed_id"], r["follower_id"]) for r in db.read("following").collect()}
    assert edges == {(101, 1), (101, 2), (101, 3), (101, 4)}
    # friends-ids reverses direction
    C.followers_ids(spark, fetch, db, 101, reverse=True)
    edges2 = {(r["followed_id"], r["follower_id"]) for r in db.read("following").collect()}
    assert (1, 101) in edges2


def test_lists_and_members(spark, db):
    owner = fixture_tweets()[0]["user"]
    the_list = {
        "id": 333, "id_str": "333", "name": "naturalists", "slug": "naturalists",
        "full_name": "@robinex/naturalists", "created_at": "Sat Jan 04 12:00:00 +0000 2020",
        "member_count": 1, "mode": "public", "user": owner,
    }
    member = fixture_tweets()[0]["retweeted_status"]["user"]

    def fetch(url, params):
        if "ownerships" in url:
            return 200, {"lists": [the_list], "next_cursor": 0}
        return 200, {"users": [member], "next_cursor": 0}

    C.lists_command(spark, fetch, db, 101, members=True)
    lists = db.read("lists").collect()
    assert [(r["id"], r["name"], r["user"]) for r in lists] == [(333, "naturalists", 101)]
    lm = {(r["list"], r["user"]) for r in db.read("list_members").collect()}
    assert lm == {(333, 501)}


def test_count_history_change_detection(spark, db):
    u1 = dict(fixture_tweets()[0]["user"])

    def fetch_v(count):
        u = dict(u1, followers_count=count)

        def fetch(url, params):
            return 200, [u]
        return fetch

    C.users_lookup(spark, fetch_v(100), db, ["robinex"])
    C.users_lookup(spark, fetch_v(100), db, ["robinex"])  # unchanged: no new row
    C.users_lookup(spark, fetch_v(105), db, ["robinex"])  # changed: new row
    ch = db.read("count_history").filter("type = 1").collect()
    counts = sorted(r["count"] for r in ch)
    assert counts == [100, 105]


def test_import_archive_command(spark, db, tmp_path):
    import zipfile
    zp = tmp_path / "a.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("follower.js",
                   "window.YTD.follower.part0 = "
                   + json.dumps([{"follower": {"accountId": "42"}}]))
    tables = C.import_archive_command(spark, db, str(zp))
    assert tables == ["archive_follower"]
    assert db.read("archive_follower").count() == 1


def test_followers_stub_profile_does_not_null_users(spark, db):
    """ADVICE r1 (high): an id-only profile stub must not replace-upsert
    over a hydrated users row."""
    hydrated = dict(fixture_tweets()[0]["user"])  # id 101, full profile
    follower = fixture_tweets()[0]["retweeted_status"]["user"]

    def fetch(url, params):
        return 200, {"users": [follower], "next_cursor": 0}

    C.followers(spark, fetch, db, hydrated)
    name_before = db.read("users").filter("id = 101").collect()[0]["screen_name"]
    assert name_before is not None
    # Re-run with only the id available (offline fallback path).
    C.followers(spark, fetch, db, {"id": 101})
    row = db.read("users").filter("id = 101").collect()[0]
    assert row["screen_name"] == name_before  # not nulled


def test_user_timeline_screen_name_and_default(spark, db):
    """ADVICE r1 (low): screen-name identifiers resolve via users/show;
    None resolves via verify_credentials."""
    tweets = fixture_tweets()
    me = dict(tweets[0]["user"])

    def fetch(url, params):
        if "users/show" in url:
            assert params.get("screen_name") == me["screen_name"]
            return 200, me
        if "verify_credentials" in url:
            return 200, me
        return timeline_fetch(tweets)(url, params)

    n = C.user_timeline(spark, fetch, db, me["screen_name"])
    assert n == 3
    assert db.watermarks.get("user", f"id:{me['id']}") == 9003
    # None → authenticated user; watermark already set so since → 0 new
    assert C.user_timeline(spark, fetch, db, None, since=True) == 0


def test_resolve_profile_numeric_vs_name(spark):
    calls = []

    def fetch(url, params):
        calls.append(params)
        return 200, {"id": 7, "screen_name": "seven"}

    assert C.resolve_profile(fetch, "7")["id"] == 7
    assert calls[-1] == {"user_id": 7}
    assert C.resolve_profile(fetch, "seven")["id"] == 7
    assert calls[-1] == {"screen_name": "seven"}
