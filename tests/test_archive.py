"""Archive importer tests (reference test_import.py shape: build a zip
of window.YTD .js fixtures, import, assert tables/rows — on our own
fixture content)."""

from __future__ import annotations

import hashlib
import json
import zipfile

import pytest

from twitter_to_sqlite_spark.sources import archive as A


def make_zip(tmp_path, files: dict[str, object]) -> str:
    p = tmp_path / "archive.zip"
    with zipfile.ZipFile(p, "w") as z:
        for name, payload in files.items():
            z.writestr(
                f"{name}.js",
                f"window.YTD.{name.replace('-', '_')}.part0 = "
                + json.dumps(payload),
            )
        z.writestr("assets/ignored.js", "window.YTD.x.part0 = []")
    return str(p)


FILES = {
    "account": [{
        "account": {
            "phoneNumber": "+15550100",
            "email": "robin@example.com",
            "createdVia": "web",
            "username": "robinex",
            "accountId": "101",
            "createdAt": "2016-11-15T13:18:50.000Z",
            "accountDisplayName": "Robin Example",
        }
    }],
    "account-suspension": [],
    "app": [{"app": {"appId": "268278", "appNames": ["Example Radio"]}}],
    "follower": [{"follower": {"accountId": "4040"}},
                 {"follower": {"accountId": "5050"}}],
    "following": [{"following": {"accountId": "6060"}}],
    "saved-search": [{"savedSearch": {"savedSearchId": "777", "query": "tide pools"}}],
}


@pytest.fixture(scope="module")
def imported(spark, tmp_path_factory):
    path = make_zip(tmp_path_factory.mktemp("arch"), FILES)
    return {k: v.collect() for k, v in A.import_archive(spark, path).items()}


def test_tables_created(imported):
    assert sorted(imported) == [
        "archive_account",
        "archive_app",
        "archive_follower",
        "archive_following",
        "archive_saved_search",
    ]  # suspension: empty array → no table; assets/ skipped


def test_account_hash_pk(imported):
    rows = imported["archive_account"]
    assert len(rows) == 1
    r = rows[0].asDict()
    assert r["username"] == "robinex"
    assert len(r["pk"]) == 40  # sha1 hex content key (K4)


def test_app_json_text_column(imported):
    r = imported["archive_app"][0].asDict()
    assert r["appId"] == "268278"
    assert json.loads(r["appNames"]) == ["Example Radio"]


def test_followers(imported):
    ids = sorted(r["accountId"] for r in imported["archive_follower"])
    assert ids == ["4040", "5050"]
    assert [r["accountId"] for r in imported["archive_following"]] == ["6060"]


def test_extract_json_rejects_garbage():
    with pytest.raises(ValueError):
        A.extract_json(b"not an archive")


def test_tweet_id_casting():
    fn, pks = A.TRANSFORMERS["tweet"]
    out = fn([
        {"tweet": {"id": "123", "in_reply_to_status_id": "456",
                   "full_text": "x", "id_str": "123"}},
        {"id": "789", "full_text": "bare"},
    ])["archive_tweet"]
    assert out[0]["id"] == 123 and out[0]["in_reply_to_status_id"] == 456
    assert out[0]["id_str"] == "123"  # only id/*_id cast (P8)
    assert out[1]["id"] == 789
    for k in A.ARCHIVE_TWEET_OPTIONAL:
        assert k in out[0] and out[0][k] is None


def test_ni_devices_pivot():
    fn, _ = A.TRANSFORMERS["ni-devices"]
    out = fn([{"niDeviceResponse": {
        "messagingDevice": {"carrier": "ex", "phoneNumber": "+1555"},
    }}])
    rows = out["archive_ne_devices"]
    assert rows == [{"category": "messagingDevice", "carrier": "ex",
                     "phoneNumber": "+1555"}]


def test_generic_fallback(spark, tmp_path):
    path = make_zip(tmp_path, {"mystery-data": [{"mystery": {"a": 1}}]})
    out = A.import_archive(spark, path)
    rows = out["archive_mystery_data"].collect()
    assert rows[0]["a"] == 1
    assert len(rows[0]["pk"]) == 40


def test_directory_input(spark, tmp_path):
    d = tmp_path / "unzipped"
    d.mkdir()
    (d / "follower.js").write_text(
        "window.YTD.follower.part0 = "
        + json.dumps([{"follower": {"accountId": "9"}}])
    )
    out = A.import_archive(spark, str(d))
    assert [r["accountId"] for r in out["archive_follower"].collect()] == ["9"]
