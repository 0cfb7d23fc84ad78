"""Twitter-archive importer (SURVEY §2.1 S10/S11, §2.3 P8-P10, §2.2 K3/K4).

The reference (archive.py) reads a .zip of `window.YTD.<name>.part0 =
[...]` JavaScript files, transforms each through a per-file registry,
and drop-recreates `archive_<name>` tables. Here:

  read_archive_js    S10: (name, payload-bytes) per .js in a zip/dir
  extract_json       S11: strip the `window.YTD…= ` prefix, parse JSON
  TRANSFORMERS       P10: filename → rows-transform registry
  import_archive     orchestrates → {table_name: DataFrame}, written
                     with overwrite (K3) and content-hash pk (K4) when
                     the file declares none

The registry covers every file type the reference tests exercise plus
the structurally interesting ones (tweet id-casting P8, ni-devices
pivot, multi-table personalization fan-out); unknown files fall back
to a generic single-key unwrap, mirroring the reference's
"not yet implemented" behavior but still landing the rows.

Scale: archives are per-user (MBs); parsing happens driver-side like
the reference, then Spark owns the tables. For fleet-scale import
(millions of archives) the same extract_json runs in mapInPandas over
spark.read.format("binaryFile") — the registry is pure and reusable.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_archive_js(path: str) -> Iterator[tuple[str, bytes]]:
    """S10 (utils.py:656-665): yield (basename-without-.js, bytes) for
    every *.js not under assets/, from a zip or a directory."""
    if os.path.isdir(path):
        for fn in sorted(os.listdir(path)):
            if fn.endswith(".js"):
                with open(os.path.join(path, fn), "rb") as f:
                    yield fn[:-3], f.read()
        return
    with zipfile.ZipFile(path) as z:
        for info in z.infolist():
            name = info.filename
            if not name.endswith(".js") or name.startswith("assets/"):
                continue
            base = os.path.basename(name)[:-3]
            yield base, z.read(name)


def extract_json(payload: bytes) -> object:
    """S11 (archive.py:45-50): drop everything before the first '=' on
    the `window.YTD.<name>.part0 = ` line, parse the remainder."""
    text = payload.decode("utf-8")
    head, sep, rest = text.partition("=")
    if not sep or not head.lstrip().startswith("window."):
        raise ValueError("not a window.YTD archive file")
    return json.loads(rest.strip())


# ---------------------------------------------------------------- P10
# Registry: name → (transform(items) -> {table: rows}, {table: pk}).
# pk None → content-hash key (K4).

Transform = Callable[[list], dict[str, list]]
TRANSFORMERS: dict[str, tuple[Transform, dict[str, str | None]]] = {}


def register(name: str, pks: dict[str, str | None] | None = None):
    def deco(fn: Transform):
        TRANSFORMERS[name] = (fn, pks or {})
        return fn
    return deco


def _unwrap(items: list, key: str) -> list:
    return [item[key] for item in items if key in item]


@register("account", {"archive_account": None})
def _account(items):
    return {"archive_account": _unwrap(items, "account")}


@register("app", {"archive_app": "appId"})
def _app(items):
    rows = []
    for r in _unwrap(items, "app"):
        r = dict(r)
        if "appNames" in r:
            r["appNames"] = json.dumps(r["appNames"])
        rows.append(r)
    return {"archive_app": rows}


@register("follower", {"archive_follower": "accountId"})
def _follower(items):
    return {"archive_follower": _unwrap(items, "follower")}


@register("following", {"archive_following": "accountId"})
def _following(items):
    return {"archive_following": _unwrap(items, "following")}


@register("saved-search", {"archive_saved_search": "savedSearchId"})
def _saved_search(items):
    return {"archive_saved_search": _unwrap(items, "savedSearch")}


@register("account-suspension")
def _account_suspension(items):
    return {}  # reference fixture: empty array → no table


ARCHIVE_TWEET_OPTIONAL = ("possibly_sensitive", "coordinates", "geo",
                          "extended_entities")


@register("tweet", {"archive_tweet": "id"})
def _tweet(items):
    """P8 (archive.py:191-207): unwrap optional {"tweet": ...}, cast id
    and every *_id string to int, default 4 optional fields to None."""
    rows = []
    for item in items:
        t = dict(item.get("tweet", item))
        for k, v in list(t.items()):
            if (k == "id" or k.endswith("_id")) and isinstance(v, str):
                try:
                    t[k] = int(v)
                except ValueError:
                    pass
        for k in ARCHIVE_TWEET_OPTIONAL:
            t.setdefault(k, None)
        rows.append(t)
    return {"archive_tweet": rows}


@register("ni-devices", {"archive_ne_devices": None})
def _ni_devices(items):
    """Pivot: each item is {"niDeviceResponse": {<category>: {...}}} —
    key becomes a `category` column (archive.py:132-141; the reference
    writes table 'ne-devices', a typo we preserve for parity)."""
    rows = []
    for item in items:
        body = item.get("niDeviceResponse", item)
        for category, payload in body.items():
            rows.append({"category": category, **payload})
    return {"archive_ne_devices": rows}


@register("personalization")
def _personalization(items):
    """Multi-table fan-out (archive.py:147-180): one record explodes
    into interest/advertiser/language/... tables."""
    out: dict[str, list] = {}

    def add(table, rows):
        if rows:
            out.setdefault(f"archive_{table}", []).extend(rows)

    for item in items:
        p = item.get("p13nData", item)
        demo = p.get("demographics", {})
        if "languages" in demo:
            add("personalization_languages", demo["languages"])
        if "genderInfo" in demo:
            add("personalization_gender", [demo["genderInfo"]])
        interests = p.get("interests", {})
        if "interests" in interests:
            add("personalization_interests", interests["interests"])
        if "partnerInterests" in interests:
            add("personalization_partner_interests", interests["partnerInterests"])
        if "audienceAndAdvertisers" in interests:
            aa = interests["audienceAndAdvertisers"]
            add("personalization_advertisers",
                [{"name": n} for n in aa.get("advertisers", [])])
            add("personalization_audience",
                [{"targeting": t} for t in aa.get("numAudiences", []) or []])
        if "shows" in interests:
            add("personalization_shows", [{"name": s} for s in interests["shows"]])
        if "locationHistory" in p:
            add("personalization_locations",
                [{"location": loc} for loc in p["locationHistory"]])
        if "inferredAgeInfo" in p:
            add("personalization_age", [p["inferredAgeInfo"]])
    return out


def _generic(name: str) -> tuple[Transform, dict]:
    """Fallback: single-key unwrap if every item wraps one key, else
    pass items through; content-hash pk."""
    table = "archive_" + name.replace("-", "_")

    def fn(items: list) -> dict[str, list]:
        if items and all(isinstance(i, dict) and len(i) == 1 for i in items):
            keys = {next(iter(i)) for i in items}
            if len(keys) == 1:
                return {table: _unwrap(items, keys.pop())}
        return {table: [i if isinstance(i, dict) else {"value": i} for i in items]}

    return fn, {table: None}


def _rows_to_df(spark: SparkSession, rows: list) -> DataFrame:
    # Archive payloads are small and schemaless — sample-based inference
    # via json lines keeps nested values as JSON text like sqlite_utils.
    flat = []
    for r in rows:
        fr = {}
        for k, v in r.items():
            fr[k] = json.dumps(v) if isinstance(v, (dict, list)) else v
        flat.append(fr)
    return spark.read.json(
        spark.sparkContext.parallelize([json.dumps(r) for r in flat], 1)
    )


def import_archive(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Import a full archive: {table_name: DataFrame}, hash-keyed where
    the file declares no pk (K4), full-refresh semantics (K3 — caller
    overwrites any existing table of the same name)."""
    from twitter_to_sqlite_spark.operators.sinks import hash_id_plan

    out: dict[str, DataFrame] = {}
    for name, payload in read_archive_js(path):
        try:
            items = extract_json(payload)
        except ValueError:
            continue
        if not isinstance(items, list) or not items:
            continue
        fn, pks = TRANSFORMERS.get(name, _generic(name))
        for table, rows in fn(items).items():
            if not rows:
                continue
            df = _rows_to_df(spark, rows)
            pk = pks.get(table)
            if pk is None:
                df = hash_id_plan(df, id_col="pk")
            out[table] = df
    return out
