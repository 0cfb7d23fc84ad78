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

Scale: one archive is per-user (MBs) — `import_archive` parses it
driver-side like the reference, then Spark owns the tables. For
fleet-scale import (millions of archives), `import_archives_fleet`
runs the same registry executor-side: binaryFile scan → mapInPandas
extract/transform → distributed schema derivation → the same tables,
with optional per-archive provenance. Both paths share one explicit
type-join (`_merge_tags`), so their outputs are identical.
"""

from __future__ import annotations

import io
import json
import os
import zipfile
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _zip_js_entries(z: zipfile.ZipFile) -> Iterator[tuple[str, bytes]]:
    for info in z.infolist():
        name = info.filename
        if not name.endswith(".js") or name.startswith("assets/"):
            continue
        yield os.path.basename(name)[:-3], z.read(name)


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
        yield from _zip_js_entries(z)


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
# pk None → content-hash key (K4). Coverage mirrors the reference's
# full transformer table (archive.py:53-211): simple each-unwraps, the
# ad-table nested plucks, dm headers, lists URL splits, the tweet
# id-cast, the ni-devices pivot, and the personalization fan-out.

Transform = Callable[[list], dict[str, list]]
TRANSFORMERS: dict[str, tuple[Transform, dict[str, str | None]]] = {}

# Deliberately ignored files (reference archive.py:11).
IGNORE = {"manifest"}


def register(name: str, pks: dict[str, str | None] | None = None):
    def deco(fn: Transform):
        TRANSFORMERS[name] = (fn, pks or {})
        return fn
    return deco


def _unwrap(items: list, key: str) -> list:
    return [item[key] for item in items if key in item]


def _table(name: str) -> str:
    return "archive_" + name.replace("-", "_")


def register_simple(name: str, each: str, pk: str | None = None) -> None:
    """The reference's ``register(filename, each=..., pk=...)`` shape
    (archive.py:14-18): one table, one unwrapped key per item."""
    table = _table(name)

    def fn(items: list) -> dict[str, list]:
        return {table: _unwrap(items, each)}

    TRANSFORMERS[name] = (fn, {table: pk})


def register_pluck(name: str, path: list[str], pk: str | None = None) -> None:
    """The reference's ``register_each`` ad-table shape (archive.py:
    59-91): per item, descend a nested key path (e.g.
    item["ad"]["adsUserData"]["adEngagements"]) and land that dict."""
    table = _table(name)

    def fn(items: list) -> dict[str, list]:
        rows = []
        for item in items:
            cur = item
            for key in path:
                if not isinstance(cur, dict) or key not in cur:
                    cur = None
                    break
                cur = cur[key]
            if cur is not None:
                rows.append(cur)
        return {table: rows}

    TRANSFORMERS[name] = (fn, {table: pk})


# Simple each-unwraps (reference archive.py:53-56,94-110,128,183-186,208).
register_simple("account-creation-ip", "accountCreationIp")
register_simple("account-suspension", "accountSuspension")
register_simple("account-timezone", "accountTimezone")
register_simple("account", "account")
register_simple("app", "app", pk="appId")
register_simple("block", "blocking", pk="accountId")
register_simple("connected-application", "connectedApplication", pk="id")
register_simple("direct-message-group-headers", "dmConversation", pk="conversationId")
register_simple("direct-messages-group", "dmConversation", pk="conversationId")
register_simple("direct-message-headers", "dmConversation", pk="conversationId")
# no pk: the reference leaves it hash-keyed because of dupes
register_simple("direct-messages", "dmConversation")
register_simple("email-address-change", "emailAddressChange")
register_simple("follower", "follower", pk="accountId")
register_simple("following", "following", pk="accountId")
register_simple("ip-audit", "ipAudit")
register_simple("like", "like", pk="tweetId")
register_simple("moment", "moment", pk="momentId")
register_simple("phone-number", "device")
register_simple("profile", "profile")
register_simple("saved-search", "savedSearch", pk="savedSearchId")
register_simple("verified", "verified")

# Ad tables (reference archive.py:59-91): nested adsUserData plucks.
for _ad_name, _ad_key in [
    ("ad-engagements", "adEngagements"),
    ("ad-impressions", "adImpressions"),
    ("ad-mobile-conversions-attributed", "attributedMobileAppConversions"),
    ("ad-mobile-conversions-unattributed", "unattributedMobileAppConversions"),
    ("ad-online-conversions-attributed", "attributedOnlineConversions"),
    ("ad-online-conversions-unattributed", "unattributedOnlineConversions"),
]:
    register_pluck(_ad_name, ["ad", "adsUserData", _ad_key])

# ageinfo (reference archive.py:94-96): ageMeta.ageInfo pluck.
register_pluck("ageinfo", ["ageMeta", "ageInfo"])


def _list_from_common(data: list) -> list:
    """P9 (reference archive.py:213-226): userListInfo.urls (or single
    url) split on '/' into {screen_name, list_slug} rows — the list's
    owner handle and slug from its canonical URL."""
    lists = []
    for block in data:
        info = block.get("userListInfo", {})
        if "urls" in info:
            urls = info["urls"]
        elif "url" in info:
            urls = [info["url"]]
        else:
            urls = []
        for url in urls:
            bits = url.split("/")
            lists.append({"screen_name": bits[-3], "list_slug": bits[-1]})
    return lists


for _list_name in ("lists-created", "lists-member", "lists-subscribed"):
    def _make_list_fn(table):
        def fn(items: list) -> dict[str, list]:
            return {table: _list_from_common(items)}
        return fn
    TRANSFORMERS[_list_name] = (_make_list_fn(_table(_list_name)), {_table(_list_name): None})


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
    """Multi-table fan-out (reference archive.py:147-180): the single
    p13nData record explodes into the reference's exact table set —
    demographics-languages/-genderInfo, interests, partnerInterests,
    advertisers, num-audiences (one row), shows, locationHistory,
    inferredAgeInfo."""
    out: dict[str, list] = {}
    if not items:
        return out
    p = items[0].get("p13nData", items[0])

    def add(table, rows):
        if rows:
            out.setdefault(_table(table), []).extend(rows)

    demo = p.get("demographics", {})
    if "languages" in demo:
        add("personalization-demographics-languages", demo["languages"])
    if "genderInfo" in demo:
        add("personalization-demographics-genderInfo", [demo["genderInfo"]])
    interests = p.get("interests", {})
    if "interests" in interests:
        add("personalization-interests", interests["interests"])
    if "partnerInterests" in interests:
        add("personalization-partnerInterests", interests["partnerInterests"])
    if "audienceAndAdvertisers" in interests:
        aa = interests["audienceAndAdvertisers"]
        add("personalization-advertisers",
            [{"name": n} for n in aa.get("advertisers", [])])
        if "numAudiences" in aa:
            add("personalization-num-audiences",
                [{"numAudiences": aa["numAudiences"]}])
    if "shows" in interests:
        add("personalization-shows", [{"name": s} for s in interests["shows"]])
    if "locationHistory" in p:
        add("personalization-locationHistory",
            [{"name": loc} for loc in p["locationHistory"]])
    if "inferredAgeInfo" in p:
        add("personalization-inferredAgeInfo", [p["inferredAgeInfo"]])
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


# ------------------------------------------------- schema derivation
# Explicit schemas instead of Spark JSON inference (VERDICT r2 #5):
# both the driver-loop and the fleet path derive the same schema from
# the same scalar type tags, so their outputs are identical.

def _flatten(r: dict) -> dict:
    """Nested values become JSON text (sqlite_utils stores them as TEXT
    — utils.py's jsonify); scalars pass through."""
    return {
        k: json.dumps(v) if isinstance(v, (dict, list)) else v
        for k, v in r.items()
    }


def _tag(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):  # bool before int: bool is an int subclass
        return "bool"
    if isinstance(v, int):
        return "int"
    if isinstance(v, float):
        return "float"
    return "str"


_TAG_TYPES = {
    "bool": T.BooleanType(),
    "int": T.LongType(),
    "float": T.DoubleType(),
    "str": T.StringType(),
    "null": T.StringType(),
}


def _merge_tags(tags) -> str:
    """Commutative/associative type join — archive-order independent:
    one numeric widening (int+float → double), anything else mixed
    degrades to string (the JSON token text), all-null → string."""
    s = set(tags) - {"null"}
    if not s:
        return "null"
    if len(s) == 1:
        return s.pop()
    if s == {"int", "float"}:
        return "float"
    return "str"


def _coerce(v, tag):
    if v is None:
        return None
    if tag == "str" and not isinstance(v, str):
        return json.dumps(v)  # mixed-type column: keep the JSON token
    if tag == "float" and isinstance(v, int) and not isinstance(v, bool):
        return float(v)
    return v


def _rows_to_df(spark: SparkSession, rows: list) -> DataFrame:
    """Driver-loop materialization with an EXPLICIT schema: fields are
    the union of keys sorted alphabetically, types the merged scalar
    tags — no single-partition JSON inference round-trip, and the same
    derivation the distributed fleet path uses."""
    flat = [_flatten(r) for r in rows]
    tags: dict[str, set] = {}
    for fr in flat:
        for k, v in fr.items():
            tags.setdefault(k, set()).add(_tag(v))
    keys = sorted(tags)
    merged = {k: _merge_tags(tags[k]) for k in keys}
    schema = T.StructType(
        [T.StructField(k, _TAG_TYPES[merged[k]]) for k in keys]
    )
    data = [tuple(_coerce(fr.get(k), merged[k]) for k in keys) for fr in flat]
    return spark.createDataFrame(data, schema)


def table_pks() -> dict[str, str | None]:
    """Registry-declared pk per output table (None → content hash)."""
    out: dict[str, str | None] = {}
    for _fn, pks in TRANSFORMERS.values():
        out.update(pks)
    return out


_WIRE_SCHEMA = "archive string, tbl string, row string, tags string"


def _extract_wire_rows(archive_path: str, content: bytes):
    """Executor-side S10/S11/P10 for one archive's bytes: every output
    row as (archive, table, {key: text-value} JSON, {key: type-tag}
    JSON). Pure — runs identically on the driver or in mapInPandas."""
    try:
        z = zipfile.ZipFile(io.BytesIO(content))
    except zipfile.BadZipFile:
        return
    for name, payload in _zip_js_entries(z):
        if name in IGNORE:
            continue
        try:
            items = extract_json(payload)
        except ValueError:
            continue
        if not isinstance(items, list) or not items:
            continue
        fn, _pks = TRANSFORMERS.get(name, _generic(name))
        for table, rows in fn(items).items():
            for r in rows:
                fr = _flatten(r)
                yield (
                    archive_path,
                    table,
                    json.dumps({k: _text_value(v) for k, v in fr.items()
                                if v is not None}),
                    json.dumps({k: _tag(v) for k, v in fr.items()}),
                )


def _text_value(v) -> str:
    return v if isinstance(v, str) else json.dumps(v)


def import_archives_fleet(spark: SparkSession, root: str | list[str],
                          provenance: bool = False) -> dict[str, DataFrame]:
    """Fleet-scale archive import: millions of archives, no driver loop.

    ``root`` may be one path or a list — multiple roots scan as ONE
    plan (binaryFile takes several paths), so their archives merge and
    dedup together instead of one root's tables clobbering another's.

    The scale path the module docstring promises: a ``binaryFile`` scan
    distributes whole-archive bytes across executors; ``mapInPandas``
    runs the same extract/transform registry per archive and emits wire
    rows (table, text-valued row, per-key type tags). Schemas are then
    derived DISTRIBUTED: the per-row tag maps aggregate to one merged
    tag per (table, key) — only that tiny summary reaches the driver —
    and each table materializes by casting the wire map through its
    explicit schema. Same type-join as ``_rows_to_df``, so a fleet
    import of one archive equals the driver-loop import exactly
    (asserted in tests/test_archive.py).

    ``provenance=True`` keeps the source archive path as an ``archive``
    column (fleet imports need lineage; single-user parity drops it).
    Content-hash pks (K4) are computed over the merged table, so
    identical rows from different archives dedup fleet-wide.
    """
    from twitter_to_sqlite_spark.operators.sinks import hash_id_plan

    roots = [root] if isinstance(root, str) else list(root)
    bf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.zip")
        .load(roots)
        .select("path", "content")
    )

    def extract(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for path, content in zip(pdf["path"], pdf["content"]):
                out.extend(_extract_wire_rows(path, bytes(content)))
            yield pd.DataFrame(
                out, columns=["archive", "tbl", "row", "tags"]
            )

    # DISK_ONLY, not cache(): the wire rows are the whole fleet's
    # extracted content — memory-pinning them evicts everything else
    # at 'millions of archives' scale. The blocks free when the caller
    # drops the returned tables (ContextCleaner GC); callers keeping a
    # session long-term should materialize and drop them promptly.
    from pyspark import StorageLevel

    wire = bf.mapInPandas(extract, schema=_WIRE_SCHEMA).persist(
        StorageLevel.DISK_ONLY)
    tag_summary = (
        wire.select("tbl", F.explode(F.from_json("tags", "map<string,string>")))
        .groupBy("tbl", "key")
        .agg(F.collect_set("value").alias("tags"))
        .collect()
    )
    by_table: dict[str, dict[str, str]] = {}
    for r in tag_summary:
        by_table.setdefault(r["tbl"], {})[r["key"]] = _merge_tags(r["tags"])

    pks = table_pks()
    out: dict[str, DataFrame] = {}
    for table in sorted(by_table):
        merged = by_table[table]
        m = F.from_json("row", "map<string,string>")
        cols = [
            F.col("__m")[k].cast(_TAG_TYPES[merged[k]]).alias(k)
            for k in sorted(merged)
        ]
        if provenance:
            cols = [F.col("archive")] + cols
        df = (
            wire.filter(F.col("tbl") == table)
            .withColumn("__m", m)
            .select(*cols)
        )
        if pks.get(table) is None:
            hash_cols = [c for c in df.columns if c != "archive"]
            df = hash_id_plan(df, cols=hash_cols, id_col="pk")
        out[table] = df
    return out


def import_archive(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Import a full archive: {table_name: DataFrame}, hash-keyed where
    the file declares no pk (K4), full-refresh semantics (K3 — caller
    overwrites any existing table of the same name)."""
    from twitter_to_sqlite_spark.operators.sinks import hash_id_plan

    out: dict[str, DataFrame] = {}
    for name, payload in read_archive_js(path):
        if name in IGNORE:
            continue
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
