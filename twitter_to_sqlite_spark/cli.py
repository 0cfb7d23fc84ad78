"""CLI mirroring the reference's subcommand surface (cli.py:35-880).

Same command names and core options; the database path becomes a
directory of parquet tables. Network-dependent commands accept
--input-json (a file of API-shaped JSON rows) so every command is
usable offline; with real credentials (`auth.json`, written by `auth`)
they hit the live API via requests-oauthlib when that package exists.

    python -m twitter_to_sqlite_spark.cli user-timeline db_dir 101 --since
    python -m twitter_to_sqlite_spark.cli import db_dir archive.zip
    python -m twitter_to_sqlite_spark.cli search db_dir "tide pools"
"""

from __future__ import annotations

import argparse
import json
import sys

from twitter_to_sqlite_spark.database import TweetDatabase
from twitter_to_sqlite_spark.session import get_spark


def _auth_fetch(auth_path: str):
    """Real OAuth1 fetch (O1, utils.py:69-75) — gated on
    requests-oauthlib being installed."""
    try:
        from requests_oauthlib import OAuth1Session  # type: ignore
    except ImportError as e:  # pragma: no cover - not in this container
        raise SystemExit(
            "requests-oauthlib not installed; use --input-json for offline runs"
        ) from e
    creds = json.load(open(auth_path))
    session = OAuth1Session(
        client_key=creds["api_key"],
        client_secret=creds["api_secret_key"],
        resource_owner_key=creds["access_token"],
        resource_owner_secret=creds["access_token_secret"],
    )

    def fetch(url, params):
        r = session.get(url, params=params)
        return r.status_code, r.json()

    return fetch


# Cursor-paginated endpoints return {'<key>': [...], 'next_cursor': N}
# rather than a bare list (reference cursor_paginate utils.py:571-586).
_CURSOR_KEYS = (
    ("followers/ids", "ids"),
    ("friends/ids", "ids"),
    ("followers/list", "users"),
    ("friends/list", "users"),
    ("lists/ownerships", "lists"),
    ("lists/members", "users"),
)


def _file_fetch(path: str):
    """Offline fetch: serve rows from a JSON file, honoring
    count/max_id/since_id and each endpoint's payload envelope
    (bare list, {'statuses': ...}, cursor dicts, single profile)."""
    rows = [json.loads(line) for line in open(path)] if path.endswith(
        (".jsonl", ".ndjson")
    ) else json.load(open(path))

    def fetch(url, params):
        dicts = [t for t in rows if isinstance(t, dict)]
        plain = [t for t in rows if not isinstance(t, dict)]
        # Single-profile endpoints return one dict, not a list.
        if "users/show" in url or "verify_credentials" in url:
            uid = params.get("user_id")
            sn = params.get("screen_name")
            for t in dicts:
                if uid is not None and t.get("id") == int(uid):
                    return 200, t
                if sn and t.get("screen_name") == str(sn):
                    return 200, t
            if uid is None and sn is None and dicts:
                return 200, dicts[0]
            return 200, {"errors": [{"code": 50, "message": "User not found."}]}
        out = sorted(dicts, key=lambda t: -t.get("id", 0))
        if "max_id" in params:
            out = [t for t in out if t.get("id", 0) <= params["max_id"]]
        if "since_id" in params:
            out = [t for t in out if t.get("id", 0) > params["since_id"]]
        # IN-list point lookups (statuses/users-lookup)
        if "id" in params:
            wanted = {int(i) for i in str(params["id"]).split(",")}
            out = [t for t in out if t.get("id") in wanted]
        if "screen_name" in params:
            names = set(str(params["screen_name"]).split(","))
            out = [t for t in out
                   if (t.get("screen_name") or t.get("user", {}).get("screen_name")) in names]
        # Cursor endpoints get the whole file as one terminal page
        # (ids endpoints serve bare-int rows when the file holds them).
        for frag, key in _CURSOR_KEYS:
            if frag in url:
                payload = plain if (key == "ids" and plain) else out
                return 200, {key: payload, "next_cursor": 0}
        if "count" in params:
            out = out[: params["count"]]
        if "search" in url:
            return 200, {"statuses": out}
        return 200, out

    return fetch


def _fetch_from(args):
    if getattr(args, "input_json", None):
        return _file_fetch(args.input_json)
    return _auth_fetch(args.auth)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="twitter-to-sqlite-spark")
    sub = p.add_subparsers(dest="command", required=True)

    def add(name, **kwargs):
        sp = sub.add_parser(name, **kwargs)
        sp.add_argument("db_path")
        sp.add_argument("-a", "--auth", default="auth.json")
        sp.add_argument("--input-json", help="offline JSON source instead of the API")
        # O4 (reference shows a progressbar by default, --silent hides
        # it; here it is opt-in — a Spark driver is usually headless
        # and rendering implies an extra users/show profile fetch for
        # the expected total).
        sp.add_argument("--progress", action="store_true",
                        help="render a progress bar with expected totals")
        return sp

    def add_identifier_options(sp):
        # reference add_identifier_options (cli.py:14-30): --sql runs a
        # query against the db's tables to extend the identifier list;
        # --attach registers extra parquet-table dirs under an alias.
        sp.add_argument("--sql", help="SQL whose first column extends identifiers")
        sp.add_argument("--attach", action="append", default=[],
                        metavar="ALIAS:PATH",
                        help="extra table dir to register as ALIAS_<table>")

    sp = add("user-timeline")
    sp.add_argument("identifiers", nargs="*")
    add_identifier_options(sp)
    sp.add_argument("--since", action="store_true")
    sp.add_argument("--since_id", type=int)
    sp.add_argument("--stop_after", type=int)

    for name in ("home-timeline", "mentions-timeline"):
        sp = add(name)
        sp.add_argument("--user-id", type=int, default=0)
        sp.add_argument("--since", action="store_true")
        sp.add_argument("--since_id", type=int)

    sp = add("favorites")
    sp.add_argument("--user-id", type=int, default=0)
    sp.add_argument("--stop_after", type=int)

    sp = add("search")
    sp.add_argument("q")
    sp.add_argument("--since", action="store_true")
    sp.add_argument("--geocode")
    sp.add_argument("--lang")
    sp.add_argument("--locale")
    sp.add_argument("--result_type")

    sp = add("users-lookup")
    sp.add_argument("identifiers", nargs="*")
    add_identifier_options(sp)
    sp.add_argument("--ids", action="store_true")

    sp = add("statuses-lookup")
    sp.add_argument("identifiers", nargs="*")
    add_identifier_options(sp)
    sp.add_argument("--skip-existing", action="store_true")

    for name in ("followers", "friends"):
        sp = add(name)
        sp.add_argument("--user-id", type=int, required=False)

    for name in ("followers-ids", "friends-ids"):
        sp = add(name)
        sp.add_argument("--user-id", type=int, required=True)

    sp = add("lists")
    sp.add_argument("--user-id", type=int, required=True)
    sp.add_argument("--members", action="store_true")

    sp = add("list-members")
    sp.add_argument("list_ids", nargs="+")

    sp = add("import")
    sp.add_argument("paths", nargs="+")
    sp.add_argument("--distributed", action="store_true",
                    help="treat each path as a ROOT of many archive "
                         "zips and import them through the executor-"
                         "side binaryFile fleet path (lineage kept in "
                         "an 'archive' column)")

    sp = add("track")
    sp.add_argument("phrases", nargs="+")
    sp.add_argument("--stream-dir", required=True,
                    help="directory watched for line-JSON stream files")

    sp = add("follow")
    sp.add_argument("user_ids", nargs="+", type=int)
    sp.add_argument("--stream-dir", required=True)

    sp = add("fetch")
    sp.add_argument("url")

    sp = sub.add_parser(
        "curate",
        help="training-data curation over parquet documents: PII scrub "
             "→ Gopher gate → exact dedup → split → sharded write")
    sp.add_argument("in_path", help="input parquet of documents")
    sp.add_argument("out_dir")
    sp.add_argument("--steps", default="pii,gopher,dedup,split",
                    help="comma list from pii,gopher,dedup,split")
    sp.add_argument("--splits", default="train=98,val=1,test=1",
                    help="name=weight comma list")
    sp.add_argument("--shards", type=int,
                    help="also write N deterministic train shards")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--text-col", default="text")

    sp = sub.add_parser("auth")
    sp.add_argument("-a", "--auth", default="auth.json")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "auth":
        creds = {
            k: input(f"{k}: ")
            for k in ("api_key", "api_secret_key", "access_token",
                      "access_token_secret")
        }
        json.dump(creds, open(args.auth, "w"))
        return 0

    if args.command == "curate":
        from twitter_to_sqlite_spark.functions.curate import run_curate

        splits = {}
        for part in args.splits.split(","):
            name, _, wt = part.partition("=")
            splits[name.strip()] = int(wt)
        stats = run_curate(
            get_spark("cli"), args.in_path, args.out_dir,
            steps=tuple(s.strip() for s in args.steps.split(",") if s.strip()),
            splits=splits, n_shards=args.shards,
            id_col=args.id_col, text_col=args.text_col)
        print(json.dumps(stats))
        return 0

    spark = get_spark("cli")
    db = TweetDatabase(spark, args.db_path)
    from twitter_to_sqlite_spark import commands as C
    from twitter_to_sqlite_spark.migrations import run_migrations

    # Reference semantics (utils.py:43-66): migrations run against
    # existing databases before any command touches them.
    if db.table_names():
        ran = run_migrations(db)
        if ran:
            print(f"applied migrations: {', '.join(ran)}")

    def resolve_idents(args):
        """S12: identifiers ∪ first column of --sql over the db's
        tables (+ --attach'd table dirs registered as alias_<table>)."""
        from twitter_to_sqlite_spark.sources.api import resolve_identifiers_sql

        idents = list(getattr(args, "identifiers", []) or [])
        sql = getattr(args, "sql", None)
        if not sql:
            return idents
        views = {name: db.read(name) for name in db.table_names()
                 if db.read(name) is not None}
        for spec in getattr(args, "attach", []):
            alias, _, apath = spec.partition(":")
            other = TweetDatabase(spark, apath or alias)
            for name in other.table_names():
                v = other.read(name)
                if v is not None:
                    views[f"{alias}_{name}"] = v
        return resolve_identifiers_sql(spark, idents, sql, views)

    if args.command == "user-timeline":
        fetch = _fetch_from(args)
        # None → authenticated user via verify_credentials; screen
        # names pass through (commands.user_timeline resolves them).
        for ident in resolve_idents(args) or [None]:
            n = C.user_timeline(spark, fetch, db, ident,
                                since=args.since, since_id=args.since_id,
                                stop_after=args.stop_after,
                                render_progress=args.progress)
            print(f"user {ident if ident is not None else 'me'}: {n} tweets")
    elif args.command == "home-timeline":
        print(C.home_timeline(spark, _fetch_from(args), db, args.user_id,
                              since=args.since, since_id=args.since_id))
    elif args.command == "mentions-timeline":
        print(C.mentions_timeline(spark, _fetch_from(args), db, args.user_id,
                                  since=args.since, since_id=args.since_id))
    elif args.command == "favorites":
        print(C.favorites(spark, _fetch_from(args), db, args.user_id,
                          stop_after=args.stop_after,
                          render_progress=args.progress))
    elif args.command == "search":
        print(C.search(spark, _fetch_from(args), db, args.q, since=args.since,
                       geocode=args.geocode, lang=args.lang,
                       locale=args.locale, result_type=args.result_type))
    elif args.command == "users-lookup":
        print(C.users_lookup(spark, _fetch_from(args), db, resolve_idents(args),
                             use_ids=args.ids))
    elif args.command == "statuses-lookup":
        print(C.statuses_lookup(spark, _fetch_from(args), db, resolve_idents(args),
                                skip_existing=args.skip_existing))
    elif args.command in ("followers", "friends"):
        fetch = _fetch_from(args)
        from twitter_to_sqlite_spark.sources import api as A

        # Hydrate the real profile first (reference cli.py:149) so the
        # profile upsert never nulls an existing users row; fall back
        # to an id-only stub — commands.followers skips its upsert.
        try:
            if args.user_id:
                profile = A.get_profile(fetch, C.URLS["users_show"],
                                        user_id=args.user_id)
            else:
                profile = C.resolve_profile(fetch, None)
        except A.ApiError:
            if args.user_id is None:
                raise
            profile = {"id": args.user_id}
        print(C.followers(spark, fetch, db, profile,
                          reverse=args.command == "friends",
                          render_progress=args.progress))
    elif args.command in ("followers-ids", "friends-ids"):
        print(C.followers_ids(spark, _fetch_from(args), db, args.user_id,
                              reverse=args.command == "friends-ids"))
    elif args.command == "lists":
        print(C.lists_command(spark, _fetch_from(args), db, args.user_id,
                              members=args.members))
    elif args.command == "list-members":
        fetch = _fetch_from(args)
        for lid in args.list_ids:
            print(C.list_members(spark, fetch, db, lid))
    elif args.command == "import":
        if args.distributed:
            from twitter_to_sqlite_spark.sources.archive import (
                import_archives_fleet,
            )
            # All roots in ONE scan: per-root overwrites would clobber
            # each other's tables (last root wins); a single plan
            # merges and dedups across roots with lineage kept.
            tables = import_archives_fleet(spark, args.paths, provenance=True)
            for name, df in sorted(tables.items()):
                db.overwrite(name, df)
            print(f"{', '.join(args.paths)}: {', '.join(sorted(tables))}")
        else:
            for path in args.paths:
                tables = C.import_archive_command(spark, db, path)
                print(f"{path}: {', '.join(tables)}")
    elif args.command in ("track", "follow"):
        from twitter_to_sqlite_spark.streaming import capture
        if args.progress:
            # O4 streaming twin: per-micro-batch counts off the
            # listener bus (reference prints one dot per tweet,
            # cli.py:664-667).
            from twitter_to_sqlite_spark.progress import attach_capture_listener
            attach_capture_listener(
                spark,
                lambda p: print(
                    f"batch {p['batch_id']}: {p['num_input_rows']} tweets "
                    f"({p['seconds']:.1f}s)", flush=True),
            )
        q = capture.start_capture(
            spark, args.stream_dir, args.db_path,
            f"{args.db_path}/_checkpoints/{args.command}",
            phrases=args.phrases if args.command == "track" else None,
            follow_ids=args.user_ids if args.command == "follow" else None,
        )
        print(f"streaming {args.command} started; Ctrl-C to stop")
        try:
            q.awaitTermination()
        except KeyboardInterrupt:
            q.stop()
    elif args.command == "fetch":
        fetch = _fetch_from(args)
        status, body = fetch(args.url, {})
        print(json.dumps(body, indent=4, sort_keys=True))
    return 0


if __name__ == "__main__":
    sys.exit(main())
