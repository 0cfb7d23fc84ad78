"""Batch API source operators (SURVEY §2.1 S1-S8).

The reference drives Twitter's REST API with hand-rolled pagination
loops (fetch_timeline utils.py:137-225, cursor_paginate utils.py:
571-586, fetch_user_batches utils.py:472-492). In a Spark engine those
loops live on the driver and feed micro-batches into DataFrames; the
HTTP client is injected (a `fetch(url, params) -> (status, payload)`
callable) so the loops are testable without a network and swappable
for the real OAuth session on a cluster.

Scale notes: ingestion is rate-limit-bound, not compute-bound — the
parallelism that matters is *many keys at once* (users/timelines), so
`batch_lookup_distributed` shows the mapInPandas shape that fans
point-lookups out across executors; the per-key page loop stays
sequential because the API's max_id cursor is inherently sequential.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field

Fetch = Callable[[str, dict], tuple[int, object]]

RATE_LIMIT_CODE = 88          # utils.py:17
RATE_LIMIT_SLEEP = 15.0       # utils.py:189-202
RATE_LIMIT_MAX_RETRIES = 5


class ApiError(Exception):
    """Typed API error (reference TwitterApiError, utils.py:589-595)."""

    def __init__(self, errors):
        self.errors = errors
        super().__init__(str(errors))


class UserDoesNotExist(ApiError):
    """utils.py:38-40."""


@dataclass
class TimelinePage:
    rows: list
    min_id: int | None
    max_id: int | None


@dataclass
class TimelineScan:
    """S1 descending-ID paginated scan (fetch_timeline, utils.py:137-225).

    Iterates pages: GET url with `max_id = min_seen - 1` until an empty
    page; honors `since_id` (server-side watermark pushdown, F2),
    `stop_after` (A5 cap), and retries rate-limit errors (O2).
    `sleep_fn` is injectable for tests.
    """

    fetch: Fetch
    url: str
    args: dict = field(default_factory=dict)
    since_id: int | None = None
    stop_after: int | None = None
    page_size: int = 200
    sleep: float = 0.0
    sleep_fn: Callable[[float], None] = time.sleep
    key: str | None = None      # payload nested under this key (search)

    def pages(self) -> Iterator[TimelinePage]:
        args = dict(self.args)
        args["count"] = min(self.page_size, self.stop_after or self.page_size)
        if self.since_id:
            args["since_id"] = self.since_id
        fetched = 0
        max_id = None
        while True:
            if max_id is not None:
                args["max_id"] = max_id
            rows = self._fetch_with_retry(args)
            if not rows:
                return
            ids = [r["id"] for r in rows if "id" in r]
            page = TimelinePage(rows, min(ids) if ids else None,
                                max(ids) if ids else None)
            yield page
            fetched += len(rows)
            if self.stop_after is not None and fetched >= self.stop_after:
                return
            if page.min_id is None:
                return
            max_id = page.min_id - 1
            if self.sleep:
                self.sleep_fn(self.sleep)

    def _fetch_with_retry(self, args: dict) -> list:
        for attempt in range(RATE_LIMIT_MAX_RETRIES + 1):
            status, payload = self.fetch(self.url, dict(args))
            body = payload
            if isinstance(body, dict) and body.get("errors"):
                errors = body["errors"]
                if (
                    any(e.get("code") == RATE_LIMIT_CODE for e in errors)
                    and attempt < RATE_LIMIT_MAX_RETRIES
                ):
                    self.sleep_fn(RATE_LIMIT_SLEEP)
                    continue
                raise ApiError(errors)
            if self.key is not None and isinstance(body, dict):
                body = body.get(self.key, [])
            return list(body)
        raise ApiError([{"code": RATE_LIMIT_CODE, "message": "retries exhausted"}])


def cursor_paginate(fetch: Fetch, url: str, args: dict, key: str,
                    page_size: int = 200, sleep: float = 0.0,
                    sleep_fn: Callable[[float], None] = time.sleep) -> Iterator[list]:
    """S5 cursor pagination (cursor_paginate, utils.py:571-586): follow
    `next_cursor` until it is 0, yielding body[key] pages."""
    args = dict(args, count=page_size, cursor=-1)
    while True:
        status, body = fetch(url, dict(args))
        if isinstance(body, dict) and body.get("errors"):
            raise ApiError(body["errors"])
        yield body[key]
        cursor = body.get("next_cursor", 0)
        if not cursor:
            return
        args["cursor"] = cursor
        if sleep:
            sleep_fn(sleep)


def chunked(items: list, size: int) -> Iterator[list]:
    """A9 fixed-size batching (utils.py:475-483)."""
    for i in range(0, len(items), size):
        yield items[i:i + size]


def batch_lookup(fetch: Fetch, url: str, identifiers: list, param: str,
                 batch_size: int, extra_args: dict | None = None,
                 sleep: float = 0.0,
                 sleep_fn: Callable[[float], None] = time.sleep) -> Iterator[list]:
    """S6/S7 batched IN-list point lookup (fetch_user_batches
    utils.py:472-492 — param user_id/screen_name, 70/batch;
    fetch_status_batches utils.py:495-511 — param id, 100/batch,
    tweet_mode=extended)."""
    first = True
    for chunk in chunked(list(identifiers), batch_size):
        if not first and sleep:
            sleep_fn(sleep)
        first = False
        args = dict(extra_args or {})
        args[param] = ",".join(str(i) for i in chunk)
        status, body = fetch(url, args)
        if isinstance(body, dict) and body.get("errors"):
            raise ApiError(body["errors"])
        yield list(body)


def get_profile(fetch: Fetch, url: str, user_id=None, screen_name=None) -> dict:
    """S8 single-row lookup (get_profile, utils.py:119-134); 404-style
    'user not found' becomes the typed UserDoesNotExist."""
    args = {}
    if user_id:
        args["user_id"] = user_id
    if screen_name:
        args["screen_name"] = screen_name
    status, body = fetch(url, args)
    if isinstance(body, dict) and body.get("errors"):
        if any(e.get("code") == 50 for e in body["errors"]):
            raise UserDoesNotExist(body["errors"])
        raise ApiError(body["errors"])
    return body


def pages_to_dataframe(spark, pages: Iterator[TimelinePage], schema):
    """Feed driver-side pages into one DataFrame.

    Rows cross the driver once (they came over HTTP anyway — this is
    the same data volume the reference writes to SQLite); everything
    after createDataFrame is distributed. For sustained capture use the
    streaming path instead (streaming/capture.py).
    """
    rows: list = []
    for p in pages:
        rows.extend(p.rows)
    return spark.createDataFrame(rows, schema=schema)


def resolve_identifiers_sql(spark, identifiers: list, sql: str | None,
                            views: dict | None = None) -> list:
    """S12 --sql/--attach identifier resolution (resolve_identifiers,
    utils.py:514-531): run arbitrary SQL against registered views and
    append the first output column to the identifier list."""
    out = list(identifiers)
    if sql:
        for name, df in (views or {}).items():
            df.createOrReplaceTempView(name)
        out.extend(r[0] for r in spark.sql(sql).collect())
    return out
