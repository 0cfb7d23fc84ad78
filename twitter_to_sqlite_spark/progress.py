"""O4 progress reporting.

The reference wraps every long scan in ``click.progressbar`` with an
expected total taken from the profile — followers/friends counts
(cli.py:130-159) and ``statuses_count`` for user-timeline
(cli.py:294-299, cleared when --since narrows the scan). This module
is the framework-neutral twin: a reporter object commands update
page-by-page, plus a ``StreamingQueryListener`` that surfaces
micro-batch progress for the capture path (SURVEY §2.10) the same way.

Events, not rendering, are the contract — the CLI renders to stderr,
tests capture the event list, a cluster deployment would forward them
to its own metrics sink. Nothing here touches the data plane: progress
is driver-side bookkeeping around loops that are already driver-side
(the API page loops) or listener callbacks Spark already emits (the
streaming bus), so there is no scale cost.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

try:  # pyspark >= 3.4 exposes the Python listener API
    from pyspark.sql.streaming import StreamingQueryListener
except ImportError:  # pragma: no cover - always present on pyspark 4
    StreamingQueryListener = object  # type: ignore[misc,assignment]

Event = tuple[str, dict]


class ProgressReporter:
    """Counts work done against an (optional) expected total.

    Emits ``(kind, payload)`` events to ``on_event``:
      start  {label, expected}
      update {n, done, expected, pct}   pct None when expected unknown
      finish {done, expected}

    ``render=True`` additionally writes a one-line bar to ``stream``
    (the CLI's stand-in for click.progressbar; reference cli.py:151-159
    shows label + position + percent the same way).
    """

    def __init__(self, label: str = "", expected: int | None = None,
                 on_event: Callable[[str, dict], None] | None = None,
                 render: bool = False, stream=None):
        self.label = label
        self.expected = expected
        self.done = 0
        self.on_event = on_event
        self.render = render
        self.stream = stream or sys.stderr
        self._finished = False
        self._emit("start", {"label": label, "expected": expected})

    # ------------------------------------------------------------ events

    def _emit(self, kind: str, payload: dict) -> None:
        if self.on_event is not None:
            self.on_event(kind, payload)
        if self.render:
            self._render_line(kind, payload)

    def _render_line(self, kind: str, payload: dict) -> None:
        if kind == "start":
            if self.label:
                self.stream.write(self.label + "\n")
            return
        pct = payload.get("pct")
        pos = f"{self.done:,}" + (f"/{self.expected:,}" if self.expected else "")
        bar = ""
        if pct is not None:
            filled = int(min(pct, 100.0) / 100 * 30)
            bar = "[" + "#" * filled + "-" * (30 - filled) + f"] {pct:5.1f}%  "
        end = "\n" if kind == "finish" else "\r"
        self.stream.write(f"  {bar}{pos}{end}")
        self.stream.flush()

    # -------------------------------------------------------------- api

    def update(self, n: int) -> None:
        self.done += int(n)
        pct = (100.0 * self.done / self.expected) if self.expected else None
        self._emit("update", {"n": int(n), "done": self.done,
                              "expected": self.expected, "pct": pct})

    def finish(self) -> None:
        if self._finished:
            return
        self._finished = True
        self._emit("finish", {"done": self.done, "expected": self.expected})

    def __enter__(self) -> "ProgressReporter":
        return self

    def __exit__(self, *exc) -> None:
        self.finish()


def timeline_expected(profile: dict, noun: str = "statuses",
                      since: bool = False, since_id=None) -> int | None:
    """Expected-total lookup from a hydrated profile: the reference
    reads ``{noun}_count`` (cli.py:152, 294) and clears the total when
    a since/since_id watermark makes it meaningless (cli.py:296-297)."""
    if since or since_id:
        return None
    v = profile.get(f"{noun}_count")
    return int(v) if v is not None else None


class CaptureProgressListener(StreamingQueryListener):
    """Streaming twin of the progressbar: forwards each micro-batch's
    row count from Spark's listener bus to ``on_progress(payload)``.

    Payload: {batch_id, num_input_rows, seconds, query_id}. Attach with
    ``spark.streams.addListener`` (see ``attach_capture_listener``);
    events arrive asynchronously on the listener thread.
    """

    def __init__(self, on_progress: Callable[[dict], None]):
        self.on_progress = on_progress

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        secs = (p.batchDuration or 0) / 1000.0
        self.on_progress({
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "seconds": secs,
            "query_id": str(p.id),
        })

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach_capture_listener(spark, on_progress: Callable[[dict], None]
                            ) -> CaptureProgressListener:
    """Register a CaptureProgressListener on the session's streaming
    bus; returns it so callers can removeListener when done."""
    listener = CaptureProgressListener(on_progress)
    spark.streams.addListener(listener)
    return listener
