"""Progress accounting + heartbeats (SURVEY.md §2.6 A1/A2, K3).

The reference accumulates four counter streams in a parallelism-1 windowed
function with cross-window instance state (`DatasetProgressWindowFunction.java:
16-73`) and throttled heartbeat sends (`JobHeartbeatSender.java:55-105`). The
faithful, simpler Spark mapping is driver-side: a ``StreamingQueryListener``
accumulating ``numInputRows`` against a known expected total (the exact
COUNT(*) pre-scan), emitting heartbeat events to a pluggable sink.

``progress = processed / expected`` once input is bounded and known —
matching `DatasetProgressWindowFunction.java:59-65`; ``last`` fires when
progress reaches 1.0 or the stream idles past the timeout (``:67``).
"""

from __future__ import annotations

import json
import time
from dataclasses import asdict, dataclass
from typing import Callable

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class Heartbeat:
    jobId: str
    timestamp: float
    progress: float | None
    last: bool
    failed: bool
    message: str | None = None

    def to_json(self) -> str:
        return json.dumps(asdict(self))


class ProgressHeartbeatListener(StreamingQueryListener):
    """Counts streamed rows, emits throttled heartbeats, detects completion.

    ``send`` receives Heartbeat objects; default collects them in-memory
    (tests) — production passes a Kafka/file producer. ``min_interval_s``
    mirrors the reference's send throttle (`JobHeartbeatSender.java:55-61`).
    """

    def __init__(
        self,
        job_id: str,
        expected_rows: int | None = None,
        send: Callable[[Heartbeat], None] | None = None,
        min_interval_s: float = 1.0,
        idle_timeout_s: float = 30.0,
    ):
        self.job_id = job_id
        self.expected = expected_rows
        self.processed = 0
        self.assembled = 0
        self.sent: list[Heartbeat] = []
        self._send = send or self.sent.append
        self.min_interval_s = min_interval_s
        self.idle_timeout_s = idle_timeout_s
        self._last_sent = 0.0
        self._last_data = time.time()
        self.finished = False

    # -- listener hooks -----------------------------------------------------
    def onQueryStarted(self, event):
        self._emit(force=True)

    def onQueryProgress(self, event):
        rows = event.progress.numInputRows
        if rows:
            self.processed += rows
            self._last_data = time.time()
        self._emit()

    def onQueryIdle(self, event):
        self._emit()

    def onQueryTerminated(self, event):
        failed = event.exception is not None
        self._emit(force=True, last=True, failed=failed, message=event.exception)

    # -- internals ----------------------------------------------------------
    def progress_value(self) -> float | None:
        if not self.expected:
            return None
        return min(self.processed / self.expected, 1.0)

    def is_last(self) -> bool:
        p = self.progress_value()
        done = p is not None and p >= 1.0
        idle = (time.time() - self._last_data) > self.idle_timeout_s
        return done or idle

    def _emit(self, force=False, last=None, failed=False, message=None):
        now = time.time()
        if not force and (now - self._last_sent) < self.min_interval_s:
            return
        self._last_sent = now
        hb = Heartbeat(
            jobId=self.job_id,
            timestamp=now,
            progress=self.progress_value(),
            last=self.is_last() if last is None else last,
            failed=failed,
            message=message,
        )
        if hb.last:
            self.finished = True
        self._send(hb)


def run_until_idle(query, idle_timeout_s: float, poll_s: float = 0.5) -> None:
    """Run a streaming query until it has seen no input for ``idle_timeout_s``,
    then stop it — the reference's end condition
    (`DatasetProgressWindowFunction.java:67`: last when idle > timeout).

    Needed because ``availableNow`` never terminates for stateful queries with
    registered processing-time timers (observed on Spark 4.1: the planner
    keeps scheduling batches to serve timers); idle-stop is also exactly the
    sentinel semantics the reference uses for bounded datasets. The idle
    window must exceed the fan-in timeout so pending partials flush first.
    """
    import time as _time

    # Only completed-batch progress counts: `isTriggerActive` is useless here
    # (stateful queries run timer-evaluation batches every trigger, so it is
    # nearly always true), and `lastProgress` is None while the first batch is
    # still running — never stop before one batch has completed.
    last_active: float | None = None
    seen: tuple | None = None
    while query.isActive:
        lp = query.lastProgress
        if lp:
            key = (lp.get("batchId"), lp.get("timestamp"))
            if key != seen:
                seen = key
                if lp.get("numInputRows", 0) > 0 or last_active is None:
                    last_active = _time.time()
            if (
                last_active is not None
                and _time.time() - last_active > idle_timeout_s
            ):
                query.stop()
                break
        _time.sleep(poll_s)
    query.awaitTermination()
