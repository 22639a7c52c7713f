"""Monitoring: ClusterState-parity snapshots from StreamingQueryListener.

The reference maintains, by hand: a LiveStats `"records"` counter bumped
per ack and reported every 30 s (src/Kinesis/Coordination.hs:92-94, 336),
and a `ClusterState` snapshot (all shards, per-shard progress, node
liveness — src/Kinesis/Types.hs:133-142, assembled at
src/Kinesis/Coordination.hs:379-400). Spark already emits all of this in
``StreamingQueryProgress``; this listener just reshapes it into the same
vocabulary so a reference user finds their dashboard fields.
"""

from __future__ import annotations

import json
import sys
from collections.abc import Callable
from dataclasses import dataclass, field
from threading import Event, Lock, Thread

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class QuerySnapshot:
    """ClusterState analogue for one streaming query."""

    query_id: str = ""
    run_id: str = ""
    batch_id: int = -1
    total_records: int = 0          # reference: LiveStats "records" counter
    last_batch_records: int = 0     # reference: per-tick item counts
    input_rows_per_second: float = 0.0
    processed_rows_per_second: float = 0.0
    source_offsets: dict = field(default_factory=dict)  # shard seq parity
    state_rows: int = 0
    is_active: bool = True


class ClusterStateListener(StreamingQueryListener):
    """Collects per-query snapshots; thread-safe; attach with
    ``spark.streams.addListener(listener)``."""

    def __init__(self) -> None:
        self._lock = Lock()
        self._snapshots: dict[str, QuerySnapshot] = {}

    # -- listener callbacks -------------------------------------------
    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._snapshots[str(event.id)] = QuerySnapshot(
                query_id=str(event.id), run_id=str(event.runId)
            )

    def onQueryProgress(self, event) -> None:
        p = event.progress
        with self._lock:
            snap = self._snapshots.setdefault(
                str(p.id), QuerySnapshot(query_id=str(p.id))
            )
            snap.run_id = str(p.runId)
            snap.batch_id = p.batchId
            snap.last_batch_records = int(p.numInputRows)
            snap.total_records += int(p.numInputRows)
            snap.input_rows_per_second = float(p.inputRowsPerSecond or 0.0)
            snap.processed_rows_per_second = float(
                p.processedRowsPerSecond or 0.0
            )
            try:
                snap.source_offsets = {
                    s.description: json.loads(s.endOffset)
                    if s.endOffset and s.endOffset.startswith("{")
                    else s.endOffset
                    for s in p.sources
                }
            except Exception:  # noqa: BLE001 — offsets are best-effort metadata
                snap.source_offsets = {}
            if p.stateOperators:
                snap.state_rows = sum(
                    int(op.numRowsTotal) for op in p.stateOperators
                )

    def onQueryTerminated(self, event) -> None:
        with self._lock:
            if str(event.id) in self._snapshots:
                self._snapshots[str(event.id)].is_active = False

    def onQueryIdle(self, event) -> None:  # pragma: no cover - optional hook
        pass

    # -- accessors ----------------------------------------------------
    def snapshot(self, query_id: str) -> QuerySnapshot | None:
        with self._lock:
            return self._snapshots.get(str(query_id))

    def cluster_state(self) -> dict[str, QuerySnapshot]:
        """All queries' snapshots — the ClusterState-parity view."""
        with self._lock:
            return dict(self._snapshots)


class StatsReporter:
    """Periodic LiveStats reporter: the reference bumps a "records" counter
    per ack and reports it every 30 s (src/Kinesis/Coordination.hs:92-94);
    here a daemon thread emits one JSON line per interval summarizing every
    query's snapshot from a ClusterStateListener.

    ``emit`` defaults to a stderr print; pass a callable to route the line
    to a metrics system. Use as a context manager or start()/stop().
    """

    def __init__(
        self,
        listener: ClusterStateListener,
        interval_s: float = 30.0,
        emit: Callable[[str], None] | None = None,
    ) -> None:
        self._listener = listener
        self._interval = interval_s
        self._emit = emit or (lambda line: print(line, file=sys.stderr))
        self._stop = Event()
        self._thread: Thread | None = None
        self.reports_emitted = 0

    def _format(self) -> str:
        state = self._listener.cluster_state()
        return json.dumps(
            {
                "live_stats": {
                    snap.query_id: {
                        "records": snap.total_records,
                        "last_batch": snap.last_batch_records,
                        "batch_id": snap.batch_id,
                        "active": snap.is_active,
                    }
                    for snap in state.values()
                }
            },
            separators=(",", ":"),
        )

    def _loop(self) -> None:
        # Event.wait is the reference's threadDelay tick, interruptible
        while not self._stop.wait(self._interval):
            self._emit(self._format())
            self.reports_emitted += 1

    def start(self) -> "StatsReporter":
        if self._thread is None:
            self._thread = Thread(
                target=self._loop, name="kinesis-stats-reporter", daemon=True
            )
            self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def __enter__(self) -> "StatsReporter":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()
