"""Streaming observability (K5): the reference logs per-batch progress and
X-Ray annotations (total_actions, chunk sizes — lambda/main.py:88,122-140);
here a StreamingQueryListener captures per-batch source/sink row counts and
durations from Spark's progress events, queryable as plain dicts."""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects one record per micro-batch progress event."""

    def __init__(self) -> None:
        self.progress: list[dict] = []
        self.started: list[str] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.progress.append(
            {
                "id": str(p.id),
                "batchId": p.batchId,
                "numInputRows": p.numInputRows,
                "durationMs": dict(p.durationMs) if p.durationMs else {},
            }
        )

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass

    def total_input_rows(self) -> int:
        return sum(p["numInputRows"] for p in self.progress)
