"""Per-epoch metrics via StreamingQueryListener + lineage helpers.

Complements sink.IcebergLiteTable's per-partition lineage records with
run-level throughput metrics (BASELINE.json:14 "per-partition lineage +
metrics"): rows/sec per micro-batch, total rows, batch durations.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class MetricsListener(StreamingQueryListener):
    """Collects per-epoch progress; read .progress after the run."""

    def __init__(self):
        self.progress: list[dict] = []
        self.terminated: list[str] = []

    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        self.progress.append({
            "id": str(p.id),
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
        })

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        self.terminated.append(str(event.id))


def attach(spark: SparkSession) -> MetricsListener:
    lst = MetricsListener()
    spark.streams.addListener(lst)
    return lst


def detach(spark: SparkSession, lst: MetricsListener) -> None:
    spark.streams.removeListener(lst)
