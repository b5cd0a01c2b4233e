"""Per-micro-batch metrics for streaming jobs — the streaming half of the
north rule's "metrics emitted per stage" (the batch half is the per-partition
lineage manifests in plans/manifest.py). Reference analogue: the progress
telemetry the Flink runner / StreamingStats emit per write
(spark/.../streaming/StreamingStats.scala — that class times KV puts, which
are out of scope; this captures the equivalent per-batch numbers Structured
Streaming already computes).

Usage:
    collector = StreamMetricsCollector(spark)
    q = df.writeStream...start()
    ...
    collector.rows()       # [{'batch_id':…,'num_input_rows':…,…}, …]
    collector.to_json(path)  # one JSON line per micro-batch (audit artifact)
    collector.stop()

Implementation: a `StreamingQueryListener` — Spark pushes a progress event
per completed micro-batch; no polling, no extra jobs, zero cost in the data
path.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


class _Listener(StreamingQueryListener):
    def __init__(self, sink: list):
        self._sink = sink

    def onQueryStarted(self, event) -> None:  # pragma: no cover - no payload we keep
        pass

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self._sink.append(
            {
                "query_id": str(p.id),
                "name": p.name,
                "batch_id": p.batchId,
                "timestamp": p.timestamp,
                "num_input_rows": p.numInputRows,
                "input_rows_per_second": p.inputRowsPerSecond,
                "processed_rows_per_second": p.processedRowsPerSecond,
                "duration_ms": dict(p.durationMs) if p.durationMs else {},
                "state_rows_total": sum(
                    (s.numRowsTotal or 0) for s in (p.stateOperators or [])
                ),
            }
        )

    def onQueryTerminated(self, event) -> None:  # pragma: no cover
        pass

    def onQueryIdle(self, event) -> None:  # pragma: no cover
        pass


class StreamMetricsCollector:
    """Attach once per SparkSession; collects every streaming query's
    per-batch progress until ``stop()``."""

    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._rows: list[dict] = []
        self._listener = _Listener(self._rows)
        spark.streams.addListener(self._listener)

    def rows(self) -> list[dict]:
        return list(self._rows)

    def to_json(self, path: str) -> int:
        with open(path, "w") as f:
            for r in self._rows:
                f.write(json.dumps(r) + "\n")
        return len(self._rows)

    def stop(self) -> None:
        self._spark.streams.removeListener(self._listener)
