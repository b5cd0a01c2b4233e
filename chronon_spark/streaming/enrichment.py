"""Stream enrichment: the JoinSource realtime case.

The reference's JoinSource comment (thrift/api.thrift:170-185, case #2) says:
for realtime (Accuracy.TEMPORAL) "we will simply issue fetchJoin and create
an enriched source" — every streaming event is decorated with the upstream
join's features as-of its own event time, so a downstream GroupBy can
consume features-over-features with zero leakage.

Spark-first shape: ``foreachBatch``. Each micro-batch of left events becomes
a query frame for the batch-simulated fetcher (`jobs/upload.fetch_features` —
batch IRs collapsed+tail-hops merged with post-batchEnd events, strict
``ts' < ts``), and the enriched frame is handed to the caller's sink. The
fetch itself is a broadcast-friendly cogroup reusing the tested offline
merge, so enrichment correctness is *by construction* identical to the
backfill (the ConsistencyJob contract, tests/test_upload_fetch.py).

Scale shape: per micro-batch one cogroup shuffle keyed by the GroupBy keys;
batch IRs are a static side loaded once and reused across batches (cache it).
In a deployment with an online KV store the fetch merge is a point lookup —
this module is the engine-native stand-in with the same semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from chronon_spark.api import GroupBy
from chronon_spark.jobs.upload import TAIL_BUFFER_MS, fetch_features


def enrich_stream(
    left_stream: DataFrame,
    gb: GroupBy,
    batch_irs: DataFrame,
    streaming_events: DataFrame,
    batch_end_ts_us: int,
    sink: Callable[[DataFrame, int], None],
    left_time_column: str = "ts",
    tail_buffer_ms: int = TAIL_BUFFER_MS,
) -> DataStreamWriter:
    """Wire a streaming left through fetch-time enrichment.

    - ``left_stream``: streaming DataFrame of events to enrich (must carry
      the GroupBy keys and ``left_time_column``).
    - ``batch_irs``: output of ``jobs.upload.build_batch_irs`` for the
      upstream GroupBy (static snapshot as of ``batch_end_ts_us``).
    - ``streaming_events``: events at/after ``batch_end_ts_us`` visible to
      the fetcher (the online-tile stand-in). For exactness it must contain
      every event before the enriched row's ts; supplying the same topic the
      left reads gives self-enrichment (the common chained-join shape).
    - ``sink``: called with (enriched micro-batch DataFrame, epoch id);
      write to a table, a topic, or accumulate in tests.

    Returns the configured ``DataStreamWriter`` — caller picks trigger,
    checkpoint location, and calls ``.start()``.
    """
    cached = batch_irs.cache()

    def _enrich(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # tail_buffer_ms threads through to the fetch's valid-range check:
        # IRs built with a wider buffer stay fetchable past the default 2d,
        # and a long-running stream fails with the rebuild message instead
        # of silently out-ranging its batch snapshot
        enriched = fetch_features(
            batch_df,
            cached,
            streaming_events,
            gb,
            batch_end_ts_us,
            left_time_column=left_time_column,
            tail_buffer_ms=tail_buffer_ms,
        )
        sink(enriched, epoch_id)

    return left_stream.writeStream.foreachBatch(_enrich)
