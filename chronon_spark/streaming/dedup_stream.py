"""Streaming exact dedup: drop duplicate documents as they arrive.

The ingest-side mirror of `functions/dedup.exact_dedup`: fingerprint each
incoming document (md5 of whitespace-normalized lowercased text — the SAME
fingerprint the batch path groups on, so batch and stream agree on what
"duplicate" means), then `dropDuplicatesWithinWatermark` keeps the first
arrival per fingerprint and expires its dedup state once the watermark
passes — bounded state, which plain `dropDuplicates` on an unbounded
stream does not have.

Scale shape: state is one (16-byte digest → timestamp) entry per DISTINCT
in-watermark document, partitioned by the digest — uniform by
construction, no skew handling needed. Re-arrivals beyond the watermark
horizon are by contract a batch concern (the daily `exact_dedup` /
`incremental_minhash_dedup` pass), the standard lambda split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from chronon_spark.functions.text import fingerprint


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str,
    time_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """First arrival per content fingerprint survives; later copies within
    the watermark horizon drop. Emits the input columns + `fp`."""
    return (
        stream.withColumn("fp", fingerprint(text_col))
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )
