from chronon_spark.streaming.groupby_stream import (
    stream_hop_tiles,
    stream_sessionize,
    stream_tumbling_agg,
)
from chronon_spark.streaming.dedup_stream import stream_exact_dedup
from chronon_spark.streaming.stats_stream import (
    hist_tile_drift,
    hist_tiles,
    merge_summary_tiles,
    stream_hist_tiles,
    stream_summary_tiles,
    summary_tiles,
)

__all__ = [
    "stream_tumbling_agg",
    "stream_sessionize",
    "stream_hop_tiles",
    "stream_exact_dedup",
    "summary_tiles",
    "stream_summary_tiles",
    "merge_summary_tiles",
    "hist_tiles",
    "stream_hist_tiles",
    "hist_tile_drift",
]
