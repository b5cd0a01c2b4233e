from chronon_spark.streaming.groupby_stream import (
    stream_hop_tiles,
    stream_sessionize,
    stream_tumbling_agg,
)

__all__ = ["stream_tumbling_agg", "stream_sessionize", "stream_hop_tiles"]
