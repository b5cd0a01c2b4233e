"""Hot-key handling for the as-of join: time-sliced replication.

A single conversation with 10^8 turns would make `cogroup` collect its whole
history into one Arrow group (the reference has the same exposure in
UnionJoin's collect_list, reference: spark/.../join/UnionJoin.scala:156-177 —
its answer is bounded BatchIr state; ours is slicing + tiles).

`sliced_asof_join` splits every entity's timeline into fixed spans: queries go
to exactly one (key, slice) group; each event is replicated to every slice
whose queries can see it — i.e. `ceil(max_window / span) + 1` slices. Per-group
state is then bounded by (span + max_window) worth of events REGARDLESS of key
hotness, and the shuffle key space (key × slice) spreads a hot key over many
reducers — this is the salting scheme the north rule mandates, with a salt
that is deterministic w.r.t. correctness instead of a random one.

Combine with `operators/tiles.py` to turn the replicated tail into pre-
aggregated hop tiles (collapsed IR) for decomposable ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from chronon_spark.api import GroupBy
from chronon_spark.operators.asof_join import asof_join, ensure_ts_us

SLICE_COL = "__slice"


def sliced_asof_join(
    left: DataFrame,
    right: DataFrame,
    gb: GroupBy,
    slice_span: str = "1d",
    left_time_column: str = "ts",
    key_mapping: dict[str, str] | None = None,
    prefix: str | None = None,
) -> DataFrame:
    """Identical semantics to `asof_join`, with per-group state bounded by
    span + max_window. Requires every window to be bounded (an unbounded
    window genuinely needs full history — keep those on the tiled path)."""
    from chronon_spark.api import Window

    span_us = Window(slice_span).millis * 1000
    mw = gb.max_window_millis
    if mw is None:
        raise ValueError("sliced_asof_join requires bounded windows (no lifetime aggs)")
    mw_us = mw * 1000
    if gb.sawtooth:
        # sawtooth rounds the window start DOWN to a hop boundary, reaching up
        # to one tail hop further back than the nominal window
        from chronon_spark.resolution import tail_hop_millis

        mw_us += tail_hop_millis(mw) * 1000
    reach = -(-mw_us // span_us)  # ceil: how many later slices an event serves

    l = ensure_ts_us(left, left_time_column, "__lts")
    l = l.withColumn(SLICE_COL, (F.col("__lts") / F.lit(span_us)).cast("long")).drop("__lts")

    r = ensure_ts_us(right, gb.time_column, "__rts")
    # an event at slice s is visible to queries in slices [s, s + reach]
    r = r.withColumn(
        SLICE_COL,
        F.explode(
            F.sequence(
                (F.col("__rts") / F.lit(span_us)).cast("long"),
                (F.col("__rts") / F.lit(span_us)).cast("long") + F.lit(reach),
            )
        ),
    ).drop("__rts")

    key_mapping = dict(key_mapping or {k: k for k in gb.keys})
    key_mapping[SLICE_COL] = SLICE_COL
    gb2 = GroupBy(
        keys=list(gb.keys) + [SLICE_COL],
        aggregations=gb.aggregations,
        time_column=gb.time_column,
        tie_breakers=gb.tie_breakers,
        accuracy=gb.accuracy,
        include_equal=gb.include_equal,
        sawtooth=gb.sawtooth,
    )
    out = asof_join(l, r, gb2, left_time_column, key_mapping, prefix)
    return out.drop(SLICE_COL)
