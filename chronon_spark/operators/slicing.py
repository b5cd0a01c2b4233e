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
    prefilter: str | None = None,
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

    if prefilter:
        from chronon_spark.operators.asof_join import prefilter_right_keys

        # push the left key set into the right scan BEFORE the slice explode
        # (a filtered event never pays the reach-fold replication)
        right = prefilter_right_keys(
            left, right, key_mapping or {k: k for k in gb.keys}, mode=prefilter
        )
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
    from chronon_spark.operators.asof_join import apply_derivations

    # gb2 carries no derivations (asof_join must not apply them before the
    # slice column is dropped); apply them here so every strategy agrees
    return apply_derivations(out.drop(SLICE_COL), gb.derivations)


# Per-(key,slice) group-size target for the auto span: comfortably inside one
# Arrow batch / one task's memory, large enough that slicing stays rare.
DEFAULT_HOT_THRESHOLD = 100_000
_MAX_HOT_STATS = 10_000  # driver-side stats collect cap (hot keys are, by definition, few)


def skew_split_asof_join(
    left: DataFrame,
    right: DataFrame,
    gb: GroupBy,
    hot_threshold: int = DEFAULT_HOT_THRESHOLD,
    slice_span: str | None = "auto",
    left_time_column: str = "ts",
    key_mapping: dict[str, str] | None = None,
    prefix: str | None = None,
    coarse_buckets: int | str | None = "auto",
    prefilter: str | None = None,
) -> DataFrame:
    """Skew-aware as-of join: hot keys take the salted (time-sliced) path,
    everything else the plain coarse-bucket cogroup; results are unioned.

    Why not always slice: slicing replicates every event ``1 + ceil(window /
    span)`` times — pure overhead for the 99.9% of keys whose whole history
    fits one Arrow group. Why not never: a key with 10^8 events lands in ONE
    cogroup task and defines the stage's wall clock (measured: 2 hot keys of
    800k events = 14 s straggler tasks while every other task finishes in
    <1 s). This is the explicit hot-key salting the reference handles via
    skewKeys config (reference: api Join.skewKeys + JoinBase filtering,
    spark/.../JoinBase.scala:78-101) — detected from data instead of
    configured, and the hot keys are still SERVED, not dropped.

    Cost of detection: one map-side-combined count per key (shuffle rows =
    one per distinct key, bytes = key + 3 longs) — at 100 TB this is the
    cheapest full-input statistic that exists, and the same scan feeds the
    broadcast split. Hot-key stats (≤ ``_MAX_HOT_STATS`` rows) come to the
    driver to size the slice span so per-(key,slice) groups hold roughly
    ``hot_threshold`` events: span = thr/rate − window, clamped to
    [window/8, window] (replication stays ≤ 9x and only on hot-key events).

    Falls back to the plain join when no key crosses ``hot_threshold`` or
    when a window is unbounded (slicing needs bounded reach; lifetime aggs
    on a hot key want the tiled path instead)."""
    key_mapping = key_mapping or {k: k for k in gb.keys}
    left_keys = list(key_mapping.keys())
    right_keys = [key_mapping[k] for k in left_keys]
    if prefilter:
        from chronon_spark.operators.asof_join import prefilter_right_keys

        # filter BEFORE the per-key count probe: the probe then scans (and
        # the broadcast split carries) only keys the left can reach
        right = prefilter_right_keys(left, right, key_mapping, mode=prefilter)
    mw = gb.max_window_millis
    if mw is None:
        return asof_join(
            left, right, gb, left_time_column, key_mapping, prefix, coarse_buckets
        )

    stats = (
        right.groupBy(*right_keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") >= hot_threshold)
        .limit(_MAX_HOT_STATS)
    )
    hot_rows = stats.collect()
    if not hot_rows:
        return asof_join(
            left, right, gb, left_time_column, key_mapping, prefix, coarse_buckets
        )

    mw_us = mw * 1000
    if slice_span == "auto":
        # span just over the effective window (window + sawtooth tail hop):
        # replication factor exactly 2x, per-(key,slice) state ~= 2 windows of
        # events — the irreducible floor, since every slice group must hold a
        # full window tail. Finer spans multiply replication without lowering
        # that floor (window/8 measured 10x hot-event volume for zero gain);
        # keys whose single WINDOW outgrows a task belong on the tiled path.
        eff_us = mw_us
        if gb.sawtooth:
            from chronon_spark.resolution import tail_hop_millis

            eff_us += tail_hop_millis(mw) * 1000
        span = f"{eff_us * 21 // 20 // 60_000_000 + 1}m"  # 1.05x, whole minutes
    else:
        span = slice_span

    hot_keys = [tuple(row[k] for k in right_keys) for row in hot_rows]
    if len(right_keys) == 1:
        vals = [k[0] for k in hot_keys]
        r_hot_pred = F.col(right_keys[0]).isin(vals)
        l_hot_pred = F.col(left_keys[0]).isin(vals)
    else:
        r_hot_pred = F.lit(False)
        l_hot_pred = F.lit(False)
        for k in hot_keys:
            r_hot_pred = r_hot_pred | F.struct(*right_keys).eqNullSafe(F.struct(*[F.lit(v) for v in k]))
            l_hot_pred = l_hot_pred | F.struct(*left_keys).eqNullSafe(F.struct(*[F.lit(v) for v in k]))

    cold = asof_join(
        # null-key left rows: isin() yields NULL -> coalesce keeps them on the
        # cold path, which emits their null-feature rows (cardinality invariant)
        left.where(~F.coalesce(l_hot_pred, F.lit(False))),
        right.where(~F.coalesce(r_hot_pred, F.lit(False))),
        gb,
        left_time_column,
        key_mapping,
        prefix,
        coarse_buckets,
    )
    hot = sliced_asof_join(
        left.where(l_hot_pred),
        right.where(r_hot_pred),
        gb,
        slice_span=span,
        left_time_column=left_time_column,
        key_mapping=dict(key_mapping),
        prefix=prefix,
    )
    return cold.unionByName(hot)
