"""Feature-table statistics + distribution drift.

The reference ships observability jobs over feature outputs: per-column
summaries (spark/.../stats/StatsCompute.scala) and distribution-drift scoring
between time slices (spark/.../stats/drift/Summarizer.scala). This module is
the Spark-first equivalent, all JVM-side (no Python in the hot path):

- ``summarize`` — ONE aggregate pass producing every per-column metric
  (count / nulls / distinct / mean / min / max), then an unpivot via
  ``stack`` into long format (column, metric, value). At 100 TB this is a
  single map-side-combined shuffle; swap ``countDistinct`` for
  ``approx_count_distinct`` via ``approx=True`` when exactness isn't needed.
- ``categorical_psi`` — Population Stability Index between two slices of a
  categorical column: two small groupBys + a broadcast-joined total, one
  number out. The standard drift score the reference's Summarizer family
  computes over binned distributions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)


def summarize(
    df: DataFrame,
    columns: list[str] | None = None,
    round_to: int = 6,
    approx: bool = False,
) -> DataFrame:
    """Long-format per-column stats: (column, metric, value:double)."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    columns = columns or list(fields)
    aggs: list = []
    entries: list[tuple[str, str, str]] = []  # (column, metric, agg alias)

    def add(col: str, metric: str, expr) -> None:
        alias = f"__{col}__{metric}"
        aggs.append(expr.alias(alias))
        entries.append((col, metric, alias))

    distinct = F.approx_count_distinct if approx else F.countDistinct
    for c in columns:
        add(c, "count", F.count(c).cast("double"))
        add(c, "nulls", F.sum(F.col(c).isNull().cast("long")).cast("double"))
        add(c, "distinct", distinct(c).cast("double"))
        if isinstance(fields[c], _NUMERIC):
            add(c, "mean", F.round(F.avg(c), round_to))
            add(c, "min", F.min(c).cast("double"))
            add(c, "max", F.max(c).cast("double"))
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', '{m}', `{a}`" for c, m, a in entries)
    return row.selectExpr(
        f"stack({len(entries)}, {stack_args}) as (column, metric, value)"
    )


def categorical_psi(df_a: DataFrame, df_b: DataFrame, col: str, round_to: int = 6) -> DataFrame:
    """PSI = Σ (p_a − p_b) · ln(p_a / p_b) over categories present in BOTH
    slices (categories exclusive to one side carry infinite PSI and should be
    surfaced separately; we keep the score finite and comparable).

    Returns a single-row DataFrame (psi:double, n_categories:long).
    """
    ca = df_a.where(F.col(col).isNotNull()).groupBy(col).agg(F.count("*").alias("__na"))
    cb = df_b.where(F.col(col).isNotNull()).groupBy(col).agg(F.count("*").alias("__nb"))
    ta = df_a.where(F.col(col).isNotNull()).agg(F.count("*").alias("__ta"))
    tb = df_b.where(F.col(col).isNotNull()).agg(F.count("*").alias("__tb"))
    j = (
        ca.join(cb, on=col, how="inner")
        .crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .withColumn("__pa", F.col("__na") / F.col("__ta"))
        .withColumn("__pb", F.col("__nb") / F.col("__tb"))
    )
    return j.agg(
        F.round(F.sum((F.col("__pa") - F.col("__pb")) * F.log(F.col("__pa") / F.col("__pb"))), round_to).alias("psi"),
        F.count("*").alias("n_categories"),
    )


def _lp_agg(pa, pb, round_to: int):
    """L∞ / L2 / L1 over per-bin probability deltas (reference
    online/.../stats/DriftMetrics.scala `LpDistances`)."""
    d = F.abs(pa - pb)
    return [
        F.round(F.max(d), round_to).alias("linf"),
        F.round(F.sqrt(F.sum(d * d)), round_to).alias("l2"),
        F.round(F.sum(d), round_to).alias("l1"),
        F.count(F.lit(1)).alias("n_bins"),
    ]


def categorical_lp_distances(
    df_a: DataFrame, df_b: DataFrame, col: str, round_to: int = 6
) -> DataFrame:
    """L∞/L2/L1 distances between the two slices' category histograms after
    normalizing each to probability mass — the reference's
    `DriftMetrics.histogramLpDistances` (online/.../stats/DriftMetrics.scala:23-54).
    Unlike :func:`categorical_psi` (which must drop one-sided categories to
    stay finite), missing buckets count as ZERO probability, so the union of
    categories is scored. Shape: two map-side-combined groupBys + a full
    outer join on the (small) category domain + broadcast totals.
    """
    from pyspark.sql import Window

    ca = df_a.where(F.col(col).isNotNull()).groupBy(col).agg(F.count("*").alias("__na"))
    cb = df_b.where(F.col(col).isNotNull()).groupBy(col).agg(F.count("*").alias("__nb"))
    j = ca.join(cb, on=col, how="full_outer")
    # slice totals as window sums over the (category-domain-sized) joined
    # frame — the full outer join keeps every category of each slice, so the
    # sum of its counts IS the slice total; avoids two scalar-attach
    # nested-loop joins and two extra aggregate jobs
    w = Window.partitionBy()
    na = F.coalesce(F.col("__na"), F.lit(0))
    nb = F.coalesce(F.col("__nb"), F.lit(0))
    pa = na / F.sum(na).over(w)
    pb = nb / F.sum(nb).over(w)
    return j.select(pa.alias("__pa"), pb.alias("__pb")).agg(
        *_lp_agg(F.col("__pa"), F.col("__pb"), round_to)
    )


def numeric_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    bins: int = 10,
    round_to: int = 6,
    approx: bool = False,
) -> DataFrame:
    """Quantile-binned distribution drift for a NUMERIC column: split points
    are the reference slice's quantiles (k/bins for k=1..bins-1), both slices
    are binned against the SAME splits, and the normalized per-bin PMFs are
    scored with L∞/L2/L1 — the reference's KLL-sketch drift
    (`DriftMetrics.kllSketchDistances`, online/.../stats/DriftMetrics.scala:88-140)
    with the sketch swapped for Spark percentiles.

    Exact `percentile` keeps the DuckDB oracle bit-reproducible (both engines
    interpolate type-7; splits are rounded to `round_to` decimals so a 1-ulp
    interpolation difference can't flip a boundary row). At 100 TB pass
    ``approx=True`` → JVM `percentile_approx` (KLL-style, mergeable, one
    pass) — same plan shape, sketch error instead of a full sort.

    Plan: one aggregate on the reference slice for the splits (broadcast — it
    is bins-1 doubles), then per slice a map-side `size(filter(splits,
    s -> s <= v))` bin id + one tiny groupBy each, a full outer join on the
    bin domain, and a single-row Lp reduce. No Python anywhere.
    """
    qs = [k / bins for k in range(1, bins)]
    pct = F.percentile_approx(col, F.array(*[F.lit(q) for q in qs]), 10000) if approx \
        else F.percentile(col, F.array(*[F.lit(q) for q in qs]))
    splits = df_a.where(F.col(col).isNotNull()).agg(
        F.transform(pct, lambda s: F.round(s, round_to)).alias("__splits")
    )

    def binned(df: DataFrame, alias: str) -> DataFrame:
        v = F.col(col)
        return (
            df.where(v.isNotNull())
            .crossJoin(F.broadcast(splits))
            .select(F.size(F.filter("__splits", lambda s: s <= v)).alias("bin"))
            .groupBy("bin")
            .agg(F.count("*").alias(f"__n{alias}"))
        )

    from pyspark.sql import Window

    ba, bb = binned(df_a, "a"), binned(df_b, "b")
    j = ba.join(bb, on="bin", how="full_outer")
    # slice totals as window sums over the bins-sized frame (every non-null
    # row of each slice landed in exactly one bin) — no scalar-attach joins
    w = Window.partitionBy()
    na = F.coalesce(F.col("__na"), F.lit(0))
    nb = F.coalesce(F.col("__nb"), F.lit(0))
    pa = na / F.sum(na).over(w)
    pb = nb / F.sum(nb).over(w)
    return j.select(pa.alias("__pa"), pb.alias("__pb")).agg(
        *_lp_agg(F.col("__pa"), F.col("__pb"), round_to)
    )


def tile_drift_series(
    df: DataFrame,
    time_col: str,
    cat_col: str,
    num_col: str,
    bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Per-tile drift SERIES — the reference's TileDriftCalculator
    (online/.../stats/TileDriftCalculator.scala:25-82: each tile summary vs
    the tile `lookback` earlier) re-expressed Spark-first over daily tiles:

    - ``count_change_pct`` — signed percent change of the tile row count
      (reference `setCountChangePercent`);
    - ``hist_l1`` / ``hist_linf`` — Lp distance between consecutive tiles'
      categorical histograms after per-tile mass normalization (reference
      `histogramDistance`), computed with `map_zip_with` over the key union
      — no explode, no extra shuffle;
    - ``pct_drift`` — mean |Δ| between consecutive tiles' decile vectors
      (reference `percentileDistance` family; exact percentiles here, the
      KLL `percentile_approx` swap is one argument at scale).

    Plan: TWO map-side-combined groupBys build the per-day summaries
    (day×category counts → one map per day; day deciles + counts), one
    broadcast-size sort-window pairs each day with its predecessor, and every
    metric is a codegen higher-order expression. Day count ≈ series length,
    so everything after the two aggregates is driver-trivial at any input
    scale."""
    from pyspark.sql import Window

    ds = F.to_date(time_col).alias("ds")
    qs = [k / bins for k in range(1, bins)]
    tiles = (
        df.groupBy(ds)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.transform(
                F.percentile(num_col, F.array(*[F.lit(q) for q in qs])),
                lambda s: F.round(s, round_to),
            ).alias("pct"),
        )
    )
    hist = (
        df.where(F.col(cat_col).isNotNull())
        .groupBy(ds, F.col(cat_col).alias("__cat"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy("ds")
        .agg(F.map_from_entries(F.collect_list(F.struct("__cat", "__c"))).alias("hist"))
    )
    t = tiles.join(hist, "ds", "left")
    w = Window.orderBy("ds")
    t = t.select(
        "ds",
        "n",
        "pct",
        "hist",
        F.lag("n").over(w).alias("__pn"),
        F.lag("pct").over(w).alias("__ppct"),
        F.lag("hist").over(w).alias("__phist"),
    ).where(F.col("__pn").isNotNull())
    tot = lambda m: F.aggregate(F.map_values(m), F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    d = F.map_values(
        F.map_zip_with(
            "hist",
            "__phist",
            lambda k, vc, vp: F.abs(
                F.coalesce(vc.cast("double"), F.lit(0.0)) / tot(F.col("hist"))
                - F.coalesce(vp.cast("double"), F.lit(0.0)) / tot(F.col("__phist"))
            ),
        )
    )
    pd_ = F.aggregate(
        F.zip_with("pct", "__ppct", lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) / F.lit(len(qs))
    return t.select(
        "ds",
        "n",
        F.round((F.col("n") - F.col("__pn")) / F.col("__pn") * 100.0, round_to).alias(
            "count_change_pct"
        ),
        F.round(F.aggregate(d, F.lit(0.0), lambda a, x: a + x), round_to).alias("hist_l1"),
        F.round(F.array_max(d), round_to).alias("hist_linf"),
        F.round(pd_, round_to).alias("pct_drift"),
    )
