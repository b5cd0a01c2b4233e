"""Tiled sawtooth as-of join: bounded per-key state for the FULL op set.

The reference's hop-tile architecture (HopsAggregator.scala:36-175 +
SawtoothMutationAggregator's BatchIr{collapsed, tailHops}) re-expressed
Spark-first:

1. **Tile build** — ONE JVM `groupBy(keys, hop_start)` producing partial IRs.
   Whole-stage codegen, map-side combine, shuffle payload = one small row per
   (key, hop) instead of every raw event. Per-op IR shapes mirror the
   reference's ColumnAggregator IRs (aggregator/.../row/ColumnAggregator.scala,
   SimpleAggregators.scala):
     - sum/count/min/max/average  -> scalar partials
     - variance/skew/kurtosis    -> raw power sums (cnt, sum, sum^2..sum^4);
       the reference carries (count, mean, M2..) Welford IRs — power sums are
       the abelian re-expression (binomial-rebased at finalize)
     - first/last/first_k/last_k -> per-tile bounded entry lists
       sorted by (ts, tie_breakers) — the reference's bounded
       ArrayDeque IRs (SimpleAggregators.scala:200-260)
     - top_k/bottom_k/unique_top_k -> per-tile k-extreme value lists
       (pigeonhole: any value in the window's global top-k is in its own
       tile's top-k)
     - unique_count              -> per-tile distinct sets (exact; the CPC
       sketch at SimpleAggregators.scala:499 is the lossy 100 TB variant —
       Spark-side `hll_sketch_agg`/`hll_union` is the drop-in when
       approximate counts are acceptable)
     - histogram/frequent/heavy_hitters -> per-tile value->count maps built
       by a two-level groupBy ((keys,hop,value) count, then collect per
       (keys,hop)) — both shuffles run on pre-reduced data
2. **Head restriction** — a query's window head is exact only inside its own
   hop, so raw events are needed ONLY in hops that contain at least one
   query for that key: a broadcast-able left-semi join on (key, hop) prunes
   the rest.
3. **Kernel** — tiles and head events enter the cogroup as one union frame
   (marker column). Scalar partials merge as range sums / sparse-table
   min-max; collection IRs are flattened to (composite_ts, value[, weight])
   entry arrays ONCE per column and served by the SAME vectorized kernels as
   the raw path (`aggregators/kernels._kernel`), then merged with the head's
   exact result per op — the reference's `lambdaAggregateIr` merge of
   collapsed IR + tail hops (SawtoothOnlineAggregator.scala:86-126).

Exactness: every supported op is EXACT and equal to `asof_join(...,
sawtooth=True)` (asserted by tests/test_tiles_slicing.py), because
  - window tails cover whole hops (wstart is a multiple of every part's tail
    hop, which is a multiple of the tile hop), so entry-level ts bounds and
    tile-level inclusion coincide;
  - entry lists carry the original (ts, tie_breakers) so cross-tile ordering
    is reconstructed exactly;
  - per-tile k-truncation is lossless for first/last/top/bottom/unique-top
    (supersets of any window's k-extremes).
Order ops require `tie_breakers` to make the event order total (the north
rule's stable turn ordering); with ties left unbroken the raw path's
input-order fallback is not reproducible from tiles (nor across shuffles).

APPROX_PERCENTILE is tiled as a SKETCH (matching the reference's KLL IR,
SimpleAggregators.scala:545 — inherently lossy): each tile stores up to
``QSK_K`` systematic samples of its sorted values with a uniform weight
(n/K), a one-level KLL-style compactor. Rank error of a merged estimate is
bounded by (tail volume)/QSK_K + the head is exact — asserted by a
rank-error-bound test. Exact percentiles need the raw values: use the plain
or sliced path when exactness matters.

Bucketed parts tile as a map of per-bucket IRs (the reference's
BucketedColumnAggregator): scalar partials AND the collection IRs
(entry/extreme lists, distinct sets, value counts) carry per bucket slot;
only bucketed moments and the percentile sketch stay on the plain path.

Moment-op caveat: raw power sums lose precision when |mean| >> stddev
(classic cancellation); the raw path's globally-shifted prefix sums
(kernels._moments) do not. Equivalence holds to ~1e-9 relative at realistic
magnitudes; for pathological columns keep moments on the plain path.

When to use which (measured, local[32]):
- many keys + queries sparse in (key, hop): tiled wins — 4M events / 2000
  keys / 2000 queries: 8.5 s vs 21 s plain (the cogroup moves 80k tile rows
  + the 2.5% of raw events in query hops instead of all 4M raw rows);
- small inputs or queries dense in hops: plain wins (the tile/semi-join
  stages are fixed overhead and the head set approaches the full stream);
- per-key event counts beyond Arrow-batch memory: tiled is the ONLY path
  for decomposable ops (bounded per-key state), sliced for order ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from chronon_spark.aggregators.kernels import (
    _ColumnSeries,
    _flat_ranges,
    _is_integral,
    _kernel,
    _prefix,
    _query_chunks,
    _run_starts,
    _sparse_query,
    _sparse_table,
    _to_numpy,
    hist_finalize,
)
from chronon_spark.api import AggregationPart, GroupBy, Op
from chronon_spark.operators.asof_join import apply_derivations, ensure_ts_us
from chronon_spark.resolution import tail_hop_millis
from chronon_spark.types import part_output_type

_SCALAR_OPS = {Op.COUNT, Op.SUM, Op.MIN, Op.MAX, Op.AVERAGE}
_MOMENT_OPS = {Op.VARIANCE, Op.SKEW, Op.KURTOSIS}
_ORDER_OPS = {Op.FIRST, Op.LAST, Op.FIRST_K, Op.LAST_K}
_EXTREME_OPS = {Op.TOP_K, Op.BOTTOM_K, Op.UNIQUE_TOP_K}
_SET_OPS = {Op.UNIQUE_COUNT, Op.APPROX_UNIQUE_COUNT}
_HIST_OPS = {Op.HISTOGRAM, Op.APPROX_FREQUENT_K, Op.APPROX_HEAVY_HITTERS_K}

TILED_OPS = (
    _SCALAR_OPS | _MOMENT_OPS | _ORDER_OPS | _EXTREME_OPS | _SET_OPS | _HIST_OPS | {Op.APPROX_PERCENTILE}
)

# per-tile quantile-sketch size: rank error of the tail estimate is bounded by
# (tail event volume) / QSK_K; 512 keeps a 13d x 1d-hop window under ~0.2%%
# rank error per 100k-event tail while a tile row stays ~4 KB
QSK_K = 512

_TS_US = "__ts_us"


def _op_family(op: Op) -> str | None:
    """Which per-tile collection IR (if any) an op reads."""
    if op in (Op.FIRST, Op.FIRST_K):
        return "firstk"
    if op in (Op.LAST, Op.LAST_K):
        return "lastk"
    if op == Op.TOP_K:
        return "topk"
    if op == Op.BOTTOM_K:
        return "bottomk"
    if op == Op.UNIQUE_TOP_K:
        return "utopk"
    if op in _SET_OPS:
        return "set"
    if op in _HIST_OPS:
        return "hist"
    return None


def _tile_stats_needed(gb: GroupBy) -> dict[str, dict[str, int | None]]:
    """Which per-column tile stats each input column needs.

    Values: max k for bounded-list stats, highest power for ``pow``,
    None for unparameterized stats."""
    need: dict[str, dict[str, int | None]] = {}
    for p in gb.parts():
        d = need.setdefault(p.input_column, {})
        if p.bucket:
            continue  # bucketed parts read their own per-bucket tile IRs
        if p.op in (Op.COUNT, Op.AVERAGE, Op.SUM) or p.op in _MOMENT_OPS:
            d["cnt"] = None  # SUM needs cnt for empty-window NULL semantics
        if p.op in (Op.SUM, Op.AVERAGE) or p.op in _MOMENT_OPS:
            d["sum"] = None
        if p.op == Op.MIN:
            d["min"] = None
        if p.op == Op.MAX:
            d["max"] = None
        if p.op in _MOMENT_OPS:
            upto = 2 if p.op == Op.VARIANCE else (3 if p.op == Op.SKEW else 4)
            d["pow"] = max(d.get("pow") or 0, upto)
        fam = _op_family(p.op)
        if fam in ("firstk", "lastk", "topk", "bottomk", "utopk"):
            k = 1 if p.op in (Op.FIRST, Op.LAST) else int(p.k)
            d[fam] = max(d.get(fam) or 0, k)
        elif fam in ("set", "hist"):
            d[fam] = None
        if p.op == Op.APPROX_PERCENTILE:
            d["qsk"] = QSK_K
    return need


def _tile_bucket_stats(
    gb: GroupBy, scalar_only: bool = False
) -> dict[tuple[str, str], dict[str, int | None]]:
    """Per-(input column, bucket column) tile stats for bucketed parts —
    the reference's BucketedColumnAggregator carries the SAME per-op IR
    inside each bucket's map slot (row/ColumnAggregator.scala), so bucketed
    tiles mirror the unbucketed IR per bucket: scalar partials, bounded
    entry/extreme lists, distinct sets, value->count histograms.

    ``scalar_only=True`` is the streaming tile builder's contract (its
    post-agg run-length fold only covers scalar partials); moments and the
    percentile sketch stay on the plain path per bucket everywhere (per-
    bucket power sums / sketches are where the map-of-IR payload stops
    paying for itself — use the plain/sliced strategies)."""
    out: dict[tuple[str, str], dict[str, int | None]] = {}
    for p in gb.parts():
        if not p.bucket:
            continue
        if p.op in _MOMENT_OPS or p.op == Op.APPROX_PERCENTILE or p.op not in TILED_OPS:
            raise ValueError(
                f"tiled bucketed parts do not support {p.op} by {p.bucket} — use the plain path"
            )
        if scalar_only and p.op not in _SCALAR_OPS:
            raise ValueError(
                f"streaming tiles support scalar bucketed ops {sorted(o.value for o in _SCALAR_OPS)}; "
                f"got {p.op} by {p.bucket} — use the batch tiled path"
            )
        st = out.setdefault((p.input_column, p.bucket), {})
        st["cnt"] = None  # anchor: every bucketed part needs per-bucket counts
        if p.op in (Op.SUM, Op.AVERAGE):
            st["sm"] = None
        if p.op == Op.MIN:
            st["mn"] = None
        if p.op == Op.MAX:
            st["mx"] = None
        fam = _op_family(p.op)
        if fam in ("firstk", "lastk", "topk", "bottomk", "utopk"):
            k = 1 if p.op in (Op.FIRST, Op.LAST) else int(p.k)
            st[fam] = max(st.get(fam) or 0, k)
        elif fam in ("set", "hist"):
            st[fam] = None
    return out


def qsk_agg_expr(col, K: int):
    """Quantile-sketch partial: sorted values, systematically sampled to K
    with a uniform per-sample weight n/K (one-level KLL compactor). Shared by
    the tile builder and the batch-IR upload; NULL when no values. The input
    column expression may carry a conditional (upload's collapsed slice)."""
    arr = F.sort_array(F.collect_list(col.cast("double")))
    n = F.size(arr)
    sampled = F.when(n <= K, arr).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.lit(K - 1)),
            lambda i: F.element_at(arr, ((i * n) / F.lit(K)).cast("int") + 1),
        )
    )
    w = F.when(n <= K, F.lit(1.0)).otherwise(n.cast("double") / F.lit(K))
    return F.when(n > 0, F.struct(sampled.alias("s"), w.alias("w")))


def validate_tiled_spec(gb: GroupBy) -> list:
    """Pre-flight the tiled-strategy contract (also called by the backfill
    entrypoint BEFORE any partition computes): supported ops, bounded
    windows, tie-breakers for order ops, scalar-only buckets."""
    if not gb.sawtooth:
        # the tiled kernel always hop-rounds window starts (sawtooth
        # semantics) — a non-sawtooth GroupBy would silently diverge from the
        # plain/sliced/skew strategies instead of erroring
        raise ValueError("tiled strategy requires sawtooth=True (window tails are hop-rounded)")
    parts = gb.parts()
    bad = [p.op for p in parts if p.op not in TILED_OPS]
    if bad:
        raise ValueError(f"tiled path supports {sorted(o.value for o in TILED_OPS)}; got {bad}")
    if any(p.window.millis is None for p in parts):
        raise ValueError("tiled path requires bounded windows")
    order_parts = [p for p in parts if p.op in _ORDER_OPS]
    if order_parts and not gb.tie_breakers:
        raise ValueError(
            "tiled first/last(_k) needs tie_breakers for a total event order "
            "(per-tile truncation is order-dependent)"
        )
    _tile_bucket_stats(gb)  # raises on non-scalar bucketed ops
    return parts


def integral_tile_cols(df: DataFrame) -> frozenset[str]:
    """Columns whose tile SUM partial should stay exact-integer: integer
    types and the Decimal rewrite's scale-0 decimals (aggregators/decimal.py).
    Their ``__sum`` partials are cast DECIMAL(20,0) so they cross the
    Arrow->pandas boundary as exact boxed Decimals — a nullable BIGINT would
    arrive as float64 and corrupt unscaled values above 2^53."""
    out = set()
    for f in df.schema.fields:
        t = f.dataType
        if isinstance(t, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            out.add(f.name)
        elif isinstance(t, T.DecimalType) and t.scale == 0 and t.precision <= 18:
            out.add(f.name)
    return frozenset(out)


def tile_agg_exprs(
    need: dict[str, dict[str, int | None]],
    tie_cols: list[str],
    integral_sum_cols: frozenset[str] = frozenset(),
) -> tuple[list, list[str]]:
    """Per-column tile aggregation expressions over a frame that carries
    ``__ts_us`` + the input/tie columns. Shared by the batch tile builder and
    the streaming tile builder (streaming/groupby_stream.stream_hop_tiles) so
    their IR schemas stay merge-compatible. Histogram columns are returned
    separately: batch builds them with a two-level groupBy, streaming with a
    post-aggregation expression (chained streaming aggregations are not
    supported)."""

    def entry_struct(c: str):
        fields = [F.col(_TS_US).alias("t")]
        fields += [F.col(t).alias(f"b{i}") for i, t in enumerate(tie_cols)]
        fields.append(F.col(c).alias("v"))
        return F.when(F.col(c).isNotNull(), F.struct(*fields))

    aggs: list = []
    hist_cols: list[str] = []
    for c in sorted(need):
        stats = need[c]
        if "cnt" in stats:
            aggs.append(F.count(c).alias(f"{c}__cnt"))
        if "sum" in stats:
            if c in integral_sum_cols:
                # DECIMAL(20,0) on purpose — exact across Arrow (see
                # integral_tile_cols); the merge's integral branch reads it
                # back as int64 losslessly
                aggs.append(F.sum(c).cast("decimal(20,0)").alias(f"{c}__sum"))
            else:
                aggs.append(F.sum(c).alias(f"{c}__sum"))
        if "min" in stats:
            aggs.append(F.min(c).alias(f"{c}__min"))
        if "max" in stats:
            aggs.append(F.max(c).alias(f"{c}__max"))
        if "pow" in stats:
            for pw in range(2, (stats["pow"] or 2) + 1):
                aggs.append(F.sum(F.pow(F.col(c).cast("double"), F.lit(pw))).alias(f"{c}__pow{pw}"))
        if "firstk" in stats:
            aggs.append(
                F.slice(F.sort_array(F.collect_list(entry_struct(c))), 1, stats["firstk"]).alias(f"{c}__firstk")
            )
        if "lastk" in stats:
            aggs.append(
                F.slice(
                    F.sort_array(F.collect_list(entry_struct(c)), asc=False), 1, stats["lastk"]
                ).alias(f"{c}__lastk")
            )
        if "topk" in stats:
            aggs.append(F.slice(F.sort_array(F.collect_list(c), asc=False), 1, stats["topk"]).alias(f"{c}__topk"))
        if "bottomk" in stats:
            aggs.append(F.slice(F.sort_array(F.collect_list(c)), 1, stats["bottomk"]).alias(f"{c}__bottomk"))
        if "utopk" in stats:
            aggs.append(F.slice(F.sort_array(F.collect_set(c), asc=False), 1, stats["utopk"]).alias(f"{c}__utopk"))
        if "set" in stats:
            aggs.append(F.collect_set(c).alias(f"{c}__set"))
        if "qsk" in stats:
            aggs.append(qsk_agg_expr(F.col(c), int(stats["qsk"])).alias(f"{c}__qsk"))
        if "hist" in stats:
            hist_cols.append(c)
    return aggs, hist_cols


def build_hop_tiles(
    events: DataFrame,
    gb: GroupBy,
    keys: list[str] | None = None,
    hop_ms: int | None = None,
) -> DataFrame:
    """Standalone batch hop-tile builder: one row per (keys, __hop) carrying
    every per-column IR the GroupBy's parts need (the reference's
    HopsAggregator output, HopsAggregator.scala:36-175). ``__hop`` is the hop
    index (tile start = __hop * hop). Streaming twin:
    streaming/groupby_stream.stream_hop_tiles (same stat columns)."""
    keys = keys or gb.keys
    if hop_ms is None:
        hop_ms = min(tail_hop_millis(p.window.millis) for p in gb.parts())
    hop_us = hop_ms * 1000
    r = ensure_ts_us(events, gb.time_column)
    for k in keys:
        r = r.where(F.col(k).isNotNull())
    need = _tile_stats_needed(gb)
    tie_cols = [t for t in gb.tie_breakers if t in events.columns and t not in keys]
    head_cols = sorted(need) + [t for t in tie_cols if t not in need]
    hop_col = (F.col(_TS_US) / F.lit(hop_us)).cast("long")
    aggs, hist_cols = tile_agg_exprs(need, tie_cols, integral_tile_cols(r))
    if not aggs:  # every part bucketed/hist: keep a row-count anchor per tile
        aggs = [F.count(F.lit(1)).alias("__tile_rows")]
    tiles = (
        r.select(*keys, hop_col.alias("__hop"), _TS_US, *head_cols)
        .groupBy(*keys, "__hop")
        .agg(*aggs)
    )
    for c in hist_cols:
        # two-level: value counts shrink map-side, then one small row per tile.
        # The join keys match the tile agg's output partitioning, so only the
        # (already tiny) value-count side pays an exchange.
        vc = (
            r.select(*keys, hop_col.alias("__hop"), F.col(c).cast("string").alias("__v"))
            .where(F.col("__v").isNotNull())
            .groupBy(*keys, "__hop", "__v")
            .agg(F.count("*").alias("__c"))
            .groupBy(*keys, "__hop")
            .agg(F.collect_list(F.struct("__v", "__c")).alias(f"{c}__hist"))
        )
        tiles = tiles.join(vc, on=keys + ["__hop"], how="left")
    for (c, b), st in _tile_bucket_stats(gb).items():
        # bucketed IRs: (keys, hop, bucket) partials collected into one list
        # per tile — the same two-level shape as histogram tiles. Each
        # bucket slot carries the SAME per-op IR as the unbucketed tile
        # (scalar partials, bounded (ts, ties, value) entry lists, k-extreme
        # lists, distinct sets, value->count pairs) — the reference's
        # BucketedColumnAggregator layout (map of per-bucket IRs).
        def bk_entry_struct():
            fields = [F.col(_TS_US).alias("t")]
            fields += [F.col(t).alias(f"b{i}") for i, t in enumerate(tie_cols)]
            fields.append(F.col(c).alias("v"))
            return F.struct(*fields)

        # per-bucket partials at (keys, hop, bucket) grain. Scalars collect
        # into the array<struct> IR column; collection IRs flatten into
        # SEPARATE per-family columns of array<struct<__b, ...>> — each
        # element tagged with its bucket. Nesting stays at list<struct>
        # depth: list<struct<list<struct>>> payloads segfault pyarrow's
        # arrow_to_pandas on some batch shapes (observed under spark-submit),
        # and the flat layout is what the kernel's per-bucket slicing wants
        # anyway. The flatten(collect_list(transform(...))) runs JVM-side —
        # the nested intermediate never crosses Arrow.
        agg2 = [F.count(c).alias("cnt")]
        struct_fields = ["__b", "cnt"]
        if "sm" in st:
            agg2.append(F.sum(F.col(c).cast("double")).alias("sm"))
            struct_fields.append("sm")
        if "mn" in st:
            agg2.append(F.min(c).alias("mn"))
            struct_fields.append("mn")
        if "mx" in st:
            agg2.append(F.max(c).alias("mx"))
            struct_fields.append("mx")
        if "firstk" in st:
            agg2.append(
                F.slice(F.sort_array(F.collect_list(bk_entry_struct())), 1, st["firstk"]).alias("firstk")
            )
        if "lastk" in st:
            agg2.append(
                F.slice(
                    F.sort_array(F.collect_list(bk_entry_struct()), asc=False), 1, st["lastk"]
                ).alias("lastk")
            )
        if "topk" in st:
            agg2.append(F.slice(F.sort_array(F.collect_list(c), asc=False), 1, st["topk"]).alias("topk"))
        if "bottomk" in st:
            agg2.append(F.slice(F.sort_array(F.collect_list(c)), 1, st["bottomk"]).alias("bottomk"))
        if "utopk" in st:
            agg2.append(F.slice(F.sort_array(F.collect_set(c), asc=False), 1, st["utopk"]).alias("utopk"))
        if "set" in st:
            agg2.append(F.collect_set(c).alias("vset"))
        base2 = r.where(F.col(c).isNotNull() & F.col(b).isNotNull()).select(
            *keys,
            hop_col.alias("__hop"),
            F.col(b).cast("string").alias("__b"),
            _TS_US,
            *sorted({c, *tie_cols} - set(keys)),
        )
        bt = base2.groupBy(*keys, "__hop", "__b").agg(*agg2)
        if "hist" in st:
            # per-bucket value counts: one extra pre-reduced level, joined
            # back at the (keys, hop, bucket) grain both sides already
            # hash-partition on
            vc2 = (
                base2.select(*keys, "__hop", "__b", F.col(c).cast("string").alias("__v"))
                .groupBy(*keys, "__hop", "__b", "__v")
                .agg(F.count("*").alias("__c"))
                .groupBy(*keys, "__hop", "__b")
                .agg(F.collect_list(F.struct("__v", "__c")).alias("hist"))
            )
            bt = bt.join(vc2, on=keys + ["__hop", "__b"])

        def tagged(arr_field: str, payload):
            return F.flatten(
                F.collect_list(F.transform(F.col(arr_field), payload))
            ).alias(f"{c}__bk_{arr_field}__{b}")

        final_aggs = [F.collect_list(F.struct(*struct_fields)).alias(f"{c}__bk__{b}")]
        ent_payload = lambda e: F.struct(  # noqa: E731
            F.col("__b").alias("__b"),
            e["t"].alias("t"),
            *[e[f"b{i}"].alias(f"b{i}") for i in range(len(tie_cols))],
            e["v"].alias("v"),
        )
        val_payload = lambda e: F.struct(F.col("__b").alias("__b"), e.alias("v"))  # noqa: E731
        if "firstk" in st:
            final_aggs.append(tagged("firstk", ent_payload))
        if "lastk" in st:
            final_aggs.append(tagged("lastk", ent_payload))
        if "topk" in st:
            final_aggs.append(tagged("topk", val_payload))
        if "bottomk" in st:
            final_aggs.append(tagged("bottomk", val_payload))
        if "utopk" in st:
            final_aggs.append(tagged("utopk", val_payload))
        if "set" in st:
            final_aggs.append(tagged("vset", val_payload))
        if "hist" in st:
            final_aggs.append(
                tagged(
                    "hist",
                    lambda e: F.struct(
                        F.col("__b").alias("__b"), e["__v"].alias("__v"), e["__c"].alias("__c")
                    ),
                )
            )
        bt = bt.groupBy(*keys, "__hop").agg(*final_aggs)
        tiles = tiles.join(bt, on=keys + ["__hop"], how="left")
    return tiles


def _range_sum(vals: np.ndarray, s: np.ndarray, e: np.ndarray) -> np.ndarray:
    p = _prefix(vals)
    return p[e] - p[s]


def _range_minmax(vals: np.ndarray, s: np.ndarray, e: np.ndarray, take_min: bool) -> np.ndarray:
    return _sparse_query(_sparse_table(vals, take_min), s, e, take_min)


def _merge_order(op: Op, k: int | None, tail: np.ndarray, head: np.ndarray) -> list:
    """Merge the tail (tiles) and head kernel results per query for order /
    extreme ops. tail is strictly earlier in time than head."""
    out = []
    if op == Op.FIRST:
        return [t if t is not None else h for t, h in zip(tail, head)]
    if op == Op.LAST:
        return [h if h is not None else t for t, h in zip(tail, head)]
    for t, h in zip(tail, head):
        if t is None and h is None:
            out.append(None)
            continue
        t = t or []
        h = h or []
        if op == Op.FIRST_K:
            out.append((t + h)[:k])
        elif op == Op.LAST_K:  # most-recent-first
            out.append((h + t)[:k])
        elif op == Op.TOP_K:
            out.append(sorted(t + h, reverse=True)[:k])
        elif op == Op.BOTTOM_K:
            out.append(sorted(t + h)[:k])
        else:  # UNIQUE_TOP_K: distinct union, desc, k
            out.append(sorted(set(t) | set(h), reverse=True)[:k])
    return out


def tiled_sawtooth_asof_join(
    left: DataFrame,
    right: DataFrame,
    gb: GroupBy,
    left_time_column: str = "ts",
    key_mapping: dict[str, str] | None = None,
    prefix: str | None = None,
    coarse_buckets: int | str | None = "auto",
    prefilter: str | None = None,
) -> DataFrame:
    """Sawtooth-mode PITC as-of join where the window tail reads pre-
    aggregated hop tiles instead of raw events. ``coarse_buckets`` as in
    asof_join: cogroup on hash(keys) %% N so one Arrow batch carries many
    keys and searchsorted in composite-index space resolves them at once.
    ``prefilter`` pushes the left key set into the right scan before the
    tile build (asof_join.prefilter_right_keys — IN-list or semi-join)."""
    # Decimal inputs: JVM-side unscaled-int64/double rewrite before the tile
    # build (see aggregators/decimal.py), rescaled back after
    from chronon_spark.aggregators.decimal import rewrite_decimal_inputs

    right_dec, gb_dec, dec_post = rewrite_decimal_inputs(right, gb)
    if dec_post is not None:
        from chronon_spark.aggregators.decimal import EXACT_OPS, _U

        bad = [
            a
            for a in gb_dec.aggregations
            if a.buckets and a.input_column.endswith(_U) and a.op in EXACT_OPS
        ]
        if bad:
            # bucketed tile partials are double-typed (per-bucket "sm"
            # structs) — an unscaled int64 through them would silently lose
            # cents above 2^53; the plain/sliced/skew strategies are exact
            raise ValueError(
                "bucketed Decimal aggregations are not supported on the tiled "
                f"strategy (ops {sorted(a.op.value for a in bad)}) — use the "
                "plain, sliced, or skew strategy, which keep them exact"
            )
        out = tiled_sawtooth_asof_join(
            left, right_dec, gb_dec, left_time_column=left_time_column,
            key_mapping=key_mapping, prefix=prefix,
            coarse_buckets=coarse_buckets, prefilter=prefilter,
        )
        return apply_derivations(dec_post(out, prefix), gb.derivations)
    parts = validate_tiled_spec(gb)
    hop_ms = min(tail_hop_millis(p.window.millis) for p in parts)
    hop_us = hop_ms * 1000

    key_mapping = key_mapping or {k: k for k in gb.keys}
    left_keys = list(key_mapping.keys())
    right_keys = [key_mapping[k] for k in left_keys]

    if prefilter:
        from chronon_spark.operators.asof_join import prefilter_right_keys

        right = prefilter_right_keys(left, right, key_mapping, mode=prefilter)
    r = ensure_ts_us(right, gb.time_column)
    for k in right_keys:
        r = r.where(F.col(k).isNotNull())
    l = ensure_ts_us(left, left_time_column)

    need = _tile_stats_needed(gb)
    _tile_bucket_stats(gb)  # validates bucketed ops up front
    in_cols = sorted(need)
    bucket_cols = sorted({p.bucket for p in parts if p.bucket})
    tie_cols = [t for t in gb.tie_breakers if t in right.columns and t not in right_keys]
    head_cols = in_cols + [b for b in bucket_cols if b not in in_cols]
    head_cols += [t for t in tie_cols if t not in head_cols]
    hop_col = (F.col(_TS_US) / F.lit(hop_us)).cast("long")

    # 1) tile build: one JVM shuffle on (keys, hop) — shared with the
    # standalone/streaming builders
    tiles = (
        build_hop_tiles(right, gb, keys=right_keys, hop_ms=hop_ms)
        # tile timestamp = 1µs before hop end: the strict '<' kernel then
        # includes a tile iff the hop lies fully inside [wstart, q)
        .withColumn(_TS_US, (F.col("__hop") + 1) * F.lit(hop_us) - F.lit(1))
        .drop("__hop")
        .withColumn("__is_tile", F.lit(True))
    )

    # 2) head events: raw rows only in hops that contain >=1 query of the key
    # no .distinct(): left-semi ignores duplicate build rows, and dropping
    # the dedup saves a whole shuffle stage (the hop set is small either way)
    q_hops = l.select(
        *[F.col(k).alias(rk) for k, rk in key_mapping.items()], hop_col.alias("__hop")
    )
    heads = (
        r.withColumn("__hop", hop_col)
        .join(q_hops, on=right_keys + ["__hop"], how="leftsemi")
        .drop("__hop")
        .select(*right_keys, _TS_US, *head_cols)
        .withColumn("__is_tile", F.lit(False))
    )

    # 3) union (null-mated) — the cogroup's right side
    tile_stat_cols = [f.name for f in tiles.schema.fields if "__" in f.name and f.name not in (_TS_US, "__is_tile")]
    heads_u = heads
    for c in tile_stat_cols:
        heads_u = heads_u.withColumn(c, F.lit(None).cast(dict(tiles.dtypes)[c]))
    tiles_u = tiles
    for c in head_cols:
        tiles_u = tiles_u.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    cols_order = right_keys + [_TS_US, "__is_tile"] + head_cols + tile_stat_cols
    union = tiles_u.select(*cols_order).unionByName(heads_u.select(*cols_order))
    union = union.select(*[F.col(c).alias(f"__r_{c}") for c in union.columns])

    feat_fields = []
    right_types = {f.name: f.dataType for f in right.schema.fields}
    for p in parts:
        name = f"{prefix}_{p.output_name}" if prefix else p.output_name
        feat_fields.append(T.StructField(name, part_output_type(p, right_types[p.input_column]), True))
    out_schema = T.StructType(list(left.schema.fields) + feat_fields)
    left_cols = [f.name for f in left.schema.fields]
    feat_names = [f.name for f in feat_fields]
    part_list = list(parts)
    n_ties = len(tie_cols)

    def kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame, lcodes: np.ndarray, rcodes: np.ndarray) -> pd.DataFrame:
        """Whole-batch kernel in composite-index space: code·block + (ts−base)
        makes every searchsorted resolve ALL keys of the Arrow batch at once
        (same trick as kernels.MultiKeyEventColumns; per-key grouping is the
        all-zero-codes special case). base is day-aligned so the sawtooth hop
        rounding commutes with rebasing; clamping window offsets to [0, block)
        keeps ranges inside their key's segment."""
        q_ts = lpdf[_TS_US].to_numpy(np.int64)
        r_ts = rpdf[_TS_US].to_numpy(np.int64) if len(rpdf) else np.empty(0, np.int64)
        lo = int(min(q_ts.min(), r_ts.min())) if len(r_ts) else int(q_ts.min())
        hi = int(max(q_ts.max(), r_ts.max())) if len(r_ts) else int(q_ts.max())
        base = (lo // 86_400_000_000) * 86_400_000_000
        block = (hi - base) + 2
        if (int(max(lcodes.max(initial=0), rcodes.max(initial=0))) + 2) * block > 2**62:
            raise OverflowError("composite-index overflow")

        is_tile = rpdf["__is_tile"].to_numpy(bool) if len(rpdf) else np.empty(0, bool)
        rcomp = rcodes.astype(np.int64) * block + (r_ts - base)
        tcomp_all, tiles_pdf = rcomp[is_tile], rpdf[is_tile]
        torder = np.argsort(tcomp_all, kind="stable")
        tiles_pdf, tcomp_all = tiles_pdf.iloc[torder], tcomp_all[torder]
        hcomp_all, heads_pdf = rcomp[~is_tile], rpdf[~is_tile]
        # heads sorted by (comp, tie_breakers): identical to the raw kernel's
        # event order so first/last(_k) heads match the plain path exactly
        htie_arrays = [heads_pdf[t].to_numpy() for t in tie_cols] if len(heads_pdf) else []
        horder = (
            np.lexsort(tuple(reversed([hcomp_all] + htie_arrays)))
            if htie_arrays
            else np.argsort(hcomp_all, kind="stable")
        )
        heads_pdf, hcomp_all = heads_pdf.iloc[horder], hcomp_all[horder]
        tile_code_base = (tcomp_all // block) * block

        head_cache: dict[str, _ColumnSeries] = {}

        def head_series(c: str) -> _ColumnSeries:
            if c not in head_cache:
                if len(heads_pdf):
                    mask = heads_pdf[c].notna().to_numpy()
                    head_cache[c] = _ColumnSeries(hcomp_all[mask], _to_numpy(heads_pdf[c][mask]))
                else:
                    head_cache[c] = _ColumnSeries(np.empty(0, np.int64), np.empty(0, object))
            return head_cache[c]

        entry_cache: dict[str, tuple] = {}

        def entries(stat_col: str, kind: str) -> tuple:
            """Flatten one tile collection column into sorted entry arrays.

            kind='ts'    -> (comp_by_orig_ts, values) ordered by (ts, ties)
            kind='value' -> (tile_comp, values)
            kind='hist'  -> (tile_comp, values, weights)
            Entry-level ts bounds equal tile-level inclusion because window
            starts are hop multiples (module docstring)."""
            if stat_col in entry_cache:
                return entry_cache[stat_col]
            empty: tuple
            if kind in ("hist", "qsk"):
                empty = (np.empty(0, np.int64), np.empty(0, np.float64 if kind == "qsk" else object), np.empty(0, np.float64 if kind == "qsk" else np.int64))
            else:
                empty = (np.empty(0, np.int64), np.empty(0, object))
            if not len(tiles_pdf):
                entry_cache[stat_col] = empty
                return empty
            lists = tiles_pdf[stat_col].to_numpy()
            if kind == "qsk":
                # struct{s: sorted samples, w: per-sample weight} per tile
                lens = np.fromiter(
                    (len(v["s"]) if isinstance(v, dict) else 0 for v in lists), np.int64, len(lists)
                )
                total = int(lens.sum())
                if not total:
                    entry_cache[stat_col] = empty
                    return empty
                comp = np.repeat(tcomp_all, lens)
                vals = np.fromiter(
                    (x for v in lists if isinstance(v, dict) for x in v["s"]), np.float64, total
                )
                wts = np.repeat(
                    np.fromiter((v["w"] for v in lists if isinstance(v, dict)), np.float64),
                    lens[lens > 0],
                )
                out = (comp, vals, wts)
                entry_cache[stat_col] = out
                return out
            lens = np.fromiter(
                (len(v) if isinstance(v, (list, np.ndarray)) else 0 for v in lists), np.int64, len(lists)
            )
            total = int(lens.sum())
            if not total:
                entry_cache[stat_col] = empty
                return empty
            flat = [e for v in lists if isinstance(v, (list, np.ndarray)) for e in v]
            if kind == "ts":
                ets = np.fromiter((e["t"] for e in flat), np.int64, total)
                comp = np.repeat(tile_code_base, lens) + (ets - base)
                vals = _to_numpy(pd.Series([e["v"] for e in flat]))
                tie_arrs = [_to_numpy(pd.Series([e[f"b{i}"] for e in flat])) for i in range(n_ties)]
                order = (
                    np.lexsort(tuple(reversed([comp] + tie_arrs)))
                    if tie_arrs
                    else np.argsort(comp, kind="stable")
                )
                out = (comp[order], vals[order])
            elif kind == "hist":
                comp = np.repeat(tcomp_all, lens)
                vals = np.fromiter((e["__v"] for e in flat), object, total)
                wts = np.fromiter((e["__c"] for e in flat), np.int64, total)
                out = (comp, vals, wts)  # comp already ascending (tiles sorted)
            else:  # value entries: bound by the tile's own comp
                comp = np.repeat(tcomp_all, lens)
                out = (comp, _to_numpy(pd.Series(flat)))
            entry_cache[stat_col] = out
            return out

        bucket_cache: dict = {}

        def bucket_series(c: str, b: str):
            """Flatten one per-bucket tile IR column + the bucket-masked head
            events into per-bucket-code contiguous slices (stable sort on
            (bucket_code, comp)); codes are shared between tiles and heads."""
            ck = (c, b)
            if ck in bucket_cache:
                return bucket_cache[ck]
            col_name = f"{c}__bk__{b}"
            if len(tiles_pdf):
                lists = tiles_pdf[col_name].to_numpy()
                lens = np.fromiter(
                    (len(v) if isinstance(v, (list, np.ndarray)) else 0 for v in lists), np.int64, len(lists)
                )
                total = int(lens.sum())
                flat = [e for v in lists if isinstance(v, (list, np.ndarray)) for e in v]
                tcomp_e = np.repeat(tcomp_all, lens)
            else:
                total, flat, tcomp_e = 0, [], np.empty(0, np.int64)
            tb = np.fromiter((e["__b"] for e in flat), object, total)
            if len(heads_pdf):
                hmask = heads_pdf[c].notna().to_numpy() & heads_pdf[b].notna().to_numpy()
                hcomp_b = hcomp_all[hmask]
                hvals_b = _to_numpy(heads_pdf[c][hmask])
                hb = heads_pdf[b][hmask].astype(str).to_numpy()
            else:
                hcomp_b = np.empty(0, np.int64)
                hvals_b = np.empty(0, object)
                hb = np.empty(0, object)
            if total + len(hb):
                codes, uniques = pd.factorize(np.concatenate([tb, hb]))
            else:
                codes, uniques = np.empty(0, np.int64), np.empty(0, object)
            tcd, hcd = codes[:total], codes[total:]
            tord = np.lexsort((tcomp_e, tcd)) if total else np.empty(0, np.int64)
            tcomp_e, tcd = tcomp_e[tord], tcd[tord]
            stats = {}
            for nm in ("cnt", "sm", "mn", "mx"):
                if flat and nm in flat[0]:
                    stats[nm] = np.fromiter((e.get(nm) for e in flat), object, total)[tord]
            # heads sorted by (bucket, comp, tie_breakers): within a bucket
            # this is the raw kernel's exact event order, so per-bucket
            # first/last(_k) match the plain grouped path
            hties = (
                [heads_pdf[t][hmask].to_numpy() for t in tie_cols]
                if len(heads_pdf) and tie_cols
                else []
            )
            hord = (
                np.lexsort(tuple(reversed([hcd, hcomp_b] + hties)))
                if len(hb)
                else np.empty(0, np.int64)
            )
            hcomp_b, hvals_b, hcd = hcomp_b[hord], hvals_b[hord], hcd[hord]
            nb = len(uniques)
            tlo = np.searchsorted(tcd, np.arange(nb + 1))
            hlo = np.searchsorted(hcd, np.arange(nb + 1))
            res = (uniques, tcomp_e, stats, tlo, hcomp_b, hvals_b, hlo)
            bucket_cache[ck] = res
            return res

        bucket_entry_cache: dict = {}

        def bucket_entries(c: str, b: str, fam: str, kind: str) -> tuple:
            """Flatten one per-bucket collection IR column (each element
            tagged with its bucket, `{c}__bk_{fam}__{b}`) into arrays laid
            out bucket-contiguously (same layouts as `entries`, plus an
            `elo` offset table indexing each bucket's slice). Bucket codes
            come from bucket_series' factorize so slices line up with the
            scalar IRs and the head slices."""
            ck = (c, b, fam)
            if ck in bucket_entry_cache:
                return bucket_entry_cache[ck]
            uniques = bucket_series(c, b)[0]
            nb = len(uniques)
            code = {u: g for g, u in enumerate(uniques)}
            field = {"set": "vset"}.get(fam, fam)
            col_name = f"{c}__bk_{field}__{b}"
            if len(tiles_pdf):
                lists = tiles_pdf[col_name].to_numpy()
                lens = np.fromiter(
                    (len(v) if isinstance(v, (list, np.ndarray)) else 0 for v in lists),
                    np.int64,
                    len(lists),
                )
                total = int(lens.sum())
                flat_e = [x for v in lists if isinstance(v, (list, np.ndarray)) for x in v]
                tcomp_rep = np.repeat(tcomp_all, lens)
                tcb_rep = np.repeat(tile_code_base, lens)
            else:
                total, flat_e = 0, []
                tcomp_rep = tcb_rep = np.empty(0, np.int64)
            # a bucket present in any collection entry always has tile rows
            # in the scalar IR column (cnt is collected unconditionally at
            # the same grain), so factorize covered it
            ebkt = np.fromiter((code[x["__b"]] for x in flat_e), np.int64, total)
            if kind == "ts":
                if total:
                    ets = np.fromiter((x["t"] for x in flat_e), np.int64, total)
                    comp = tcb_rep + (ets - base)
                    vals = _to_numpy(pd.Series([x["v"] for x in flat_e]))
                    ties = [
                        _to_numpy(pd.Series([x[f"b{i}"] for x in flat_e])) for i in range(n_ties)
                    ]
                    order = np.lexsort(tuple(reversed([ebkt, comp] + ties)))
                    comp, vals, ebkt = comp[order], vals[order], ebkt[order]
                else:
                    comp, vals = np.empty(0, np.int64), np.empty(0, object)
                out_t: tuple = (comp, vals)
            elif kind == "hist":
                vals = np.fromiter((x["__v"] for x in flat_e), object, total)
                wts = np.fromiter((x["__c"] for x in flat_e), np.int64, total)
                order = np.lexsort((tcomp_rep, ebkt)) if total else np.empty(0, np.int64)
                ebkt = ebkt[order]
                out_t = (tcomp_rep[order], vals[order], wts[order])
            else:  # plain value entries, bound by their tile's comp
                vals = _to_numpy(pd.Series([x["v"] for x in flat_e]))
                order = np.lexsort((tcomp_rep, ebkt)) if total else np.empty(0, np.int64)
                ebkt = ebkt[order]
                out_t = (tcomp_rep[order], vals[order])
            elo = np.searchsorted(ebkt, np.arange(nb + 1))
            res = (elo, *out_t)
            bucket_entry_cache[ck] = res
            return res

        nullkey = lcodes < 0
        head_start = (q_ts // hop_us) * hop_us
        kbase = lcodes.astype(np.int64) * block
        comp_q = np.where(nullkey, np.int64(-1), kbase + (q_ts - base))
        comp_h = np.where(nullkey, np.int64(0), kbase + np.clip(head_start - base, 0, block - 1))

        out = lpdf[left_cols].copy()
        for p, fname in zip(part_list, feat_names):
            w_us = p.window.millis * 1000
            p_hop_us = tail_hop_millis(p.window.millis) * 1000
            wstart = ((q_ts - w_us) // p_hop_us) * p_hop_us
            comp_w = np.where(nullkey, np.int64(0), kbase + np.clip(wstart - base, 0, block - 1))
            c = p.input_column

            if p.bucket is not None:
                # Map[bucket -> agg]: per-bucket tile IRs merged with
                # bucket-masked head events; iteration is per BUCKET (each
                # pass vectorized over all queries), the same shape as
                # kernels._grouped_kernel. Scalars merge range partials;
                # collection IRs reuse the SAME raw-path kernels per bucket.
                uniques, tcomp_e, bstats, tlo, hcomp_b, hvals_b, hlo = bucket_series(c, p.bucket)
                fam = _op_family(p.op)
                integral = isinstance(part_output_type(p, right_types[c]).valueType, T.LongType)
                acc: list = [None] * len(q_ts)
                for g in range(len(uniques)):
                    ts_g = tcomp_e[tlo[g] : tlo[g + 1]]
                    s1 = np.searchsorted(ts_g, comp_w, side="left")
                    e1 = np.maximum(np.searchsorted(ts_g, comp_h, side="left"), s1)
                    hts_g = hcomp_b[hlo[g] : hlo[g + 1]]
                    hv_g = hvals_b[hlo[g] : hlo[g + 1]]
                    s2 = np.searchsorted(hts_g, comp_h, side="left")
                    e2 = np.maximum(np.searchsorted(hts_g, comp_q, side="left"), s2)
                    if fam is not None:
                        kind = (
                            "ts"
                            if p.op in _ORDER_OPS
                            else ("hist" if p.op in _HIST_OPS else "value")
                        )
                        ent = bucket_entries(c, p.bucket, fam, kind)
                        elo, ecomp = ent[0], ent[1]
                        arr = ecomp[elo[g] : elo[g + 1]]
                        av = ent[2][elo[g] : elo[g + 1]]
                        es = np.searchsorted(arr, comp_w, side="left")
                        ee = np.maximum(np.searchsorted(arr, comp_h, side="left"), es)
                        if p.op in _SET_OPS:
                            vals_g = _distinct2(av, es, ee, hv_g, s2, e2)
                        elif p.op in _HIST_OPS:
                            aw = ent[3][elo[g] : elo[g + 1]]
                            kk = p.k if (p.k or p.op != Op.HISTOGRAM) else None
                            vals_g = _hist2(av, aw, es, ee, hv_g, s2, e2, kk)
                        else:  # order / extreme: raw-path kernel both sides
                            kp = p
                            if p.op in (Op.FIRST, Op.LAST):
                                kp = AggregationPart(
                                    p.input_column,
                                    Op.FIRST_K if p.op == Op.FIRST else Op.LAST_K,
                                    p.window,
                                    k=1,
                                )
                            tail_res = _kernel(kp, _ColumnSeries(arr, av), es, ee)
                            head_res = _kernel(kp, _ColumnSeries(hts_g, hv_g), s2, e2)
                            if p.op in (Op.FIRST, Op.LAST):
                                merged_k = _merge_order(kp.op, 1, tail_res, head_res)
                                vals_g = [None if v is None else v[0] for v in merged_k]
                            else:
                                vals_g = _merge_order(p.op, p.k, tail_res, head_res)
                        bkey = str(uniques[g])
                        for i in range(len(vals_g)):
                            if vals_g[i] is not None:
                                d0 = acc[i]
                                if d0 is None:
                                    d0 = acc[i] = {}
                                d0[bkey] = vals_g[i]
                        continue
                    cnt_g = _range_sum(
                        np.asarray(bstats["cnt"][tlo[g] : tlo[g + 1]], np.float64), s1, e1
                    ) + (e2 - s2)
                    if p.op == Op.COUNT:
                        vals_g = [None if v <= 0 else int(v) for v in cnt_g]
                    elif p.op in (Op.SUM, Op.AVERAGE):
                        sm_g = _range_sum(
                            np.asarray(bstats["sm"][tlo[g] : tlo[g + 1]], np.float64), s1, e1
                        ) + _range_sum(
                            hv_g.astype(np.float64) if len(hv_g) else np.empty(0, np.float64), s2, e2
                        )
                        if p.op == Op.SUM:
                            vals_g = [
                                None if n0 <= 0 else (int(round(v)) if integral else float(v))
                                for v, n0 in zip(sm_g, cnt_g)
                            ]
                        else:
                            vals_g = [
                                None if n0 <= 0 else float(v / n0) for v, n0 in zip(sm_g, cnt_g)
                            ]
                    else:
                        take_min = p.op == Op.MIN
                        nm = "mn" if take_min else "mx"
                        part_t = _range_minmax(bstats[nm][tlo[g] : tlo[g + 1]], s1, e1, take_min)
                        part_h = _range_minmax(hv_g, s2, e2, take_min)
                        vals_g = []
                        for a, b2 in zip(part_t, part_h):
                            if a is None:
                                vals_g.append(b2)
                            elif b2 is None:
                                vals_g.append(a)
                            else:
                                vals_g.append(min(a, b2) if take_min else max(a, b2))
                    bkey = str(uniques[g])
                    for i in range(len(vals_g)):
                        if vals_g[i] is not None:
                            d0 = acc[i]
                            if d0 is None:
                                d0 = acc[i] = {}
                            d0[bkey] = vals_g[i]
                res = np.empty(len(q_ts), object)
                for i, d0 in enumerate(acc):
                    res[i] = d0
                out[fname] = res
                continue

            hcs = head_series(c)
            hs = np.searchsorted(hcs.ts, comp_h, side="left")
            he = np.maximum(np.searchsorted(hcs.ts, comp_q, side="left"), hs)

            if p.op in (Op.COUNT, Op.SUM, Op.AVERAGE) or p.op in _MOMENT_OPS:
                # tail: tiles fully inside [wstart, head_start)
                ts_idx_s = np.searchsorted(tcomp_all, comp_w, side="left")
                ts_idx_e = np.maximum(np.searchsorted(tcomp_all, comp_h, side="left"), ts_idx_s)
                cnt_t = _range_sum(tiles_pdf[f"{c}__cnt"].to_numpy(np.float64), ts_idx_s, ts_idx_e)
                n = cnt_t + (he - hs)  # non-null values in window
                if p.op == Op.COUNT:
                    out[fname] = [None if v <= 0 else int(v) for v in n]
                    continue
                if p.op == Op.SUM:
                    integral = isinstance(part_output_type(p, right_types[c]), T.LongType)
                    # exact int64 path: tile partials arrive as boxed Decimals
                    # (integral_tile_cols cast) and heads as int64 — no float64
                    # round-trip, so >2^53 sums (incl. the Decimal rewrite's
                    # unscaled values) stay exact
                    t_raw = tiles_pdf[f"{c}__sum"] if len(tiles_pdf) else None
                    t_obj = t_raw is None or t_raw.dtype == object
                    h_int = not len(hcs.vals) or _is_integral(hcs.vals)
                    if integral and t_obj and h_int:
                        if t_raw is not None:
                            tl = np.fromiter(
                                (0 if v is None else int(v) for v in t_raw.to_numpy()),
                                np.int64,
                                len(t_raw),
                            )
                        else:
                            tl = np.empty(0, np.int64)
                        pt = np.concatenate(([0], np.cumsum(tl)))
                        ph = np.concatenate(
                            ([0], np.cumsum(hcs.vals.astype(np.int64)))
                        ) if len(hcs.vals) else np.zeros(1, np.int64)
                        total_i = (pt[ts_idx_e] - pt[ts_idx_s]) + (ph[he] - ph[hs])
                        out[fname] = [
                            None if nv <= 0 else int(v) for v, nv in zip(total_i, n)
                        ]
                        continue
                hvals = hcs.vals.astype(np.float64) if len(hcs.vals) else np.empty(0, np.float64)
                t_sum_np = tiles_pdf[f"{c}__sum"].to_numpy() if len(tiles_pdf) else np.empty(0, object)
                if t_sum_np.dtype == object:  # boxed decimals on the float path
                    t_sum_np = np.array(
                        [0.0 if v is None else float(v) for v in t_sum_np], np.float64
                    )
                else:
                    t_sum_np = np.nan_to_num(t_sum_np.astype(np.float64))
                sum_t = _range_sum(t_sum_np, ts_idx_s, ts_idx_e)
                sum_h = _range_sum(hvals, hs, he)
                total = sum_t + sum_h
                if p.op == Op.SUM:
                    integral = isinstance(part_output_type(p, right_types[c]), T.LongType)
                    out[fname] = [
                        None if nv <= 0 else (int(round(v)) if integral else float(v))
                        for v, nv in zip(total, n)
                    ]
                    continue
                if p.op == Op.AVERAGE:
                    with np.errstate(invalid="ignore", divide="ignore"):
                        avg = np.where(n > 0, total / n, np.nan)
                    out[fname] = [None if np.isnan(v) else float(v) for v in avg]
                    continue
                # moments from merged raw power sums (same central-moment
                # algebra as kernels._moments at shift 0)
                upto = 2 if p.op == Op.VARIANCE else (3 if p.op == Op.SKEW else 4)
                S = {1: total}
                for pw in range(2, upto + 1):
                    s_t = _range_sum(
                        np.nan_to_num(tiles_pdf[f"{c}__pow{pw}"].to_numpy(np.float64)), ts_idx_s, ts_idx_e
                    )
                    p_h = _prefix(hvals, pw)
                    S[pw] = s_t + (p_h[he] - p_h[hs])
                with np.errstate(invalid="ignore", divide="ignore"):
                    mu = S[1] / n
                    m2 = np.maximum(S[2] / n - mu**2, 0.0)
                    if p.op == Op.VARIANCE:
                        vals_out, bad = m2, n <= 0
                    elif p.op == Op.SKEW:
                        m3 = S[3] / n - 3 * mu * S[2] / n + 2 * mu**3
                        vals_out = m3 / np.power(m2, 1.5)
                        bad = (n < 3) | (m2 <= 0)
                    else:
                        m4 = S[4] / n - 4 * mu * S[3] / n + 6 * mu**2 * S[2] / n - 3 * mu**4
                        vals_out = m4 / (m2**2) - 3.0
                        bad = (n < 4) | (m2 <= 0)
                res = vals_out.astype(object)
                res[bad | (n <= 0)] = None
                out[fname] = res
            elif p.op in (Op.MIN, Op.MAX):
                take_min = p.op == Op.MIN
                tcol = f"{c}__{'min' if take_min else 'max'}"
                tmask = tiles_pdf[tcol].notna().to_numpy() if len(tiles_pdf) else np.empty(0, bool)
                # _to_numpy recovers exact int64 from boxed-Decimal tile
                # partials (the Decimal rewrite's DECIMAL(18,0) columns)
                tt, tv = tcomp_all[tmask], _to_numpy(tiles_pdf[tcol].to_numpy()[tmask])
                s2 = np.searchsorted(tt, comp_w, side="left")
                e2 = np.maximum(np.searchsorted(tt, comp_h, side="left"), s2)
                part_t = _range_minmax(tv, s2, e2, take_min)
                part_h = _range_minmax(hcs.vals, hs, he, take_min)
                merged = []
                for a, b in zip(part_t, part_h):
                    if a is None:
                        merged.append(b)
                    elif b is None:
                        merged.append(a)
                    else:
                        merged.append(min(a, b) if take_min else max(a, b))
                out[fname] = merged
            elif p.op in _ORDER_OPS or p.op in _EXTREME_OPS:
                fam = _op_family(p.op)
                kind = "ts" if p.op in _ORDER_OPS else "value"
                ecomp, evals = entries(f"{c}__{fam}", kind)
                es = np.searchsorted(ecomp, comp_w, side="left")
                ee = np.maximum(np.searchsorted(ecomp, comp_h, side="left"), es)
                # reuse the raw-path kernel on both sides, merge per op.
                # FIRST/LAST ride their _K kernels so the list merge is uniform
                kp = p
                if p.op in (Op.FIRST, Op.LAST):
                    kp = AggregationPart(
                        p.input_column,
                        Op.FIRST_K if p.op == Op.FIRST else Op.LAST_K,
                        p.window,
                        k=1,
                    )
                tail_res = _kernel(kp, _ColumnSeries(ecomp, evals), es, ee)
                head_res = _kernel(kp, hcs, hs, he)
                if p.op in (Op.FIRST, Op.LAST):
                    merged_k = _merge_order(
                        Op.FIRST_K if p.op == Op.FIRST else Op.LAST_K, 1, tail_res, head_res
                    )
                    out[fname] = [None if v is None else v[0] for v in merged_k]
                else:
                    out[fname] = _merge_order(p.op, p.k, tail_res, head_res)
            elif p.op in _SET_OPS:
                ecomp, evals = entries(f"{c}__set", "value")
                es = np.searchsorted(ecomp, comp_w, side="left")
                ee = np.maximum(np.searchsorted(ecomp, comp_h, side="left"), es)
                out[fname] = _distinct2(evals, es, ee, hcs.vals, hs, he)
            elif p.op == Op.APPROX_PERCENTILE:
                ecomp, evals, ewts = entries(f"{c}__qsk", "qsk")
                es = np.searchsorted(ecomp, comp_w, side="left")
                ee = np.maximum(np.searchsorted(ecomp, comp_h, side="left"), es)
                out[fname] = _qsk2(
                    evals, ewts, es, ee, hcs.vals, hs, he, np.asarray(p.percentiles, np.float64)
                )
            else:  # histogram family
                ecomp, evals, ewts = entries(f"{c}__hist", "hist")
                es = np.searchsorted(ecomp, comp_w, side="left")
                ee = np.maximum(np.searchsorted(ecomp, comp_h, side="left"), es)
                k = p.k if (p.k or p.op != Op.HISTOGRAM) else None
                out[fname] = _hist2(evals, ewts, es, ee, hcs.vals, hs, he, k)
        return out

    def fn_perkey(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf):
            return pd.DataFrame(columns=left_cols + feat_names)
        rpdf = rpdf.rename(columns=lambda c: c[4:] if c.startswith("__r_") else c)
        return kernel(lpdf, rpdf, np.zeros(len(lpdf), np.int64), np.zeros(len(rpdf), np.int64))

    def fn_bucketed(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf):
            return pd.DataFrame(columns=left_cols + feat_names)
        rpdf = rpdf.rename(columns=lambda c: c[4:] if c.startswith("__r_") else c)
        if len(left_keys) == 1:
            joint = pd.concat([lpdf[left_keys[0]], rpdf[right_keys[0]]], ignore_index=True)
            codes = pd.factorize(joint, use_na_sentinel=True)[0]
        else:
            arrays = [
                pd.concat([lpdf[lk], rpdf[rk]], ignore_index=True)
                for lk, rk in zip(left_keys, right_keys)
            ]
            codes = pd.MultiIndex.from_arrays(arrays).factorize()[0]
        lcodes, rcodes = codes[: len(lpdf)], codes[len(lpdf) :]
        try:
            return kernel(lpdf, rpdf, lcodes, rcodes)
        except OverflowError:  # huge time span x many keys: per-key in-process
            pieces = []
            for k in np.unique(lcodes):
                lsub = lpdf[lcodes == k]
                rsub = rpdf[rcodes == k] if k >= 0 else rpdf.iloc[0:0]
                pieces.append(
                    kernel(lsub, rsub, np.zeros(len(lsub), np.int64), np.zeros(len(rsub), np.int64))
                )
            return pd.concat(pieces, ignore_index=False)

    if coarse_buckets == "auto":
        try:
            sp = int(left.sparkSession.conf.get("spark.sql.shuffle.partitions", "64"))
        except ValueError:
            sp = left.sparkSession.sparkContext.defaultParallelism or 64
        coarse_buckets = max(sp * 4, 64)

    if coarse_buckets:
        lb = l.withColumn("__b", F.pmod(F.xxhash64(*left_keys), F.lit(coarse_buckets)))
        ub = union.withColumn(
            "__r___b", F.pmod(F.xxhash64(*[f"__r_{c}" for c in right_keys]), F.lit(coarse_buckets))
        )
        grouped = lb.groupby(F.col("__b")).cogroup(ub.groupby(F.col("__r___b")))
        return apply_derivations(grouped.applyInPandas(fn_bucketed, schema=out_schema), gb.derivations)
    grouped = l.groupby(*[F.col(c) for c in left_keys]).cogroup(
        union.groupby(*[F.col(f"__r_{c}") for c in right_keys])
    )
    return apply_derivations(grouped.applyInPandas(fn_perkey, schema=out_schema), gb.derivations)


def _distinct2(
    evals: np.ndarray,
    es: np.ndarray,
    ee: np.ndarray,
    hvals: np.ndarray,
    hs: np.ndarray,
    he: np.ndarray,
) -> np.ndarray:
    """Distinct count over the union of two index-range families (tile-set
    entries + head events) — one segmented lexsort per chunk, like the raw
    kernel's UNIQUE_COUNT but gathering from both sides."""
    n = (ee - es) + (he - hs)
    out = np.empty(len(n), object)
    for lo, hi in _query_chunks(n):
        f1, l1 = _flat_ranges(es[lo:hi], ee[lo:hi])
        f2, l2 = _flat_ranges(hs[lo:hi], he[lo:hi])
        seg = np.concatenate(
            [np.repeat(np.arange(hi - lo, dtype=np.int64), l1), np.repeat(np.arange(hi - lo, dtype=np.int64), l2)]
        )
        vals = np.concatenate(
            [evals[f1] if len(f1) else evals[:0], hvals[f2] if len(f2) else hvals[:0]]
        )
        if len(vals):
            order = np.lexsort((vals, seg))
            seg, vals = seg[order], vals[order]
        runs = _run_starts(seg, vals)
        cnt = np.bincount(seg[runs], minlength=hi - lo) if len(seg) else np.zeros(hi - lo, np.int64)
        chunk = cnt.astype(object)
        chunk[(l1 + l2) <= 0] = None
        out[lo:hi] = chunk
    return out


def _hist2(
    evals: np.ndarray,
    ewts: np.ndarray,
    es: np.ndarray,
    ee: np.ndarray,
    hvals: np.ndarray,
    hs: np.ndarray,
    he: np.ndarray,
    k: int | None,
) -> np.ndarray:
    """Weighted histogram over tile (value, count) entries + weight-1 head
    events; finalize (incl. deterministic k-truncation) shared with the raw
    kernel via kernels.hist_finalize."""
    n = (ee - es) + (he - hs)
    out = np.empty(len(n), object)
    hstr = hvals.astype(str) if len(hvals) else np.empty(0, object)
    for lo, hi in _query_chunks(n):
        f1, l1 = _flat_ranges(es[lo:hi], ee[lo:hi])
        f2, l2 = _flat_ranges(hs[lo:hi], he[lo:hi])
        seg = np.concatenate(
            [np.repeat(np.arange(hi - lo, dtype=np.int64), l1), np.repeat(np.arange(hi - lo, dtype=np.int64), l2)]
        )
        vals = np.concatenate(
            [evals[f1].astype(str) if len(f1) else np.empty(0, object), hstr[f2] if len(f2) else np.empty(0, object)]
        )
        wts = np.concatenate([ewts[f1] if len(f1) else ewts[:0], np.ones(len(f2), np.int64)])
        if len(vals):
            order = np.lexsort((vals, seg))
            seg, vals, wts = seg[order], vals[order], wts[order]
        runs = _run_starts(seg, vals)
        run_seg, run_val = seg[runs], vals[runs]
        wprefix = np.concatenate(([0], np.cumsum(wts)))
        bounds = np.concatenate([np.flatnonzero(runs), [len(seg)]]) if len(seg) else np.array([0])
        run_cnt = (wprefix[bounds[1:]] - wprefix[bounds[:-1]]).astype(np.int64) if len(run_seg) else np.empty(0, np.int64)
        out[lo:hi] = hist_finalize(run_seg, run_val, run_cnt, hi - lo, k, (l1 + l2) <= 0)
    return out


def _qsk2(
    evals: np.ndarray,
    ewts: np.ndarray,
    es: np.ndarray,
    ee: np.ndarray,
    hvals: np.ndarray,
    hs: np.ndarray,
    he: np.ndarray,
    qs: np.ndarray,
) -> np.ndarray:
    """Weighted-quantile estimate over tile sketch samples (weight n/K) +
    exact head events (weight 1). Sample i covers ranks [c_{i-1}, c_i); the
    estimate linearly interpolates at rank q*(W-1) — with all weights 1 this
    reduces EXACTLY to the raw kernel's interpolation, so the sketch is only
    approximate where tiles actually compacted."""
    n = (ee - es) + (he - hs)
    out = np.empty(len(n), object)
    for lo, hi in _query_chunks(n):
        m = hi - lo
        f1, l1 = _flat_ranges(es[lo:hi], ee[lo:hi])
        f2, l2 = _flat_ranges(hs[lo:hi], he[lo:hi])
        seg = np.concatenate(
            [np.repeat(np.arange(m, dtype=np.int64), l1), np.repeat(np.arange(m, dtype=np.int64), l2)]
        )
        hseg = (hvals[f2] if len(f2) else hvals[:0]).astype(np.float64)
        vals = np.concatenate([evals[f1] if len(f1) else evals[:0], hseg])
        wts = np.concatenate([ewts[f1] if len(f1) else ewts[:0], np.ones(len(f2))])
        if len(vals):
            order = np.lexsort((vals, seg))
            seg, vals, wts = seg[order], vals[order], wts[order]
        cum = np.cumsum(wts)
        counts = np.bincount(seg, minlength=m) if len(seg) else np.zeros(m, np.int64)
        idx_end = np.cumsum(counts)
        idx_start = idx_end - counts
        nonz = counts > 0
        segw_start = np.zeros(m)
        W = np.zeros(m)
        if len(cum):
            segw_start[nonz] = np.where(idx_start[nonz] > 0, cum[idx_start[nonz] - 1], 0.0)
            W[nonz] = cum[idx_end[nonz] - 1] - segw_start[nonz]
        cols = []
        for q in qs:
            t = q * np.maximum(W - 1, 0)

            def rank_val(tt):
                tgt = segw_start + np.minimum(tt, np.maximum(W - 1, 0))
                idx = np.searchsorted(cum, tgt, side="right") if len(cum) else np.zeros(m, np.int64)
                idx = np.clip(idx, idx_start, np.maximum(idx_end - 1, idx_start))
                return vals[np.clip(idx, 0, max(len(vals) - 1, 0))] if len(vals) else np.zeros(m)

            t0 = np.floor(t)
            frac = t - t0
            cols.append(rank_val(t0) * (1 - frac) + rank_val(t0 + 1) * frac)
        stacked = np.stack(cols, axis=1) if cols else np.zeros((m, 0))
        out[lo:hi] = _obj_from_rows(stacked, nonz)
    return out


def _obj_from_rows(stacked: np.ndarray, nonz: np.ndarray) -> np.ndarray:
    res = np.empty(len(nonz), object)
    for i in range(len(nonz)):
        res[i] = [float(x) for x in stacked[i]] if nonz[i] else None
    return res
