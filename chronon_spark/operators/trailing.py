"""Self-as-of trailing-window features — the pure-JVM fast path.

When the query timestamps ARE the event timestamps (per-event trailing
features, the most common backfill shape), the as-of join degenerates to
native window functions with a value-range frame:

    Window.partitionBy(keys).orderBy(ts_us).rangeBetween(-w_us, -1)

`[ts - w, ts - 1]` micros ≡ the strict half-open `[ts - w, ts)` window —
zero temporal leakage, whole-stage-codegen, no Python. Use this whenever it
applies; fall back to `asof_join` for a distinct query table.

The reference has no such fast path (it always runs the sawtooth); this is a
place the Spark-first rebuild is structurally faster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from chronon_spark.api import GroupBy, Op
from chronon_spark.operators.asof_join import _TS_US, ensure_ts_us

# ops expressible as native Spark window aggregates
NATIVE_OPS = {
    Op.COUNT,
    Op.SUM,
    Op.AVERAGE,
    Op.MIN,
    Op.MAX,
    Op.VARIANCE,
    Op.UNIQUE_COUNT,
    Op.APPROX_UNIQUE_COUNT,
    Op.FIRST,
    Op.LAST,
    Op.FIRST_K,
    Op.LAST_K,
}


def _native_agg(op: Op, col: str, k: int | None, win) -> Column:
    c = F.col(col)
    cnt = F.count(c).over(win)
    if op == Op.COUNT:
        return F.when(cnt > 0, cnt)
    if op == Op.SUM:
        return F.sum(c).over(win)
    if op == Op.AVERAGE:
        return F.avg(c).over(win)
    if op == Op.MIN:
        return F.min(c).over(win)
    if op == Op.MAX:
        return F.max(c).over(win)
    if op == Op.VARIANCE:
        return F.var_pop(c).over(win)
    if op == Op.UNIQUE_COUNT:
        return F.when(cnt > 0, F.size(F.collect_set(c).over(win)).cast("long"))
    if op == Op.APPROX_UNIQUE_COUNT:
        return F.when(cnt > 0, F.approx_count_distinct(c).over(win))
    if op == Op.FIRST:
        # frame is ts-ordered; first non-null in frame (F.get: null on empty,
        # ANSI-safe unlike [0]/element_at)
        return F.get(F.collect_list(c).over(win), 0)
    if op == Op.LAST:
        arr = F.collect_list(c).over(win)
        return F.get(arr, F.size(arr) - 1)
    if op == Op.FIRST_K:
        arr = F.collect_list(c).over(win)
        return F.when(F.size(arr) > 0, F.slice(arr, 1, k))
    if op == Op.LAST_K:
        # most-recent-first, matching kernels.py; slice(-k) underflows when
        # size < k, so take the whole array in that case
        arr = F.collect_list(c).over(win)
        tail = F.when(F.size(arr) < k, arr).otherwise(F.slice(arr, -k, k))
        return F.when(F.size(arr) > 0, F.reverse(tail))
    raise NotImplementedError(op)


def trailing_features(df: DataFrame, gb: GroupBy) -> DataFrame:
    """Append one trailing-window feature column per AggregationPart, computed
    at every event row (strict `< ts`). Requires ops ⊆ NATIVE_OPS and no
    buckets; otherwise use asof_join(left=df, right=df, gb)."""
    parts = gb.parts()
    bad = [p for p in parts if p.op not in NATIVE_OPS or p.bucket]
    if bad:
        raise ValueError(f"not native-window expressible: {[p.output_name for p in bad]}; use asof_join")
    out = ensure_ts_us(df, gb.time_column)
    for p in parts:
        w_us = None if p.window.millis is None else p.window.millis * 1000
        base = W.partitionBy(*gb.keys).orderBy(_TS_US)
        win = base.rangeBetween(W.unboundedPreceding if w_us is None else -w_us, -1)
        out = out.withColumn(p.output_name, _native_agg(p.op, p.input_column, p.k, win))
    return out.drop(_TS_US)
