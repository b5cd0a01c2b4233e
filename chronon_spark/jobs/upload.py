"""Batch-IR upload + fetch-time merge: the reference's online-serving data
path, re-expressed as Spark batch jobs.

Reference anatomy:
- ``GroupByUpload`` writes, per key at ``batchEndTs``, a
  ``FinalBatchIr{collapsed, tailHops}`` (spark/.../GroupByUpload.scala:43-120,
  schema SawtoothMutationAggregator.scala:30-66): *collapsed* aggregates every
  event in ``[tail_i + tailBuffer, batchEnd)`` for window i
  (tail_i = batchEnd − window; tailBuffer default 2 d), while events inside
  ``(tail_i, tail_i + tailBuffer)`` stay as per-hop tail IRs.
- At fetch time ``SawtoothOnlineAggregator.lambdaAggregateIr``
  (SawtoothOnlineAggregator.scala:86-126) clones the collapsed IR, adds
  streaming rows with ``batchEndTs <= ts < queryTs`` (strict head), and merges
  tail hops with ``hopStart >= round(queryTs − w, hop)``
  (mergeTailHops, SawtoothMutationAggregator.scala:159-184).
- ``ConsistencyJob`` (spark/.../stats/ConsistencyJob.scala:96-154) re-runs the
  offline backfill over logged fetch requests and diffs — our
  ``tests/test_upload_fetch.py`` does exactly that: fetch == sawtooth backfill.

Spark-first shape: the collapsed IRs are ONE whole-stage-codegen
``groupBy(keys)`` with per-part conditional aggregates; tail hops are a
``groupBy(keys, hop)`` over the (narrow) tail-buffer slice collected into a
sorted array per key; the fetch merge is the same cogroup + Arrow kernel
pattern as the as-of join. Exact for the decomposable ops
(COUNT/SUM/MIN/MAX/AVERAGE) — the same subset the reference can collapse.

Valid fetch range: ``batchEndTs <= queryTs < batchEndTs + tailBuffer`` (after
that the reference re-uploads a fresh batch; we assert the same contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from chronon_spark.api import GroupBy, Op
from chronon_spark.operators.asof_join import ensure_ts_us
from chronon_spark.resolution import tail_hop_millis
from chronon_spark.types import part_output_type

UPLOAD_OPS = {Op.COUNT, Op.SUM, Op.MIN, Op.MAX, Op.AVERAGE}
TAIL_BUFFER_MS = 2 * 86_400_000  # reference default: Window(2, DAYS)

_TS_US = "__ts_us"


def _check(gb: GroupBy) -> list:
    parts = gb.parts()
    bad = [p.op for p in parts if p.op not in UPLOAD_OPS]
    if bad:
        raise ValueError(f"batch-IR upload supports {sorted(o.value for o in UPLOAD_OPS)}; got {bad}")
    if any(p.bucket for p in parts):
        raise ValueError("batch-IR upload does not support buckets")
    if not gb.sawtooth:
        raise ValueError("batch-IR upload requires sawtooth=True (hop-rounded window tails)")
    return parts


def build_batch_irs(
    events: DataFrame,
    gb: GroupBy,
    batch_end_ts_us: int,
    tail_buffer_ms: int = TAIL_BUFFER_MS,
) -> DataFrame:
    """One row per key: per-part collapsed IR columns ``__c{i}_{stat}`` plus a
    time-sorted tail-hop array ``__tails_{i}`` of struct(hop, cnt, sm, mn, mx).
    """
    parts = _check(gb)
    _check_alignment(parts, batch_end_ts_us)
    buf_us = tail_buffer_ms * 1000
    ev = ensure_ts_us(events, gb.time_column).where(F.col(_TS_US) < batch_end_ts_us)
    for k in gb.keys:
        ev = ev.where(F.col(k).isNotNull())

    # collapsed: one conditional-aggregate pass (whole-stage codegen, map-side
    # combine — the 100 TB bulk of history reduces to one row per key here)
    aggs = []
    for i, p in enumerate(parts):
        c = F.col(p.input_column)
        if p.window.millis is None:
            cond = F.lit(True)
        else:
            tail = batch_end_ts_us - p.window.millis * 1000
            cond = F.col(_TS_US) >= F.lit(tail + buf_us)
        val = F.when(cond, c)
        if p.op in (Op.COUNT, Op.SUM, Op.AVERAGE):
            aggs.append(F.count(val).alias(f"__c{i}_cnt"))
        if p.op in (Op.SUM, Op.AVERAGE):
            aggs.append(F.sum(val.cast("double")).alias(f"__c{i}_sm"))
        if p.op == Op.MIN:
            aggs.append(F.min(val).alias(f"__c{i}_mn"))
        if p.op == Op.MAX:
            aggs.append(F.max(val).alias(f"__c{i}_mx"))
    out = ev.groupBy(*gb.keys).agg(*aggs)

    # tail hops: per part, the (tail, tail+buffer) slice at hop granularity
    for i, p in enumerate(parts):
        if p.window.millis is None:
            out = out.withColumn(f"__tails_{i}", F.lit(None).cast(_tail_type()))
            continue
        hop_us = tail_hop_millis(p.window.millis) * 1000
        tail = batch_end_ts_us - p.window.millis * 1000
        # >= tail: an event exactly at batchEnd - window must land in the tail
        # hops (collapsed starts at tail + buf), or fetch undercounts vs the
        # sawtooth backfill whose hop-rounded window start is inclusive;
        # hops below a query's rounded wstart are filtered at fetch time
        sl = ev.where((F.col(_TS_US) >= tail) & (F.col(_TS_US) < min(tail + buf_us, batch_end_ts_us)))
        c = F.col(p.input_column)
        hops = (
            sl.withColumn("__hop", (F.col(_TS_US) / F.lit(hop_us)).cast("long") * F.lit(hop_us))
            .groupBy(*gb.keys, "__hop")
            .agg(
                F.count(c).alias("cnt"),
                F.sum(c.cast("double")).alias("sm"),
                F.min(c.cast("double")).alias("mn"),
                F.max(c.cast("double")).alias("mx"),
            )
            .groupBy(*gb.keys)
            .agg(
                F.sort_array(
                    F.collect_list(F.struct(F.col("__hop").alias("hop"), "cnt", "sm", "mn", "mx"))
                ).alias(f"__tails_{i}")
            )
        )
        out = out.join(hops, on=gb.keys, how="full")
    return out


def _check_alignment(parts, batch_end_ts_us: int) -> None:
    """tail_i = batchEnd − window must sit on a hop boundary, or collapsed
    events leak relative to the hop-rounded window start. In the reference's
    deployment batchEnd is a midnight partition boundary and windows are whole
    hours/days, which guarantees this — we assert instead of assuming."""
    for p in parts:
        if p.window.millis is None:
            continue
        hop_us = tail_hop_millis(p.window.millis) * 1000
        if (batch_end_ts_us - p.window.millis * 1000) % hop_us:
            raise ValueError(
                f"window {p.window.spec}: batch_end - window not aligned to its {hop_us}us hop"
            )


def _tail_type() -> T.ArrayType:
    return T.ArrayType(
        T.StructType(
            [
                T.StructField("hop", T.LongType()),
                T.StructField("cnt", T.LongType()),
                T.StructField("sm", T.DoubleType()),
                T.StructField("mn", T.DoubleType()),
                T.StructField("mx", T.DoubleType()),
            ]
        )
    )


def fetch_features(
    queries: DataFrame,
    batch_irs: DataFrame,
    streaming: DataFrame,
    gb: GroupBy,
    batch_end_ts_us: int,
    left_time_column: str = "ts",
    tail_buffer_ms: int = TAIL_BUFFER_MS,
) -> DataFrame:
    """Batch-simulated online fetch: for every query row (key, ts), merge its
    key's batch IR + tail hops + streaming rows into final feature values —
    ``lambdaAggregateIr`` (SawtoothOnlineAggregator.scala:86-126) as a cogroup
    kernel. Strict head (``rowTs < queryTs``), exactly the engine default."""
    parts = _check(gb)
    _check_alignment(parts, batch_end_ts_us)
    del tail_buffer_ms  # upper hop bound is enforced at build time

    st = ensure_ts_us(streaming, gb.time_column).where(F.col(_TS_US) >= batch_end_ts_us)
    for k in gb.keys:
        st = st.where(F.col(k).isNotNull())
    in_cols = sorted({p.input_column for p in parts})
    st = st.select(*gb.keys, _TS_US, *in_cols).withColumn("__is_ir", F.lit(False))

    ir_cols = [c for c in batch_irs.columns if c.startswith("__c") or c.startswith("__tails_")]
    ir = batch_irs.withColumn(_TS_US, F.lit(-1).cast("long")).withColumn("__is_ir", F.lit(True))
    for c in in_cols:
        ir = ir.withColumn(c, F.lit(None).cast(dict(st.dtypes)[c]))
    st_u = st
    for c in ir_cols:
        st_u = st_u.withColumn(c, F.lit(None).cast(dict(ir.dtypes)[c]))
    order = gb.keys + [_TS_US, "__is_ir"] + in_cols + ir_cols
    union = ir.select(*order).unionByName(st_u.select(*order))
    union = union.select(*[F.col(c).alias(f"__r_{c}") for c in union.columns])

    l = ensure_ts_us(queries, left_time_column)
    left_cols = [f.name for f in queries.schema.fields]
    right_types = {f.name: f.dataType for f in streaming.schema.fields}
    feat_fields = [
        T.StructField(p.output_name, part_output_type(p, right_types[p.input_column]), True)
        for p in parts
    ]
    out_schema = T.StructType(list(queries.schema.fields) + feat_fields)
    feat_names = [f.name for f in feat_fields]
    part_list = list(parts)
    integral = [isinstance(part_output_type(p, right_types[p.input_column]), T.LongType) for p in parts]

    def fn(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if not len(lpdf):
            return pd.DataFrame(columns=left_cols + feat_names)
        rpdf = rpdf.rename(columns=lambda c: c[4:] if c.startswith("__r_") else c)
        q_ts = lpdf[_TS_US].to_numpy("int64")
        if (q_ts < batch_end_ts_us).any():
            raise ValueError("fetch ts < batchEndTs (reference raises the same)")
        is_ir = rpdf["__is_ir"].to_numpy(bool)
        ir_rows = rpdf[is_ir]
        stream = rpdf[~is_ir].sort_values(_TS_US, kind="stable")
        ir_row = ir_rows.iloc[0] if len(ir_rows) else None

        out = lpdf[left_cols].copy()
        for i, (p, fname) in enumerate(zip(part_list, feat_names)):
            col = p.input_column
            # streaming slice per query: [max(batchEnd, window_start), q)
            s_ser = stream[[_TS_US, col]].dropna(subset=[col])
            s_ts = s_ser[_TS_US].to_numpy("int64")
            s_vals = s_ser[col].to_numpy("float64") if len(s_ser) else np.empty(0)
            if p.window.millis is None:
                wstart = np.full(len(q_ts), -(2**62), "int64")
            else:
                hop_us = tail_hop_millis(p.window.millis) * 1000
                wstart = ((q_ts - p.window.millis * 1000) // hop_us) * hop_us
            ss = np.searchsorted(s_ts, np.maximum(wstart, batch_end_ts_us), side="left")
            se = np.maximum(np.searchsorted(s_ts, q_ts, side="left"), ss)

            # tail hops relevant per query: hop >= wstart (upper bound already
            # enforced at build: hop < tail + buffer)
            if ir_row is not None and isinstance(ir_row.get(f"__tails_{i}"), (list, np.ndarray)):
                tl = pd.DataFrame(list(ir_row[f"__tails_{i}"]))
            else:
                tl = pd.DataFrame(columns=["hop", "cnt", "sm", "mn", "mx"])
            t_hop = tl["hop"].to_numpy("int64") if len(tl) else np.empty(0, "int64")
            ti = np.searchsorted(t_hop, wstart, side="left")  # tails sorted by hop

            def _tail_sum(colname):
                vals = tl[colname].to_numpy("float64") if len(tl) else np.empty(0)
                cs = np.concatenate([[0.0], np.nancumsum(vals)])
                return cs[-1] - cs[ti]

            c_cnt = float(ir_row[f"__c{i}_cnt"]) if ir_row is not None and f"__c{i}_cnt" in ir_row and pd.notna(ir_row.get(f"__c{i}_cnt")) else 0.0

            if p.op in (Op.COUNT, Op.SUM, Op.AVERAGE):
                n = c_cnt + _tail_sum("cnt") + (se - ss)
                if p.op == Op.COUNT:
                    out[fname] = [None if v <= 0 else int(v) for v in n]
                    continue
                c_sm = float(ir_row[f"__c{i}_sm"]) if ir_row is not None and pd.notna(ir_row.get(f"__c{i}_sm")) else 0.0
                scs = np.concatenate([[0.0], np.cumsum(s_vals)])
                total = c_sm + _tail_sum("sm") + (scs[se] - scs[ss])
                if p.op == Op.SUM:
                    out[fname] = [
                        None if nv <= 0 else (int(round(v)) if integral[i] else float(v))
                        for v, nv in zip(total, n)
                    ]
                else:
                    out[fname] = [None if nv <= 0 else float(v / nv) for v, nv in zip(total, n)]
            else:
                take_min = p.op == Op.MIN
                stat, cstat = ("mn", f"__c{i}_mn") if take_min else ("mx", f"__c{i}_mx")
                c_v = ir_row[cstat] if ir_row is not None and pd.notna(ir_row.get(cstat)) else None
                t_vals = tl[stat].to_numpy("float64") if len(tl) else np.empty(0)
                # suffix min/max over sorted-by-hop tails; NaN (all-null hop)
                # mapped to the identity so it never wins
                if len(t_vals):
                    ident = np.inf if take_min else -np.inf
                    t_safe = np.nan_to_num(t_vals, nan=ident)
                    sfx = (
                        np.minimum.accumulate(t_safe[::-1])[::-1]
                        if take_min
                        else np.maximum.accumulate(t_safe[::-1])[::-1]
                    )
                vals_out = []
                for j in range(len(q_ts)):
                    cand = []
                    if c_v is not None:
                        cand.append(float(c_v))
                    if len(t_vals) and ti[j] < len(t_vals) and np.isfinite(sfx[ti[j]]):
                        cand.append(float(sfx[ti[j]]))
                    if se[j] > ss[j]:
                        seg = s_vals[ss[j] : se[j]]
                        cand.append(float(seg.min() if take_min else seg.max()))
                    if not cand:
                        vals_out.append(None)
                    else:
                        v = min(cand) if take_min else max(cand)
                        vals_out.append(int(round(v)) if integral[i] else v)
                out[fname] = vals_out
        return out

    grouped = l.groupby(*[F.col(c) for c in gb.keys]).cogroup(
        union.groupby(*[F.col(f"__r_{c}") for c in gb.keys])
    )
    return grouped.applyInPandas(fn, schema=out_schema)
