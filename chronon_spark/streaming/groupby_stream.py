"""Streaming GroupBy: Structured Streaming equivalents of the engine's
windowed aggregations.

The reference runs the same GroupBy semantics through two streaming engines
(spark/.../streaming/GroupBy.scala:85-201 — row-level pass-through with
windows resolved at fetch; flink/.../FlinkJob.scala:95-118 — event-time
tumbling tiles sized by the smallest tail hop, 5-minute bounded
out-of-orderness watermark). We use idiomatic Structured Streaming:

- `stream_tumbling_agg` / `stream_hop_tiles`: `F.window` event-time windows
  with a watermark; tiles are keyed by (entity, tile_start) exactly like the
  reference's tiled IRs (api/.../TilingUtils.scala), so a downstream
  fetcher can merge them with batch tiles from `operators/tiles.py` — the
  tile schema is the same (cnt/sum/min/max per column).
- `stream_sessionize`: `F.session_window` gap sessions (the reference has no
  session operator anywhere — north-rule addition).

All aggregation stays JVM-side (built-in functions; update/merge handled by
Spark's stateful operators). Late data beyond the watermark is dropped —
identical to the reference's Flink watermark contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from chronon_spark.api import GroupBy, Op
from chronon_spark.resolution import smallest_tail_hop_millis


def _dur(spec: str) -> str:
    """'5m' → '5 minutes' (Spark interval string)."""
    from chronon_spark.api import Window

    ms = Window(spec).millis
    return f"{ms // 1000} seconds"


def stream_tumbling_agg(
    stream: DataFrame,
    keys: list[str],
    size: str,
    aggs: dict[str, Column],
    time_col: str = "ts",
    watermark: str = "5m",
) -> DataFrame:
    """Event-time tumbling aggregation with bounded out-of-orderness
    (reference default: 5 minutes, FlinkJob.scala:95-118)."""
    w = stream.withWatermark(time_col, _dur(watermark))
    out = w.groupBy(*keys, F.window(time_col, _dur(size)).alias("__w")).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        *keys, F.col("__w.start").alias("window_start"), F.col("__w.end").alias("window_end"), *aggs
    )


def stream_hop_tiles(
    stream: DataFrame,
    gb: GroupBy,
    time_col: str = "ts",
    watermark: str = "5m",
) -> DataFrame:
    """Streaming tile builder: partial IRs per (keys, tile_start), tile size =
    smallest tail hop across the GroupBy's windows (Resolution.scala:65-86).
    Output schema matches the batch tile builder in operators/tiles.py, so
    batch + streaming tiles merge associatively (update/merge contract)."""
    hop_ms = smallest_tail_hop_millis([p.window.millis for p in gb.parts()])
    aggs = []
    seen = set()
    for p in gb.parts():
        c = p.input_column
        for stat, expr in (
            ("cnt", F.count(c)),
            ("sum", F.sum(c)),
            ("min", F.min(c)),
            ("max", F.max(c)),
        ):
            if (c, stat) in seen:
                continue
            if (
                (stat == "cnt" and p.op in (Op.COUNT, Op.AVERAGE, Op.SUM))
                or (stat == "sum" and p.op in (Op.SUM, Op.AVERAGE))
                or (stat == "min" and p.op == Op.MIN)
                or (stat == "max" and p.op == Op.MAX)
            ):
                seen.add((c, stat))
                aggs.append(expr.alias(f"{c}__{stat}"))
    if not aggs:
        raise ValueError("no tileable aggregations in GroupBy")
    w = stream.withWatermark(time_col, _dur(watermark))
    out = w.groupBy(
        *gb.keys, F.window(time_col, f"{hop_ms // 1000} seconds").alias("__w")
    ).agg(*aggs)
    return out.select(*gb.keys, F.col("__w.start").alias("tile_start"), *[a for a in out.columns if "__" in a and a != "__w"])


DECOMPOSABLE = {Op.COUNT, Op.SUM, Op.AVERAGE, Op.MIN, Op.MAX}


def stream_running_features(stream: DataFrame, gb: GroupBy, time_col: str = "ts") -> DataFrame:
    """Custom stateful operator: per-key RUNNING lifetime features, one output
    row per input event — the reference's fire-per-element trigger semantics
    (flink/.../window/Trigger.scala:13-56 AlwaysFireOnElementTrigger), built
    on `applyInPandasWithState` (Arrow-batched, no per-row Python).

    Each emitted row carries the aggregate of every event strictly BEFORE it
    (prior micro-batches via the keyed state IR + earlier rows of the same
    batch via a prefix scan) — the same zero-leakage `ts' < ts` contract as
    the batch as-of join, which the parity test asserts. Supports the
    decomposable ops over unbounded (lifetime) windows; state per key is one
    fixed-size IR row (cnt/sum/min/max per input column).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from chronon_spark.types import part_output_type

    parts = gb.parts()
    bad = [p.op for p in parts if p.op not in DECOMPOSABLE]
    if bad:
        raise ValueError(f"stream_running_features supports {sorted(o.value for o in DECOMPOSABLE)}; got {bad}")
    if any(p.window.millis is not None for p in parts):
        raise ValueError("stream_running_features computes lifetime (unbounded) windows only")
    in_cols = sorted({p.input_column for p in parts})
    tie = list(gb.tie_breakers)

    state_fields = []
    for c in in_cols:
        state_fields += [
            T.StructField(f"{c}__cnt", T.LongType()),
            T.StructField(f"{c}__sm", T.DoubleType()),
            T.StructField(f"{c}__mn", T.DoubleType()),
            T.StructField(f"{c}__mx", T.DoubleType()),
        ]
    state_schema = T.StructType(state_fields)
    right_types = {f.name: f.dataType for f in stream.schema.fields}
    feat_fields = [
        T.StructField(p.output_name, part_output_type(p, right_types[p.input_column]), True)
        for p in parts
    ]
    out_schema = T.StructType(list(stream.schema.fields) + feat_fields)
    in_names = [f.name for f in stream.schema.fields]
    integral = [isinstance(part_output_type(p, right_types[p.input_column]), T.LongType) for p in parts]

    def fn(key, pdfs, state: GroupState):
        names = [f.name for f in state_fields]
        if state.exists:
            st = dict(zip(names, state.get))
        else:
            st = {n: (0 if n.endswith("__cnt") else None) for n in names}
        # materialize ALL Arrow chunks before sorting: a micro-batch larger
        # than arrow maxRecordsPerBatch arrives as multiple chunks that are
        # NOT time-ordered — scanning them independently with state merged
        # in between would let an early-ts row in a later chunk see later
        # events (violating strict ts' < ts)
        chunks = [p for p in pdfs if len(p)]
        for pdf in ([pd.concat(chunks, ignore_index=True)] if chunks else []):
            pdf = pdf.sort_values([time_col] + tie, kind="stable").reset_index(drop=True)
            out = pdf[in_names].copy()
            # strict ts' < ts, same as the batch as-of kernel: a row sees only
            # STRICTLY EARLIER timestamps, so duplicate-ts rows exclude each
            # other (searchsorted-left prefix index, not row position)
            ts_arr = pdf[time_col].to_numpy()
            idx = np.searchsorted(ts_arr, ts_arr, side="left")
            stats = {}
            for c in in_cols:
                v = pd.to_numeric(pdf[c], errors="coerce").to_numpy("float64")
                ok = ~np.isnan(v)
                pc = np.concatenate([[0], np.cumsum(ok)])[idx]
                ps = np.concatenate([[0.0], np.cumsum(np.where(ok, v, 0.0))])[idx]
                pmn = np.concatenate([[np.inf], np.minimum.accumulate(np.where(ok, v, np.inf))])[idx]
                pmx = np.concatenate([[-np.inf], np.maximum.accumulate(np.where(ok, v, -np.inf))])[idx]
                s_cnt, s_sm = st[f"{c}__cnt"], st[f"{c}__sm"]
                s_mn, s_mx = st[f"{c}__mn"], st[f"{c}__mx"]
                stats[c] = (
                    pc + s_cnt,
                    ps + (s_sm or 0.0),
                    np.minimum(pmn, s_mn if s_mn is not None else np.inf),
                    np.maximum(pmx, s_mx if s_mx is not None else -np.inf),
                )
                st[f"{c}__cnt"] = int(s_cnt + ok.sum())
                st[f"{c}__sm"] = float((s_sm or 0.0) + np.where(ok, v, 0.0).sum())
                bmn = v[ok].min() if ok.any() else None
                bmx = v[ok].max() if ok.any() else None
                st[f"{c}__mn"] = bmn if s_mn is None else (s_mn if bmn is None else min(s_mn, bmn))
                st[f"{c}__mx"] = bmx if s_mx is None else (s_mx if bmx is None else max(s_mx, bmx))
            for i, p in enumerate(parts):
                cnt, sm, mn, mx = stats[p.input_column]
                if p.op == Op.COUNT:
                    vals = [None if n <= 0 else int(n) for n in cnt]
                elif p.op == Op.SUM:
                    vals = [
                        None if n <= 0 else (int(round(s)) if integral[i] else float(s))
                        for n, s in zip(cnt, sm)
                    ]
                elif p.op == Op.AVERAGE:
                    vals = [None if n <= 0 else float(s / n) for n, s in zip(cnt, sm)]
                elif p.op == Op.MIN:
                    vals = [
                        None if not np.isfinite(m) else (int(round(m)) if integral[i] else float(m))
                        for m in mn
                    ]
                else:
                    vals = [
                        None if not np.isfinite(m) else (int(round(m)) if integral[i] else float(m))
                        for m in mx
                    ]
                out[p.output_name] = vals
            yield out
        state.update(tuple(st[n] for n in names))

    return stream.groupBy(*gb.keys).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def stream_sessionize(
    stream: DataFrame,
    keys: list[str],
    gap: str,
    aggs: dict[str, Column] | None = None,
    time_col: str = "ts",
    watermark: str = "5m",
) -> DataFrame:
    """Gap-based session windows over a stream (`F.session_window` — dynamic
    event-time sessions closed when no event arrives within `gap`)."""
    aggs = aggs or {"n_turns": F.count(F.lit(1))}
    w = stream.withWatermark(time_col, _dur(watermark))
    out = w.groupBy(*keys, F.session_window(time_col, _dur(gap)).alias("__s")).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )
    return out.select(
        *keys,
        F.col("__s.start").alias("session_start"),
        F.col("__s.end").alias("session_end"),
        *aggs,
    )
