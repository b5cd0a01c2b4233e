"""Tiled sawtooth as-of join: bounded per-key state for decomposable ops.

The reference's hop-tile architecture (HopsAggregator.scala:36-175 +
SawtoothMutationAggregator's BatchIr{collapsed, tailHops}) re-expressed
Spark-first:

1. **Tile build** — ONE JVM `groupBy(keys, hop_start)` producing partial IRs
   (sum/count/min/max per input column). Whole-stage codegen, map-side
   combine, shuffle payload = one small row per (key, hop) instead of every
   raw event.
2. **Head restriction** — a query's window head is exact only inside its own
   hop, so raw events are needed ONLY in hops that contain at least one
   query for that key: a broadcast-able left-semi join on (key, hop) prunes
   the rest. For sparse query patterns this drops the raw volume by
   ~hop/density; for dense backfills it is the tail tiles that carry the win
   (a 13d window touches ≤13 tile rows + 1 hop of raw events per query
   instead of 13 days of raw events).
3. **Kernel** — tiles and head events enter the cogroup as one union frame
   (marker column); the kernel aggregates tiles over [window_start,
   head_hop) and raw events over [head_hop, query_ts), then merges the two
   partials per op (sum+sum, min∧min, …) — the reference's
   `lambdaAggregateIr` merge of collapsed IR + tail hops.

Supported ops: COUNT / SUM / MIN / MAX / AVERAGE (the decomposable subset —
exactly what the reference can collapse; order-sensitive ops keep the raw
path or the sliced path). Semantics are identical to
`asof_join(..., sawtooth=True)`, which the tests assert.

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

from chronon_spark.aggregators.kernels import _ColumnSeries, _prefix, _sparse_query, _sparse_table
from chronon_spark.api import GroupBy, Op
from chronon_spark.operators.asof_join import ensure_ts_us
from chronon_spark.resolution import tail_hop_millis
from chronon_spark.types import part_output_type

TILED_OPS = {Op.COUNT, Op.SUM, Op.MIN, Op.MAX, Op.AVERAGE}

_TS_US = "__ts_us"


def _tile_stats_needed(gb: GroupBy) -> dict[str, set[str]]:
    """Which per-column tile stats each input column needs."""
    need: dict[str, set[str]] = {}
    for p in gb.parts():
        s = need.setdefault(p.input_column, set())
        if p.op in (Op.COUNT, Op.AVERAGE, Op.SUM):
            s.add("cnt")  # SUM needs cnt for empty-window NULL semantics
        if p.op in (Op.SUM, Op.AVERAGE):
            s.add("sum")
        if p.op == Op.MIN:
            s.add("min")
        if p.op == Op.MAX:
            s.add("max")
    return need


def _range_sum(vals: np.ndarray, s: np.ndarray, e: np.ndarray) -> np.ndarray:
    p = _prefix(vals)
    return p[e] - p[s]


def _range_minmax(vals: np.ndarray, s: np.ndarray, e: np.ndarray, take_min: bool) -> np.ndarray:
    return _sparse_query(_sparse_table(vals, take_min), s, e, take_min)


def tiled_sawtooth_asof_join(
    left: DataFrame,
    right: DataFrame,
    gb: GroupBy,
    left_time_column: str = "ts",
    key_mapping: dict[str, str] | None = None,
    prefix: str | None = None,
    coarse_buckets: int | str | None = "auto",
) -> DataFrame:
    """Sawtooth-mode PITC as-of join where the window tail reads pre-
    aggregated hop tiles instead of raw events. ``coarse_buckets`` as in
    asof_join: cogroup on hash(keys) %% N so one Arrow batch carries many
    keys and the whole-batch composite-index kernel resolves them at once."""
    parts = gb.parts()
    bad = [p.op for p in parts if p.op not in TILED_OPS]
    if bad:
        raise ValueError(f"tiled path supports {sorted(o.value for o in TILED_OPS)}; got {bad}")
    if any(p.window.millis is None for p in parts):
        raise ValueError("tiled path requires bounded windows")
    if any(p.bucket for p in parts):
        raise ValueError("tiled path does not support buckets yet")
    hop_ms = min(tail_hop_millis(p.window.millis) for p in parts)
    hop_us = hop_ms * 1000

    key_mapping = key_mapping or {k: k for k in gb.keys}
    left_keys = list(key_mapping.keys())
    right_keys = [key_mapping[k] for k in left_keys]

    r = ensure_ts_us(right, gb.time_column)
    for k in right_keys:
        r = r.where(F.col(k).isNotNull())
    l = ensure_ts_us(left, left_time_column)

    need = _tile_stats_needed(gb)
    in_cols = sorted(need)
    hop_col = (F.col(_TS_US) / F.lit(hop_us)).cast("long")

    # 1) tile build: one JVM shuffle on (keys, hop)
    aggs = []
    for c in in_cols:
        stats = need[c]
        if "cnt" in stats:
            aggs.append(F.count(c).alias(f"{c}__cnt"))
        if "sum" in stats:
            aggs.append(F.sum(c).alias(f"{c}__sum"))
        if "min" in stats:
            aggs.append(F.min(c).alias(f"{c}__min"))
        if "max" in stats:
            aggs.append(F.max(c).alias(f"{c}__max"))
    tiles = (
        r.select(*right_keys, hop_col.alias("__hop"), *in_cols)
        .groupBy(*right_keys, "__hop")
        .agg(*aggs)
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
        .select(*right_keys, _TS_US, *in_cols)
        .withColumn("__is_tile", F.lit(False))
    )

    # 3) union (null-mated) — the cogroup's right side
    tile_stat_cols = [f.name for f in tiles.schema.fields if "__" in f.name and f.name not in (_TS_US, "__is_tile")]
    heads_u = heads
    for c in tile_stat_cols:
        heads_u = heads_u.withColumn(c, F.lit(None).cast(dict(tiles.dtypes)[c]))
    tiles_u = tiles
    for c in in_cols:
        tiles_u = tiles_u.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    cols_order = right_keys + [_TS_US, "__is_tile"] + in_cols + tile_stat_cols
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

    def kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame, lcodes: np.ndarray, rcodes: np.ndarray) -> pd.DataFrame:
        """Whole-batch kernel in composite-index space: code·block + (ts−base)
        makes every searchsorted resolve ALL keys of the Arrow batch at once
        (same trick as kernels.MultiKeyEventColumns; per-key grouping is the
        all-zero-codes special case). base is day-aligned so the sawtooth hop
        rounding commutes with rebasing; clamping window offsets to [0, block)
        keeps ranges inside their key's segment. Decomposable ops are
        order-insensitive within a timestamp, so the comp-only sort suffices
        (tie-breakers matter only for first/last/k ops, not served here)."""
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
        horder = np.argsort(hcomp_all, kind="stable")
        heads_pdf, hcomp_all = heads_pdf.iloc[horder], hcomp_all[horder]

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

            # head: raw events in [head_start, q), compacted per column
            hmask = heads_pdf[c].notna().to_numpy() if len(heads_pdf) else np.empty(0, bool)
            h_comp, h_vals = hcomp_all[hmask], heads_pdf[c].to_numpy()[hmask]
            hs = np.searchsorted(h_comp, comp_h, side="left")
            he = np.maximum(np.searchsorted(h_comp, comp_q, side="left"), hs)

            if p.op in (Op.COUNT, Op.SUM, Op.AVERAGE):
                # tail: tiles fully inside [wstart, head_start)
                ts_idx_s = np.searchsorted(tcomp_all, comp_w, side="left")
                ts_idx_e = np.maximum(np.searchsorted(tcomp_all, comp_h, side="left"), ts_idx_s)
                cnt_t = _range_sum(tiles_pdf[f"{c}__cnt"].to_numpy(np.float64), ts_idx_s, ts_idx_e)
                n = cnt_t + (he - hs)  # non-null values in window
                if p.op == Op.COUNT:
                    out[fname] = [None if v <= 0 else int(v) for v in n]
                    continue
                sum_t = _range_sum(
                    np.nan_to_num(tiles_pdf[f"{c}__sum"].to_numpy(np.float64)), ts_idx_s, ts_idx_e
                )
                sum_h = _range_sum(h_vals.astype(np.float64), hs, he)
                total = sum_t + sum_h
                if p.op == Op.SUM:
                    integral = isinstance(part_output_type(p, right_types[c]), T.LongType)
                    out[fname] = [
                        None if nv <= 0 else (int(round(v)) if integral else float(v))
                        for v, nv in zip(total, n)
                    ]
                    continue
                with np.errstate(invalid="ignore", divide="ignore"):
                    avg = np.where(n > 0, total / n, np.nan)
                out[fname] = [None if np.isnan(v) else float(v) for v in avg]
            elif p.op in (Op.MIN, Op.MAX):
                take_min = p.op == Op.MIN
                tcol = f"{c}__{'min' if take_min else 'max'}"
                tmask = tiles_pdf[tcol].notna().to_numpy() if len(tiles_pdf) else np.empty(0, bool)
                tt, tv = tcomp_all[tmask], tiles_pdf[tcol].to_numpy()[tmask]
                s2 = np.searchsorted(tt, comp_w, side="left")
                e2 = np.maximum(np.searchsorted(tt, comp_h, side="left"), s2)
                part_t = _range_minmax(tv, s2, e2, take_min)
                part_h = _range_minmax(h_vals, hs, he, take_min)
                merged = []
                for a, b in zip(part_t, part_h):
                    if a is None:
                        merged.append(b)
                    elif b is None:
                        merged.append(a)
                    else:
                        merged.append(min(a, b) if take_min else max(a, b))
                out[fname] = merged
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
        return grouped.applyInPandas(fn_bucketed, schema=out_schema)
    grouped = l.groupby(*[F.col(c) for c in left_keys]).cogroup(
        union.groupby(*[F.col(f"__r_{c}") for c in right_keys])
    )
    return grouped.applyInPandas(fn_perkey, schema=out_schema)
