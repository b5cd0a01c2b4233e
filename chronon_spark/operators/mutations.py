"""Entity/CDC model: point-in-time-correct aggregation over a MUTABLE table.

Reference: EntitySource (thrift/api.thrift:142-162 — midnight `snapshotTable`
+ `mutationTable` with `mutation_ts`/`is_before`), the temporal-entities path
(GroupBy.scala:200-342) and CDC reversal in `updateIr`
(SawtoothMutationAggregator.scala:123-139): every mutation is a pair of rows —
the before-image (`is_before=true`) and the after-image — and *abelian* ops
(SUM/COUNT/AVERAGE) reverse the before-image instead of recomputing.

Spark-first re-expression: turn state into a SIGNED DELTA event stream and
reuse the ordinary as-of kernel —

- base snapshot rows       → events at the base midnight, sign +1
- mutation after-images    → events at mutation_ts,      sign +1
- mutation before-images   → events at mutation_ts,      sign −1

then `state_agg(T) = unbounded-window SUM over (value·sign) / SUM(sign)`
with the engine's strict `ts' < T` kernel. COUNT is SUM(sign); AVERAGE is
SUM(value·sign)/SUM(sign). Non-abelian reads (the current value of an
attribute) are the LAST after-image — plain `Op.LAST` over the
`is_before=false` stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as SqlWindow, functions as F, types as T

from chronon_spark.api import Aggregation, GroupBy, Op
from chronon_spark.operators.asof_join import asof_join

ABELIAN_OPS = {Op.SUM, Op.COUNT, Op.AVERAGE}

# ops the replay path evaluates over the reconstructed visible multiset.
# This is a SUPERSET of the reference's mutation support: the reference
# routes before-images through ColumnAggregator.delete, which only
# SUM/COUNT/AVERAGE/HISTOGRAM implement (SimpleAggregators.scala:57-334;
# BaseAggregator.scala:60 throws UnsupportedOperationException for the
# rest), so a windowed MIN/LAST_K over a mutating column aborts there.
# Replaying visible row-versions instead of deleting from an IR makes
# every order/set op expressible.
REPLAY_OPS = {
    Op.SUM,
    Op.COUNT,
    Op.AVERAGE,
    Op.MIN,
    Op.MAX,
    Op.LAST,
    Op.LAST_K,
    Op.UNIQUE_COUNT,
    Op.HISTOGRAM,
}


def mutations_to_deltas(
    snapshot: DataFrame,
    mutations: DataFrame,
    keys: list[str],
    value_col: str,
    base_ds: str,
    mutation_ts_col: str = "mutation_ts",
    is_before_col: str = "is_before",
    event_ts_col: str | None = None,
) -> DataFrame:
    """Unified signed-delta event stream from a base snapshot + CDC rows.

    `snapshot` must be the state at `base_ds` midnight; `mutations` must cover
    (base_ds, ∞). Scale: both inputs are scanned once, no shuffle here — the
    downstream as-of join provides the single key shuffle.

    ``event_ts_col``: the entity row's OWN event-time column (reference
    `row.ts`, distinct from `mutationTs` — SawtoothMutationAggregator.scala:
    127-137 window-filters on row.ts while replaying in mutationTs order).
    Defaults to the mutation/base timestamp, emitted as ``__ets``.
    """
    ets = F.col(event_ts_col) if event_ts_col else None
    base = snapshot.select(
        *keys,
        F.lit(1).alias("__sign"),
        F.col(value_col).alias("__val"),
        F.to_timestamp(F.lit(base_ds)).alias("__mts"),
        (ets if ets is not None else F.to_timestamp(F.lit(base_ds))).alias("__ets"),
    ).where(F.col(value_col).isNotNull())
    mut = (
        mutations.select(
            *keys,
            F.when(F.col(is_before_col), -1).otherwise(1).alias("__sign"),
            F.col(value_col).alias("__val"),
            F.col(mutation_ts_col).alias("__mts"),
            (ets if ets is not None else F.col(mutation_ts_col)).alias("__ets"),
        )
        .where(F.col(mutation_ts_col) >= F.to_timestamp(F.lit(base_ds)))
        # null-valued rows contribute nothing (reference: null inputs skipped)
        .where(F.col("__val").isNotNull())
    )
    return base.unionByName(mut)


def entity_state_asof(
    left: DataFrame,
    snapshot: DataFrame,
    mutations: DataFrame,
    keys: list[str],
    value_col: str,
    base_ds: str,
    ops: tuple[Op, ...] = (Op.SUM, Op.COUNT, Op.AVERAGE),
    left_time_column: str = "ts",
    mutation_ts_col: str = "mutation_ts",
    is_before_col: str = "is_before",
) -> DataFrame:
    """For each left row: SUM/COUNT/AVERAGE of `value_col` over the entity
    table's STATE as of the row's timestamp (strictly before, zero leakage).

    Output columns: `{value_col}_state_sum` / `_state_count` / `_state_avg`
    per requested op.
    """
    bad = [o for o in ops if o not in ABELIAN_OPS]
    if bad:
        raise ValueError(
            f"entity state aggregation needs abelian ops (reversible via is_before); got {bad}. "
            "For current-attribute reads use Op.LAST over the after-image stream."
        )
    deltas = mutations_to_deltas(
        snapshot, mutations, keys, value_col, base_ds, mutation_ts_col, is_before_col
    ).withColumn("__signed_val", F.col("__val") * F.col("__sign"))

    gb = GroupBy(
        keys=keys,
        aggregations=[
            Aggregation("__signed_val", Op.SUM, windows=(None,)),
            Aggregation("__sign", Op.SUM, windows=(None,)),
        ],
        time_column="__mts",
    )
    out = asof_join(left, deltas, gb, left_time_column=left_time_column)
    n = F.col("__sign_sum")
    s = F.col("__signed_val_sum")
    cols = list(left.columns)
    if Op.SUM in ops:
        cols.append(F.when(n > 0, s).alias(f"{value_col}_state_sum"))
    if Op.COUNT in ops:
        cols.append(F.when(n > 0, n).cast("long").alias(f"{value_col}_state_count"))
    if Op.AVERAGE in ops:
        cols.append(F.when(n > 0, s / n).alias(f"{value_col}_state_avg"))
    return out.select(*cols)


def entity_last_value_asof(
    left: DataFrame,
    mutations: DataFrame,
    keys: list[str],
    value_col: str,
    left_time_column: str = "ts",
    mutation_ts_col: str = "mutation_ts",
    is_before_col: str = "is_before",
    tie_breakers: list[str] | None = None,
) -> DataFrame:
    """Current attribute value as of each left row's ts: the LAST after-image
    strictly before ts (the as-of dimension lookup)."""
    after = mutations.where(~F.col(is_before_col))
    gb = GroupBy(
        keys=keys,
        aggregations=[Aggregation(value_col, Op.LAST, windows=(None,))],
        time_column=mutation_ts_col,
        tie_breakers=tie_breakers or [],
    )
    out = asof_join(left, after, gb, left_time_column=left_time_column)
    return out.withColumnRenamed(f"{value_col}_last", f"{value_col}_asof")


def _part_name(value_col: str, part) -> str:
    from chronon_spark.api import _K_OPS

    op = part.op.value + (str(part.k) if part.op in _K_OPS else "")
    return f"{value_col}_state_{op}{part.window.suffix}"


def entity_state_replay_asof(
    left: DataFrame,
    snapshot: DataFrame,
    mutations: DataFrame,
    keys: list[str],
    value_col: str,
    base_ds: str,
    aggregations: list[Aggregation],
    left_time_column: str = "ts",
    mutation_ts_col: str = "mutation_ts",
    is_before_col: str = "is_before",
    event_ts_col: str | None = None,
) -> DataFrame:
    """Windowed aggregation of ANY supported op over a MUTATING entity
    table's visible state at each left row's timestamp — including the
    non-abelian ops (MIN/MAX/LAST_K/UNIQUE_COUNT/HISTOGRAM) the reference's
    delete-based mutation path cannot express (its before-images route
    through ColumnAggregator.delete, unimplemented for order/set ops —
    BaseAggregator.scala:60, SawtoothMutationAggregator.scala:123-139).

    Semantics (multiset of row-VERSIONS):

    - the i-th insert of value v (per pairing identity, in mutation-ts
      order) opens an instance at its mutation ts; the i-th before-image of
      the same identity closes it at ITS mutation ts (FIFO pairing — the
      standard multiset convention; instances of equal identity are
      interchangeable, so the resulting STATE is exact). The pairing
      identity is (key, value) by default; with ``event_ts_col`` set (a CDC
      feed whose before-images carry the original row's event time, the
      reference's `row.ts`) it is (key, value, event_ts). Unmatched
      before-images close nothing (a delete of a never-inserted version is
      a no-op, where the signed-delta abelian path would oversubtract);
      a before-image that precedes its FIFO-paired insert is likewise an
      orphan (every earlier instance of the identity was already closed at
      its ts) and closes nothing — the pair is un-paired, not emptied.
    - an instance's EVENT ts is its INSERT row's — windows and LAST-ordering
      read the opening image's time, never the before-image's.
    - an instance is VISIBLE at query ts T iff valid_from < T ≤ valid_to
      (strict `<` on the open side: zero leakage, matching the engine's
      as-of kernels).
    - a windowed part additionally requires the instance's EVENT ts in
      [T − W, T); unbounded parts apply no event-ts filter (reference
      updateIr: `window == null` skips the rowTs check).
    - empty visible set ⇒ NULL for every part (the engine's empty-window
      convention).

    Plan shape: instance reconstruction is pure DataFrame work — one window
    (row_number per key×ets×value, mutation-ts order) + one co-partitioned
    equi-join pairing inserts with before-images; the replay itself is ONE
    cogrouped Arrow kernel keyed by entity (numpy masks per query over the
    key's live instances). Per-key cost is O(queries × live-instances) —
    the price of non-abelian state, same order as the reference's per-row
    JVM replay; state never crosses keys, so the shuffle is the same single
    key exchange every as-of query pays. Hot keys land one task each —
    salt-split upstream if a key's live state itself is the skew.
    """
    import pandas as pd

    parts = [p for a in aggregations for p in a.parts()]
    bad = [p.op for p in parts if p.op not in REPLAY_OPS]
    if bad:
        raise ValueError(f"replay path supports {sorted(o.value for o in REPLAY_OPS)}; got {bad}")
    if any(p.bucket for p in parts):
        raise ValueError("buckets are not supported on the entity replay path")

    deltas = mutations_to_deltas(
        snapshot, mutations, keys, value_col, base_ds, mutation_ts_col, is_before_col, event_ts_col
    )
    # pair the i-th insert with the i-th before-image per pairing identity:
    # both branches share the identity hash partitioning, so the pairing
    # join is co-partitioned with the row_number exchange. The instance's
    # __ets comes from the INSERT side.
    ident = [*keys, "__val"] + (["__ets"] if event_ts_col else [])
    seq = SqlWindow.partitionBy(*ident).orderBy("__mts")
    ins = (
        deltas.where(F.col("__sign") > 0)
        .withColumn("__rn", F.row_number().over(seq))
        .select(*ident, "__rn", F.col("__ets").alias("__i_ets"), F.col("__mts").alias("__vf"))
    )
    dele = (
        deltas.where(F.col("__sign") < 0)
        .withColumn("__rn", F.row_number().over(seq))
        .select(*ident, "__rn", F.col("__mts").alias("__vt"))
    )
    inst = ins.join(dele, [*ident, "__rn"], "left").withColumn("__ets", F.col("__i_ets"))
    # an INVERTED pair (__vt < __vf) means the rn-th before-image fired
    # BEFORE the rn-th insert — i.e. at its mutation ts every prior insert
    # of this identity was already closed, so it is an orphan delete. Keep
    # the documented contract (orphans close nothing) instead of silently
    # producing an empty [vf, vt] interval that makes the insert invisible
    # forever. Feeds whose deletes always follow their inserts (consistent
    # CDC) never produce inversions; under same-identity interleaving with
    # orphans the FIFO pairing remains a deterministic best-effort choice.
    inst = inst.withColumn(
        "__vt", F.when(F.col("__vt") < F.col("__vf"), F.lit(None)).otherwise(F.col("__vt"))
    )

    val_type = dict(deltas.dtypes)["__val"]
    out_fields = list(left.schema.fields)
    for p in parts:
        nm = _part_name(value_col, p)
        if p.op in (Op.COUNT, Op.UNIQUE_COUNT):
            t = "bigint"
        elif p.op in (Op.SUM, Op.AVERAGE):
            t = "double"
        elif p.op is Op.LAST_K:
            t = f"array<{val_type}>"
        elif p.op is Op.HISTOGRAM:
            t = "map<string,bigint>"
        else:  # MIN / MAX / LAST keep the input type
            t = val_type
        out_fields.append(T.StructField(nm, T._parse_datatype_string(t)))
    out_schema = T.StructType(out_fields)
    left_cols = list(left.columns)
    us = {p: (None if p.window.millis is None else p.window.millis * 1000) for p in parts}

    def _us(series: pd.Series):
        import numpy as np

        v = pd.to_datetime(series).astype("datetime64[us]").astype("int64").to_numpy()
        return np.asarray(v, dtype="int64")

    def kernel(lpdf: pd.DataFrame, ipdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        res = lpdf.copy()
        if lpdf.empty:
            for p in parts:
                res[_part_name(value_col, p)] = None
            return res
        qts = _us(lpdf[left_time_column])
        if ipdf.empty:
            for p in parts:
                res[_part_name(value_col, p)] = None
            return res
        vf = _us(ipdf["__vf"])
        open_end = ipdf["__vt"].isna().to_numpy()
        vt = np.where(open_end, np.iinfo("int64").max, _us(ipdf["__vt"].fillna(pd.Timestamp(0))))
        ets = _us(ipdf["__ets"])
        val = ipdf["__val"].to_numpy()
        rn = ipdf["__rn"].to_numpy()
        cols: dict[str, list] = {_part_name(value_col, p): [] for p in parts}
        for t_q in qts:
            vis = (vf < t_q) & (vt >= t_q)
            for p in parts:
                w = us[p]
                m = vis if w is None else vis & (ets >= t_q - w) & (ets < t_q)
                v = val[m]
                nm = _part_name(value_col, p)
                if v.size == 0:
                    cols[nm].append(None)
                    continue
                if p.op is Op.SUM:
                    cols[nm].append(float(np.sum(v)))
                elif p.op is Op.COUNT:
                    cols[nm].append(int(v.size))
                elif p.op is Op.AVERAGE:
                    cols[nm].append(float(np.mean(v)))
                elif p.op is Op.MIN:
                    cols[nm].append(v.min())
                elif p.op is Op.MAX:
                    cols[nm].append(v.max())
                elif p.op is Op.UNIQUE_COUNT:
                    cols[nm].append(int(pd.unique(v).size))
                elif p.op is Op.HISTOGRAM:
                    u, c = np.unique(v.astype(str), return_counts=True)
                    cols[nm].append({str(k): int(n) for k, n in zip(u, c)})
                else:  # LAST / LAST_K: event-time-descending, full tie order
                    order = np.lexsort((-rn[m], -vf[m], _desc_key(v), -ets[m]))
                    if p.op is Op.LAST:
                        cols[nm].append(v[order[0]])
                    else:
                        cols[nm].append(list(v[order[: p.k]]))
        for nm, data in cols.items():
            res[nm] = pd.Series(data, index=res.index, dtype="object")
        return res

    return (
        left.groupBy(*keys)
        .cogroup(inst.groupBy(*keys))
        .applyInPandas(kernel, out_schema)
        .select(*left_cols, *[_part_name(value_col, p) for p in parts])
    )


def _desc_key(v):
    """Descending sort key for lexsort over a possibly-non-numeric array:
    numeric arrays negate; otherwise rank-encode (dense) and negate."""
    import numpy as np

    if np.issubdtype(v.dtype, np.number):
        return -v
    # factorize to ranks of the sorted unique values, then negate
    import pandas as pd

    codes = pd.Categorical(v, ordered=True).codes
    return -codes.astype("int64")
