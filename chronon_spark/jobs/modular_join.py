"""Modular join backfill: the reference's per-part job decomposition.

The reference splits a big join backfill into independent run modes —
``backfill-left`` (materialize the left side once), ``join-part-job`` (one
Spark job per JoinPart) and ``merge-job`` (stitch part tables back on
``rowIds``) — so a 20-part join over months of data resumes at PART
granularity instead of rerunning the world (repo/constants.py:28-30,
spark/.../batch/JoinPartJob.scala, MergeJob.scala; ``Join.rowIds``
thrift/api.thrift:426).

Our default `operators/asof_join.compute_join` deliberately CHAINS parts in
one pass (no merge stage, fewer shuffles — the right default when the job
fits one run). This module is the complementary shape for long-running
backfills:

- left materialized once to ``<workdir>/left`` (skew-key filter applied,
  row-id uniqueness asserted — a duplicate row id would silently fan out
  the merge);
- each part computed from the SLIM left (row ids + its join keys + ts
  only — at 100 TB the left's payload columns never ride a part shuffle)
  and written to ``<workdir>/part_<i>_<semantic_hash>``; the semantic hash
  in the path makes a spec edit invalidate exactly that part;
- parts whose output dir already has Spark's ``_SUCCESS`` marker are
  SKIPPED on re-run (crash/resume at part granularity);
- merge: equi-joins of the part tables back onto the full left on the row
  ids — one co-keyed shuffle per part table, then join-level derivations.

Each part job reuses `compute_join` on a single-part Join, so TEMPORAL /
SNAPSHOT accuracy, key mappings, prefixes and GroupBy derivations behave
byte-identically to the chained path (equivalence-tested).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from chronon_spark.api import Join, JoinPart
from chronon_spark.plans.manifest import group_by_semantic_hash


def _part_dir(workdir: str, idx: int, jp: JoinPart) -> str:
    h = group_by_semantic_hash(jp.group_by)[:10]
    tag = f"{jp.prefix}_" if jp.prefix else ""
    return os.path.join(workdir, f"part_{idx}_{tag}{h}")


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _left_key_cols(join: Join, jp: JoinPart) -> list[str]:
    # key_mapping is left->right; a part's slim left needs the LEFT name of
    # every GroupBy key (mapped keys via the reverse mapping, rest as-is)
    rev = {r: l for l, r in (jp.key_mapping or {}).items()}
    return [rev.get(k, k) for k in jp.group_by.keys]


def compute_join_modular(
    left: DataFrame, join: Join, workdir: str, overwrite: bool = False
) -> DataFrame:
    """Run the modular backfill under ``workdir`` and return the merged
    result (lazy over the written part tables). Re-invoking with the same
    workdir resumes: finished parts are not recomputed."""
    from chronon_spark.operators.asof_join import compute_join

    if not join.row_ids:
        raise ValueError("modular join requires Join.row_ids (thrift:426)")
    spark = left.sparkSession
    os.makedirs(workdir, exist_ok=True)

    # ---- backfill-left: skew filter + row-id uniqueness, materialized once
    left_path = os.path.join(workdir, "left")
    if overwrite or not _done(left_path):
        lf = left
        for col, vals in (join.skew_keys or {}).items():
            lf = lf.where(~F.col(col).isin(vals) | F.col(col).isNull())
        dup = (
            lf.groupBy(*join.row_ids).agg(F.count(F.lit(1)).alias("__n")).where("__n > 1").limit(1)
        )
        if dup.count() > 0:
            raise ValueError(f"row_ids {join.row_ids} do not uniquely identify left rows")
        lf.write.mode("overwrite").parquet(left_path)
    left_m = spark.read.parquet(left_path)

    # ---- join-part-job: slim left -> one output table per part
    for i, jp in enumerate(join.join_parts):
        pd_ = _part_dir(workdir, i, jp)
        if not overwrite and _done(pd_):
            continue
        slim_cols = list(dict.fromkeys(join.row_ids + _left_key_cols(join, jp) + [join.left_time_column]))
        slim = left_m.select(*slim_cols)
        out = compute_join(slim, Join(join.left_time_column, [jp]))
        feat = [c for c in out.columns if c not in set(slim_cols)]
        out.select(*join.row_ids, *feat).write.mode("overwrite").parquet(pd_)

    # ---- merge-job: stitch part tables onto the full left
    merged = left_m
    for i, jp in enumerate(join.join_parts):
        merged = merged.join(spark.read.parquet(_part_dir(workdir, i, jp)), join.row_ids, "left")
    if join.derivations:
        exprs = [F.col(c) for c in merged.columns] if "*" in join.derivations else []
        exprs += [F.expr(e).alias(n) for n, e in join.derivations.items() if n != "*"]
        merged = merged.select(*exprs)
    return merged
