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

import glob
import hashlib
import json
import os

from pyspark.sql import DataFrame, functions as F

from chronon_spark.api import Aggregation, GroupBy, Join, JoinPart
from chronon_spark.plans.manifest import group_by_semantic_hash

COLHASH_FILE = "_colhashes.json"


def _part_dir(workdir: str, idx: int, jp: JoinPart) -> str:
    h = group_by_semantic_hash(jp.group_by)[:10]
    tag = f"{jp.prefix}_" if jp.prefix else ""
    return os.path.join(workdir, f"part_{idx}_{tag}{h}")


def _done(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _column_hashes(join: Join, jp: JoinPart) -> dict[str, str]:
    """Semantic hash PER OUTPUT COLUMN (reference MergeJob column hashes,
    batch/MergeJob.scala:305-411): everything that affects one feature
    column's values — its AggregationPart, the GroupBy keys / time column /
    boundary flags, the part's key mapping and the join's left time column.
    A spec edit that touches one aggregation leaves every other column's
    hash intact, which is what makes column-level reuse sound."""
    base = {
        "keys": jp.group_by.keys,
        "time_column": jp.group_by.time_column,
        "tie_breakers": jp.group_by.tie_breakers,
        "accuracy": jp.group_by.accuracy.value,
        "include_equal": jp.group_by.include_equal,
        "sawtooth": jp.group_by.sawtooth,
        "key_mapping": jp.key_mapping,
        "left_time_column": join.left_time_column,
    }
    out = {}
    for p in jp.group_by.parts():
        spec = {
            **base,
            "input": p.input_column,
            "op": p.op.value,
            "window": p.window.spec,
            "bucket": p.bucket,
            "k": p.k,
            "percentiles": list(p.percentiles),
        }
        out[jp.out_name(p)] = hashlib.md5(
            json.dumps(spec, sort_keys=True).encode()
        ).hexdigest()
    return out


def _reusable_prior(workdir: str, idx: int, jp: JoinPart, want: dict[str, str]):
    """Newest finished part dir for this part SLOT (same index/prefix, any
    semantic hash) carrying a column-hash manifest; returns (path, cols to
    reuse) or (None, {})."""
    tag = f"{jp.prefix}_" if jp.prefix else ""
    cands = [
        d
        for d in glob.glob(os.path.join(workdir, f"part_{idx}_{tag}*"))
        if _done(d) and os.path.exists(os.path.join(d, COLHASH_FILE))
    ]
    for d in sorted(cands, key=os.path.getmtime, reverse=True):
        with open(os.path.join(d, COLHASH_FILE)) as f:
            have = json.load(f)
        reuse = {c for c, h in want.items() if have.get(c) == h}
        if reuse:
            return d, reuse
    return None, set()


def _reduced_group_by(gb: GroupBy, jp: JoinPart, missing: set[str]) -> GroupBy:
    """A copy of gb computing ONLY the aggregation parts whose output
    columns are in `missing` (each part reconstructed as a single-window,
    single-bucket Aggregation)."""
    aggs = []
    for p in gb.parts():
        name = jp.out_name(p)
        if name not in missing:
            continue
        aggs.append(
            Aggregation(
                p.input_column,
                p.op,
                windows=(p.window,),
                buckets=(p.bucket,) if p.bucket else (),
                k=p.k,
                percentiles=p.percentiles,
            )
        )
    return GroupBy(
        keys=gb.keys,
        aggregations=aggs,
        time_column=gb.time_column,
        tie_breakers=gb.tie_breakers,
        accuracy=gb.accuracy,
        include_equal=gb.include_equal,
        sawtooth=gb.sawtooth,
    )


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
        col_hashes = _column_hashes(join, jp)
        # column-level reuse (reference MergeJob.analyzeJoinPartsForReuse):
        # a spec edit that changed SOME of this part's columns recomputes
        # only those — unchanged columns copy from the newest prior output
        # whose per-column semantic hashes match. GroupBy derivations remap
        # outputs, so reuse applies only to underived parts; the prior dir
        # shares this workdir's materialized left, so row coverage matches.
        prior, reuse_cols = (None, set())
        if not overwrite and not jp.group_by.derivations:
            prior, reuse_cols = _reusable_prior(workdir, i, jp, col_hashes)
        missing = set(col_hashes) - reuse_cols
        if prior and not missing:
            out = spark.read.parquet(prior).select(*join.row_ids, *sorted(reuse_cols))
        elif prior:
            reduced = JoinPart(
                _reduced_group_by(jp.group_by, jp, missing),
                jp.right_df,
                key_mapping=jp.key_mapping,
                prefix=jp.prefix,
                strategy=jp.strategy,
            )
            fresh = compute_join(slim, Join(join.left_time_column, [reduced]))
            fresh = fresh.select(*join.row_ids, *[c for c in fresh.columns if c in missing])
            reused = spark.read.parquet(prior).select(*join.row_ids, *sorted(reuse_cols))
            out = fresh.join(reused, join.row_ids, "left")
        else:
            full = compute_join(slim, Join(join.left_time_column, [jp]))
            feat = [c for c in full.columns if c not in set(slim_cols)]
            out = full.select(*join.row_ids, *feat)
        feat_cols = [c for c in out.columns if c not in join.row_ids]
        # keep declared order when the column set matches the spec exactly
        if set(feat_cols) == set(col_hashes):
            feat_cols = list(col_hashes)
        out.select(*join.row_ids, *feat_cols).write.mode("overwrite").parquet(pd_)
        if set(feat_cols) == set(col_hashes):
            # manifest enables future column-level reuse; derived parts remap
            # outputs so their manifests would lie — only exact matches write
            with open(os.path.join(pd_, COLHASH_FILE), "w") as f:
                json.dump(col_hashes, f, indent=1)

    # ---- merge-job: stitch part tables onto the full left
    merged = left_m
    for i, jp in enumerate(join.join_parts):
        merged = merged.join(spark.read.parquet(_part_dir(workdir, i, jp)), join.row_ids, "left")
    if join.derivations:
        exprs = [F.col(c) for c in merged.columns] if "*" in join.derivations else []
        exprs += [F.expr(e).alias(n) for n, e in join.derivations.items() if n != "*"]
        merged = merged.select(*exprs)
    return merged
