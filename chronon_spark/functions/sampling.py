"""Deterministic sampling, splitting, and corpus mixing for training data.

A training-data pipeline needs reproducible selection decisions: the same
document must land in the same train/val/test split on every run, on every
cluster size, regardless of partitioning — so selection is a pure function of
the row's identity, never of `rand()` (which is per-task-seeded and
repartition-sensitive). Everything here keys off md5(id [+ salt]), the same
digest DuckDB computes, so every operator is exactly oracle-checkable.

Scale shape: all pure map-side projections/filters (no shuffle, no state);
the mixture operator is a unionByName of per-corpus filters (each corpus
scan is pruned by its own filter — no materialized intermediate).

Reference parity note: the reference has no sampling module (its python
tooling delegates to warehouse SQL); this is a driver-mandated
training-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 2^64 as the bucket denominator: take the first 16 hex chars of the md5 —
# DuckDB mirrors with ('0x' || substring(md5(x),1,15))::BIGINT (60 bits kept
# signed-positive); we use 60 bits for the same reason.
_BITS = 60
_DEN = float(1 << _BITS)


def hash_unit(id_col: Column | str, salt: str = "") -> Column:
    """Deterministic uniform [0, 1) draw from a row id: the top 60 bits of
    md5(salt + id) over 2^60. Same row + same salt -> same draw, forever,
    on any engine (DuckDB mirror: ('0x' || substring(md5(...),1,15))::BIGINT
    / 2^60)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    hx = F.substring(F.md5(F.concat(F.lit(salt), c.cast("string"))), 1, _BITS // 4)
    return F.conv(hx, 16, 10).cast("decimal(20,0)").cast("double") / F.lit(_DEN)


def deterministic_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by cumulative hash ranges
    (e.g. ``{"train": 0.98, "val": 0.01, "test": 0.01}``). Stable under
    re-partitioning, appends, and engine changes; fractions must sum to ~1."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = hash_unit(id_col, salt)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        branch = F.when(u < F.lit(acc), F.lit(name))
        expr = branch if expr is None else expr.when(u < F.lit(acc), F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep a stable ``fraction`` of rows: hash_unit(id, salt) < fraction.
    Re-runs and engine swaps select the SAME rows (unlike df.sample)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_unit(id_col, salt) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "strata",
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum value gets its own
    keep-fraction (e.g. upsample rare languages, downsample boilerplate).
    Strata not listed fall back to ``default_fraction``."""
    u = hash_unit(id_col, salt)
    thr = None
    for val, frac in fractions.items():
        cond = F.col(strata_col) == F.lit(val)
        thr = F.when(cond, F.lit(frac)) if thr is None else thr.when(cond, F.lit(frac))
    thr = F.lit(default_fraction) if thr is None else thr.otherwise(F.lit(default_fraction))
    return df.where(u < thr)


def mix_corpora(
    sources: dict[str, tuple[DataFrame, float]],
    id_col: str,
    salt: str = "mix",
    source_col: str = "source",
) -> DataFrame:
    """Weighted corpus mixture: for each named corpus keep a deterministic
    ``weight`` fraction of its rows (weight in [0, 1] — a DATA-KEPT fraction,
    not a normalized mixing ratio) and tag provenance. Columns are aligned by
    name (missing columns are an error — align upstream); each corpus is
    filtered map-side before the union, so nothing is materialized."""
    out = None
    for name, (df, weight) in sources.items():
        part = deterministic_sample(df, id_col, weight, salt=f"{salt}:{name}").withColumn(
            source_col, F.lit(name)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("mix_corpora: no sources given")
    return out
