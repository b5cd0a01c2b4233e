"""Two-phase salted top-k per group: exactness vs the unsalted window for
any salt_buckets, deterministic ranks, validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chronon_spark.functions.ranking import topk_per_group


@pytest.fixture(scope="module")
def scored(spark):
    rows = [(i, f"g{i % 3}", float((i * 7919) % 100)) for i in range(500)]
    # inject score ties so the tie-break path is exercised
    rows += [(1000 + i, "g0", 99.0) for i in range(5)]
    return spark.createDataFrame(rows, "id long, grp string, score double")


def _unsalted(df, k):
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("id"))
    return df.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


@pytest.mark.parametrize("buckets", [1, 4, 64])
def test_exactness_any_bucket_count(scored, buckets):
    got = topk_per_group(
        scored, ["grp"], [F.desc("score"), F.asc("id")], "id", k=7, salt_buckets=buckets
    )
    want = _unsalted(scored, 7)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_k_larger_than_group(scored):
    small = scored.where("grp = 'g1'").limit(3)
    out = topk_per_group(small, ["grp"], [F.desc("score"), F.asc("id")], "id", k=100)
    assert out.count() == 3


def test_k_validated(scored):
    with pytest.raises(ValueError, match="positive"):
        topk_per_group(scored, ["grp"], [F.desc("score")], "id", k=0)
