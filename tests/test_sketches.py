"""Error-bound gates for the JVM sketch scale path — the reference's
ApproxDistinctTest / ApproxPercentilesTest pattern (aggregator/src/test/scala)
applied to Spark's HLL++ and percentile_approx."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def _big(n=20_000, card=3_000, seed=7):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, 4, size=n),
            "id": rng.integers(0, card, size=n).astype(str),
            "x": rng.normal(100.0, 25.0, size=n),
        }
    )


def test_hll_error_bound(spark):
    pdf = _big()
    df = spark.createDataFrame(pdf)
    got = (
        df.groupBy("k")
        .agg(F.approx_count_distinct("id").alias("approx"))
        .toPandas()
        .set_index("k")["approx"]
    )
    exact = pdf.groupby("k")["id"].nunique()
    for k in exact.index:
        rel = abs(got[k] - exact[k]) / exact[k]
        assert rel <= 0.15, f"group {k}: rel err {rel:.3f} (approx={got[k]}, exact={exact[k]})"


def test_percentile_approx_bound(spark):
    pdf = _big()
    df = spark.createDataFrame(pdf)
    got = (
        df.groupBy("k")
        .agg(
            F.percentile_approx("x", 0.5).alias("p50"),
            F.percentile_approx("x", 0.9).alias("p90"),
        )
        .toPandas()
        .set_index("k")
    )
    for k, grp in pdf.groupby("k"):
        # approx percentile returns an actual data value within rank error;
        # bound by the value span of a +-2% rank neighborhood
        for q, col in ((0.5, "p50"), (0.9, "p90")):
            lo, hi = np.quantile(grp["x"], [max(q - 0.02, 0), min(q + 0.02, 1)])
            assert lo - 1e-9 <= got.loc[k, col] <= hi + 1e-9
