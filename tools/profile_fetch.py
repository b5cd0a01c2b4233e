"""Stage-level timing for the serving-fetch contract queries — find where
the 9-10 s at sf0.1 actually goes (IR build? stream tiles? cogroup merge?).

Usage: python tools/profile_fetch.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from chronon_spark.api import Aggregation, GroupBy, Op  # noqa: E402
from chronon_spark.session import get_spark  # noqa: E402


def t(label, thunk):
    t0 = time.time()
    out = thunk()
    print(f"{label:40s} {time.time() - t0:7.2f} s")
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-fetch", master="local[32]", shuffle_partitions=32)
    from chronon_spark.contracts.ops import _BATCH_END_US, _transcripts

    US_D = 86_400_000_000
    tr = _transcripts(spark, sf_dir)
    t("materialize transcripts (count)", lambda: tr.count())
    gb = GroupBy(
        keys=["conv_id"],
        aggregations=[
            Aggregation("turn_idx", Op.COUNT, windows=("13d",)),
            Aggregation("score", Op.SUM, windows=("7d",)),
            Aggregation("text", Op.LAST_K, windows=("7d",), k=2),
        ],
        tie_breakers=["turn_idx"],
        sawtooth=True,
    )
    left = tr.where(
        (F.col("role") == "user")
        & (F.col("tus") >= _BATCH_END_US)
        & (F.col("tus") < _BATCH_END_US + 2 * US_D)
    ).select("conv_id", "turn_idx", "tus", "ts")
    t("left count", lambda: left.count())

    from chronon_spark.jobs.upload import build_batch_irs, fetch_features

    irs = build_batch_irs(tr, gb, _BATCH_END_US)
    t("build_batch_irs (count)", lambda: irs.count())
    irs_c = irs.persist()
    t("irs persisted count", lambda: irs_c.count())

    out = fetch_features(left, irs, tr, gb, _BATCH_END_US)
    t("fetch_features on lazy irs (count)", lambda: out.count())
    out2 = fetch_features(left, irs_c, tr, gb, _BATCH_END_US)
    t("fetch_features on cached irs (count)", lambda: out2.count())

    # the full contract query, as bench times it
    from chronon_spark.contracts.ops import QUERIES

    t("_q_serving_fetch end-to-end", lambda: QUERIES["serving_fetch"](spark, sf_dir).count())
    t("_q_serving_fetch 2nd run", lambda: QUERIES["serving_fetch"](spark, sf_dir).count())
    t("_q_serving_fetch_tiled end-to-end", lambda: QUERIES["serving_fetch_tiled"](spark, sf_dir).count())
    spark.stop()


if __name__ == "__main__":
    main()
