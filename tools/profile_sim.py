"""Profile the similarity-family queries: split driver planning from execution.

Usage: python tools/profile_sim.py [sf_dir]
"""
import sys
import time

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

from chronon_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="profile_sim")
spark.sparkContext.setLogLevel("ERROR")

from chronon_spark.contracts import corpus  # noqa: E402

QS = [
    "embedding_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_near_dups",
    "dedup_simhash",
]

queries = corpus.QUERIES

for name in QS:
    fn = queries[name]
    t0 = time.time()
    df = fn(spark, SF)
    t_build = time.time() - t0
    t0 = time.time()
    df.explain("cost")  # forces full analysis+optimization
    t_plan = time.time() - t0
    t0 = time.time()
    n = df.count()
    t_exec1 = time.time() - t0
    t0 = time.time()
    n = df.count()
    t_exec2 = time.time() - t0
    print(
        f"{name:24s} build={t_build:6.2f}s plan={t_plan:6.2f}s "
        f"exec1={t_exec1:6.2f}s exec2={t_exec2:6.2f}s rows={n}"
    )
