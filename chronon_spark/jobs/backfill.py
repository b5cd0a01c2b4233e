"""spark-submit entrypoint: PITC feature backfill over a transcripts table.

    spark-submit --py-files chronon_spark.zip chronon_spark/jobs/backfill.py \
        --events /path/transcripts.parquet --queries /path/queries.parquet \
        --out /path/out --checkpoint /path/manifests [--partitions ds ...]

Runs the as-of join per `ds` partition with per-partition lineage manifests;
a rerun computes only partitions missing from the manifest dir
(reference semantics: unfilledRanges, catalog/TableUtils.scala:403-499).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_gb(spec: str):
    """JSON GroupBy spec -> api.GroupBy. Example:
    {"keys":["conv_id"],"aggs":[{"col":"turn_idx","op":"count","windows":["7d"]}],
     "time_column":"ts","tie_breakers":["turn_idx"]}"""
    from chronon_spark.api import Aggregation, GroupBy, Op

    d = json.loads(spec)
    aggs = [
        Aggregation(
            a["col"],
            Op(a["op"]),
            windows=tuple(a.get("windows", [None])),
            buckets=tuple(a.get("buckets", [])),
            k=a.get("k"),
        )
        for a in d["aggs"]
    ]
    return GroupBy(
        keys=d["keys"],
        aggregations=aggs,
        time_column=d.get("time_column", "ts"),
        tie_breakers=d.get("tie_breakers", []),
        include_equal=d.get("include_equal", False),
        sawtooth=d.get("sawtooth", False),
    )


DEFAULT_GB = json.dumps(
    {
        "keys": ["conv_id"],
        "aggs": [
            {"col": "turn_idx", "op": "count", "windows": ["7d", "1h", None]},
            {"col": "turn_idx", "op": "sum", "windows": ["7d"]},
            {"col": "text", "op": "last_k", "windows": ["2d"], "k": 5},
        ],
        "tie_breakers": ["turn_idx"],
    }
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--events", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True, help="lineage-manifest dir (resume state)")
    ap.add_argument("--group-by", default=DEFAULT_GB, help="JSON GroupBy spec")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from chronon_spark.plans.manifest import run_partitioned_backfill
    from chronon_spark.session import get_spark

    spark = get_spark("chronon-backfill", master=args.master)
    gb = parse_gb(args.group_by)
    # pre-flight (Analyzer.scala analogue): fail on spec/schema problems
    # BEFORE any partition computes, not hours into the backfill
    from chronon_spark.analyzer import analyze

    analyze(
        spark.read.parquet(args.queries), gb, right=spark.read.parquet(args.events)
    )
    t0 = time.time()
    stats = run_partitioned_backfill(
        spark,
        events_path=args.events,
        queries_path=args.queries,
        out_path=args.out,
        checkpoint_dir=args.checkpoint,
        gb=gb,
    )
    stats["wall_sec"] = round(time.time() - t0, 3)
    print(json.dumps(stats))
    return 0


if __name__ == "__main__":
    sys.exit(main())
