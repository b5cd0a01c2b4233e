"""Micro-bench: where does the distributed bloom pushdown beat the exact
broadcast semi-join (and the IN-list small mode)?

Measures, at 10^5 / 10^6 / 10^7 distinct left key tuples against a fixed
right event stream, the wall time of filtering the right side through each
prefilter strategy (operators/asof_join.prefilter_right_keys) plus a
no-prefilter scan control. Emits tools/bloom_crossover.json.

The reference's spark.chronon.backfill.bloomfilter.threshold = 1e6
(catalog/TableUtils.scala:54-63) is the conf default this engine honors; this
bench validates the ordering empirically on local[N] so the auto-mode
recommendation is measured, not inherited.

Usage: python tools/bloom_crossover.py [--rows 8000000] [--out tools/bloom_crossover.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=8_000_000, help="right-side event rows")
    ap.add_argument("--out", default="tools/bloom_crossover.json")
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from chronon_spark.operators.asof_join import prefilter_right_keys
    from chronon_spark.session import get_spark

    spark = get_spark("bloom-crossover", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus * 4)

    # right: event stream over 2x10^7 possible keys (so every left size is a
    # genuine subset and the filter selectivity scales with left size)
    key_space = 20_000_000
    right = (
        spark.range(args.rows)
        .select(
            (F.xxhash64("id") % key_space).alias("user_id"),
            (F.col("id") % 1000).alias("v"),
        )
        .persist()
    )
    right.count()  # materialize once; every strategy then pays only its own cost

    results = []
    for n_keys in (100_000, 1_000_000, 10_000_000):
        left = (
            spark.range(n_keys)
            .select((F.xxhash64(F.col("id") + 1) % key_space).alias("user_id"))
            .persist()
        )
        left.count()
        row: dict = {"left_distinct_keys": n_keys}
        for mode in (None, "semi", "bloom"):
            t0 = time.time()
            if mode is None:
                n = right.count()
            else:
                filtered = prefilter_right_keys(left, right, {"user_id": "user_id"}, mode=mode)
                n = filtered.count()
            row[f"{mode or 'none'}_sec"] = round(time.time() - t0, 3)
            row[f"{mode or 'none'}_rows_out"] = n
        left.unpersist()
        results.append(row)
        print(json.dumps(row))

    out = {
        "bench": "bloom_crossover",
        "right_rows": args.rows,
        "key_space": key_space,
        "cpus": args.cpus,
        "results": results,
        "note": (
            "build+probe wall of each prefilter vs a full-scan control; the "
            "reference threshold (bloom under 1e6 left rows, skip above) is "
            "validated if bloom_sec < semi_sec at 1e6 and the gap narrows or "
            "inverts at 1e7 where the bitmap build dominates"
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
