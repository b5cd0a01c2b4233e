"""Two-parallelism scaling benchmark — the BASELINE.json north-rule evidence.

Runs the SAME as-of feature backfill on the SAME input at local[N] and
local[4N] (sandbox stand-in for N vs 4N executor clusters), reports throughput
(turns/sec) at both and the scaling efficiency
  eff = (thr_4N / thr_N) / 4
Target: eff >= 0.8. Results are recorded in BASELINE.md.

Usage: python tools/scaling_bench.py [n_small] [sf_dir] [rows]
Each parallelism level runs in a fresh spark-submit-equivalent session
(sequential, separate JVM via subprocess) so executors don't share warm state.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]

CHILD = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from chronon_spark.session import get_spark
import __spark_entry__ as E

cores = {cores}
sf_dir = {sf_dir!r}
spark = get_spark("scale-bench", master=f"local[{{cores}}]", shuffle_partitions=cores)
n = spark.read.parquet(f"{{sf_dir}}/events.parquet").count()
E.queries()["trailing_window_features"](spark, sf_dir).count()  # warmup
t0 = time.time()
E.queries()["asof_join_features"](spark, sf_dir).write.format("noop").mode("overwrite").save()
asof = time.time() - t0
t0 = time.time()
E.queries()["trailing_window_features"](spark, sf_dir).write.format("noop").mode("overwrite").save()
trail = time.time() - t0
print("RESULT " + json.dumps({{"cores": cores, "rows": n, "asof_sec": round(asof, 3),
                               "trailing_sec": round(trail, 3)}}))
spark.stop()
"""


def run_level(cores: int, sf_dir: str) -> dict:
    code = CHILD.format(root=str(ROOT), cores=cores, sf_dir=sf_dir)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800,
        cwd=str(ROOT), env={**os.environ, "SPARK_DRIVER_MEMORY": "16g"},
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:])
    raise RuntimeError(f"no RESULT line at cores={cores}")


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    small = run_level(n_small, sf_dir)
    big = run_level(n_small * 4, sf_dir)
    res = {"sf_dir": sf_dir, "small": small, "big": big}
    for key in ("asof_sec", "trailing_sec"):
        thr_s = small["rows"] / small[key]
        thr_b = big["rows"] / big[key]
        res[key.replace("_sec", "")] = {
            f"turns_per_sec_local{n_small}": round(thr_s, 1),
            f"turns_per_sec_local{n_small * 4}": round(thr_b, 1),
            "scaling_efficiency": round(thr_b / thr_s / 4, 3),
        }
    print(json.dumps(res, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
