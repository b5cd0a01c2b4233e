"""Deterministic corpus restriction for sampled at-scale oracle checks.

The pair/ANN family's DuckDB oracles are O(n^2); at the upsampled sf1.0
corpus (50k docs / 20k vectors) they are infeasible, so those 15 queries
previously ran engine-only at sf1.0. This tool derives a RESTRICTED twin of
an sf dir: documents subsampled 1-in-K and embeddings 1-in-K2 by a
deterministic id hash, every other table copied through unchanged. Both
engines then run the SAME queries on the SAME restricted parquet, giving the
family a true two-engine check on sf1.0-GENERATED data (the 10x replica
corpus's near-dup structure survives subsampling proportionally) at an
oracle cost the quadratic SQL can pay.

Usage: python tools/gen_restricted.py [src_dir] [out_dir] [K_docs] [K_vecs]
       (defaults: /tmp/sf1.0 /tmp/sf1.0r 5 2)
"""

from __future__ import annotations

import os
import shutil
import sys

import pyarrow.compute as pc
import pyarrow.parquet as pq


def restrict(src: str, out: str, k_docs: int, k_vecs: int) -> None:
    os.makedirs(out, exist_ok=True)
    for fn in sorted(os.listdir(src)):
        if not fn.endswith(".parquet"):
            continue
        sp, op = os.path.join(src, fn), os.path.join(out, fn)
        name = fn[: -len(".parquet")]
        if name in ("documents", "embeddings"):
            k = k_docs if name == "documents" else k_vecs
            t = pq.read_table(sp)
            idc = "doc_id" if "doc_id" in t.column_names else t.column_names[0]
            ids = t.column(idc)
            if ids.type == "string":
                # deterministic, engine-independent: hash on the id's bytes
                import hashlib

                keep_mask = [
                    int(hashlib.md5(str(v).encode()).hexdigest(), 16) % k == 0
                    for v in ids.to_pylist()
                ]
                t = t.filter(pc.array(keep_mask) if hasattr(pc, "array") else keep_mask)
            else:
                import numpy as np

                vals = np.asarray(ids.to_numpy(zero_copy_only=False), dtype=np.int64)
                t = t.filter(vals % k == 0)
            pq.write_table(t, op)
            print(f"{name}: kept {t.num_rows} rows (1 in {k})")
        else:
            shutil.copyfile(sp, op)
    print(f"wrote {out}")


if __name__ == "__main__":
    a = sys.argv[1:]
    restrict(
        a[0] if len(a) > 0 else "/tmp/sf1.0",
        a[1] if len(a) > 1 else "/tmp/sf1.0r",
        int(a[2]) if len(a) > 2 else 5,
        int(a[3]) if len(a) > 3 else 2,
    )
