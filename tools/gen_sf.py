"""Deterministic scale-factor upsampler for local correctness sweeps.

The driver ships read-only testdata at sf0.001/0.01/0.1; rounding-boundary
bugs (the dyadic half-tie class caught in r2/r3) only surface when aggregate
SUMs cross new decimal boundaries — i.e. at NEW data scales. This tool
synthesizes a larger sf from sf0.1 without external data: each replica k
offsets every BIGINT id by k*10^9 (far beyond real id ranges, so replica
key spaces never collide), keeps timestamps/values bit-identical (10x more
groups, same per-group distribution — exactly what shakes out rounding
ties), de-duplicates document text with a deterministic suffix (so the
dedup/fingerprint queries see a 10x corpus, not a corpus of exact clones),
and perturbs embedding[0] by k*1e-3 (breaks cosine ties that would
otherwise make top-k order compare-unstable between engines).

Both Spark and the DuckDB oracles read the SAME generated parquet, so every
check_oracle.py comparison stays a true two-engine test.

Usage: python tools/gen_sf.py [k] [src_dir] [out_dir]
       (defaults: 10 /root/testdata/sf0.1 /tmp/sf1.0)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 10**9


def upsample(src: str, out: str, k: int) -> None:
    os.makedirs(out, exist_ok=True)
    for name in ("events", "documents", "embeddings"):
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        replicas = []
        for i in range(k):
            r = t
            for col in r.column_names:
                if col.endswith("_id") and pa.types.is_integer(r.schema.field(col).type):
                    r = r.set_column(
                        r.column_names.index(col),
                        col,
                        pc.add(r.column(col), i * OFFSET),
                    )
            if i > 0 and name == "documents":
                suffix = f" replica{i}"
                text = pc.binary_join_element_wise(
                    r.column("text").cast(pa.string()), suffix, ""
                )
                r = r.set_column(r.column_names.index("text"), "text", text)
                r = r.set_column(
                    r.column_names.index("n_chars"),
                    "n_chars",
                    pc.add(r.column("n_chars"), len(suffix)),
                )
            if i > 0 and name == "embeddings":
                import numpy as np

                emb = r.column("embedding").combine_chunks()
                flat = emb.values.to_numpy(zero_copy_only=False).copy()
                dims = len(flat) // len(r)
                flat[::dims] += i * 1e-3
                fixed = pa.ListArray.from_arrays(
                    emb.offsets, pa.array(flat, type=emb.values.type)
                )
                r = r.set_column(r.column_names.index("embedding"), "embedding", fixed)
            replicas.append(r)
        big = pa.concat_tables(replicas)
        pq.write_table(big, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {len(t)} -> {len(big)} rows")
    # the TPCH star tables aren't read by any registry query; symlink them so
    # check_oracle's view registration keeps working unchanged
    for name in (
        "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
    ):
        src_p = os.path.join(src, f"{name}.parquet")
        dst_p = os.path.join(out, f"{name}.parquet")
        if os.path.exists(src_p) and not os.path.exists(dst_p):
            os.symlink(src_p, dst_p)


if __name__ == "__main__":
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sf1.0"
    upsample(src, out, k)
