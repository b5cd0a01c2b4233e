"""Deterministic synthetic transcript generator (FIXTURES.md F1/F2).

Shape = BASELINE.json input_hint: (conv_id string, turn_idx int, role string,
text string, tool string, ts timestamp). Zipf-ish conv sizes with explicit hot
keys (skew must be exercised), null injection for text/tool, duplicate
timestamps within conversations (boundary tests), seeded numpy — same bytes
every run. Mirrors the reference's generators
(spark/src/test/scala/ai/chronon/spark/utils/DataFrameGen.scala:33-172) in
spirit, none of its code.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array([f"tool_{i}" for i in range(20)])
BASE_TS = pd.Timestamp("2024-01-01").value // 1000  # epoch micros
SPAN_US = 30 * 86_400_000_000  # 30 days


def synth_transcripts(
    n_rows: int = 10_000,
    n_convs: int = 100,
    hot_key_frac: float = 0.10,
    n_hot: int = 2,
    null_frac: float = 0.02,
    dup_ts_frac: float = 0.01,
    seed: int = 42,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    # conversation assignment: n_hot hot convs take hot_key_frac each
    p = np.full(n_convs, (1 - n_hot * hot_key_frac) / max(n_convs - n_hot, 1))
    p[:n_hot] = hot_key_frac
    p /= p.sum()
    conv = rng.choice(n_convs, size=n_rows, p=p)
    ts = BASE_TS + rng.integers(0, SPAN_US, size=n_rows)
    # inject duplicate timestamps within a conversation
    n_dup = int(n_rows * dup_ts_frac)
    if n_dup:
        src = rng.integers(0, n_rows, size=n_dup)
        dst = rng.integers(0, n_rows, size=n_dup)
        ts[dst] = ts[src]
        conv[dst] = conv[src]
    df = pd.DataFrame(
        {
            "conv_id": np.char.add("conv_", conv.astype(str)),
            "ts_us": ts,
        }
    )
    df = df.sort_values(["conv_id", "ts_us"], kind="stable").reset_index(drop=True)
    df["turn_idx"] = df.groupby("conv_id").cumcount().astype(np.int32)
    role_idx = rng.integers(0, len(ROLES), size=n_rows)
    df["role"] = ROLES[role_idx]
    df["text"] = np.char.add(
        np.char.add(df["role"].to_numpy(str), "-turn-"), df["turn_idx"].to_numpy().astype(str)
    )
    df["tool"] = TOOLS[rng.integers(0, len(TOOLS), size=n_rows)]
    df.loc[rng.random(n_rows) < null_frac, "text"] = None
    df.loc[rng.random(n_rows) < 0.5, "tool"] = None
    df["n_chars"] = df["text"].str.len().astype("float64")  # numeric feature input
    df["ts"] = pd.to_datetime(df.pop("ts_us"), unit="us").astype("datetime64[us]")
    df["ds"] = df["ts"].dt.strftime("%Y-%m-%d")
    return df[["conv_id", "turn_idx", "role", "text", "tool", "n_chars", "ts", "ds"]]


def synth_queries(
    transcripts: pd.DataFrame,
    n_queries: int = 2_000,
    boundary_frac: float = 0.05,
    seed: int = 43,
) -> pd.DataFrame:
    """Left-side query table (FIXTURES.md F2): random (conv_id, ts) points,
    a slice with ts exactly equal to event ts (boundary regression), plus
    duplicated rows (the reference unions the query table with itself,
    UnionJoinTest.scala:59)."""
    rng = np.random.default_rng(seed)
    convs = transcripts["conv_id"].unique()
    conv = rng.choice(convs, size=n_queries)
    ts = pd.to_datetime(BASE_TS + rng.integers(0, SPAN_US, size=n_queries), unit="us").astype("datetime64[us]")
    q = pd.DataFrame({"conv_id": conv, "ts": ts})
    n_b = int(n_queries * boundary_frac)
    if n_b:
        picks = transcripts.sample(n=n_b, random_state=seed)[["conv_id", "ts"]]
        q.iloc[:n_b] = picks.to_numpy()
    q = pd.concat([q, q.iloc[: n_queries // 10]], ignore_index=True)  # duplicates
    q["query_id"] = [f"q{i}" for i in range(len(q))]
    q["ds"] = q["ts"].dt.strftime("%Y-%m-%d")
    return q[["conv_id", "query_id", "ts", "ds"]]
