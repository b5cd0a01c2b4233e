"""Document chunking and sequence packing for training-data pipelines.

Two pretraining-prep primitives the reference doesn't carry (its python
tooling stops at feature serving) but every LLM data pipeline needs between
"deduped corpus" and "training shards":

- ``chunk_documents``: split long documents into fixed-size token windows
  with overlap (context-window fitting). Pure expression work — split,
  ``sequence`` of window starts, ``transform`` + ``posexplode`` + ``slice``:
  one narrow projection, no shuffle, no UDF.
- ``pack_token_stream``: concatenate-then-split packing (the standard
  pretraining shape: documents are laid head-to-tail in a deterministic
  order and the stream is cut every ``budget`` tokens; documents may
  straddle a cut — flagged). Assignment is a single exclusive running sum
  over a total order, i.e. ONE window shuffle; emitting per-bin offsets is
  projection-only.

Determinism: the stream order is (id) — a pure function of the data, never
partition order — so bin ids are reproducible across runs, engines, and
cluster sizes, and the DuckDB oracle reproduces them exactly.

Scale note: the global window (ORDER BY id, no PARTITION BY) serializes on
one task — correct but not parallel. At 100 TB, partition the stream first
(e.g. by shard = hash(id) % n_shards, each shard packed independently with
its own bins via PARTITION BY shard) — provided as ``shard_col``; bins are
then (shard, bin_idx) pairs. n_shards × budget granularity is the only
semantic difference, which pretraining tolerates by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """One row per (doc, chunk): whitespace tokens ``[start, start+chunk)``
    re-joined with single spaces; starts advance by ``chunk_tokens -
    overlap``. Output: (id, chunk_idx, chunk_text, n_tokens)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # window starts: 0, step, 2*step, ... while start < n (at least one chunk
    # for a non-empty doc); F.sequence is inclusive, so the last start is the
    # greatest multiple of step strictly below n
    starts = F.sequence(F.lit(0), F.greatest(F.ceil(n / step) - 1, F.lit(0)) * step, F.lit(step))
    chunks = F.transform(starts, lambda s: F.slice(toks, s + 1, chunk_tokens))
    return (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .select(F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "__c"))
        .select(
            id_col,
            "chunk_idx",
            F.array_join("__c", " ").alias("chunk_text"),
            F.size("__c").alias("n_tokens"),
        )
    )


def pack_token_stream(
    df: DataFrame,
    id_col: str,
    n_tokens_col: str,
    budget: int,
    shard_col: str | None = None,
) -> DataFrame:
    """Concat-then-split packing: documents laid head-to-tail in ``id`` order,
    stream cut every ``budget`` tokens. Output one row per document:

    - ``bin_idx``: bin containing the document's FIRST token
      (``floor(exclusive_cumsum / budget)``),
    - ``bin_offset``: token offset of the document inside that bin,
    - ``spans_bins``: true when the document straddles a cut (its tokens
      continue into bin_idx+1..).

    With ``shard_col`` the stream (and bin numbering) restarts per shard —
    the parallel form; without it the window is global (one-task sort)."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    part = Window.partitionBy(*([shard_col] if shard_col else [])).orderBy(id_col)
    csum_excl = F.coalesce(
        F.sum(n_tokens_col).over(part.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    cols = ([shard_col] if shard_col else []) + [
        F.col(id_col),
        F.col(n_tokens_col).alias("n_tokens"),
        F.floor(csum_excl / budget).alias("bin_idx"),
        (csum_excl % budget).alias("bin_offset"),
        (((csum_excl % budget) + F.col(n_tokens_col)) > budget).alias("spans_bins"),
    ]
    return df.select(*cols)
