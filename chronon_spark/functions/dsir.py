"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS 2023).

The standard recipe for targeting a web-scale raw corpus at a desired domain
(the paper's setting: select GPT-3-quality pretraining data from Common Crawl
by importance-weighting toward Wikipedia+books):

1. featurize every document as a bag of HASHED n-grams (unigrams + bigrams
   -> ``n_buckets`` counts) — hashing bounds the model size independent of
   vocabulary, so the "LM" is a length-``n_buckets`` multinomial;
2. fit bucket probabilities on the TARGET corpus (p) and the RAW corpus (q)
   with add-one smoothing;
3. per raw document, the log importance weight is
   ``log w(x) = sum_i c_i(x) * (log p_i - log q_i)``;
4. resample: Gumbel-top-k on ``log w + g``, g = -ln(-ln(u)) with u a
   DETERMINISTIC per-doc hash draw (functions/sampling.hash_unit) — sampling
   without replacement proportional to w, reproducible on any cluster shape.

Spark shape at 100 TB: bucketing is md5 codegen (no vocabulary state); the
two model fits are single partial aggregations onto ``n_buckets`` keys (map
combine reduces every task to <= n_buckets rows before the shuffle); the
model join is an ``n_buckets``-row broadcast; the per-doc weight is one
partial agg keyed by doc id. No per-row Python anywhere; every step is
mirrored exactly by the DuckDB oracle (md5 bucketing is engine-portable).

Reference parity note: the reference has no data-selection module; this is a
driver-mandated training-pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from chronon_spark.functions.sampling import hash_unit
from chronon_spark.functions.text import tokens, word_bigrams
from chronon_spark.rounding import NUDGE_6DP

# 15 hex chars of the md5 = 60 bits, signed-positive in both engines
# (DuckDB mirror: ('0x' || substring(md5(t), 1, 15))::BIGINT % n_buckets)
_HEX = 15


def hash_bucket(term: Column, n_buckets: int) -> Column:
    """Stable feature bucket of a term: top-60-bits-of-md5 mod n_buckets."""
    h = F.conv(F.substring(F.md5(term), 1, _HEX), 16, 10).cast("decimal(20,0)")
    return (h % n_buckets).cast("int")


def hashed_ngram_buckets(text_col: Column | str, n_buckets: int) -> Column:
    """Array of feature-bucket ids for a document: one per unigram + one per
    adjacent bigram (the DSIR featurization). Pure codegen projection."""
    uni = F.transform(tokens(text_col), lambda t: hash_bucket(t, n_buckets))
    bi = F.transform(word_bigrams(text_col), lambda t: hash_bucket(t, n_buckets))
    return F.concat(uni, bi)


def _bucket_counts(df: DataFrame, id_col: str, text_col: str, n_buckets: int) -> DataFrame:
    """(id, bucket) -> count. The explode fans out ~doc_len rows but the
    groupBy partial-aggregates map-side, so the shuffle carries at most
    n_docs x distinct-buckets-per-doc rows."""
    return (
        df.select(F.col(id_col), F.explode(hashed_ngram_buckets(text_col, n_buckets)).alias("__b"))
        .groupBy(id_col, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def _model(bucket_tf: DataFrame, n_buckets: int, prob_col: str) -> DataFrame:
    """Smoothed multinomial over buckets: (bucket, log prob). Add-one
    smoothing over ALL n_buckets (absent buckets get alpha mass), so
    log-weights are finite for any document."""
    cnt = bucket_tf.groupBy("__b").agg(F.sum("__c").alias("__n"))
    tot = cnt.agg((F.sum("__n") + F.lit(n_buckets)).alias("__t"))
    spark = bucket_tf.sparkSession
    full = spark.range(n_buckets).select(F.col("id").cast("int").alias("__b"))
    return (
        full.join(cnt, on="__b", how="left")
        .crossJoin(F.broadcast(tot))
        .select("__b", F.log((F.coalesce(F.col("__n"), F.lit(0)) + 1) / F.col("__t")).alias(prob_col))
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    round_to: int = 6,
) -> DataFrame:
    """Per-raw-document DSIR importance weight toward the target corpus.

    Returns (id, n_feats, log_weight): log_weight = sum over the doc's
    feature buckets of log p_target(b) - log q_raw(b), display-rounded with
    the house dyadic nudge (summation order differs across engines ~1 ulp).

    NULL-text contract: a document with NULL text has no features, so it
    gets NO weight row and can never be selected (it also contributes
    nothing to the q model) — the SQL mirror behaves identically (unnest of
    a NULL list emits no rows). Filter or impute nulls upstream if every
    raw doc must be representable; note this also means ``dsir_resample``
    can return fewer than ``k`` rows when null-text docs shrink the pool.
    Empty-string text IS kept (one '' token feature), like the other text
    operators.
    """
    raw_tf = _bucket_counts(raw, id_col, text_col, n_buckets)
    p = _model(_bucket_counts(target, id_col, text_col, n_buckets), n_buckets, "__lp")
    q = _model(raw_tf, n_buckets, "__lq")
    model = F.broadcast(p.join(q, on="__b"))
    doc = raw_tf.join(model, on="__b").groupBy(id_col).agg(
        F.sum("__c").alias("n_feats"),
        F.sum(F.col("__c") * (F.col("__lp") - F.col("__lq"))).alias("__lw"),
    )
    return doc.select(
        F.col(id_col),
        F.col("n_feats"),
        (F.round(F.col("__lw") + F.lit(NUDGE_6DP), round_to) + F.lit(0.0)).alias("log_weight"),
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    salt: str = "dsir",
) -> DataFrame:
    """Select ``k`` raw documents ~ importance weights, without replacement,
    deterministically: Gumbel-top-k with the gumbel drawn from the doc's own
    hash (same id + salt -> same draw on any engine/cluster/partitioning).

    The global top-k is one sort of (n_docs) score rows — at corpus scale
    Spark's TakeOrderedAndProject keeps per-partition heaps of size k, so no
    full sort materializes."""
    w = dsir_log_weights(raw, target, id_col, text_col, n_buckets)
    u = hash_unit(id_col, salt)
    g = -F.log(-F.log(u))
    scored = w.withColumn("sel_score", F.col("log_weight") + g)
    return scored.orderBy(F.desc("sel_score"), id_col).limit(k)
