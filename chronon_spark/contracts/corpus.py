"""Corpus-curation contract queries (documents / embeddings tables) with
DuckDB oracle SQL.

Portability rules that make exact value-hash agreement possible:
- every hash is md5 over an explicit string (identical in both engines);
- dot products / norms are sequential float64 folds in both engines
  (Spark `aggregate` left fold ≡ DuckDB `list_sum(list_transform(...))` —
  verified bitwise equal);
- ratios are single IEEE divisions of identical integers — no rounding needed.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from chronon_spark.functions import clustering, dedup, multimodal, similarity, text
from chronon_spark.functions.similarity import plane_components
from chronon_spark.rounding import NUDGE_6DP

# ---------------------------------------------------------------- helpers

_TOKS = "regexp_split_to_array(trim(text), '\\s+')"
_STOP = "['" + "','".join(text.STOPWORDS_EN) + "']"


def _load_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _load_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ---------------------------------------------------------------- doc_stats


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load_docs(spark, sf_dir)
    return d.select(
        "doc_id",
        text.token_count("text").alias("n_tokens"),
        text.char_count("text").alias("n_chars"),
        text.avg_token_len("text").alias("avg_tok_len"),
        text.unique_token_ratio("text").alias("uniq_ratio"),
        text.stopword_ratio("text").alias("stop_ratio"),
    )


_SQL_DOC_STATS = f"""
WITH d AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id,
       len(toks)                                            AS n_tokens,
       length(text)                                         AS n_chars,
       list_sum(list_transform(toks, t -> length(t)))::DOUBLE / len(toks) AS avg_tok_len,
       len(list_distinct(toks))::DOUBLE / len(toks)         AS uniq_ratio,
       len(list_filter(toks, t -> list_contains({_STOP}, t)))::DOUBLE / len(toks) AS stop_ratio
FROM d
"""


# ---------------------------------------------------------------- repetition


def _q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document — pure per-row
    codegen (sorted-run mode counting), ZERO shuffles at any scale; the
    oracle reproduces each signal via unnest + group-by."""
    d = _load_docs(spark, sf_dir)
    return d.select("doc_id", *text.repetition_signals("text"))


_SQL_REPETITION = r"""
WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents),
words AS (SELECT doc_id, unnest(ws) AS wd FROM w),
wc AS (SELECT doc_id, wd, COUNT(*) AS c FROM words GROUP BY 1, 2),
topw AS (SELECT doc_id, MAX(c) AS topc, SUM(c) AS n FROM wc GROUP BY 1),
bglist AS (SELECT doc_id,
                  [ws[i] || ' ' || ws[i+1] for i in generate_series(1, len(ws) - 1)] AS bs
           FROM w),
bg AS (SELECT doc_id, unnest(bs) AS b FROM bglist),
bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bg GROUP BY 1, 2),
topb AS (SELECT doc_id, MAX(c) AS topc, SUM(c) AS nb FROM bc GROUP BY 1),
dw AS (SELECT doc_id, len(list_distinct(ws)) AS nd, len(ws) AS n FROM w)
SELECT dw.doc_id,
       CAST(dw.n AS INT) AS n_words,
       ROUND(CAST(dw.nd AS DOUBLE) / dw.n, 6) AS distinct_word_ratio,
       ROUND(CAST(topw.topc AS DOUBLE) / topw.n, 6) AS top_word_frac,
       CASE WHEN topb.nb > 0 THEN ROUND(CAST(topb.topc AS DOUBLE) / topb.nb, 6) END
         AS top_bigram_frac
FROM dw JOIN topw USING (doc_id) LEFT JOIN topb USING (doc_id)
"""


# ---------------------------------------------------------------- lang/quality


def _q_lang_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _load_docs(spark, sf_dir)
    return d.select(
        "doc_id",
        text.lang_id("text").alias("lang"),
        text.quality_score("text").alias("quality"),
    )


def _lex_sql(lang: str) -> str:
    words = "','".join(text.LANG_LEXICONS[lang])
    return f"len(list_filter(toks, t -> list_contains(['{words}'], t)))::DOUBLE / len(toks)"


_SQL_LANG_QUALITY = f"""
WITH d AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, text, toks,
             {_lex_sql("de")} AS s_de, {_lex_sql("en")} AS s_en, {_lex_sql("es")} AS s_es,
             len(list_distinct(toks))::DOUBLE / len(toks) AS uniq,
             length(regexp_replace(text, '[\\w ]', '', 'g'))::DOUBLE / length(text) AS punct
      FROM d)
SELECT doc_id,
       CASE WHEN greatest(s_de, s_en, s_es) <= 0 THEN 'und'
            WHEN s_de >= s_en AND s_de >= s_es THEN 'de'
            WHEN s_en >= s_es THEN 'en'
            ELSE 'es' END AS lang,
       (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END
        + least(uniq, 0.5) * 0.6
        + CASE WHEN punct < 0.1 THEN 0.2 ELSE 0.0 END) AS quality
FROM s
"""


# ---------------------------------------------------------------- unigram LM


def _q_unigram_logppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-unigram LM quality scoring (the CCNet quality-bucket mechanic):
    per-doc mean −ln p(token) under corpus frequencies."""
    return text.unigram_logppl(_load_docs(spark, sf_dir), "doc_id", "text")


_SQL_UNIGRAM_LOGPPL = f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
cnt AS (SELECT term, sum(tf)::BIGINT AS cnt FROM tf GROUP BY term),
tot AS (SELECT sum(cnt)::BIGINT AS t FROM cnt),
doc AS (SELECT doc_id, sum(tf)::BIGINT AS n_tokens,
               sum(tf * ln(cnt::DOUBLE / t)) AS slp
        FROM tf JOIN cnt USING (term) CROSS JOIN tot GROUP BY doc_id)
SELECT doc_id, n_tokens, ROUND(-slp / n_tokens + {NUDGE_6DP!r}, 6) + 0.0 AS logppl FROM doc
"""


# ---------------------------------------------------------------- exact dedup


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_load_docs(spark, sf_dir), "text", "doc_id")


_SQL_DEDUP_EXACT = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
       min(doc_id) AS keep_id,
       count(*)    AS n_dups
FROM documents GROUP BY 1
"""


def _q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under the oracle gate: documents replay as two
    micro-batches (maxFilesPerTrigger=1) through `stream_exact_dedup`
    (dropDuplicatesWithinWatermark — bounded keyed state on the content
    fingerprint), and the surviving fingerprint SET must equal the batch
    definition of "distinct document". Arrival times are synthetic and span
    < 1h against a 2h watermark, so no row is late — duplicates that
    straddle the two batches dedup through state, not rescans."""
    import glob as _glob
    import os
    import tempfile
    import uuid

    from chronon_spark.streaming.dedup_stream import stream_exact_dedup

    d = _load_docs(spark, sf_dir).withColumn(
        "arrived",
        F.timestamp_seconds(F.lit(1704067200) + F.pmod(F.col("doc_id"), F.lit(3000))),
    )
    stage = tempfile.mkdtemp(prefix="stream_dedup_")
    src = os.path.join(stage, "src")
    os.makedirs(src)
    for i, half in enumerate((d.where(F.col("doc_id") % 2 == 0), d.where(F.col("doc_id") % 2 == 1))):
        half.coalesce(1).write.parquet(os.path.join(stage, f"h{i}"))
        for j, f in enumerate(sorted(_glob.glob(os.path.join(stage, f"h{i}", "part-*.parquet")))):
            os.link(f, os.path.join(src, f"h{i}_{j}.parquet"))
    stream = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    name = f"stream_dedup_{uuid.uuid4().hex}"
    q = (
        stream_exact_dedup(stream, "text", time_col="arrived", watermark="2 hours")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(stage, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # which doc_id survives per fingerprint is arrival-order-defined; the
    # gated invariant is the fingerprint set (one survivor per distinct text)
    return spark.table(name).select("fp").distinct()


_SQL_STREAM_DEDUP = """
SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
FROM documents
"""


# ---------------------------------------------------------------- segment dedup


def _q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (CCNet/RefinedWeb line-level) dedup on fixed 8-token
    segments: per-doc duplicated-segment fraction via a segment-hash inverted
    index — shuffle carries 32-byte md5 keys, never doc x doc."""
    return dedup.segment_dedup(_load_docs(spark, sf_dir), "doc_id", "text", n=8, min_docs=2)


_SQL_SEGMENT_DEDUP = f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
seg AS (SELECT doc_id,
               unnest(list_transform(range(len(toks) // 8),
                      i -> md5(array_to_string(toks[i*8+1 : i*8+8], ' ')))) AS h
        FROM d),
dup AS (SELECT h FROM seg GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
per_doc AS (SELECT doc_id, count(*) AS n_segments FROM seg GROUP BY doc_id),
dups AS (SELECT s.doc_id, count(*) AS n_dup FROM seg s JOIN dup USING (h) GROUP BY s.doc_id)
SELECT d.doc_id AS doc_id,
       COALESCE(p.n_segments, 0) AS n_segments,
       COALESCE(x.n_dup, 0) AS n_dup,
       CASE WHEN COALESCE(p.n_segments, 0) > 0
            THEN COALESCE(x.n_dup, 0)::DOUBLE / p.n_segments END AS dup_frac
FROM d LEFT JOIN per_doc p USING (doc_id) LEFT JOIN dups x USING (doc_id)
"""


def _q_segment_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRANSFORM form of sub-document dedup (CCNet's actual output):
    corpus-duplicated 8-token segments are removed and the text re-assembled
    — the oracle must reproduce the cleaned string byte-for-byte."""
    return dedup.segment_dedup_rewrite(
        _load_docs(spark, sf_dir), "doc_id", "text", n=8, min_docs=2
    )


_SQL_SEGMENT_REWRITE = f"""
WITH d AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
seg AS (SELECT doc_id, i AS idx,
               array_to_string(toks[i*8+1 : i*8+8], ' ') AS seg,
               md5(array_to_string(toks[i*8+1 : i*8+8], ' ')) AS h
        FROM d, unnest(range(len(toks) // 8)) AS u(i)),
dup AS (SELECT h FROM seg GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
marked AS (SELECT s.*, dup.h IS NOT NULL AS dropped
           FROM seg s LEFT JOIN dup ON s.h = dup.h),
agg AS (SELECT doc_id, COUNT(*) AS n_segments,
               SUM(CASE WHEN dropped THEN 1 ELSE 0 END) AS n_dropped,
               COALESCE(string_agg(CASE WHEN NOT dropped THEN seg END, ' ' ORDER BY idx), '')
                 AS kept
        FROM marked GROUP BY doc_id),
tails AS (SELECT doc_id,
                 CASE WHEN len(toks) - (len(toks) // 8) * 8 > 0
                      THEN array_to_string(toks[(len(toks) // 8) * 8 + 1 : len(toks)], ' ')
                      ELSE '' END AS tail
          FROM d)
SELECT t.doc_id AS doc_id,
       COALESCE(a.n_segments, 0)::BIGINT AS n_segments,
       COALESCE(a.n_dropped, 0)::BIGINT AS n_dropped,
       CASE WHEN COALESCE(a.kept, '') = '' THEN t.tail
            WHEN t.tail = '' THEN a.kept
            ELSE a.kept || ' ' || t.tail END AS cleaned_text
FROM tails t LEFT JOIN agg a USING (doc_id)
"""


# ---------------------------------------------------------------- minhash LSH

_NUM_HASHES, _BANDS, _SHINGLE_N, _J_THRESHOLD = 16, 4, 3, 0.5


def _q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_dedup(
        _load_docs(spark, sf_dir),
        "doc_id",
        "text",
        num_hashes=_NUM_HASHES,
        bands=_BANDS,
        shingle_n=_SHINGLE_N,
        threshold=_J_THRESHOLD,
    )


def _minhash_sql() -> str:
    from chronon_spark.functions.vec_kernels import minhash_params

    a_c, b_c = minhash_params(_NUM_HASHES)
    r = _NUM_HASHES // _BANDS
    # affine family over one 32-bit base hash (first 4 md5 bytes) — mirrors
    # minhash_sig_arrow / minhash_from_shingles exactly
    mins = ",\n             ".join(
        f"min(({a_c[i]} * x + {b_c[i]}) % 4294967296) AS h{i}" for i in range(_NUM_HASHES)
    )
    band_exprs = ", ".join(
        "md5(" + " || '|' || ".join(f"h{b * r + j}::VARCHAR" for j in range(r)) + ")"
        for b in range(_BANDS)
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
docs AS (SELECT doc_id,
                list_distinct(CASE WHEN len(toks) >= {_SHINGLE_N}
                  THEN list_transform(range(1, len(toks) - {_SHINGLE_N - 2}),
                                      i -> array_to_string(toks[i:i+{_SHINGLE_N - 1}], ' '))
                  ELSE []::VARCHAR[] END) AS sh
         FROM t),
nz AS (SELECT * FROM docs WHERE len(sh) > 0),
ex AS (SELECT doc_id, ('0x' || substring(md5(unnest(sh)), 1, 8))::BIGINT AS x FROM nz),
sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
bk AS (SELECT doc_id, [{band_exprs}] AS bks FROM sig),
banded AS (SELECT doc_id, unnest(bks) AS band_key FROM bk),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM banded a JOIN banded b ON a.band_key = b.band_key AND a.doc_id < b.doc_id),
j AS (SELECT id_a, id_b,
             len(list_intersect(da.sh, db.sh))::DOUBLE
               / len(list_distinct(list_concat(da.sh, db.sh))) AS jaccard
      FROM cand JOIN nz da ON da.doc_id = id_a JOIN nz db ON db.doc_id = id_b)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= {_J_THRESHOLD}
"""


# ------------------------------------------------------- incremental dedup


def _q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-batch dedup (docs with doc_id % 10 == 7 play the incoming
    batch) against the standing corpus: candidates come from the batch's
    band keys joined to the corpus LSH index — no corpus-vs-corpus pair is
    ever generated, so a daily batch costs O(batch), not O(corpus²)."""
    d = _load_docs(spark, sf_dir)
    new = d.where(F.col("doc_id") % 10 == 7)
    corpus = d.where(F.col("doc_id") % 10 != 7)
    return dedup.incremental_minhash_dedup(
        corpus, new, "doc_id", "text",
        num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=_SHINGLE_N, threshold=_J_THRESHOLD,
    )


def _incremental_sql() -> str:
    from chronon_spark.functions.vec_kernels import minhash_params

    a_c, b_c = minhash_params(_NUM_HASHES)
    r = _NUM_HASHES // _BANDS
    mins = ",\n             ".join(
        f"min(({a_c[i]} * x + {b_c[i]}) % 4294967296) AS h{i}" for i in range(_NUM_HASHES)
    )
    band_exprs = ", ".join(
        "md5(" + " || '|' || ".join(f"h{b * r + j}::VARCHAR" for j in range(r)) + ")"
        for b in range(_BANDS)
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
docs AS (SELECT doc_id,
                list_distinct(CASE WHEN len(toks) >= {_SHINGLE_N}
                  THEN list_transform(range(1, len(toks) - {_SHINGLE_N - 2}),
                                      i -> array_to_string(toks[i:i+{_SHINGLE_N - 1}], ' '))
                  ELSE []::VARCHAR[] END) AS sh
         FROM t),
nz AS (SELECT * FROM docs WHERE len(sh) > 0),
ex AS (SELECT doc_id, ('0x' || substring(md5(unnest(sh)), 1, 8))::BIGINT AS x FROM nz),
sig AS (SELECT doc_id, {mins} FROM ex GROUP BY doc_id),
bk AS (SELECT doc_id, [{band_exprs}] AS bks FROM sig),
banded AS (SELECT doc_id, unnest(bks) AS band_key FROM bk),
cand AS (
  SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old, 'corpus' AS vs
  FROM banded n JOIN banded o ON n.band_key = o.band_key
  WHERE n.doc_id % 10 = 7 AND o.doc_id % 10 != 7
  UNION ALL
  SELECT DISTINCT n.doc_id AS id_new, o.doc_id AS id_old, 'batch' AS vs
  FROM banded n JOIN banded o ON n.band_key = o.band_key
  WHERE n.doc_id % 10 = 7 AND o.doc_id % 10 = 7 AND o.doc_id < n.doc_id),
j AS (SELECT id_new, id_old, vs,
             len(list_intersect(dn.sh, dd.sh))::DOUBLE
               / len(list_distinct(list_concat(dn.sh, dd.sh))) AS jaccard
      FROM cand JOIN nz dn ON dn.doc_id = id_new JOIN nz dd ON dd.doc_id = id_old)
SELECT id_new, id_old, vs, jaccard FROM j WHERE jaccard >= {_J_THRESHOLD}
"""


# ---------------------------------------------------------------- exact jaccard


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _load_docs(spark, sf_dir), "doc_id", "text", shingle_n=3, threshold=0.5
    )


_SQL_NGRAM_JACCARD = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
docs AS (SELECT doc_id,
                list_distinct(CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
                  ELSE []::VARCHAR[] END) AS sh
         FROM t),
nz AS (SELECT * FROM docs WHERE len(sh) > 0),
p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh)) AS common, len(a.sh) AS na, len(b.sh) AS nb
      FROM nz a JOIN nz b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, common::DOUBLE / (na + nb - common) AS jaccard
FROM p WHERE common > 0 AND common::DOUBLE / (na + nb - common) >= 0.5
"""


# ---------------------------------------------------------------- clusters


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_clusters(_load_docs(spark, sf_dir), "doc_id", "text", shingle_n=3, threshold=0.5)


# min-label propagation as a recursive CTE: labels flow along near-dup edges
# (the `comp < dst` guard prunes non-minimal labels without losing the min —
# every node on the path to the minimum has a larger id), final comp = MIN
_SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
docs AS (SELECT doc_id,
                list_distinct(CASE WHEN len(toks) >= 3
                  THEN list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
                  ELSE []::VARCHAR[] END) AS sh
         FROM t),
nz AS (SELECT * FROM docs WHERE len(sh) > 0),
p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.sh, b.sh)) AS common, len(a.sh) AS na, len(b.sh) AS nb
      FROM nz a JOIN nz b ON a.doc_id < b.doc_id),
pairs AS (SELECT id_a, id_b FROM p
          WHERE common > 0 AND common::DOUBLE / (na + nb - common) >= 0.5),
e AS (SELECT id_a AS s, id_b AS d FROM pairs UNION ALL SELECT id_b, id_a FROM pairs),
lab(id, comp) AS (
    SELECT doc_id, doc_id FROM documents
  UNION
    SELECT e.d, lab.comp FROM lab JOIN e ON e.s = lab.id WHERE lab.comp < e.d
)
SELECT id AS doc_id, MIN(comp) AS cluster_id, id = MIN(comp) AS is_canonical
FROM lab GROUP BY id
"""


# ---------------------------------------------------------------- simhash

_MAX_HAMMING = 6


def _q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_pairs(_load_docs(spark, sf_dir), "doc_id", "text", max_hamming=_MAX_HAMMING)


def _simhash_sql() -> str:
    # 64-bit two-half signature: hex digit j votes two bits — its high bit
    # (pattern 89abcdef) and its second bit (4567cdef); digits 1-16 build hi,
    # 17-32 build lo (mirrors dedup.simhash64_from_hashes exactly)
    def term(j: int, pattern: str, weight: int) -> str:
        return (
            f"CASE WHEN 2 * len(list_filter(hs, x -> strpos('{pattern}', substring(x, {j}, 1)) > 0))"
            f" > len(hs) THEN {weight} ELSE 0 END"
        )

    def half(digits: range) -> str:
        terms = []
        for idx, j in enumerate(digits):
            terms.append(term(j, "89abcdef", 1 << (32 - (2 * idx + 1))))
            terms.append(term(j, "4567cdef", 1 << (32 - (2 * idx + 2))))
        return "\n           + ".join(terms)

    return f"""
WITH h AS (SELECT doc_id, list_transform({_TOKS}, t -> md5(t)) AS hs FROM documents),
sig AS (SELECT doc_id, ({half(range(1, 17))}) AS hi, ({half(range(17, 33))}) AS lo FROM h)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= {_MAX_HAMMING}
"""


# ---------------------------------------------------------------- embeddings

_DOT = (
    "list_sum(list_transform(range(1, 65), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)
_NORM = "sqrt(list_sum(list_transform({a}, x -> x::DOUBLE * x::DOUBLE)))"


def _cos_sql(a: str, b: str) -> str:
    return f"{_DOT.format(a=a, b=b)} / ({_NORM.format(a=a)} * {_NORM.format(a=b)})"


def _q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _load_emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).withColumnRenamed("vec_id", "query_id")
    return similarity.cosine_topk(emb, queries, k=5)


_SQL_EMBEDDING_TOPK = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         {_cos_sql("q.embedding", "c.embedding")} AS cos
  FROM embeddings q JOIN embeddings c ON q.vec_id < 10 AND c.vec_id != q.vec_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5
"""


def _q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (cluster-scoped semantic dedup with representative keep):
    sign-random-projection cells, within-cell cosine >= 0.35 drops the higher
    id; one row per vector with (cell, dropped, dup_of)."""
    return similarity.semdedup(_load_emb(spark, sf_dir), threshold=0.35)


def _semdedup_sql() -> str:
    bits = []
    for p in range(4):
        comp = plane_components(similarity.SEMDEDUP_TABLE, p, 64)
        lits = ", ".join(repr(v) for v in comp)
        bits.append(
            "(CASE WHEN list_sum(list_transform(range(1, 65),"
            f" i -> embedding[i]::DOUBLE * ([{lits}])[i])) > 0 THEN {1 << p} ELSE 0 END)"
        )
    cell = " + ".join(bits)
    return f"""
WITH cells AS (SELECT vec_id, embedding, {cell} AS cell FROM embeddings),
hits AS (SELECT b.vec_id AS idb, min(a.vec_id) AS dup_of
         FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
         WHERE ROUND({_cos_sql("a.embedding", "b.embedding")}, 6) >= 0.35
         GROUP BY b.vec_id)
SELECT c.vec_id AS vec_id, c.cell AS cell, h.dup_of IS NOT NULL AS dropped, h.dup_of AS dup_of
FROM cells c LEFT JOIN hits h ON c.vec_id = h.idb
"""


def _q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained k-means (Lloyd's, 2 iterations from deterministic md5-ordered
    seeds) over the embeddings table, under the hard oracle gate: the SQL twin
    unrolls the identical iterations, so every centroid (3-dp-rounded per-dim
    sums / exact counts) and every assignment (6-dp-rounded squared distance,
    ties to the lower cluster id) must agree bit-for-bit."""
    emb = _load_emb(spark, sf_dir).where(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    cents = clustering.kmeans_fit(emb, k=8, iters=2, dims=64)
    out = clustering.kmeans_assign(emb, cents)
    return out.select("vec_id", F.col("cluster").cast("long").alias("cluster"), "dist")


def _kmeans_dist(cent: str, dims: int) -> str:
    """6-dp squared distance with half-tie nudge + signed-zero normalization
    — the SQL twin of ``clustering._r(_dist2(...), 6)``."""
    rng = f"range(1, {dims + 1})"
    return (
        f"ROUND(list_sum(list_transform({rng},"
        f" i -> (e.v[i] - {cent}[i]) * (e.v[i] - {cent}[i]))) + {NUDGE_6DP!r}, 6) + 0.0"
    )


def _kmeans_ctes(k: int, iters: int, dims: int) -> list[str]:
    """CTE chain shared by the k-means oracle and the trained-IVF oracle:
    ``e`` (clean double vectors), ``c0`` (md5-ordered seeds), then per
    iteration d/a/s/n/c — ends at ``c{iters}``, the trained centroids.
    Same seeds (md5-ordered), same rounding (sums 3 dp, distances 6 dp,
    +2^-33 dyadic half-tie nudge, +0.0 signed-zero normalization), same
    empty-cluster keep-previous rule as ``clustering.kmeans_fit``."""
    rng = f"range(1, {dims + 1})"
    ctes = [
        "e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v"
        " FROM embeddings WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)",
        "c0 AS (SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1"
        f" AS c, v AS cent FROM e ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})",
    ]
    for it in range(iters):
        dist = _kmeans_dist("s.cent", dims)
        ctes += [
            f"d{it} AS (SELECT e.vec_id, s.c, {dist} AS dist FROM e CROSS JOIN c{it} s)",
            f"a{it} AS (SELECT vec_id, c FROM (SELECT *, row_number() OVER"
            f" (PARTITION BY vec_id ORDER BY dist, c) AS rn FROM d{it}) WHERE rn = 1)",
            f"s{it} AS (SELECT a.c, t.i, ROUND(SUM(e.v[t.i]) + {NUDGE_6DP!r}, 3) + 0.0 AS sm,"
            f" COUNT(*) AS n FROM a{it} a JOIN e USING (vec_id) CROSS JOIN {rng} t(i)"
            " GROUP BY a.c, t.i)",
            f"n{it + 1} AS (SELECT c, list(sm / n ORDER BY i) AS cent FROM s{it} GROUP BY c)",
            f"c{it + 1} AS (SELECT p.c, COALESCE(x.cent, p.cent) AS cent"
            f" FROM c{it} p LEFT JOIN n{it + 1} x USING (c))",
        ]
    return ctes


def _kmeans_sql(k: int = 8, iters: int = 2, dims: int = 64) -> str:
    ctes = _kmeans_ctes(k, iters, dims)
    dist = _kmeans_dist("s.cent", dims)
    ctes.append(f"df AS (SELECT e.vec_id, s.c, {dist} AS dist FROM e CROSS JOIN c{iters} s)")
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT vec_id, c AS cluster, dist FROM (SELECT *, row_number() OVER"
        " (PARTITION BY vec_id ORDER BY dist, c) AS rn FROM df) WHERE rn = 1"
    )


_IVF_TRAINED_K, _IVF_TRAINED_ITERS, _IVF_TRAINED_PROBE = 8, 1, 2


def _q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end TRAINED-quantizer ANN — the FAISS IVF recipe: k-means fits
    the coarse quantizer on the corpus itself, then the SAME inverted-file
    machinery (cell assign → probe → exact cosine re-rank) runs with the
    trained centroids in place of the fixed hash-recipe Voronoi cells. Cells
    follow the data distribution so recall rises at equal n_probe; the
    probe/re-rank plan (broadcast queries, map-side corpus, one equi-join on
    cell id) is byte-identical to `ann_ivf_topk`. The oracle replays the
    training in SQL (shared k-means CTE chain) and the unrounded fold-order
    dot-product scores, so cell boundaries and the final top-k must agree
    bit-for-bit."""
    emb = _load_emb(spark, sf_dir).where(
        F.col("vec_id").isNotNull() & F.col("embedding").isNotNull()
    )
    cents = clustering.kmeans_fit(emb, k=_IVF_TRAINED_K, iters=_IVF_TRAINED_ITERS, dims=64)
    queries = emb.where(F.col("vec_id") < 10).withColumnRenamed("vec_id", "query_id")
    return similarity.ivf_ann_topk(
        emb, queries, k=5, n_probe=_IVF_TRAINED_PROBE, dims=64, centroids=cents
    )


def _ivf_trained_sql(
    k: int = _IVF_TRAINED_K, iters: int = _IVF_TRAINED_ITERS, n_probe: int = _IVF_TRAINED_PROBE
) -> str:
    rng = "range(1, 65)"
    # score = v·c − |c|²/2, every sum a sequential fold (list_sum) — matches
    # _fold_dot_matrix / _fold_sq_norm order in the Arrow kernels exactly
    score = (
        f"list_sum(list_transform({rng}, i -> e.v[i] * s.cent[i]))"
        f" - list_sum(list_transform({rng}, i -> s.cent[i] * s.cent[i])) / 2.0"
    )
    ctes = _kmeans_ctes(k, iters, 64)
    ctes += [
        f"sc AS (SELECT e.vec_id, s.c, {score} AS score FROM e CROSS JOIN c{iters} s)",
        "cells AS (SELECT vec_id, c AS cell FROM (SELECT *, row_number() OVER"
        " (PARTITION BY vec_id ORDER BY score DESC, c) AS rn FROM sc) WHERE rn = 1)",
        "probes AS (SELECT vec_id AS query_id, c AS cell FROM (SELECT *, row_number() OVER"
        " (PARTITION BY vec_id ORDER BY score DESC, c) AS rn FROM sc WHERE vec_id < 10)"
        f" WHERE rn <= {n_probe})",
        "scored AS (SELECT p.query_id, ce.vec_id AS neighbor_id,"
        f" {_cos_sql('qe.embedding', 'ne.embedding')} AS cos"
        " FROM probes p JOIN cells ce ON p.cell = ce.cell"
        " JOIN embeddings qe ON qe.vec_id = p.query_id"
        " JOIN embeddings ne ON ne.vec_id = ce.vec_id"
        " WHERE ce.vec_id != p.query_id)",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT query_id, rank, neighbor_id, cos FROM (SELECT *, row_number() OVER"
        " (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank FROM scored)"
        " WHERE rank <= 5"
    )


def _q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.near_dup_pairs(_load_emb(spark, sf_dir), threshold=0.4)


_SQL_EMBEDDING_NEAR_DUPS = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_cos_sql("a.embedding", "b.embedding")}, 6) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND({_cos_sql("a.embedding", "b.embedding")}, 6) >= 0.4
"""

_ANN_TABLES, _ANN_PLANES = 4, 4


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _load_emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).withColumnRenamed("vec_id", "query_id")
    return similarity.lsh_ann_topk(
        emb, queries, k=5, n_tables=_ANN_TABLES, n_planes=_ANN_PLANES, dims=64
    )


def _ann_sql() -> str:
    tables = []
    for t in range(_ANN_TABLES):
        bits = []
        for p in range(_ANN_PLANES):
            plane = ", ".join(repr(v) for v in plane_components(t, p, 64))
            proj = f"list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * ([{plane}])[i]))"
            bits.append(f"CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END")
        tables.append(
            f"SELECT vec_id, embedding, {t} AS tbl, ({' + '.join(bits)}) AS bucket FROM embeddings"
        )
    cb = "\n  UNION ALL\n  ".join(tables)
    return f"""
WITH cb AS (
  {cb}
),
cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         FROM cb q JOIN cb c ON q.tbl = c.tbl AND q.bucket = c.bucket
         WHERE q.vec_id < 10 AND c.vec_id != q.vec_id),
scored AS (SELECT query_id, neighbor_id, {_cos_sql("qe.embedding", "ce.embedding")} AS cos
           FROM cand JOIN embeddings qe ON qe.vec_id = query_id
                     JOIN embeddings ce ON ce.vec_id = neighbor_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5
"""


_IVF_C, _IVF_PROBE = 16, 4


def _q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _load_emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).withColumnRenamed("vec_id", "query_id")
    return similarity.ivf_ann_topk(
        emb, queries, k=5, n_centroids=_IVF_C, n_probe=_IVF_PROBE, dims=64
    )


def _ivf_sql() -> str:
    from chronon_spark.functions.similarity import ivf_centroid_components

    score_exprs = []
    for j in range(_IVF_C):
        comp = ivf_centroid_components(j, 64)
        lits = ", ".join(repr(v) for v in comp)
        half = repr(sum(v * v for v in comp) / 2.0)
        score_exprs.append(
            f"list_sum(list_transform(range(1, 65), i -> embedding[i]::DOUBLE * ([{lits}])[i])) - {half}"
        )
    scores = ",\n    ".join(score_exprs)
    return f"""
WITH base AS (SELECT vec_id, embedding, [{scores}] AS scores FROM embeddings),
cells AS (SELECT vec_id, embedding, scores, list_position(scores, list_max(scores)) AS cell FROM base),
probes AS (
  SELECT vec_id AS query_id, embedding AS qv,
         unnest(list_filter(range(1, {_IVF_C + 1}),
                j -> len(list_filter(range(1, {_IVF_C + 1}),
                         j2 -> scores[j2] > scores[j] OR (scores[j2] = scores[j] AND j2 < j)))
                     < {_IVF_PROBE})) AS cell
  FROM cells WHERE vec_id < 10),
scored AS (SELECT p.query_id, c.vec_id AS neighbor_id, {_cos_sql("p.qv", "c.embedding")} AS cos
           FROM probes p JOIN cells c ON p.cell = c.cell WHERE c.vec_id != p.query_id),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
SELECT query_id, rank, neighbor_id, cos FROM r WHERE rank <= 5
"""


# ---------------------------------------------------------------- multimodal


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing, now with a REAL oracle: the synthetic payload is
    a deterministic digest chain DuckDB can replay (payload hex equality pins
    the exact bytes), and feat[0] is a dyadic rational — mean of the first 8
    digest bytes / 256 — that float32 represents exactly, so the oracle can
    assert one decoded feature value bit-for-bit. Only the decode step is a
    stub; schema/batching/UDF plumbing is fully gated."""
    media = multimodal.synth_media(spark, n=64, kind="image")
    feats = multimodal.extract_image_features(media, resize_to=(8, 8))
    payloads = media.select("media_id", F.lower(F.hex("payload")).alias("payload_hex"))
    return feats.join(payloads, "media_id").select(
        "media_id",
        "out_width",
        "out_height",
        F.size("feat").alias("feat_dim"),
        "payload_hex",
        F.element_at("feat", 1).cast("double").alias("feat0"),
        F.forall("feat", lambda x: (x >= 0) & (x < 1)).alias("feat_in_unit_range"),
    )


_SQL_MEDIA = """
WITH m AS (
  SELECT i AS media_id, sha256('image:' || CAST(i AS VARCHAR)) AS d
  FROM range(0, 64) t(i)
)
SELECT media_id,
       8 AS out_width, 8 AS out_height, 64 AS feat_dim,
       repeat(d, 8) AS payload_hex,
       -- feat[0] = mean of img[0:6, 0:8]; the decode digest (sha256 of the
       -- payload hex) tiles row-major into 48x64, so those cells are digest
       -- bytes 0..7 — a dyadic rational, exact in float32
       list_sum(list_transform(range(0, 8),
                               j -> CAST('0x' || substring(sha256(repeat(d, 8)), 2 * j + 1, 2) AS INT)))
         / 2048.0 AS feat0,
       TRUE AS feat_in_unit_range
FROM m
"""


# ---------------------------------------------------------------- registry

# ---------------------------------------------------------------- sampling

_U60 = float(1 << 60)


def _q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment — pure function of doc_id."""
    from chronon_spark.functions.sampling import deterministic_split

    d = _load_docs(spark, sf_dir)
    return deterministic_split(
        d, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


_SQL_SAMPLE_SPLIT = f"""
WITH u AS (SELECT doc_id,
                  (('0x' || substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)::DOUBLE
                  / {_U60!r} AS u
           FROM documents)
SELECT doc_id,
       CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split
FROM u
"""


def _q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language keep fractions (downsample en, keep all de, half default)."""
    from chronon_spark.functions.sampling import stratified_sample

    d = _load_docs(spark, sf_dir)
    return stratified_sample(
        d, "doc_id", "lang", {"en": 0.25, "de": 1.0}, default_fraction=0.5
    ).select("doc_id", "lang")


_SQL_STRATIFIED = f"""
WITH u AS (SELECT doc_id, lang,
                  (('0x' || substring(md5('strata' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)::DOUBLE
                  / {_U60!r} AS u
           FROM documents)
SELECT doc_id, lang
FROM u
WHERE u < (CASE WHEN lang = 'en' THEN 0.25 WHEN lang = 'de' THEN 1.0 ELSE 0.5 END)
"""


def _q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture of two corpus slices with provenance tags."""
    from chronon_spark.functions.sampling import mix_corpora

    d = _load_docs(spark, sf_dir)
    mixed = mix_corpora(
        {
            "long_docs": (d.where(F.col("n_chars") >= 400), 0.5),
            "short_docs": (d.where(F.col("n_chars") < 400), 0.25),
        },
        "doc_id",
        source_col="mix_source",
    )
    return mixed.select("doc_id", "mix_source")


_SQL_MIXTURE = f"""
WITH long_docs AS (
  SELECT doc_id, 'long_docs' AS mix_source,
         (('0x' || substring(md5('mix:long_docs' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)::DOUBLE
         / {_U60!r} AS u
  FROM documents WHERE n_chars >= 400),
short_docs AS (
  SELECT doc_id, 'short_docs' AS mix_source,
         (('0x' || substring(md5('mix:short_docs' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)::DOUBLE
         / {_U60!r} AS u
  FROM documents WHERE n_chars < 400)
SELECT doc_id, mix_source FROM long_docs WHERE u < 0.5
UNION ALL
SELECT doc_id, mix_source FROM short_docs WHERE u < 0.25
"""


# ---------------------------------------------------------------- chunk/pack


def _q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token windows with overlap (context-window fitting)."""
    from chronon_spark.functions.packing import chunk_documents

    d = _load_docs(spark, sf_dir)
    return chunk_documents(d, "doc_id", "text", chunk_tokens=32, overlap=8)


_SQL_DOC_CHUNKS = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents WHERE length(trim(text)) > 0),
st AS (SELECT doc_id, toks,
              unnest(generate_series(0, GREATEST(CAST(CEIL(len(toks) / 24.0) AS BIGINT) - 1, 0) * 24, 24)) AS s
       FROM t)
SELECT doc_id,
       CAST(s // 24 AS INT)                                  AS chunk_idx,
       array_to_string(toks[s + 1 : s + 32], ' ')            AS chunk_text,
       CAST(len(toks[s + 1 : s + 32]) AS INT)                AS n_tokens
FROM st
"""


def _q_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-split token-stream packing into 256-token bins."""
    from chronon_spark.functions.packing import pack_token_stream

    d = _load_docs(spark, sf_dir)
    sized = d.select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_toks"))
    return pack_token_stream(sized, "doc_id", "n_toks", budget=256)


_SQL_PACK_BINS = f"""
WITH t AS (SELECT doc_id, len({_TOKS}) AS n_toks FROM documents),
c AS (SELECT doc_id, n_toks,
             COALESCE(SUM(n_toks) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ce
      FROM t)
SELECT doc_id, CAST(n_toks AS INT) AS n_tokens,
       CAST(ce // 256 AS BIGINT) AS bin_idx,
       CAST(ce % 256 AS BIGINT)  AS bin_offset,
       (ce % 256) + n_toks > 256 AS spans_bins
FROM c
"""


# ---------------------------------------------------------------- quality filter


def _q_quality_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation: keep the top-5 documents per detected language by quality
    score (deterministic rank tie-break on doc_id). One window shuffle keyed
    by language — the standard 'best docs per stratum' selection."""
    from chronon_spark.functions.ranking import topk_per_group

    d = _load_docs(spark, sf_dir)
    scored = d.select(
        "doc_id",
        text.lang_id("text").alias("lang"),
        (F.round(text.quality_score("text") + F.lit(NUDGE_6DP), 6) + F.lit(0.0)).alias("quality"),
    )
    # two-phase salted top-k: a bare per-lang window would single-task each
    # language's sort at corpus scale (see functions/ranking.py)
    out = topk_per_group(
        scored, ["lang"], [F.desc("quality"), F.asc("doc_id")], "doc_id", k=5
    )
    return out.select("doc_id", "lang", "quality", "rank")


_SQL_QUALITY_TOPK = f"""
WITH d AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, text, toks,
             {_lex_sql("de")} AS s_de, {_lex_sql("en")} AS s_en, {_lex_sql("es")} AS s_es,
             len(list_distinct(toks))::DOUBLE / len(toks) AS uniq,
             length(regexp_replace(text, '[\\w ]', '', 'g'))::DOUBLE / length(text) AS punct
      FROM d),
scored AS (SELECT doc_id,
       CASE WHEN greatest(s_de, s_en, s_es) <= 0 THEN 'und'
            WHEN s_de >= s_en AND s_de >= s_es THEN 'de'
            WHEN s_en >= s_es THEN 'en'
            ELSE 'es' END AS lang,
       ROUND(CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END
        + least(uniq, 0.5) * 0.6
        + CASE WHEN punct < 0.1 THEN 0.2 ELSE 0.0 END + {NUDGE_6DP!r}, 6) + 0.0 AS quality
FROM s),
ranked AS (SELECT doc_id, lang, quality,
                  CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY quality DESC, doc_id ASC) AS INT) AS rank
           FROM scored)
SELECT doc_id, lang, quality, rank FROM ranked WHERE rank <= 5
"""


# ---------------------------------------------------------------- winnowing


def _q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints per document (k=8 char-grams, window w=4):
    doc_id, fingerprint count, and the sorted fingerprint set serialized
    with '|' (driver-canonicalizable). The fingerprint set is the substring-
    level dedup index: two docs sharing any >=11-char normalized substring
    share a fingerprint, so candidate pairs come from a plain equi-join on
    fp — no all-pairs comparison at any scale."""
    d = _load_docs(spark, sf_dir)
    out = d.select(
        "doc_id", text.winnow_fingerprints("text", k=8, w=4).alias("fps_arr")
    ).where(F.size("fps_arr") > 0)
    return out.select(
        "doc_id",
        F.size("fps_arr").alias("n_fps"),
        F.array_join(F.array_sort("fps_arr"), "|").alias("fps"),
    )


_SQL_DOC_FINGERPRINTS = """
WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
           FROM documents),
g AS (SELECT doc_id,
             list_transform(range(1, length(norm) - 8 + 2),
                            i -> substring(md5(substring(norm, i::INT, 8)), 1, 16)) AS hs
      FROM d WHERE length(norm) >= 8),
f AS (SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(1, len(hs) - 4 + 1) + 1),
                                          j -> list_min(hs[j::INT : j::INT + 3]))) AS fps
      FROM g)
SELECT doc_id, len(fps)::INT AS n_fps, array_to_string(list_sort(fps), '|') AS fps
FROM f WHERE len(fps) > 0
"""


def _q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level near-dup pairs: winnowing-fingerprint inverted index
    (one shuffle keyed by fingerprint), containment >= 0.5.

    ``max_df=20`` is NOT optional here: char 8-gram fingerprints hit common
    English substrings, so posting lengths grow with corpus size and an
    unpruned index degenerates quadratically (measured 178 s at sf0.1 vs
    ~10 s pruned). Candidates come from bounded postings only; scores are
    re-computed EXACTLY over the full fingerprint sets via the join-back,
    so emitted values are identical to the exact path's for every surviving
    pair — the oracle mirrors the same prune."""
    d = _load_docs(spark, sf_dir)
    return dedup.winnow_overlap_pairs(
        d, "doc_id", "text", k=8, w=4, threshold=0.5, max_df=20
    )


_SQL_WINNOW_OVERLAP = """
WITH d AS (SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
           FROM documents),
g AS (SELECT doc_id,
             list_transform(range(1, length(norm) - 8 + 2),
                            i -> substring(md5(substring(norm, i::INT, 8)), 1, 16)) AS hs
      FROM d WHERE length(norm) >= 8),
f AS (SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(1, len(hs) - 4 + 1) + 1),
                                          j -> list_min(hs[j::INT : j::INT + 3]))) AS fps
      FROM g WHERE len(hs) > 0),
ex AS (SELECT doc_id, unnest(fps) AS fp FROM f),
pf AS (SELECT fp, count(*) AS c FROM ex GROUP BY fp),
exp AS (SELECT ex.doc_id, ex.fp FROM ex JOIN pf USING (fp) WHERE pf.c BETWEEN 2 AND 20),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM exp a JOIN exp b ON a.fp = b.fp AND a.doc_id < b.doc_id)
SELECT id_a, id_b,
       len(list_intersect(fa.fps, fb.fps))::BIGINT AS common,
       len(list_intersect(fa.fps, fb.fps))::DOUBLE / least(len(fa.fps), len(fb.fps)) AS containment
FROM cand JOIN f fa ON fa.doc_id = id_a JOIN f fb ON fb.doc_id = id_b
WHERE len(list_intersect(fa.fps, fb.fps))::DOUBLE / least(len(fa.fps), len(fb.fps)) >= 0.5
"""


# ---------------------------------------------------------------- tf-idf


def _q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (score = tf * ln(N/df), rounded to 6
    decimals; ties broken by term asc).

    Scale shape: explode -> groupBy(doc,term) with map-side partial count
    (one shuffle), vocabulary df as a second partial agg, tf x df equi-join
    on term left to AQE (vocab may exceed broadcast at corpus scale), and a
    plain per-doc window for the top-k — doc_id groups are numerous and
    tiny, so window skew (the reason quality_topk uses the salted two-phase
    form) does not apply here."""
    from pyspark.sql.window import Window

    d = _load_docs(spark, sf_dir)
    toks = d.select("doc_id", F.explode(text.tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("score"),
        )
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .where(F.col("rnk") <= 3)
        .select("doc_id", "term", "rnk", "score")
    )


_SQL_TFIDF_TOPK = f"""
WITH toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
s AS (SELECT doc_id, term, round(tf * ln(n_docs::DOUBLE / df), 6) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n),
r AS (SELECT doc_id, term, score,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INT) AS rnk
      FROM s)
SELECT doc_id, term, rnk, score FROM r WHERE rnk <= 3
"""


# ---------------------------------------------------------------- decontamination


def _q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination report: every document scored against an
    'eval set' (the doc_id % 20 == 0 slice — deterministic stand-in for a
    held-out benchmark) on distinct 8-gram overlap. Bench docs flag
    themselves (hit_frac 1.0); cross-hits surface shared boilerplate.

    Scale shape: benchmark hash set broadcast, train side streams map-side
    through the broadcast join; only matched shingles shuffle (see
    functions/decontaminate.py docstring)."""
    from chronon_spark.functions.decontaminate import contamination

    d = _load_docs(spark, sf_dir)
    bench = d.where(F.col("doc_id") % 20 == 0)
    out = contamination(d, bench, shingle_n=8, min_hits=1)
    return out.withColumn("n_ngrams", F.col("n_ngrams").cast("long"))


_SQL_DECONTAMINATE = f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
sh AS (SELECT doc_id,
              list_distinct(CASE WHEN len(toks) >= 8
                THEN list_transform(range(1, len(toks) - 6),
                                    i -> md5(array_to_string(toks[i:i+7], ' ')))
                ELSE []::VARCHAR[] END) AS hs
       FROM t),
bench AS (SELECT DISTINCT unnest(hs) AS h FROM sh WHERE doc_id % 20 = 0),
hits AS (SELECT s.doc_id, count(*) AS n_hit
         FROM (SELECT doc_id, unnest(hs) AS h FROM sh) s JOIN bench USING (h)
         GROUP BY s.doc_id)
SELECT sh.doc_id AS doc_id,
       len(sh.hs)::BIGINT AS n_ngrams,
       COALESCE(hits.n_hit, 0)::BIGINT AS n_hit,
       CASE WHEN len(sh.hs) > 0
            THEN COALESCE(hits.n_hit, 0)::DOUBLE / len(sh.hs) ELSE 0.0 END AS hit_frac,
       CASE WHEN COALESCE(hits.n_hit, 0) >= 1 THEN 1 ELSE 0 END AS contaminated
FROM sh LEFT JOIN hits USING (doc_id)
"""


# ---------------------------------------------------------------- pii scrub


def _pii_fixture_expr(cast_type: str) -> str:
    """Deterministic PII-bearing text derived from doc_id — the synthetic
    documents table contains no real PII, so both engines append the same
    synthetic emails / IPs / SSNs / phones / card numbers / URLs before the
    scrub runs. Identical SQL in both dialects except the cast target
    (STRING vs VARCHAR)."""

    def c(e: str) -> str:
        return f"CAST({e} AS {cast_type})"

    email = f"' mail user' || {c('doc_id % 97')} || '@ex' || {c('doc_id % 7')} || '.org'"
    ipv4 = (
        f"' ip ' || {c('doc_id % 223 + 1')} || '.' || {c('(doc_id * 7) % 256')}"
        f" || '.0.' || {c('(doc_id * 13) % 256')}"
    )
    ssn = (
        f"' ssn ' || lpad({c('doc_id % 1000')}, 3, '0') || '-' || "
        f"lpad({c('doc_id % 100')}, 2, '0') || '-' || lpad({c('doc_id % 10000')}, 4, '0')"
    )
    phone = (
        f"' tel ' || lpad({c('(doc_id * 3) % 1000')}, 3, '0') || '-' || "
        f"lpad({c('(doc_id * 5) % 1000')}, 3, '0') || '-' || lpad({c('doc_id % 10000')}, 4, '0')"
    )
    # bound the Knuth-hash multiplicand: doc_id * 2654435761 overflows int64
    # once ids pass ~3.5e9 (Spark ANSI raises where DuckDB silently promotes
    # to HUGEINT — caught by the upsampled sf1.0 sweep). ids < 1e6 (every
    # driver sf) produce bit-identical output to the unbounded form.
    cc = f"' card 4' || lpad({c('((doc_id % 1000000) * 2654435761) % 1000000000000000')}, 15, '0')"
    url = f"' see https://site' || {c('doc_id % 11')} || '.example.org/p/' || {c('doc_id')}"
    parts = [
        ("doc_id % 3 = 0", email),
        ("doc_id % 4 = 0", ipv4),
        ("doc_id % 5 = 0", ssn),
        ("doc_id % 6 = 1", phone),
        ("doc_id % 7 = 2", cc),
        ("doc_id % 2 = 0", url),
    ]
    cases = " || ".join(f"CASE WHEN {cond} THEN {frag} ELSE '' END" for cond, frag in parts)
    return f"trim(text) || {cases}"


def _q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII counts + redacted text. One codegen projection —
    no shuffle at any scale; the redacted string is compared byte-for-byte
    against the oracle's RE2 replay of the same detector chain."""
    from chronon_spark.functions import pii

    d = _load_docs(spark, sf_dir)
    p = d.select("doc_id", F.expr(_pii_fixture_expr("STRING")).alias("ptext"))
    return p.select(
        "doc_id",
        *pii.pii_counts("ptext"),
        pii.redact_pii("ptext").alias("redacted"),
    )


def _pii_scrub_sql() -> str:
    from chronon_spark.functions import pii

    counts = ",\n       ".join(pii.pii_counts_sql("ptext"))
    return f"""
WITH p AS (SELECT doc_id, {_pii_fixture_expr("VARCHAR")} AS ptext FROM documents)
SELECT doc_id,
       {counts},
       {pii.redact_pii_sql("ptext")} AS redacted
FROM p
"""


def _q_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain URL rollup (the C4-style pre-blocklist frequency table).
    Scale shape: extract+explode are map-side; the only shuffle is the
    groupBy on domain (low cardinality vs docs), with map-side partial
    aggregation — the classic word-count plan."""
    from chronon_spark.functions import pii

    d = _load_docs(spark, sf_dir)
    p = d.select("doc_id", F.expr(_pii_fixture_expr("STRING")).alias("ptext"))
    urls = p.select("doc_id", F.explode(pii.extract_domains("ptext")).alias("domain"))
    return urls.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def _url_domains_sql() -> str:
    from chronon_spark.functions.pii import URL_PATTERN

    return f"""
WITH p AS (SELECT doc_id, {_pii_fixture_expr("VARCHAR")} AS ptext FROM documents),
u AS (SELECT doc_id, unnest(regexp_extract_all(ptext, '{URL_PATTERN}', 1)) AS domain FROM p)
SELECT domain, COUNT(*) AS n_urls, COUNT(DISTINCT doc_id) AS n_docs FROM u GROUP BY domain
"""


# ---------------------------------------------------------------- curation


def _q_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED training-data pipeline (jobs/curate.py) under the hard
    oracle gate: exact dedup -> lang/quality gate -> 8-gram decontamination
    vs the eval slice -> deterministic split, as ONE query whose oracle
    replays all four stages in sequence."""
    from chronon_spark.jobs.curate import curate

    d = _load_docs(spark, sf_dir)
    bench = d.where(F.col("doc_id") % 20 == 0)
    return curate(d, bench, min_quality=0.6)


_SQL_CURATE = f"""
WITH fp AS (SELECT doc_id, text,
                   md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f
            FROM documents),
keep AS (SELECT doc_id, text
         FROM (SELECT *, min(doc_id) OVER (PARTITION BY f) AS k FROM fp)
         WHERE doc_id = k),
d AS (SELECT doc_id, text, {_TOKS} AS toks FROM keep),
s AS (SELECT doc_id, toks,
             {_lex_sql("de")} AS s_de, {_lex_sql("en")} AS s_en, {_lex_sql("es")} AS s_es,
             len(list_distinct(toks))::DOUBLE / len(toks) AS uniq,
             length(regexp_replace(text, '[\\w ]', '', 'g'))::DOUBLE / length(text) AS punct
      FROM d),
q AS (SELECT doc_id, toks,
             CASE WHEN greatest(s_de, s_en, s_es) <= 0 THEN 'und'
                  WHEN s_de >= s_en AND s_de >= s_es THEN 'de'
                  WHEN s_en >= s_es THEN 'en'
                  ELSE 'es' END AS lang,
             (CASE WHEN len(toks) BETWEEN 10 AND 1000 THEN 0.4 ELSE 0.0 END
              + least(uniq, 0.5) * 0.6
              + CASE WHEN punct < 0.1 THEN 0.2 ELSE 0.0 END) AS quality,
             len(toks)::BIGINT AS n_tokens
      FROM s),
g AS (SELECT * FROM q WHERE quality >= 0.6),
braw AS (SELECT doc_id, {_TOKS} AS toks FROM documents WHERE doc_id % 20 = 0),
bench AS (SELECT DISTINCT unnest(CASE WHEN len(toks) >= 8
            THEN list_transform(range(1, len(toks) - 6),
                                i -> md5(array_to_string(toks[i:i+7], ' ')))
            ELSE []::VARCHAR[] END) AS h
          FROM braw),
gsh AS (SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 8
          THEN list_transform(range(1, len(toks) - 6),
                              i -> md5(array_to_string(toks[i:i+7], ' ')))
          ELSE []::VARCHAR[] END)) AS h
        FROM g),
hit AS (SELECT DISTINCT gsh.doc_id FROM gsh JOIN bench USING (h)),
clean AS (SELECT g.* FROM g WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
u AS (SELECT *,
             (('0x' || substring(md5('split' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)::DOUBLE
             / {_U60!r} AS uu
      FROM clean)
SELECT doc_id, lang, quality, n_tokens,
       CASE WHEN uu < 0.8 THEN 'train' WHEN uu < 0.9 THEN 'val' ELSE 'test' END AS split
FROM u
"""


# ---------------------------------------------------------------- DSIR


_DSIR_B = 1024


def _q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) of every document toward the
    English slice of the corpus: hashed unigram+bigram multinomials fit on
    target (lang='en') and raw (all docs), per-doc log-likelihood ratio.
    Both model fits, the n_buckets-row broadcast join and the per-doc sum are
    verified value-for-value by the oracle (md5 bucketing is portable)."""
    from chronon_spark.functions.dsir import dsir_log_weights

    d = _load_docs(spark, sf_dir)
    return dsir_log_weights(d, d.where(F.col("lang") == "en"), "doc_id", "text", _DSIR_B)


_SQL_DSIR_WEIGHTS = f"""
WITH w AS (SELECT doc_id, lang, {_TOKS} AS ws FROM documents),
f AS (SELECT doc_id, lang,
             unnest(list_concat(
               list_transform(ws, t -> ('0x' || substring(md5(t), 1, 15))::BIGINT % {_DSIR_B}),
               [('0x' || substring(md5(ws[i] || ' ' || ws[i+1]), 1, 15))::BIGINT % {_DSIR_B}
                for i in generate_series(1, len(ws) - 1)]
             )) AS b
      FROM w),
tf AS (SELECT doc_id, lang, b, count(*) AS c FROM f GROUP BY 1, 2, 3),
qcnt AS (SELECT b, sum(c)::BIGINT AS n FROM tf GROUP BY b),
qtot AS (SELECT coalesce(sum(n), 0) + {_DSIR_B} AS t FROM qcnt),
pcnt AS (SELECT b, sum(c)::BIGINT AS n FROM tf WHERE lang = 'en' GROUP BY b),
ptot AS (SELECT coalesce(sum(n), 0) + {_DSIR_B} AS t FROM pcnt),
buckets AS (SELECT range AS b FROM range({_DSIR_B})),
model AS (SELECT bk.b,
                 ln((coalesce(p.n, 0) + 1)::DOUBLE / ptot.t) AS lp,
                 ln((coalesce(q.n, 0) + 1)::DOUBLE / qtot.t) AS lq
          FROM buckets bk
          LEFT JOIN pcnt p ON bk.b = p.b
          LEFT JOIN qcnt q ON bk.b = q.b
          CROSS JOIN ptot CROSS JOIN qtot),
doc AS (SELECT tf.doc_id, sum(c)::BIGINT AS n_feats, sum(c * (lp - lq)) AS lw
        FROM tf JOIN model ON tf.b = model.b GROUP BY 1)
SELECT doc_id, n_feats, ROUND(lw + {NUDGE_6DP!r}, 6) + 0.0 AS log_weight FROM doc
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dsir_weights": _q_dsir_weights,
    "pii_scrub": _q_pii_scrub,
    "url_domains": _q_url_domains,
    "decontaminate": _q_decontaminate,
    "quality_topk_per_lang": _q_quality_topk,
    "doc_chunks": _q_doc_chunks,
    "pack_bins": _q_pack_bins,
    "sample_split": _q_sample_split,
    "stratified_lang_sample": _q_stratified_sample,
    "corpus_mixture": _q_corpus_mixture,
    "doc_stats": _q_doc_stats,
    "repetition_quality": _q_repetition,
    "lang_quality": _q_lang_quality,
    "unigram_logppl": _q_unigram_logppl,
    "dedup_exact": _q_dedup_exact,
    "stream_dedup_exact": _q_stream_dedup,
    "segment_dedup": _q_segment_dedup,
    "segment_dedup_rewrite": _q_segment_rewrite,
    "curate_corpus": _q_curate_corpus,
    "dedup_minhash_lsh": _q_dedup_minhash,
    "dedup_incremental": _q_dedup_incremental,
    "dedup_ngram_jaccard": _q_ngram_jaccard,
    "dedup_clusters": _q_dedup_clusters,
    "dedup_simhash": _q_simhash_pairs,
    "embedding_topk": _q_embedding_topk,
    "embedding_clusters": _q_embedding_clusters,
    "ann_ivf_trained": _q_ann_ivf_trained,
    "semdedup": _q_semdedup,
    "embedding_near_dups": _q_embedding_near_dups,
    "ann_lsh_topk": _q_ann_topk,
    "ann_ivf_topk": _q_ivf_topk,
    "media_features": _q_media_features,
    "doc_fingerprints": _q_doc_fingerprints,
    "dedup_winnow_overlap": _q_winnow_overlap,
    "tfidf_topk": _q_tfidf_topk,
}

ORACLES: dict[str, str] = {
    "dsir_weights": _SQL_DSIR_WEIGHTS,
    "pii_scrub": _pii_scrub_sql(),
    "url_domains": _url_domains_sql(),
    "decontaminate": _SQL_DECONTAMINATE,
    "quality_topk_per_lang": _SQL_QUALITY_TOPK,
    "doc_chunks": _SQL_DOC_CHUNKS,
    "pack_bins": _SQL_PACK_BINS,
    "sample_split": _SQL_SAMPLE_SPLIT,
    "stratified_lang_sample": _SQL_STRATIFIED,
    "corpus_mixture": _SQL_MIXTURE,
    "doc_stats": _SQL_DOC_STATS,
    "repetition_quality": _SQL_REPETITION,
    "lang_quality": _SQL_LANG_QUALITY,
    "unigram_logppl": _SQL_UNIGRAM_LOGPPL,
    "dedup_exact": _SQL_DEDUP_EXACT,
    "stream_dedup_exact": _SQL_STREAM_DEDUP,
    "segment_dedup": _SQL_SEGMENT_DEDUP,
    "segment_dedup_rewrite": _SQL_SEGMENT_REWRITE,
    "curate_corpus": _SQL_CURATE,
    "dedup_minhash_lsh": _minhash_sql(),
    "dedup_incremental": _incremental_sql(),
    "dedup_ngram_jaccard": _SQL_NGRAM_JACCARD,
    "dedup_clusters": _SQL_DEDUP_CLUSTERS,
    "dedup_simhash": _simhash_sql(),
    "embedding_topk": _SQL_EMBEDDING_TOPK,
    "embedding_clusters": _kmeans_sql(),
    "ann_ivf_trained": _ivf_trained_sql(),
    "semdedup": _semdedup_sql(),
    "embedding_near_dups": _SQL_EMBEDDING_NEAR_DUPS,
    "ann_lsh_topk": _ann_sql(),
    "ann_ivf_topk": _ivf_sql(),
    "media_features": _SQL_MEDIA,
    "doc_fingerprints": _SQL_DOC_FINGERPRINTS,
    "dedup_winnow_overlap": _SQL_WINNOW_OVERLAP,
    "tfidf_topk": _SQL_TFIDF_TOPK,
}
