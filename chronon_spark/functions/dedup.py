"""Deduplication operators for web-scale corpus curation.

Five strategies, all shuffle-architected for 100 TB:

- **exact**: hash-groupBy on a 128-bit fingerprint — one shuffle keyed by the
  digest (never by the raw text, so shuffle payload is 32 bytes/row).
- **MinHash + LSH**: per-row signature (NO shuffle — `array_min` over
  `transform`, pure codegen) → band keys → explode → self-join on band →
  exact-Jaccard verify on the candidates only. The self-join is the only
  shuffle and it is keyed by band digest, which spreads uniformly.
- **SimHash**: per-row 32-bit signature from md5 bit votes → candidates via
  banded byte match → Hamming-distance verify (`bit_count(xor)`).
- **n-gram Jaccard (exact)**: inverted-index self-join on shingles with a
  common-shingle count, avoiding the O(N²) cross join entirely.
- **embedding cosine**: see similarity.py (`near_dup_pairs`).

Determinism contract: every hash is md5 over explicit strings, so the DuckDB
oracle reproduces identical signatures, bands and candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from chronon_spark.functions.text import (
    fingerprint,
    tokens,
    winnow_fingerprints,
    word_shingles,
)

# session-id -> persisted scratch frames, oldest first (see persist_reused)
_PERSISTED_REGISTRY: dict[str, list] = {}
_PERSIST_KEEP = 8


def persist_reused(df: DataFrame, what: str) -> DataFrame:
    """Persist a frame that multiple join branches re-derive (the winnow
    join-back's fingerprint arrays, the minhash band self-join's signatures):
    MEMORY_AND_DISK + an eager count() so the expensive map work materializes
    exactly ONCE, then every branch scans the cache. The count doubles as the
    size log the operator emits (bounded metadata — one scalar).

    Gated by ``spark.chronon.persistReusedFrames`` (default on). The lazy
    double-compute alternative runs duplicate branches in parallel and can win
    on an idle host with spare cores — measured both ways at sf0.1; on a
    CPU-saturated cluster (the 100 TB regime) one-scan always wins."""
    spark = df.sparkSession
    if str(spark.conf.get("spark.chronon.persistReusedFrames", "true")).lower() != "true":
        return df
    from pyspark import StorageLevel

    import sys

    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    n = out.count()
    # stderr: stdout is reserved for the one-line JSON contract of
    # bench.py / backfill.py drivers
    print(f'{{"persisted": "{what}", "rows": {n}}}', file=sys.stderr)
    # bounded registry: these caches are single-query scratch; nothing
    # unpersists them otherwise, and a long-lived session (repeated bench
    # runs, a resident pipeline driver) would pin memory/disk without bound.
    # Evicting the oldest beyond a small window is safe — persist is
    # advisory, an evicted frame silently recomputes.
    reg = _PERSISTED_REGISTRY.setdefault(spark.sparkContext.applicationId, [])
    reg.append(out)
    while len(reg) > _PERSIST_KEEP:
        reg.pop(0).unpersist(blocking=False)
    return out


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the session's default parallelism when the input
    arrives in fewer partitions — a small corpus parquet reads as 1-2 splits
    and would otherwise run every map-side kernel (shingling, signatures) on
    one task. At real scale inputs already carry ≥ cores partitions and this
    is a no-op (no exchange inserted)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per distinct normalized text: representative id (min), dup count.
    Shuffle key = md5 digest, 32 bytes/row — the raw text never shuffles."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


# ---------------------------------------------------------------- segments


def segment_hashes(text_col: Column | str, n: int = 8) -> Column:
    """md5 of each NON-OVERLAPPING ``n``-token segment — the unit of
    CCNet/RefinedWeb-style sub-document (line-level) dedup, degraded to fixed
    windows for punctuation-free text. ``array<string>``; < n tokens => empty.

    Let-bound through ``transform(array(tokens), t -> ...)[0]`` so the
    whitespace split runs once per row, not once per segment (the
    CollapseProject re-inlining trap documented on ``word_shingles``)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.transform(
        F.array(tokens(c)),
        # guard: sequence(0, -1) DESCENDS in Spark, so < n tokens must
        # short-circuit to an empty array, not a bogus [0, -1] index list
        lambda t: F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.floor(F.size(t) / n).cast("int") - 1),
                lambda i: F.md5(F.array_join(F.slice(t, i * n + 1, n), " ")),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )[0]


def segment_dedup(
    df: DataFrame, id_col: str, text_col: str, n: int = 8, min_docs: int = 2
) -> DataFrame:
    """Per-document duplicated-segment stats: a segment is boilerplate when it
    appears in >= ``min_docs`` DISTINCT documents. Returns one row per doc:
    (id, n_segments, n_dup, dup_frac — NULL for docs shorter than a segment).

    100 TB shape: segments shuffle as 32-byte md5 keys (inverted index, the
    decontaminate pattern); the duplicated-hash set joins back broadcast-or-
    shuffle per AQE. Never doc x doc. Three branches read the segment frame
    (dup set, per-doc totals, per-doc dup counts), so it goes through
    persist_reused: ONE corpus scan + explode, branches scan the cache."""
    segs = persist_reused(
        df.select(F.col(id_col), F.explode(segment_hashes(text_col, n)).alias("__h")),
        "segment_hashes",
    )
    dup = (
        segs.groupBy("__h")
        .agg(F.count_distinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__h")
    )
    per_doc = segs.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_segments"))
    dups = segs.join(dup, on="__h").groupBy(id_col).agg(F.count(F.lit(1)).alias("__ndup"))
    out = (
        df.select(id_col)
        .join(per_doc, on=id_col, how="left")
        .join(dups, on=id_col, how="left")
    )
    n_seg = F.coalesce(F.col("n_segments"), F.lit(0))
    n_dup = F.coalesce(F.col("__ndup"), F.lit(0))
    return out.select(
        F.col(id_col),
        n_seg.alias("n_segments"),
        n_dup.alias("n_dup"),
        F.when(n_seg > 0, n_dup.cast("double") / n_seg).alias("dup_frac"),
    )


def _segment_parts(c: Column, n: int) -> Column:
    """struct(segs: array<struct<idx,h,seg>>, tail: string) for one document:
    the indexed n-token segments (hash + re-joined text) plus the <n-token
    remainder. Let-bound through transform(array(tokens), ...) so the
    whitespace split evaluates once per row (the CollapseProject re-inlining
    trap documented on ``word_shingles``)."""

    def body(t: Column) -> Column:
        nseg = F.floor(F.size(t) / n).cast("int")
        seg_txts = F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), nseg - 1),
                lambda i: F.array_join(F.slice(t, i * n + 1, F.lit(n)), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))
        segs = F.transform(
            seg_txts,
            lambda x, i: F.struct(i.alias("idx"), F.md5(x).alias("h"), x.alias("seg")),
        )
        rest = F.size(t) - nseg * n
        tail = F.when(
            rest > 0, F.array_join(F.slice(t, nseg * n + 1, rest), " ")
        ).otherwise(F.lit(""))
        return F.struct(segs.alias("segs"), tail.alias("tail"))

    return F.transform(F.array(tokens(c)), lambda t: body(t))[0]


def segment_dedup_rewrite(
    df: DataFrame, id_col: str, text_col: str, n: int = 8, min_docs: int = 2
) -> DataFrame:
    """CCNet/RefinedWeb sub-document dedup as a TRANSFORM, not just a score:
    every n-token segment that appears in >= ``min_docs`` DISTINCT documents
    is REMOVED and the surviving text re-assembled (kept segments in order,
    then the <n-token remainder). Whitespace normalizes to single spaces —
    the standard consequence of token-level rewriting. Returns one row per
    doc: (id, n_segments, n_dropped, cleaned_text).

    100 TB shape: same inverted index as ``segment_dedup`` — segments
    shuffle as 32-byte md5 keys, never doc x doc; the duplicated-hash set is
    data-sized-small and joins back broadcast-or-shuffle per AQE;
    re-assembly is one groupBy(id) whose state is the document's own segment
    list (bounded by doc length). The segment frame feeds two branches (dup
    set + join back), so it goes through persist_reused: one scan."""
    parts = _segment_parts(F.col(text_col) if isinstance(text_col, str) else text_col, n)
    base = df.select(F.col(id_col), parts.alias("__p"))
    ex = persist_reused(
        base.select(
            id_col,
            F.col("__p.tail").alias("__tail"),
            F.explode_outer("__p.segs").alias("__s"),
        ),
        "segment_rewrite",
    )
    dup = (
        ex.where(F.col("__s").isNotNull())
        .groupBy(F.col("__s.h").alias("__h"))
        .agg(F.count_distinct(id_col).alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__h")
    )
    j = ex.join(dup, ex["__s.h"] == dup["__h"], "left")
    kept_struct = F.when(
        F.col("__h").isNull() & F.col("__s").isNotNull(),
        F.struct(F.col("__s.idx").alias("idx"), F.col("__s.seg").alias("seg")),
    )
    agg = j.groupBy(id_col).agg(
        F.first("__tail").alias("__tail"),
        F.count("__s").alias("n_segments"),
        F.count("__h").alias("n_dropped"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(kept_struct)), lambda s: s["seg"]), " "
        ).alias("__kept"),
    )
    cleaned = (
        F.when(F.col("__kept") == "", F.col("__tail"))
        .when(F.col("__tail") == "", F.col("__kept"))
        .otherwise(F.concat(F.col("__kept"), F.lit(" "), F.col("__tail")))
    )
    return agg.select(
        F.col(id_col),
        F.col("n_segments").cast("long").alias("n_segments"),
        F.col("n_dropped").cast("long").alias("n_dropped"),
        cleaned.alias("cleaned_text"),
    )


# ---------------------------------------------------------------- minhash


def minhash_from_shingles(shingles: Column, num_hashes: int = 16) -> Column:
    """MinHash signature (array<long>) — expression twin of the production
    Arrow kernel (`vec_kernels.minhash_sig_arrow`), same affine family:
    base x = first 4 bytes of md5(shingle), element i = min over shingles of
    `(a_i * x + b_i) mod 2^32` with the shared `minhash_params` constants.

    Shape note: a transform over hash indices with an inner
    `transform(shingles, ...)` would reference — and therefore re-evaluate —
    the shingle expression once per hash function. This single fold over the
    shingles (inner loop over hash indices, elementwise min merge) evaluates
    `shingles` exactly once however it was constructed. The md5-per-shingle
    is still re-inlined across the `num_hashes` inner elements (HOF lambdas
    inline child expressions) — acceptable for this test/reference twin; the
    kernel hashes once.
    """
    from chronon_spark.functions.vec_kernels import minhash_params

    a_c, b_c = minhash_params(num_hashes)
    init = F.array_repeat(F.lit(None).cast("long"), num_hashes)
    mod = F.lit(1 << 32).cast("long")

    def per_shingle(s):
        x = F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
        return F.array(*[((F.lit(a_c[i]) * x + F.lit(b_c[i])) % mod) for i in range(num_hashes)])

    return F.aggregate(
        shingles,
        init,
        lambda acc, s: F.zip_with(acc, per_shingle(s), lambda a, h: F.least(a, h)),
    )


def minhash_signature(text_col: str | Column, num_hashes: int = 16, shingle_n: int = 3) -> Column:
    """One-shot signature column (fine for few hashes; pipelines should stage
    `word_shingles` → `minhash_from_shingles` as separate projections)."""
    return minhash_from_shingles(word_shingles(text_col, n=shingle_n, distinct=True), num_hashes)


def lsh_band_keys(sig_col: Column, bands: int, rows_per_band: int) -> Column:
    """Collapse each band of the signature to one md5 key. Docs sharing ANY
    band key are candidate duplicates (standard banding amplification)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat_ws(
                "|",
                F.transform(F.slice(sig_col, b * rows_per_band + 1, rows_per_band), lambda v: v.cast("string")),
            )
        ),
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard over two (distinct-element) arrays."""
    return F.size(F.array_intersect(a, b)).cast("double") / F.size(F.array_union(a, b))


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidate generation + exact-Jaccard verification.

    Scale shape: signature/bands are per-row codegen; `explode(bands)` makes
    `bands` rows/doc; the self-equi-join on (band_idx, band_key) is the single
    shuffle and Spark picks SMJ/shuffled-hash under AQE. Verification runs
    only on candidates (≪ N²). Shingle arrays ride along the join — for
    10^9-doc corpora swap them for a second join back to the docs table.
    """
    rows_per_band = num_hashes // bands
    # Signature in one map-side Arrow kernel (vec_kernels.minhash_sig_arrow):
    # shingling stays Spark-side, the 16 salted md5-minima run in hashlib.
    # Earlier shapes for the record: the per-row HOF fold gets re-inlined by
    # CollapseProject into every band expression (re-hashing every shingle
    # per band); the explode + groupBy(16 mins) fix paid an extra shuffle of
    # the exploded shingle table. The kernel output is an ArrowEvalPython
    # attribute, which downstream band expressions reference WITHOUT
    # re-evaluation — a materialization barrier plain expressions don't get.
    from chronon_spark.functions.vec_kernels import minhash_sig_arrow

    docs = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), word_shingles(text_col, n=shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    sig = docs.select("doc_id", minhash_sig_arrow(F.col("sh"), num_hashes).alias("sig"))
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                    for r in range(rows_per_band)
                ],
            )
        )
        for b in range(bands)
    ]
    # the band self-join moves ONLY (doc_id, band keys) — the shingle arrays
    # join back onto the (candidate pairs ≪ N²) afterwards, so at 10⁹ docs
    # the big shuffle payload is bands × 32-char digests per doc, not text.
    # Both self-join sides read this frame, so it goes through persist_reused:
    # signature kernel runs once, branches scan the cache. (For the record:
    # an eager localCheckpoint was MEASURED 2× slower at sf0.1, 5.7 s→11.8 s —
    # it serializes the pipeline into blocking jobs; memory persist + count
    # keeps one materialization job and cheap cache scans.)
    base = persist_reused(
        sig.select("doc_id", F.array(*band_cols).alias("bk")), "minhash_band_keys"
    )
    banded = base.select("doc_id", "bk", F.posexplode("bk").alias("band_idx", "band_key"))
    a = banded.select(
        F.col("band_idx"), F.col("band_key"), F.col("doc_id").alias("id_a"), F.col("bk").alias("bk_a")
    )
    b = banded.select(
        F.col("band_idx").alias("band_idx_b"),
        F.col("band_key").alias("band_key_b"),
        F.col("doc_id").alias("id_b"),
        F.col("bk").alias("bk_b"),
    )
    cand = a.join(
        b,
        (a.band_idx == b.band_idx_b) & (a.band_key == b.band_key_b) & (a.id_a < b.id_b),
        "inner",
    )
    # keep each pair only in its FIRST colliding band — a pure projection
    # predicate over the band-key arrays, replacing a dropDuplicates shuffle
    first_band = F.lit(True)
    for j in range(bands - 1):
        first_band = first_band & (
            (F.col("band_idx") <= j)
            | (F.element_at("bk_a", j + 1) != F.element_at("bk_b", j + 1))
        )
    cand = cand.where(first_band).select("id_a", "id_b")
    # verification: shingles join back onto candidates (≪ N² rows). A
    # broadcast-the-candidate-ids variant (shingle only matched rows) was
    # MEASURED slower at sf0.1 (extra broadcast-collect jobs beat by the
    # lazy plan's parallel duplicate branches); the join-back keeps one
    # linear plan and its shuffle payload is candidate shingles only.
    sh_a = docs.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .select("id_a", "id_b", jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------- exact jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_df: int | None = 10_000,
) -> DataFrame:
    """EXACT all-pairs Jaccard ≥ threshold via an inverted index: explode
    distinct shingles, build posting lists per shingle, emit co-occurring
    pairs from each posting, then |A∩B| / (|A| + |B| − |A∩B|). Never
    materializes the N² cross join — only pairs sharing ≥1 shingle exist,
    which threshold > 0 requires anyway.

    Scale: the shuffle is keyed by shingle; stop-shingles (appearing in a
    huge fraction of docs) are the skew risk — a posting of length k emits
    k·(k−1)/2 pairs, so ONE shingle shared by 10^6 docs is 5·10^11 pairs.
    ``max_df`` caps that: postings longer than max_df generate NO candidate
    pairs; candidates from the surviving postings are then verified with the
    EXACT Jaccard over the full (unpruned) shingle sets via a join-back.
    Trade-off (documented, standard prefix-filter refinement): a pair whose
    ONLY shared shingles are stop-shingles is missed — for near-duplicate
    thresholds (≥ 0.5) such pairs share many shingles, so any real duplicate
    keeps a sub-max_df witness in practice. The DEFAULT is the pruned path
    (max_df=10^4 — inactive below 10^4 docs, bounds the worst posting to
    ~5·10^7 pairs at corpus scale); the fully exact path is an explicit
    opt-in via ``max_df=None`` because its cost is O(df²) per posting and
    its per-doc-size attach assumes the doc count is join-able driver-free.
    """
    sh = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), word_shingles(text_col, n=shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    # posting lists instead of a self-join: ONE shuffle keyed by shingle
    # (collect_list), then the k·(k−1)/2 pairs per posting explode in-stage
    # (posexplode + slice) with no join and shingles computed once — the
    # self-join shape shuffles the exploded table twice and re-derives the
    # shingles on both sides. (A struct-posting variant that carries n_sh
    # through the postings to skip the size joins was MEASURED 1.4× slower
    # at sf0.1: struct sort/shuffle overhead on the hot exploded path beats
    # two broadcast scans that run in parallel branches of the lazy plan.)
    postings = (
        ex.groupBy("s")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .where(F.size("docs") > 1)
        .select("docs")
    )
    if max_df is not None:
        # no posting can exceed the corpus size, so below max_df docs the
        # prune provably drops NOTHING — co-occurrence counts stay complete
        # and the cheap size-formula jaccard is exact. Skipping the
        # array-rescore join here is a 4x win at test scales (measured),
        # while at corpus scale (n_docs > max_df) the rescore engages as
        # designed. The count() is one columnar scan of a frame this plan
        # reads anyway.
        if df.count() <= max_df:
            max_df = None
        else:
            # pruned postings only GENERATE candidates; jaccard comes from
            # the exact join-back below, so partial co-occurrence counts are
            # fine
            postings = postings.where(F.size("docs") <= max_df)
    co = (
        postings.select(F.posexplode("docs").alias("pos", "id_a"), F.col("docs"))
        .select(
            "id_a",
            F.explode(F.slice("docs", F.col("pos") + F.lit(2), F.size("docs"))).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    if max_df is not None:
        sh_a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("__sh_a"))
        sh_b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("__sh_b"))
        return (
            co.select("id_a", "id_b")
            .join(sh_a, "id_a")
            .join(sh_b, "id_b")
            .select("id_a", "id_b", jaccard(F.col("__sh_a"), F.col("__sh_b")).alias("jaccard"))
            .where(F.col("jaccard") >= threshold)
        )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("nb"))
    # plain joins (no broadcast hint): the exact branch is the unbounded-doc-
    # count opt-in, so let AQE pick broadcast only when sizes actually fit
    return (
        co.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    w: int = 4,
    threshold: float = 0.5,
    max_df: int | None = 10_000,
) -> DataFrame:
    """Substring-level near-dup pairs from winnowing fingerprints
    (text.winnow_fingerprints): any shared normalized substring of length
    >= k + w - 1 guarantees a shared fingerprint, so candidate pairs come
    from the fingerprint inverted index — same one-shuffle posting-list
    shape as ngram_jaccard_pairs, never an all-pairs join. Score is
    containment |Fa ∩ Fb| / min(|Fa|, |Fb|) (the plagiarism-detection
    convention: a small doc fully embedded in a large one scores 1.0,
    where Jaccard would dilute it).

    ``max_df`` prunes boilerplate fingerprints exactly as in
    ngram_jaccard_pairs: long postings generate no candidates, and the
    surviving candidates are re-scored EXACTLY over the full fingerprint
    sets via a join-back (array_intersect), so emitted scores are never
    approximate — only recall of pairs whose sole witnesses are boilerplate
    is traded away. As in ngram_jaccard_pairs, the pruned path (max_df=10^4)
    is the default; the exact O(df²)-per-posting path is an explicit
    ``max_df=None`` opt-in.
    """
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text")
    )
    fp = base.select(
        "doc_id", winnow_fingerprints("__text", k=k, w=w).alias("fps")
    ).where(F.size("fps") > 0)
    # the postings build AND both re-score branches read fp: winnowing (the
    # expensive expression) materializes once instead of 3x
    fp = persist_reused(fp, "winnow_fingerprints")
    sizes = fp.select("doc_id", F.size("fps").alias("n_fp"))
    ex = fp.select("doc_id", F.explode("fps").alias("f"))
    postings = (
        ex.groupBy("f")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("docs"))
        .where(F.size("docs") > 1)
        .select("docs")
    )
    if max_df is not None:
        postings = postings.where(F.size("docs") <= max_df)
    co = (
        postings.select(F.posexplode("docs").alias("pos", "id_a"), F.col("docs"))
        .select(
            "id_a",
            F.explode(F.slice("docs", F.col("pos") + F.lit(2), F.size("docs"))).alias("id_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    if max_df is not None:
        # exact re-score over full fingerprint sets via join-back to the
        # PERSISTED per-doc fingerprint arrays. Never re-winnow per pair:
        # candidate pairs can vastly outnumber docs (sf0.1: 185k pairs from
        # 5k docs), and winnowing is the expensive expression — a per-pair
        # recompute measured 200 s where this join-back runs the whole query
        # in ~14 s. fp is cached above (persist_reused), so each branch is a
        # cache scan, not a corpus-sized winnowing recompute.
        fa = fp.select(F.col("doc_id").alias("id_a"), F.col("fps").alias("__fa"))
        fb = fp.select(F.col("doc_id").alias("id_b"), F.col("fps").alias("__fb"))
        rescored = co.select("id_a", "id_b").join(fa, "id_a").join(fb, "id_b")
        return rescored.select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("__fa", "__fb")).cast("bigint").alias("common"),
            (
                F.size(F.array_intersect("__fa", "__fb")).cast("double")
                / F.least(F.size("__fa"), F.size("__fb"))
            ).alias("containment"),
        ).where(F.col("containment") >= threshold)
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_fp").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_fp").alias("nb"))
    # plain joins: the exact branch is the unbounded-doc-count opt-in (AQE
    # broadcasts when the size frames actually fit)
    return (
        co.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "common",
            (F.col("common").cast("double") / F.least("na", "nb")).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


# ---------------------------------------------------------------- simhash

# Worker-persistent scratch for the simhash bucket kernel. numpy releases
# >128 KB temporaries with munmap, so per-tile temporaries would fault fresh
# pages every tile on hosts that provision memory slowly; module globals
# survive across tasks in a reused Python worker, so each shape's buffers
# and the popcount table are faulted in once per worker.
_POP16 = None
_SIMHASH_BUF_CACHE: dict = {}


def _pop16_table():
    global _POP16
    if _POP16 is None:
        import numpy as np

        _POP16 = np.array([bin(v).count("1") for v in range(1 << 16)], dtype=np.uint8)
    return _POP16


def _simhash_tile_bufs(n: int, tile: int = 256):
    import numpy as np

    width = 1 << (max(n, 1024) - 1).bit_length()
    key = (tile, width)
    if key not in _SIMHASH_BUF_CACHE:
        _SIMHASH_BUF_CACHE[key] = (
            np.empty((tile, width), np.uint16),  # xor chunk
            np.empty((tile, width), np.uint8),  # chunk popcount
            np.empty((tile, width), np.int16),  # hamming accumulator
            np.empty((tile, width), bool),  # hit mask
            np.empty((tile, width), bool),  # scratch mask
        )
    bufs = _SIMHASH_BUF_CACHE[key]
    return tuple(b[:, :] for b in bufs)



_HI_HEX = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash_from_hashes(hashes: Column, bits: int = 32) -> Column:
    """SimHash from an array of md5 hex digests (one per token).

    Bit j is the high bit of hex digit j: tokens vote ±1 per bit; the
    signature bit is 1 iff the vote is strictly positive (frequency-weighted,
    ties → 0). 32 bits = 32 hex digits of one md5 per token, all codegen.
    Pass a materialized `transform(tokens, md5)` column so each token hashes
    once, not `bits` times.
    """
    assert bits <= 32
    # Single left fold over the hash array. The naive shape — one
    # F.filter(hashes, ...) per bit — references `hashes` `bits` times, and
    # lambdas inline their child expression, so a caller passing
    # transform(tokens, md5) would re-hash every token per bit (measured
    # 121 s for 5000 docs at 32 bits). Here `hashes` is evaluated twice
    # total (fold + size), independent of `bits`.
    def bitvec(hx):
        # hex digit j (1-indexed) -> 1 iff its high bit is set
        return F.transform(
            F.sequence(F.lit(1), F.lit(bits)),
            lambda j: hx.substr(j, F.lit(1)).isin(*_HI_HEX).cast("int"),
        )

    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, hx: F.zip_with(acc, bitvec(hx), lambda a, b: a + b),
    )
    # vote threshold: strictly more ones than zeros; digit j carries weight
    # 1 << (bits - j), identical to the DuckDB oracle's convention
    n_rep = F.array_repeat(F.size(hashes), bits)
    powers = F.array(*[F.lit(1 << (bits - j)).cast("long") for j in range(1, bits + 1)])
    votes = F.zip_with(counts, n_rep, lambda c, nn: (c * 2 > nn).cast("long"))
    return F.aggregate(
        F.zip_with(votes, powers, lambda v, p: v * p),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def simhash(text_col: str | Column, bits: int = 32) -> Column:
    """SimHash over the whitespace token stream."""
    return simhash_from_hashes(F.transform(tokens(text_col), F.md5), bits)


_BIT2_HEX = ("4", "5", "6", "7", "c", "d", "e", "f")


def simhash64_from_hashes(hashes: Column) -> Column:
    """64-bit SimHash as a struct of two 32-bit halves (hi, lo), each a
    non-negative long — one md5 per token, two bits per hex digit (the high
    bit and the second bit of the digit), so the wider signature costs no
    extra hashing. Two halves instead of one packed long because bit 63 does
    not fit a positive Spark LongType literal and ANSI arithmetic would
    overflow-throw; xor/bit_count distribute over the halves anyway.

    Same single-left-fold shape as `simhash_from_hashes` (see its comment on
    lambda inlining): `hashes` is evaluated O(1) times regardless of width.
    """
    def bitvec(hx):
        # digit j contributes bits (2j-1, 2j): its high bit and second bit
        return F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.lit(32)),
                lambda j: F.array(
                    hx.substr(j, F.lit(1)).isin(*_HI_HEX).cast("int"),
                    hx.substr(j, F.lit(1)).isin(*_BIT2_HEX).cast("int"),
                ),
            )
        )

    counts = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), 64),
        lambda acc, hx: F.zip_with(acc, bitvec(hx), lambda a, b: a + b),
    )
    n_rep = F.array_repeat(F.size(hashes), 64)
    votes = F.zip_with(counts, n_rep, lambda c, nn: (c * 2 > nn).cast("long"))
    powers = F.array(*[F.lit(1 << (32 - j)).cast("long") for j in range(1, 33)] * 2)
    weighted = F.zip_with(votes, powers, lambda v, p: v * p)
    half_sum = lambda arr: F.aggregate(arr, F.lit(0).cast("long"), lambda a, x: a + x)  # noqa: E731
    return F.struct(
        half_sum(F.slice(weighted, 1, 32)).alias("hi"),
        half_sum(F.slice(weighted, 33, 32)).alias("lo"),
    )


def simhash64(text_col: str | Column) -> Column:
    return simhash64_from_hashes(F.transform(tokens(text_col), F.md5))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with Hamming(simhash64) ≤ max_hamming (≤ 7).

    Candidate generation: the 64-bit signature splits into 8 bands of 8 bits —
    pigeonhole guarantees any pair within radius ≤ 7 agrees on ≥1 whole band,
    so the equi-join on (band_idx, band_bits) finds all true pairs without a
    cross join. 256 buckets per band keep the per-band self-join ~N²/256
    (the 32-bit/4-bit-band layout degenerated to 16 buckets per band —
    candidates approached N²/16). Verify with bit_count(xor) over the halves.

    Dedup without a shuffle: a pair colliding in k bands would appear k
    times, but instead of dropDuplicates over the (possibly huge, skew-prone)
    candidate set we keep each pair only in its FIRST colliding band — a pure
    projection predicate on (sig_a, sig_b, band_idx), since whether the pair
    also collides in any earlier band is recomputable from the signatures.
    """
    if max_hamming > 7:
        raise ValueError("simhash_pairs: max_hamming must be <= 7 (8 bands of 8 bits)")
    band_w, n_bands = 8, 8
    # Signature in one map-side Arrow kernel (vec_kernels.simhash64_sig_arrow):
    # tokenization stays Spark-side, hashing+voting run in hashlib/numpy.
    # Earlier shapes for the record: a per-row HOF fold re-hashed every token
    # per band via CollapseProject re-inlining (12.6 s -> 72 s at sf0.1), the
    # explode + groupBy(65 sums) variant fixed that but paid an extra shuffle
    # and a 9 s driver-side expression build.
    from chronon_spark.functions.vec_kernels import simhash64_sig_arrow

    sig = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), simhash64_sig_arrow(tokens(text_col)).alias("__s")
    ).select("doc_id", F.col("__s.hi").alias("hi"), F.col("__s.lo").alias("lo"))

    def band_of(half, j_in_half):
        return F.shiftrightunsigned(half, (3 - j_in_half) * band_w) % F.lit(1 << band_w)

    bandkeys = F.array(
        *[band_of(F.col("hi"), j) for j in range(4)],
        *[band_of(F.col("lo"), j) for j in range(4)],
    )
    banded = sig.select("doc_id", "hi", "lo", F.posexplode(bandkeys).alias("band_idx", "band_bits"))

    # Verify INSIDE a per-bucket Arrow kernel instead of a row-level band
    # self-join: templated corpora concentrate most docs into one band value
    # (measured: one 8-bit bucket held 68% of sf0.1 docs -> the join built
    # 12.5M candidate rows for 60k true pairs). The kernel sees each bucket
    # once, shuffles only O(N * bands) signature rows, and runs the pairwise
    # XOR+popcount as tiled numpy over a 256-entry byte table — O(c²) bit-ops
    # at memory-bandwidth speed, no candidate-row materialization. The
    # first-colliding-band dedup becomes a mask over earlier-band equality,
    # recomputed from the signatures inside the kernel. A bucket holding c
    # docs still costs c² bit-ops — a corpus where c² per bucket exceeds a
    # task's budget needs a cap-and-report or recursive refinement policy.
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField("id_a", df.schema[id_col].dataType, False),
            T.StructField("id_b", df.schema[id_col].dataType, False),
            T.StructField("hamming", T.IntegerType(), False),
        ]
    )
    empty = pd.DataFrame({"id_a": [], "id_b": [], "hamming": []})

    def _np_band(hi: "np.ndarray", lo: "np.ndarray", j: int) -> "np.ndarray":
        half = hi if j < 4 else lo
        return ((half >> ((3 - (j % 4)) * band_w)) & ((1 << band_w) - 1)).astype(np.uint16)

    def kernel(key, pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return empty
        band_idx = int(key[0])
        ids = pdf["doc_id"].to_numpy()
        hi = pdf["hi"].to_numpy()
        lo = pdf["lo"].to_numpy()
        # the two 32-bit halves as four uint16 chunks -> table-driven popcount
        chunks = [
            (hi & 0xFFFF).astype(np.uint16),
            ((hi >> 16) & 0xFFFF).astype(np.uint16),
            (lo & 0xFFFF).astype(np.uint16),
            ((lo >> 16) & 0xFFFF).astype(np.uint16),
        ]
        earlier = [_np_band(hi, lo, j) for j in range(band_idx)]
        xbuf, pbuf, hambuf, hitbuf, mbuf = _simhash_tile_bufs(n)
        tile = xbuf.shape[0]
        out_a, out_b, out_h = [], [], []
        for s in range(0, n, tile):
            e = min(s + tile, n)
            h = e - s
            x, p, ham, hit, m = (
                xbuf[:h, :n], pbuf[:h, :n], hambuf[:h, :n], hitbuf[:h, :n], mbuf[:h, :n],
            )
            ham[:] = 0
            for ch in chunks:
                np.bitwise_xor(ch[s:e, None], ch[None, :], out=x)
                np.take(_pop16_table(), x, out=p)
                ham += p
            np.less_equal(ham, max_hamming, out=hit)
            np.less(ids[s:e, None], ids[None, :], out=m)
            hit &= m
            for eb in earlier:  # pair already met in an earlier band -> skip
                np.not_equal(eb[s:e, None], eb[None, :], out=m)
                hit &= m
            r, c = np.nonzero(hit)
            out_a.append(ids[s + r])
            out_b.append(ids[c])
            out_h.append(ham[r, c].astype(np.int32))
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    return banded.groupBy("band_idx", "band_bits").applyInPandas(kernel, schema=out_schema)


# ---------------------------------------------------------------- clustering


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    all_nodes: DataFrame | None = None,
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over an undirected near-duplicate pair list via
    iterative min-label propagation: ``comp(v) = min(v, comp(neighbors))``
    until fixpoint. Returns ``(id, comp)`` where ``comp`` is the smallest node
    id in the component — the canonical document of the duplicate cluster.

    ``all_nodes`` (optional, one ``id`` column) adds isolated nodes as
    singleton clusters, so the result covers the whole corpus.

    Scale shape: each round is one shuffle-join (edges ⋈ labels on src) plus
    one min-groupBy; rounds = component diameter. Near-dup graphs are
    overwhelmingly tiny dense cliques (diameter ≤ 2-3), so 3-5 rounds close
    web-scale corpora; pathological chains would want the large-star/
    small-star alternation (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14) — same primitive ops, O(log n) rounds.
    Each round `localCheckpoint()`s to truncate lineage (25 stacked joins
    would otherwise blow the plan) and convergence is detected by the
    monotone-decreasing label sum, one cheap agg per round instead of an
    old-vs-new join.
    """
    # symmetrize with one explode, NOT a two-branch union: a union re-executes
    # the (expensive — LSH/inverted-index) pair-generation plan once per
    # branch, while the explode scans it exactly once
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("esrc"), F.col(dst).alias("edst")),
                    F.struct(F.col(dst).alias("esrc"), F.col(src).alias("edst")),
                )
            ).alias("__e")
        )
        .select("__e.esrc", "__e.edst")
        .persist()
    )

    nodes = edges.select(F.col("esrc").alias("id")).distinct()
    if all_nodes is not None:
        nodes = nodes.unionByName(all_nodes.select(F.col(all_nodes.columns[0]).alias("id"))).distinct()
    # lazy localCheckpoint: the per-round sum-agg action materializes the
    # checkpoint in the same job (eager=True would pay a second pass)
    labels = nodes.select("id", F.col("id").alias("comp")).localCheckpoint(eager=False)
    prev_sum = labels.agg(F.sum("comp")).collect()[0][0]

    for _ in range(max_iter):
        prop = edges.join(labels, edges.esrc == labels.id).select(
            F.col("edst").alias("id"), F.col("comp")
        )
        labels = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint(eager=False)
        )
        new_sum = labels.agg(F.sum("comp")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    edges.unpersist()
    return labels


def connected_components_star(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    all_nodes: DataFrame | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """Connected components via alternating **large-star / small-star**
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC'14) — the O(log n)-round path that replaces min-label propagation's
    O(diameter) rounds on chain-shaped graphs. Same output contract as
    :func:`connected_components`: ``(id, comp)`` with ``comp`` = smallest
    node id in the component (equivalence-tested).

    Per round:
    - **large-star**: per node u over its undirected neighborhood N(u),
      m = min(N ∪ {u}); rewire every strictly-larger neighbor to m.
    - **small-star**: orient edges large→small, m = min(N⁻ ∪ {u}); rewire
      u and its ≤-neighbors to m.

    Each star is one shuffle (a window min over the grouping key — no
    neighbor-list materialization, so hub nodes with 10^6 edges never build
    a 10^6-element array) + a distinct. Convergence = stable (count,
    xxhash-sum) edge signature; converged edges form per-component stars
    whose centers are the component minima.
    """
    from pyspark.sql import Window

    und = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")),
                    F.struct(F.col(dst).cast("long").alias("u"), F.col(src).cast("long").alias("v")),
                )
            ).alias("__e")
        )
        .select("__e.u", "__e.v")
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def signature(e: DataFrame) -> tuple:
        # bit_xor: order-independent and overflow-free (edges are distinct,
        # so xor-cancellation of duplicates cannot occur); a SUM would
        # overflow long under ANSI mode
        r = e.agg(
            F.count(F.lit(1)).alias("n"), F.expr("bit_xor(xxhash64(u, v))").alias("h")
        ).collect()[0]
        return (r["n"], r["h"])

    edges = und
    sig = signature(edges)
    for _ in range(max_iter):
        # large-star over the undirected view
        w = Window.partitionBy("u")
        ls = (
            edges.withColumn("m", F.least(F.col("u"), F.min("v").over(w)))
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # small-star over the large→small orientation
        ori = ls.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).distinct()
        m = F.least(F.col("u"), F.min("v").over(w))
        sm = ori.withColumn("m", m)
        rewired = (
            sm.select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(sm.select("u", F.col("m").alias("v")).distinct())
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        # back to the undirected view for the next large-star
        edges = (
            rewired.select(
                F.explode(
                    F.array(
                        F.struct(F.col("u"), F.col("v")),
                        F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
                    )
                ).alias("__e")
            )
            .select("__e.u", "__e.v")
            .distinct()
            .localCheckpoint(eager=False)
        )
        new_sig = signature(edges)
        if new_sig == sig:
            break
        sig = new_sig

    # converged: edges are star arms (node ↔ component min); labels = min arm
    labels = edges.groupBy("u").agg(F.min("v").alias("comp"))
    labels = labels.select(
        F.col("u").alias("id"), F.least("id", "comp").alias("comp")
    )
    members = labels.select("id", "comp").unionByName(
        labels.select(F.col("comp").alias("id"), F.col("comp"))
    )
    if all_nodes is not None:
        iso = all_nodes.select(F.col(all_nodes.columns[0]).cast("long").alias("id"))
        members = members.unionByName(iso.select("id", F.col("id").alias("comp")))
    return members.groupBy("id").agg(F.min("comp").alias("comp"))


def dedup_clusters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    threshold: float = 0.5,
    algo: str = "star",
) -> DataFrame:
    """Full keep-one-per-cluster dedup: exact n-gram-Jaccard near-dup pairs →
    connected components → ``(doc_id, cluster_id, is_canonical)`` for EVERY
    document (singletons are their own canonical cluster). Filtering
    ``is_canonical`` yields the deduplicated corpus.

    ``algo``: "star" (large-star/small-star, Kiveris et al. SoCC'14 —
    O(log n) rounds, the DEFAULT: web-corpus duplicate graphs have
    chain-shaped components from templated pages, where min-label
    propagation's O(diameter) rounds each cost a Spark job plus a driver
    convergence check) or "propagate" (min-label propagation — fine for
    small graphs / tiny dense cliques); both produce identical labels
    (equivalence-tested)."""
    pairs = ngram_jaccard_pairs(df, id_col, text_col, shingle_n=shingle_n, threshold=threshold)
    cc_fn = connected_components_star if algo == "star" else connected_components
    cc = cc_fn(pairs, all_nodes=df.select(F.col(id_col).alias("id")))
    return cc.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        (F.col("id") == F.col("comp")).alias("is_canonical"),
    )


# ------------------------------------------------------- incremental dedup


def build_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Persistable LSH index of a corpus: one (doc_id, band_idx, band_key)
    row per band per doc. This is the table a production pipeline writes
    ONCE per corpus snapshot (bucketed by band_key — see sources/bucketed)
    so that daily incremental batches join against it without ever touching
    corpus text again: index bytes ≈ docs × bands × 32-char digests,
    independent of document length."""
    from chronon_spark.functions.vec_kernels import minhash_sig_arrow

    rows_per_band = num_hashes // bands
    docs = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), word_shingles(text_col, n=shingle_n).alias("sh")
    ).where(F.size("sh") > 0)
    sig = docs.select("doc_id", minhash_sig_arrow(F.col("sh"), num_hashes).alias("sig"))
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                *[
                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                    for r in range(rows_per_band)
                ],
            )
        )
        for b in range(bands)
    ]
    return sig.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band_idx", "band_key")
    )


def incremental_minhash_dedup(
    corpus: DataFrame,
    new_batch: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    threshold: float = 0.5,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Dedup an incoming batch against an existing (already-deduped) corpus
    plus within itself — WITHOUT generating any corpus-vs-corpus pair.

    This is the production shape at 10^9-docs scale: the full self-join
    (`minhash_lsh_dedup`) runs once to bootstrap the corpus; every
    subsequent ingest batch runs THIS, whose cost is O(batch) signatures +
    one equi-join of batch band keys against the (precomputed, persisted)
    corpus index — pass it as ``corpus_index`` (from
    ``build_minhash_index``) to skip re-signing the corpus. Exact-Jaccard
    verification joins text back ONLY for matched candidate ids.

    Returns (id_new, id_old, vs, jaccard): ``vs='corpus'`` rows pair a new
    doc with its corpus duplicate; ``vs='batch'`` rows are within-batch
    pairs (id_old < id_new). New docs appearing in neither are safe to
    append to the corpus + index.
    """
    if corpus_index is None:
        corpus_index = build_minhash_index(
            corpus, id_col, text_col, num_hashes, bands, shingle_n
        )
    new_index = build_minhash_index(new_batch, id_col, text_col, num_hashes, bands, shingle_n)

    n = new_index.select(F.col("doc_id").alias("id_new"), "band_key")
    o = corpus_index.select(F.col("doc_id").alias("id_old"), "band_key")
    cand_corpus = n.join(o, "band_key").select("id_new", "id_old").distinct()
    n2 = new_index.select(F.col("doc_id").alias("id_old"), "band_key")
    cand_batch = (
        n.join(n2, "band_key")
        .where(F.col("id_old") < F.col("id_new"))
        .select("id_new", "id_old")
        .distinct()
    )
    cand = cand_corpus.withColumn("vs", F.lit("corpus")).unionByName(
        cand_batch.withColumn("vs", F.lit("batch"))
    )

    def shingles(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(alias), word_shingles(text_col, n=shingle_n).alias(f"sh_{alias}")
        )

    sh_new = shingles(new_batch, "id_new")
    sh_old = shingles(corpus, "id_old").unionByName(shingles(new_batch, "id_old"))
    return (
        cand.join(sh_new, "id_new")
        .join(sh_old, "id_old")
        .select(
            "id_new", "id_old", "vs",
            jaccard(F.col("sh_id_new"), F.col("sh_id_old")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
