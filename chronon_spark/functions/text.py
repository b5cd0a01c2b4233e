"""Text-analysis column functions for large-scale corpus curation.

All functions return pyspark Columns built from built-in SQL functions —
they stay inside WholeStageCodegen, scale linearly with no shuffle, and every
one is expressible in ANSI SQL so the DuckDB oracle can verify it exactly.

Determinism contract (for the oracle): only md5 / split / filter / transform /
aggregate — identical semantics in Spark SQL and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from chronon_spark.rounding import NUDGE_6DP

# Small deterministic lexicons for the n-gram-free language-ID heuristic.
# Real deployments plug in fastText et al.; the heuristic is the portable,
# dependency-free baseline (score = stopword-hit fraction per language).
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "value", "table", "row", "fast"),
    "es": ("el", "la", "de", "y", "que", "los", "una", "por", "con"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von"),
}

STOPWORDS_EN: tuple[str, ...] = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (the BPE-ish regex path is `bpe_ish_tokens`)."""
    return F.split(F.trim(text), r"\s+")


def bpe_ish_tokens(text: Column | str) -> Column:
    """Sub-word-ish tokenization: split on whitespace AND punctuation / digit
    boundaries — a cheap, deterministic stand-in for a BPE pre-tokenizer."""
    c = F.col(text) if isinstance(text, str) else text
    spaced = F.regexp_replace(c, r"([0-9]+|[^\w\s]+)", r" $1 ")
    return F.filter(F.split(F.trim(spaced), r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    return F.length(text)


def avg_token_len(text: Column | str) -> Column:
    t = tokens(text)
    return F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double") / F.size(t)


def unique_token_ratio(text: Column | str) -> Column:
    t = tokens(text)
    return F.size(F.array_distinct(t)).cast("double") / F.size(t)


def punct_ratio(text: Column | str) -> Column:
    """Fraction of characters that are neither word characters nor spaces."""
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[\w ]", "")
    return F.length(stripped).cast("double") / F.length(c)


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    t = tokens(text)
    hits = F.size(F.filter(t, lambda x: x.isin(*stopwords)))
    return hits.cast("double") / F.size(t)


def lang_scores(text: Column | str, lexicons: dict[str, tuple[str, ...]] | None = None) -> dict[str, Column]:
    """Per-language stopword-hit fraction over the token stream."""
    lex = lexicons or LANG_LEXICONS
    t = tokens(text)
    n = F.size(t)

    def hit(words: tuple[str, ...]):
        # closure factory: a default-arg lambda would change the arity pyspark
        # inspects and bind the array index instead
        return lambda x: x.isin(*words)

    return {
        lang: F.size(F.filter(t, hit(words))).cast("double") / n for lang, words in lex.items()
    }


def lang_id(text: Column | str, lexicons: dict[str, tuple[str, ...]] | None = None) -> Column:
    """argmax language with deterministic lexicographic tie-break; 'und' if no
    lexicon hit at all."""
    scores = lang_scores(text, lexicons)
    best_lang = F.lit("und")
    best_score = F.lit(0.0)
    # ascending iteration + strict '>' => ties prefer the lexicographically
    # smallest language; zero-score everywhere stays 'und'
    for lang in sorted(scores):
        s = scores[lang]
        best_lang = F.when(s > best_score, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(s > best_score, s).otherwise(best_score)
    return best_lang


def quality_score(text: Column | str) -> Column:
    """Deterministic [0,1] quality heuristic: length band + lexical diversity
    + low punctuation (the C4/Gopher-style rule set, portable to SQL)."""
    n = token_count(text)
    len_ok = (n >= 10) & (n <= 1000)
    return (
        F.when(len_ok, F.lit(0.4)).otherwise(F.lit(0.0))
        + F.least(unique_token_ratio(text), F.lit(0.5)) * 0.6
        + F.when(punct_ratio(text) < 0.1, F.lit(0.2)).otherwise(F.lit(0.0))
    ).cast("double")


def normalize_text(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def fingerprint(text: Column | str) -> Column:
    """Deterministic 128-bit document fingerprint (md5 of normalized text).
    The rolling-hash variant for shingle-level fingerprints is in dedup.py."""
    return F.md5(normalize_text(text))


def winnow_fingerprints(text: Column | str, k: int = 8, w: int = 4) -> Column:
    """MOSS-style winnowing fingerprints (Schleimer et al., SIGMOD '03):
    hash every char ``k``-gram of the normalized text, then keep the minimum
    hash of each sliding window of ``w`` consecutive gram hashes. Guarantees
    any shared substring of length >= k + w - 1 contributes at least one
    shared fingerprint, at ~2/(w+1) the density of full k-gram hashing.

    Returns ``array<string>`` of the distinct selected hashes (first 16 hex
    chars of md5 — portable to any SQL engine). Documents shorter than ``k``
    (normalized) yield an empty array.

    Entirely codegen built-ins — no UDF, no shuffle; the downstream
    fingerprint->doc inverted index is where the (single) shuffle lives.

    Expression shape: each stage is let-bound through a single-element
    ``transform(array(x), v -> body)[0]`` so the normalize regex runs once
    per row and the gram-hash array is materialized once before the O(n*w)
    window-min pass — a bare nested expression would be re-inlined per
    element by CollapseProject (the O(T^2) trap documented on
    ``word_shingles``).
    """
    c = F.col(text) if isinstance(text, str) else text

    def grams(nrm: Column) -> Column:
        return F.transform(
            F.sequence(F.lit(1), F.length(nrm) - k + 1),
            lambda i: F.substring(F.md5(nrm.substr(i, F.lit(k))), 1, 16),
        )

    def winnow(hs: Column) -> Column:
        # window-min as a (w-1)-fold zip_with(least) over shifted slices —
        # w array passes total instead of one slice+array_min alloc per
        # window (measured ~25% faster than the per-window form). A slice
        # that runs past the end zips as NULL and least() skips NULLs, so
        # the size<w case degenerates to min-of-all — same as one window.
        win = F.greatest(F.size(hs) - w + 1, F.lit(1))
        m = F.slice(hs, 1, win)
        for i in range(1, w):
            m = F.zip_with(m, F.slice(hs, 1 + i, win), lambda a, b: F.least(a, b))
        return F.array_distinct(m)

    bound = F.transform(
        F.array(normalize_text(c)),
        lambda nrm: F.when(
            F.length(nrm) >= k,
            F.transform(F.array(grams(nrm)), winnow)[0],
        ).otherwise(F.array().cast("array<string>")),
    )
    return bound[0]


def word_shingles(text: Column | str, n: int = 3, distinct: bool = True) -> Column:
    """Word n-gram shingles (the MinHash/Jaccard input set).

    Built as an n-way ``zip_with`` of shifted token slices, NOT as
    ``transform(sequence(1, T), i -> slice(tokens, i, n))``: a lambda that
    references the token array inlines its child expression, so the
    tokenizing regex split would re-run once PER SHINGLE (O(T²) per doc —
    measured 4 s for 5000 small docs). The slice form evaluates the split
    n times per row total.
    """
    t = tokens(text)
    win = F.greatest(F.size(t) - (n - 1), F.lit(0))  # 0 when fewer than n tokens
    sh = F.slice(t, 1, win)
    for i in range(1, n):
        sh = F.zip_with(sh, F.slice(t, i + 1, win), lambda a, b: F.concat_ws(" ", a, b))
    # null text -> empty shingle set (not null), as before
    sh = F.coalesce(sh, F.array().cast("array<string>"))
    return F.array_distinct(sh) if distinct else sh


def _mode_run_count(arr: Column) -> Column:
    """Count of the most frequent element (the mode's multiplicity) — as the
    longest equal-run in the sorted array, computed in ONE codegen fold.
    O(T log T) per row, no shuffle, no Python. The fold lambda references
    only its accumulator and element (never the child array), so the sort is
    evaluated exactly once per row (see `word_shingles` for the inlining trap
    this avoids)."""
    srt = F.array_sort(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def merge(acc, x):
        run = F.when(acc.prev.eqNullSafe(x), acc.run + F.lit(1)).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc.best, run).alias("best")
        )

    return F.aggregate(srt, init, merge, lambda acc: acc.best)


def word_bigrams(text: Column | str) -> Column:
    """Adjacent word pairs (NOT distinct — repetition counting needs the
    multiset), via the same shifted-slice zip as `word_shingles`."""
    t = tokens(text)
    win = F.greatest(F.size(t) - 1, F.lit(0))
    return F.zip_with(
        F.slice(t, 1, win), F.slice(t, 2, win), lambda a, b: F.concat_ws(" ", a, b)
    )


def repetition_signals(text: Column | str, round_to: int = 6) -> list[Column]:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 —
    "fraction of characters in the most common n-gram" family), the standard
    filters a web-scale corpus pipeline runs before training:

    - ``n_words`` — token count;
    - ``distinct_word_ratio`` — unique words / words (low = repetitive);
    - ``top_word_frac`` — occurrences of the most frequent word / words;
    - ``top_bigram_frac`` — occurrences of the most frequent adjacent word
      pair / total pairs.

    All pure per-row codegen (sorted-run mode counting, no explode/groupBy),
    so the 100 TB plan is a bare projection over the scan — zero shuffles —
    while the SQL oracle does the same via unnest + group-by."""
    t = tokens(text)
    n = F.size(t)
    bg = word_bigrams(text)
    nb = F.size(bg)
    return [
        n.alias("n_words"),
        F.round(F.size(F.array_distinct(t)) / n, round_to).alias("distinct_word_ratio"),
        F.round(_mode_run_count(t) / n, round_to).alias("top_word_frac"),
        F.when(nb > 0, F.round(_mode_run_count(bg) / nb, round_to)).alias("top_bigram_frac"),
    ]


def unigram_logppl(df, id_col: str, text_col: str):
    """CCNet-style LM quality scoring with a corpus-trained UNIGRAM model:
    per-document mean negative log-probability of its tokens under the
    corpus-wide unigram frequency distribution — high logppl = tokens rare
    in this corpus (gibberish / other-domain), low = boilerplate-ish. The
    quality-bucket mechanic of CCNet (Wenzek et al. 2020) with the KenLM
    5-gram swapped for the heaviest model expressible engine-side.

    Two aggregation passes and one join, all whole-stage-codegen:
    explode -> (doc, term) tf -> term counts; at 100 TB the vocabulary is
    ZIPF-small relative to the corpus so the count join is broadcast-or-AQE,
    and the corpus streams map-side. Float parity with the SQL oracle: the
    per-doc sum's addition order differs between engines (~1e-16 relative),
    so the final mean takes the moments treatment — +2^-33 dyadic nudge off
    rounding boundaries, ROUND 6, +0.0 signed-zero normalization.

    Returns one row per doc: (id, n_tokens, logppl)."""
    toks = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("__term"))
    tf = toks.groupBy(id_col, "__term").agg(F.count(F.lit(1)).alias("__tf"))
    cnt = tf.groupBy("__term").agg(F.sum("__tf").alias("__cnt"))
    tot = cnt.agg(F.sum("__cnt").alias("__t"))
    per = tf.join(cnt, on="__term").crossJoin(F.broadcast(tot))
    doc = per.groupBy(id_col).agg(
        F.sum("__tf").alias("n_tokens"),
        F.sum(F.col("__tf") * F.log(F.col("__cnt").cast("double") / F.col("__t"))).alias("__slp"),
    )
    return doc.select(
        F.col(id_col),
        F.col("n_tokens"),
        (F.round(-F.col("__slp") / F.col("n_tokens") + F.lit(NUDGE_6DP), 6) + F.lit(0.0)).alias("logppl"),
    )
