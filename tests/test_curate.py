"""jobs/curate.py — the composed 4-stage curation pipeline against
hand-constructed documents where each stage's effect is unambiguous."""

from __future__ import annotations

from chronon_spark.jobs.curate import curate

GOOD = (
    "the quick brown fox jumps over the lazy dog while the rain falls "
    "softly and the wind is quiet near the old stone bridge tonight"
)
GOOD2 = (
    "a completely different high quality passage with many distinct words "
    "describing mountains rivers forests valleys and the long road home"
)
CONTAMINATED = (
    "benchmark question one what is the capital of france answer paris "
    "plus extra context words to clear the quality bar easily here now"
)
LOWQ = "spam spam spam spam spam spam spam spam spam"  # 9 tokens, all repeats


def _docs(spark):
    rows = [
        (1, GOOD),
        (2, GOOD),  # exact duplicate of 1 -> dropped (keep min id)
        (3, GOOD2),
        (4, CONTAMINATED),  # shares 8-grams with the bench doc -> dropped
        (5, LOWQ),  # repetition floors uniq ratio -> below min_quality
        (6, "tiny"),  # < 10 tokens -> quality misses the length bonus
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_stages(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame([(100, CONTAMINATED)], "doc_id long, text string")
    out = curate(docs, bench, min_quality=0.6).toPandas().set_index("doc_id")
    # dedup kept 1, dropped 2; decontamination dropped 4; quality dropped 5+6
    assert sorted(out.index) == [1, 3]
    assert set(out["split"]) <= {"train", "val", "test"}
    assert (out["quality"] >= 0.6).all()
    assert (out["n_tokens"] > 10).all()


def test_curate_lang_filter(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame([(100, "nothing shared here at all")], "doc_id long, text string")
    full = curate(docs, bench, min_quality=0.0)
    langs = {r["doc_id"]: r["lang"] for r in full.collect()}
    some_lang = langs[1]
    only = curate(docs, bench, min_quality=0.0, langs=(some_lang,))
    assert all(r["lang"] == some_lang for r in only.collect())


def test_curate_split_is_deterministic(spark):
    docs = _docs(spark)
    bench = spark.createDataFrame([(100, "zz yy xx")], "doc_id long, text string")
    a = {r["doc_id"]: r["split"] for r in curate(docs, bench, min_quality=0.0).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in curate(docs.repartition(7), bench, min_quality=0.0).collect()
    }
    assert a == b  # partitioning-invariant
