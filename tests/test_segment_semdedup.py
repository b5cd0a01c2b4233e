"""segment_dedup (sub-document boilerplate) + semdedup (cluster-scoped
semantic dedup) unit tests against hand-computed expectations."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from chronon_spark.functions.dedup import segment_dedup, segment_hashes
from chronon_spark.functions.similarity import SEMDEDUP_TABLE, lsh_bucket, semdedup

W8_A = "a b c d e f g h"          # one full segment
W8_B = "p q r s t u v w"          # a different full segment


def test_segment_hashes_shapes(spark):
    df = spark.createDataFrame(
        [
            (1, f"{W8_A} {W8_B} x y"),  # 18 tokens -> 2 segments (tail dropped)
            (2, "one two three"),        # < 8 tokens -> no segments
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r.h for r in df.select("doc_id", segment_hashes("text").alias("h")).collect()}
    assert len(rows[1]) == 2
    assert rows[2] == []
    # segment identity: same 8 tokens -> same hash regardless of position
    df2 = spark.createDataFrame([(3, f"{W8_B} {W8_A}")], "doc_id int, text string")
    h2 = df2.select(segment_hashes("text").alias("h")).head().h
    assert set(h2) == set(rows[1][:2])


def test_segment_dedup_fractions(spark):
    # A appears in docs 1+2 (boilerplate); B only in doc 1; doc 3 too short
    df = spark.createDataFrame(
        [(1, f"{W8_A} {W8_B}"), (2, f"{W8_A} z z z z z z z z"), (3, "tiny doc")],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in segment_dedup(df, "doc_id", "text").collect()}
    assert (out[1].n_segments, out[1].n_dup) == (2, 1) and math.isclose(out[1].dup_frac, 0.5)
    assert (out[2].n_segments, out[2].n_dup) == (2, 1)  # the z-segment is unique
    assert (out[3].n_segments, out[3].n_dup, out[3].dup_frac) == (0, 0, None)


def test_segment_dedup_within_doc_repeat_not_boilerplate(spark):
    # the same segment twice in ONE doc is not cross-doc boilerplate
    df = spark.createDataFrame([(1, f"{W8_A} {W8_A}")], "doc_id int, text string")
    r = segment_dedup(df, "doc_id", "text").head()
    assert (r.n_segments, r.n_dup) == (2, 0)


def _vec(seed: int, dims: int = 64) -> list[float]:
    # deterministic unit-ish vectors; seed controls direction
    return [math.sin(seed * 0.7 + d) for d in range(dims)]


def test_semdedup_drops_exact_duplicates(spark):
    v1, v2 = _vec(1), _vec(2)
    df = spark.createDataFrame(
        [(10, v1), (11, v1), (12, v1), (20, v2)],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in semdedup(df, threshold=0.99).collect()}
    # identical vectors share a bucket by construction; lowest id is kept
    assert not out[10].dropped and out[10].dup_of is None
    assert out[11].dropped and out[11].dup_of == 10
    assert out[12].dropped and out[12].dup_of == 10
    assert not out[20].dropped


def test_semdedup_cell_matches_lsh_bucket(spark):
    df = spark.createDataFrame([(1, _vec(5))], "vec_id long, embedding array<float>")
    cell = semdedup(df, threshold=0.99).head().cell
    direct = df.select(lsh_bucket(F.col("embedding"), SEMDEDUP_TABLE, 4, 64).alias("b")).head().b
    assert cell == direct


def _basis(i: int, dims: int = 64) -> list[float]:
    return [1.0 if d == i % dims else 0.0 for d in range(dims)]


def test_semdedup_one_row_per_vector(spark):
    # distinct basis vectors are mutually orthogonal (cos 0); the 5 re-ids
    # are exact copies (cos 1) and must be the only drops
    vs = [(i, _basis(i)) for i in range(30)] + [(100 + i, _basis(i)) for i in range(5)]
    df = spark.createDataFrame(vs, "vec_id long, embedding array<float>")
    out = semdedup(df, threshold=0.99)
    assert out.count() == len(vs)
    dropped = {r.vec_id: r.dup_of for r in out.where(F.col("dropped")).collect()}
    assert dropped == {100 + i: i for i in range(5)}


def test_unigram_logppl_hand_computed(spark):
    from chronon_spark.functions.text import unigram_logppl

    # corpus: "a" x3, "b" x1 -> T=4; p(a)=3/4, p(b)=1/4
    df = spark.createDataFrame([(1, "a a"), (2, "a b")], "doc_id int, text string")
    out = {r.doc_id: r for r in unigram_logppl(df, "doc_id", "text").collect()}
    ln = math.log
    assert out[1].n_tokens == 2 and math.isclose(out[1].logppl, round(-ln(3 / 4) + 1.1641532182693481e-10, 6))
    exp2 = -(ln(3 / 4) + ln(1 / 4)) / 2
    assert out[2].n_tokens == 2 and math.isclose(out[2].logppl, round(exp2 + 1.1641532182693481e-10, 6))


# ---------------------------------------------------------------- brute-force parity


def _brute_segment_dedup(docs: list[tuple[int, str]], n: int = 8, min_docs: int = 2):
    """Pure-python oracle: same segmentation, inverted index, fractions."""
    import hashlib
    from collections import defaultdict

    segs = {}
    for did, txt in docs:
        toks = txt.split()
        segs[did] = [
            hashlib.md5(" ".join(toks[i * n : i * n + n]).encode()).hexdigest()
            for i in range(len(toks) // n)
        ]
    owners = defaultdict(set)
    for did, hs in segs.items():
        for h in hs:
            owners[h].add(did)
    out = {}
    for did, hs in segs.items():
        nd = sum(1 for h in hs if len(owners[h]) >= min_docs)
        out[did] = (len(hs), nd, nd / len(hs) if hs else None)
    return out


def test_segment_dedup_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for did in range(40):
        L = rng.randint(0, 40)
        docs.append((did, " ".join(rng.choice(vocab) for _ in range(L))))
    # inject literal copies so cross-doc segments definitely exist
    docs.append((100, docs[0][1]))
    docs.append((101, docs[1][1] + " " + docs[2][1]))
    exp = _brute_segment_dedup(docs)
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {
        r.doc_id: (r.n_segments, r.n_dup, r.dup_frac)
        for r in segment_dedup(df, "doc_id", "text").collect()
    }
    for did, (ns, nd, frac) in exp.items():
        gns, gnd, gfrac = got[did]
        assert (gns, gnd) == (ns, nd), f"doc {did}"
        assert (gfrac is None) == (frac is None) and (frac is None or math.isclose(gfrac, frac))


def test_semdedup_matches_bruteforce(spark):
    """Within-bucket pair semantics vs a python replay using the SAME bucket
    function (parity is about the drop/representative logic, not the LSH)."""
    import random

    rng = random.Random(11)
    vecs = []
    for i in range(40):
        base = [rng.uniform(-1, 1) for _ in range(64)]
        vecs.append((i, base))
        if i % 7 == 0:  # a jittered near-copy likely above threshold
            vecs.append((1000 + i, [x + rng.uniform(-0.01, 0.01) for x in base]))
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    rows = semdedup(df, threshold=0.9).collect()
    cells = {r.vec_id: r.cell for r in rows}
    # python replay on float32-rounded inputs (Spark stores array<float>)
    import numpy as np

    v32 = {i: np.asarray(v, np.float32).astype(np.float64) for i, v in vecs}

    def cos(a, b):
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    exp_dup = {}
    for i, vi in v32.items():
        lower = [
            j for j, vj in v32.items() if j < i and cells[j] == cells[i] and cos(vj, vi) >= 0.9
        ]
        if lower:
            exp_dup[i] = min(lower)
    got = {r.vec_id: r.dup_of for r in rows if r.dropped}
    assert got == exp_dup


def test_segment_rewrite_removes_boilerplate_and_keeps_tail(spark):
    from chronon_spark.functions.dedup import segment_dedup_rewrite

    df = spark.createDataFrame(
        [
            (1, f"{W8_A} {W8_B} x y"),            # A boilerplate, B unique, tail "x y"
            (2, f"{W8_A} z1 z2 z3 z4 z5 z6 z7 z8"),  # A boilerplate, z-seg unique
            (3, "tiny doc"),                       # < 8 tokens: text passes through
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in segment_dedup_rewrite(df, "doc_id", "text").collect()}
    assert (out[1].n_segments, out[1].n_dropped) == (2, 1)
    assert out[1].cleaned_text == f"{W8_B} x y"
    assert (out[2].n_segments, out[2].n_dropped) == (2, 1)
    assert out[2].cleaned_text == "z1 z2 z3 z4 z5 z6 z7 z8"
    assert (out[3].n_segments, out[3].n_dropped) == (0, 0)
    assert out[3].cleaned_text == "tiny doc"


def test_segment_rewrite_all_dropped_and_order(spark):
    from chronon_spark.functions.dedup import segment_dedup_rewrite

    # both segments boilerplate -> empty cleaned text; order preserved in doc 3
    df = spark.createDataFrame(
        [
            (1, f"{W8_A} {W8_B}"),
            (2, f"{W8_A} {W8_B}"),
            (3, f"u1 u2 u3 u4 u5 u6 u7 u8 {W8_A} v1 v2 v3 v4 v5 v6 v7 v8"),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in segment_dedup_rewrite(df, "doc_id", "text").collect()}
    assert out[1].cleaned_text == "" and out[1].n_dropped == 2
    assert out[3].cleaned_text == "u1 u2 u3 u4 u5 u6 u7 u8 v1 v2 v3 v4 v5 v6 v7 v8"
