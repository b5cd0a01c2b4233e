"""Tests for the training-data pipeline functions (text / dedup / similarity /
multimodal), following the reference's oracle style (SURVEY.md §5): every
approximate path is checked against an exact brute-force on the same data.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from chronon_spark.functions import dedup, multimodal, similarity, text

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# ---------------------------------------------------------------- text


def test_token_stats(docs):
    row = (
        docs.select(
            "text",
            text.token_count("text").alias("n"),
            text.char_count("text").alias("c"),
            text.unique_token_ratio("text").alias("u"),
            text.stopword_ratio("text").alias("s"),
            text.punct_ratio("text").alias("p"),
        )
        .orderBy("text")
        .first()
    )
    toks = row["text"].split()
    assert row["n"] == len(toks)
    assert row["c"] == len(row["text"])
    assert row["u"] == pytest.approx(len(set(toks)) / len(toks))
    assert row["s"] == pytest.approx(sum(t in text.STOPWORDS_EN for t in toks) / len(toks))
    assert row["p"] == pytest.approx(sum(not (ch.isalnum() or ch in "_ ") for ch in row["text"]) / len(row["text"]))


def test_word_shingles_match_python(docs):
    row = docs.select("text", text.word_shingles("text", 3).alias("sh")).first()
    toks = row["text"].split()
    expect = sorted({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
    assert sorted(row["sh"]) == expect


def test_word_shingles_short_text(spark):
    df = spark.createDataFrame([("a b",), ("",)], ["text"])
    rows = df.select(text.word_shingles("text", 3).alias("sh")).collect()
    assert rows[0]["sh"] == [] and rows[1]["sh"] == []


def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        [
            ("the value of the table and the row", "en"),
            ("el que la de los una por con y", "es"),
            ("zzz qqq www", "und"),
        ],
        ["text", "expect"],
    )
    rows = df.select("expect", text.lang_id("text").alias("lang"), text.quality_score("text").alias("q")).collect()
    for r in rows:
        assert r["lang"] == r["expect"]
        assert 0.0 <= r["q"] <= 1.2


def test_fingerprint_normalizes(spark):
    df = spark.createDataFrame([("Hello  World",), ("hello world",)], ["text"])
    fps = [r[0] for r in df.select(text.fingerprint("text")).collect()]
    assert fps[0] == fps[1] == hashlib.md5(b"hello world").hexdigest()


def test_bpe_ish_tokens(spark):
    df = spark.createDataFrame([("don't stop, 42 times!",)], ["text"])
    toks = df.select(text.bpe_ish_tokens("text").alias("t")).first()["t"]
    assert toks == ["don", "'", "t", "stop", ",", "42", "times", "!"]


# ---------------------------------------------------------------- dedup


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "A b  C"), (3, "different text")], ["doc_id", "text"]
    )
    out = {r["keep_id"]: r["n_dups"] for r in dedup.exact_dedup(df, "text", "doc_id").collect()}
    assert out == {1: 2, 3: 1}


def test_minhash_signature_is_true_min(docs):
    row = docs.select(
        "text",
        text.word_shingles("text", 3).alias("sh"),
        dedup.minhash_signature("text", num_hashes=4).alias("sig"),
    ).first()
    from chronon_spark.functions.vec_kernels import minhash_params

    a_c, b_c = minhash_params(4)
    bases = [int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "big") for s in row["sh"]]
    for i in range(4):
        expect = min((a_c[i] * x + b_c[i]) % (1 << 32) for x in bases)
        assert row["sig"][i] == expect


def test_minhash_sig_arrow_matches_expression(docs):
    from chronon_spark.functions.vec_kernels import minhash_sig_arrow

    sh = docs.limit(40).select(
        "doc_id", text.word_shingles("text", 3).alias("sh")
    ).where(F.size("sh") > 0)
    both = sh.select(
        "doc_id",
        dedup.minhash_from_shingles(F.col("sh"), num_hashes=8).alias("expr_sig"),
        minhash_sig_arrow(F.col("sh"), num_hashes=8).alias("kern_sig"),
    )
    for r in both.collect():
        assert r["expr_sig"] == r["kern_sig"]


def test_minhash_lsh_finds_planted_dups(docs):
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, threshold=0.5).collect()
    }
    assert len(exact) == 25  # planted near-dup pairs at sf0.01
    # strong banding (16 bands of 2): detection prob at j=0.5 is 1-(1-.25)^16 ≈ .99
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_dedup(
            docs, "doc_id", "text", num_hashes=32, bands=16, threshold=0.5
        ).collect()
    }
    assert lsh <= exact  # verification step guarantees no false positives
    assert len(lsh) >= 0.9 * len(exact)


def test_simhash_properties(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta zeta"), (3, "x1 y2 z3 w4 v5")],
        ["doc_id", "text"],
    )
    sigs = {r["doc_id"]: r["s"] for r in df.select("doc_id", dedup.simhash("text").alias("s")).collect()}
    assert all(0 <= s < 2**32 for s in sigs.values())
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(sigs[1], sigs[2]) < ham(sigs[1], sigs[3])


def test_simhash_pairs_radius(spark, docs):
    pairs = dedup.simhash_pairs(docs, "doc_id", "text", max_hamming=6).collect()
    # brute-check completeness AND soundness against per-doc 64-bit signatures
    sig = {
        r["doc_id"]: (r["s"]["hi"], r["s"]["lo"])
        for r in docs.select("doc_id", dedup.simhash64("text").alias("s")).collect()
    }
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    ids = sorted(sig)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(sig[a][0] ^ sig[b][0]).count("1") + bin(sig[a][1] ^ sig[b][1]).count("1")
            if h <= 6:
                want[(a, b)] = h
    assert got == want


# ---------------------------------------------------------------- similarity


def test_cosine_topk_matches_numpy(emb):
    import numpy as np

    queries = emb.where(F.col("vec_id") < 3).withColumnRenamed("vec_id", "query_id")
    out = similarity.cosine_topk(emb, queries, k=5).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    for qid in range(3):
        got = [(r["rank"], r["neighbor_id"]) for r in out if r["query_id"] == qid]
        q = vecs[qid]
        cos = {
            i: float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
            for i, v in vecs.items()
            if i != qid
        }
        expect = sorted(cos, key=lambda i: (-cos[i], i))[:5]
        assert [n for _, n in sorted(got)] == expect


def test_lsh_ann_recall(emb):
    queries = emb.where(F.col("vec_id") < 10).withColumnRenamed("vec_id", "query_id")
    exact = similarity.cosine_topk(emb, queries, k=5).collect()
    # neighbors here are weak (max cos ≈ 0.5 → p_bit ≈ 0.6): 4 planes ×
    # 12 tables gives expected recall ≈ 1-(1-0.6^4)^12 ≈ 0.8
    approx = similarity.lsh_ann_topk(emb, queries, k=5, n_tables=12, n_planes=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = tot = 0
    for r in approx:
        tot += 1
        hit += r["neighbor_id"] in exact_sets[r["query_id"]]
    # candidates are bucket-mates only; re-rank is exact → decent recall
    assert tot > 0 and hit / max(sum(len(v) for v in exact_sets.values()), 1) >= 0.5


def test_ivf_ann_recall(emb):
    queries = emb.where(F.col("vec_id") < 10).withColumnRenamed("vec_id", "query_id")
    exact = similarity.cosine_topk(emb, queries, k=5).collect()
    approx = similarity.ivf_ann_topk(emb, queries, k=5, n_centroids=16, n_probe=6).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hit = sum(r["neighbor_id"] in exact_sets[r["query_id"]] for r in approx)
    # 6/16 cells probed; weak neighbors (max cos ~0.5) -> partial recall ok
    assert len(approx) > 0 and hit / max(sum(len(v) for v in exact_sets.values()), 1) >= 0.4


def test_near_dup_pairs_symmetric_threshold(emb):
    pairs = similarity.near_dup_pairs(emb, threshold=0.4).collect()
    assert all(r["cos"] >= 0.4 and r["id_a"] < r["id_b"] for r in pairs)


def test_near_dup_blocked_equals_bruteforce(emb):
    """The blocked BLAS path is EXACT: same pair set and cos values (to the
    shared 6-decimal rounding) as the non-equi-join brute force."""
    want = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.near_dup_pairs_bruteforce(emb, threshold=0.4).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cos"]
        for r in similarity.near_dup_pairs(emb, threshold=0.4, method="blocked", n_blocks=7).collect()
    }
    assert got == want and len(want) > 0


def test_near_dup_lsh_full_recall_on_tight_threshold(spark):
    """At genuine near-dup thresholds (cos >= 0.9, per-plane collision
    probability >= 0.9) the LSH path must find every pair: planted pairs are
    tiny perturbations, distractors are random."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        v = rng.normal(size=64)
        rows.append((2 * i, (v / np.linalg.norm(v)).tolist()))
        w = v + rng.normal(size=64) * 0.05  # cos ~ 0.999
        rows.append((2 * i + 1, (w / np.linalg.norm(w)).tolist()))
    for i in range(200):
        v = rng.normal(size=64)
        rows.append((1000 + i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = {
        (r["id_a"], r["id_b"])
        for r in similarity.near_dup_pairs_bruteforce(df, threshold=0.9).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.near_dup_pairs(df, threshold=0.9, method="lsh").collect()
    }
    assert want and got == want
    # and the plan is candidate-driven: no row-level cartesian
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        similarity.near_dup_pairs(df, threshold=0.9, method="lsh").explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()


# ---------------------------------------------------------------- multimodal


def test_multimodal_image_features(spark):
    media = multimodal.synth_media(spark, n=16, kind="image")
    out = multimodal.extract_image_features(media, resize_to=(8, 8)).collect()
    assert len(out) == 16
    assert all(len(r["feat"]) == 64 for r in out)
    # deterministic: same payload → same features
    again = multimodal.extract_image_features(multimodal.synth_media(spark, n=16), resize_to=(8, 8)).collect()
    assert {r["media_id"]: r["feat"] for r in out} == {r["media_id"]: r["feat"] for r in again}


def test_multimodal_real_decoder_is_stubbed(spark):
    media = multimodal.synth_media(spark, n=2)
    with pytest.raises(Exception, match="NotImplementedError|plug PIL"):
        multimodal.extract_image_features(media, decoder="real").collect()


def test_frame_sampling(spark):
    media = multimodal.synth_media(spark, n=4, kind="video")
    out = multimodal.sample_frames(media, every_n=10).collect()
    assert len(out) == 4 * 10  # n_frames=100, every 10th
    assert {r["frame_idx"] for r in out} == set(range(0, 100, 10))


# ------------------------------------------------- arrow-kernel equivalence


def test_arrow_kernels_bitwise_equal_expression_path(emb):
    """The vec_kernels Arrow path must reproduce the HOF-fold expression path
    BITWISE (same float64 op order) — buckets, cells, probes, and raw cosine."""
    from chronon_spark.functions import vec_kernels as VK

    # LSH buckets: kernel vs per-plane fold expression
    expr_b = F.array(*[similarity.lsh_bucket(F.col("embedding"), t, 4, 64) for t in range(3)])
    both = emb.select(
        "vec_id",
        expr_b.alias("eb"),
        VK.lsh_buckets_arrow(F.col("embedding"), 3, 4, 64).alias("kb"),
    ).collect()
    for r in both:
        assert list(r["eb"]) == list(r["kb"]), r["vec_id"]

    # IVF cell: kernel vs array_position(argmax) expression
    cells = emb.select(
        "vec_id",
        similarity.ivf_cell(F.col("embedding"), 8, 64).alias("ec"),
        VK.ivf_cell_arrow(F.col("embedding"), 8, 64).alias("kc"),
    ).collect()
    for r in cells:
        assert int(r["ec"]) == int(r["kc"]), r["vec_id"]

    # cosine: kernel vs sequential fold, exact float equality (==, not approx)
    a = emb.where(F.col("vec_id") < 30).select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.where((F.col("vec_id") >= 30) & (F.col("vec_id") < 60)).select(
        F.col("vec_id").alias("ib"), F.col("embedding").alias("vb")
    )
    pairs = a.crossJoin(b).select(
        similarity.cosine(F.col("va"), F.col("vb")).alias("ec"),
        VK.cosine_arrow(F.col("va"), F.col("vb"), 64).alias("kc"),
    )
    for r in pairs.collect():
        assert r["ec"] == r["kc"]


def test_ivf_probe_cells_match_rank_expression(emb):
    """Probe selection: stable argsort kernel == the rank-expression filter
    (ties to the lower index), compared as sets per query."""
    from chronon_spark.functions import vec_kernels as VK
    from chronon_spark.functions.similarity import _ivf_scores

    sc = _ivf_scores(F.col("embedding"), 8, 64)
    probe_expr = F.filter(
        F.sequence(F.lit(1), F.lit(8)),
        lambda j: F.size(
            F.filter(
                F.sequence(F.lit(1), F.lit(8)),
                lambda j2: (F.try_element_at(sc, j2) > F.try_element_at(sc, j))
                | ((F.try_element_at(sc, j2) == F.try_element_at(sc, j)) & (j2 < j)),
            )
        )
        < 3,
    )
    rows = emb.where(F.col("vec_id") < 50).select(
        "vec_id",
        probe_expr.alias("ep"),
        VK.ivf_probe_cells_arrow(F.col("embedding"), 8, 3, 64).alias("kp"),
    ).collect()
    for r in rows:
        assert sorted(r["ep"]) == sorted(r["kp"]), r["vec_id"]


def test_connected_components_chain_clique_singleton(spark):
    # chain 1-2-3-4 (diameter 3), clique {10,11,12}, isolated 20
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 20]], "id long")
    got = {r["id"]: r["comp"] for r in dedup.connected_components(pairs, all_nodes=nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20}


def test_dedup_clusters_canonical_invariants(docs):
    out = dedup.dedup_clusters(docs, "doc_id", "text", shingle_n=3, threshold=0.5).collect()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert len(out) == docs.count()  # every doc assigned
    for cid, rows in by_cluster.items():
        ids = sorted(r["doc_id"] for r in rows)
        assert ids[0] == cid  # canonical is the min id
        canon = [r for r in rows if r["is_canonical"]]
        assert len(canon) == 1 and canon[0]["doc_id"] == cid
    # every near-dup pair lands in one cluster
    comp = {r["doc_id"]: r["cluster_id"] for r in out}
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", shingle_n=3, threshold=0.5).collect()
    assert pairs, "fixture should contain planted near-dups"
    for p in pairs:
        assert comp[p["id_a"]] == comp[p["id_b"]]


def test_repetition_signals(spark):
    import pandas as pd

    from chronon_spark.functions.text import repetition_signals

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a a a a b",          # top word 'a' x4/5; top bigram 'a a' x3/4
                "x y x y x y",        # top word x3/6; bigrams: 'x y' x3 of 5
                "unique words only here",  # all distinct
            ],
        }
    )
    got = (
        spark.createDataFrame(docs)
        .select("doc_id", *repetition_signals("text"))
        .toPandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "n_words"] == 5
    assert abs(got.loc[1, "top_word_frac"] - 0.8) < 1e-9
    assert abs(got.loc[1, "top_bigram_frac"] - 0.75) < 1e-9
    assert abs(got.loc[2, "top_word_frac"] - 0.5) < 1e-9
    assert abs(got.loc[2, "top_bigram_frac"] - 0.6) < 1e-9
    assert got.loc[3, "distinct_word_ratio"] == 1.0
    assert abs(got.loc[3, "top_word_frac"] - 0.25) < 1e-9


def test_connected_components_star_equivalence(spark):
    import random

    # chain (worst case for propagation), clique, random graph, isolated
    rnd = random.Random(11)
    chain = [(i, i + 1) for i in range(100, 140)]
    clique = [(a, b) for a in range(200, 205) for b in range(a + 1, 205)]
    randg = [(rnd.randrange(300, 360), rnd.randrange(300, 360)) for _ in range(80)]
    randg = [(a, b) for a, b in randg if a != b]
    pairs = spark.createDataFrame(chain + clique + randg, "id_a long, id_b long")
    node_ids = sorted({x for p in chain + clique + randg for x in p} | {999})
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id long")
    want = {
        r["id"]: r["comp"]
        for r in dedup.connected_components(pairs, all_nodes=nodes, max_iter=60).collect()
    }
    got = {
        r["id"]: r["comp"]
        for r in dedup.connected_components_star(pairs, all_nodes=nodes).collect()
    }
    assert got == want
    assert got[999] == 999 and got[140] == 100


def test_dedup_clusters_default_is_scale_safe():
    # The O(log n) large-star/small-star algorithm must stay the DEFAULT:
    # min-label propagation is O(component-diameter) Spark jobs, and web
    # duplicate graphs have chain-shaped components (templated pages).
    import inspect

    assert inspect.signature(dedup.dedup_clusters).parameters["algo"].default == "star"


def test_ngram_jaccard_max_df(docs):
    # the fully exact O(df²)-per-posting path is an EXPLICIT opt-in
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", 3, threshold=0.5, max_df=None
        ).collect()
    }
    # the DEFAULT is the pruned path with max_df=10^4 — inactive below 10^4
    # docs, so identical pairs AND values on this fixture
    import inspect

    assert inspect.signature(dedup.ngram_jaccard_pairs).parameters["max_df"].default == 10_000
    assert inspect.signature(dedup.winnow_overlap_pairs).parameters["max_df"].default == 10_000
    default = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", 3, threshold=0.5).collect()
    }
    assert default == exact and exact
    # max_df above every posting length -> identical pairs AND values
    loose = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", 3, threshold=0.5, max_df=10**6
        ).collect()
    }
    assert loose == exact and exact
    # aggressive prune -> subset of exact, with EXACT jaccard values
    tight = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, "doc_id", "text", 3, threshold=0.5, max_df=3
        ).collect()
    }
    assert set(tight) <= set(exact)
    for k, v in tight.items():
        assert abs(v - exact[k]) < 1e-12


# ---------------------------------------------------------------- winnowing


def _py_winnow(t: str, k: int = 8, w: int = 4) -> list[str]:
    import re

    norm = re.sub(r"\s+", " ", t.lower()).strip()
    if len(norm) < k:
        return []
    hs = [
        hashlib.md5(norm[i : i + k].encode()).hexdigest()[:16]
        for i in range(len(norm) - k + 1)
    ]
    return sorted({min(hs[j : j + w]) for j in range(max(1, len(hs) - w + 1))})


def test_winnow_fingerprints_match_python(docs):
    rows = (
        docs.limit(20)
        .select("doc_id", "text", text.winnow_fingerprints("text").alias("fps"))
        .collect()
    )
    assert rows
    for r in rows:
        assert sorted(r["fps"]) == _py_winnow(r["text"])


def test_winnow_short_and_exact_k_texts(spark):
    df = spark.createDataFrame(
        [("short", "abc"), ("exact", "abcdefgh"), ("ws", "  a   b  ")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["fps"]
        for r in df.select(
            "doc_id", text.winnow_fingerprints("text").alias("fps")
        ).collect()
    }
    assert got["short"] == []
    assert got["exact"] == [hashlib.md5(b"abcdefgh").hexdigest()[:16]]
    # whitespace collapses to "a b" (3 chars) -> below k
    assert got["ws"] == []


def test_winnow_guarantee_shared_substring(spark):
    """Winnowing guarantee: any shared normalized substring of length
    >= k + w - 1 (= 11) contributes at least one shared fingerprint."""
    shared = "zqxjkvbwpyg"  # 11 chars, appears in both docs
    df = spark.createDataFrame(
        [(1, f"left prefix {shared} left tail"), (2, f"other {shared} ending here")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id", text.winnow_fingerprints("text").alias("fps")
        ).collect()
    }
    assert got[1] & got[2], "docs sharing an 11-char substring must share a fingerprint"


def test_tfidf_topk_contract(spark):
    from chronon_spark.contracts.corpus import _q_tfidf_topk

    out = _q_tfidf_topk(spark, "/root/testdata/sf0.001").collect()
    assert out
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append((r["rnk"], r["score"], r["term"]))
    for doc_id, rows in by_doc.items():
        rows.sort()
        assert [r[0] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        # scores weakly decreasing in rank; ties broken by term asc
        for (r1, s1, t1), (r2, s2, t2) in zip(rows, rows[1:]):
            assert s1 > s2 or (s1 == s2 and t1 < t2)


def test_winnow_overlap_max_df_exact_scores(docs):
    exact = {
        (r["id_a"], r["id_b"]): (r["common"], r["containment"])
        for r in dedup.winnow_overlap_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert exact, "sf0.01 planted dups must produce winnow-overlap pairs"
    for (a, b), (c, s) in exact.items():
        assert a < b and c >= 1 and 0.5 <= s <= 1.0
    # aggressive posting prune -> subset of exact pairs with EXACT scores
    tight = {
        (r["id_a"], r["id_b"]): (r["common"], r["containment"])
        for r in dedup.winnow_overlap_pairs(
            docs, "doc_id", "text", threshold=0.5, max_df=3
        ).collect()
    }
    assert set(tight) <= set(exact)
    for pair, v in tight.items():
        assert v == exact[pair]


def test_persist_reused_registry_bounded(spark):
    """Scratch caches evict oldest-first beyond the keep window — a resident
    session must not pin memory/disk without bound (persist is advisory, an
    evicted frame recomputes)."""
    from chronon_spark.functions.dedup import _PERSIST_KEEP, _PERSISTED_REGISTRY, persist_reused

    frames = [persist_reused(spark.range(3).selectExpr(f"id + {i} AS v"), f"t{i}") for i in range(_PERSIST_KEEP + 3)]
    reg = _PERSISTED_REGISTRY[spark.sparkContext.applicationId]
    assert len(reg) <= _PERSIST_KEEP
    # the first frames were evicted (storage level reset to NONE), newest kept
    assert frames[0].storageLevel.useMemory is False
    assert frames[-1].storageLevel.useMemory is True
    # evicted frames still compute correctly
    assert frames[0].count() == 3
