"""Unit tests for the operator library against hand-computed oracles."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from league_of_legends_data_pipeline_spark.operators.dedup import (
    exact_dedup, minhash_lsh_pairs, ngram_jaccard_pairs, simhash64,
)
from league_of_legends_data_pipeline_spark.operators.joins import asof_join, range_join
from league_of_legends_data_pipeline_spark.operators.similarity import cosine_topk
from league_of_legends_data_pipeline_spark.operators.text import (
    fingerprint, predicted_language, quality_score, token_count,
)


# --- temporal joins --------------------------------------------------------

def _events(spark):
    rows = [
        # (key, ts, id, v)
        ("u1", "2024-01-01 10:00:00", 1, 1.0),
        ("u1", "2024-01-01 11:00:00", 2, 2.0),
        ("u1", "2024-01-01 11:00:00", 3, 3.0),  # tie on ts
        ("u2", "2024-01-01 09:00:00", 4, 4.0),
    ]
    return spark.createDataFrame(rows, ["k", "ts_s", "rid", "v"]) \
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")


def test_asof_join_backward_inclusive_and_ties(spark):
    left = spark.createDataFrame(
        [("u1", "2024-01-01 10:30:00", "a"),
         ("u1", "2024-01-01 11:00:00", "b"),   # equal ts → right visible
         ("u1", "2024-01-01 09:00:00", "c"),   # before all → no match
         ("u3", "2024-01-01 12:00:00", "d")],  # no right key
        ["k", "ts_s", "tag"],
    ).withColumn("lts", F.to_timestamp("ts_s")).drop("ts_s")
    out = asof_join(left, _events(spark), on="k", left_ts="lts", right_ts="ts",
                    right_cols=["rid", "v"], right_tiebreak="rid")
    got = {r["tag"]: (r["rid"], r["v"]) for r in out.collect()}
    assert got["a"] == (1, 1.0)
    assert got["b"] == (3, 3.0)      # tie broken by greatest rid
    assert got["c"] == (None, None)  # left join keeps row
    assert got["d"] == (None, None)


def test_asof_join_tolerance_and_inner(spark):
    left = spark.createDataFrame([("u1", "2024-01-01 12:00:00")], ["k", "ts_s"]) \
        .withColumn("lts", F.to_timestamp("ts_s")).drop("ts_s")
    out = asof_join(left, _events(spark), on="k", left_ts="lts", right_ts="ts",
                    right_cols=["rid"], tolerance=F.expr("INTERVAL 30 MINUTES"),
                    how="inner")
    assert out.count() == 0  # latest right is 11:00, outside 30min tolerance


def test_range_join_window(spark):
    left = spark.createDataFrame([("u1", "2024-01-01 11:30:00")], ["k", "ts_s"]) \
        .withColumn("lts", F.to_timestamp("ts_s")).drop("ts_s")
    out = range_join(left, _events(spark), on="k", left_ts="lts", right_ts="ts",
                     lookback_seconds=3600)
    assert sorted(r["rid"] for r in out.collect()) == [2, 3]  # 10:00 excluded


# --- dedup family ----------------------------------------------------------

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
    (3, "the quick brown fox jumped over the lazy dog"),  # near dup of 1
    (4, "completely different text about spark engines"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(spark):
    out = exact_dedup(_docs(spark), ["text"], id_col="doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3, 4]


def test_dedup_pairs_spreads_the_verify_stage(spark):
    """r14: candidate-pair dedup must ride an EXPLICIT-count exchange.
    dropDuplicates alone plans an AQE-coalescible shuffle, and the
    few-MB pair key set collapses to ONE post-shuffle partition — which
    then runs the downstream array-attach joins and Jaccard verify
    intersections single-threaded (measured 1.5-2.1 s vs 0.37-0.49 s on
    the q186 chain). Pin: _dedup_pairs' executed plan carries the
    full-parallelism hashpartitioning on the pair key, and no AQE
    coalesced read shrinks it back to one partition."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        _dedup_pairs,
    )

    n = spark.sparkContext.defaultParallelism
    cands = spark.range(10_000).select(
        (F.col("id") % 97).alias("id_a"), (F.col("id") % 89).alias("id_b"))
    out = _dedup_pairs(cands, cands)
    out.collect()
    # final (executed) section only — AQE appends "== Initial Plan =="
    plan = (out._jdf.queryExecution().executedPlan().toString()
            .split("== Initial Plan ==")[0])
    assert "hashpartitioning(id_a#" in plan and f", {n})" in plan, plan
    # the dedup aggregate must reuse that exchange (no second shuffle),
    # and it must be the explicit REPARTITION_BY_NUM form AQE never
    # coalesces (ENSURE_REQUIREMENTS is the coalescible one)
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "REPARTITION_BY_NUM" in plan, plan
    assert out.rdd.getNumPartitions() > 1


def test_ngram_jaccard_pairs_oracle(spark):
    out = ngram_jaccard_pairs(_docs(spark), "doc_id", "text",
                              shingle_k=3, threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out.collect()}

    def shingles(s, k=3):
        return {s[i:i + k] for i in range(max(len(s) - k + 1, 1))}

    for (a, b), j in got.items():
        sa, sb = shingles(DOCS[a - 1][1]), shingles(DOCS[b - 1][1])
        want = len(sa & sb) / len(sa | sb)
        assert j == pytest.approx(want, abs=1e-6)
    assert (1, 2) in got and got[(1, 2)] == 1.0
    assert (1, 3) in got  # near dup above 0.5
    assert not any(4 in p for p in got)


def test_ngram_jaccard_pairs_refuses_pathological_block(spark):
    """A degenerate blocking key (every doc in one block) must raise
    instead of silently running the O(n²) exact verifier all-pairs."""
    df = spark.createDataFrame([(i, "same length text!") for i in range(7)],
                               ["doc_id", "text"])
    with pytest.raises(ValueError, match="max_block_size"):
        ngram_jaccard_pairs(df, "doc_id", "text", shingle_k=3,
                            max_block_size=5).count()
    # same block passes with the guard disabled or the cap raised
    assert ngram_jaccard_pairs(df, "doc_id", "text", shingle_k=3,
                               max_block_size=None).count() == 21
    assert ngram_jaccard_pairs(df, "doc_id", "text", shingle_k=3,
                               max_block_size=100).count() == 21


def test_minhash_lsh_finds_near_dups(spark):
    out = minhash_lsh_pairs(_docs(spark), "doc_id", "text",
                            num_hashes=32, bands=16, shingle_k=3,
                            jaccard_threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs and (1, 3) in pairs
    assert not any(4 in p for p in pairs)


def test_simhash_hamming_property(spark):
    out = _docs(spark).select(
        "doc_id", simhash64(F.split("text", r"\s+"), bits=60).alias("sh"))
    sig = {r["doc_id"]: r["sh"] for r in out.collect()}
    assert sig[1] == sig[2]  # identical docs → identical signature

    def ham(a, b):
        return bin((a ^ b) & (2**60 - 1)).count("1")
    assert ham(sig[1], sig[3]) < ham(sig[1], sig[4])  # near < far

    # python oracle for one signature: bit j set iff majority of token
    # hashes have bit j set (votes +1/-1, weighted by token frequency)
    import hashlib
    toks = DOCS[0][1].split()
    hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
    want = sum(
        (1 << j) for j in range(60)
        if sum(1 if (h >> j) & 1 else -1 for h in hs) > 0)
    assert sig[1] == want


# --- similarity ------------------------------------------------------------

def test_cosine_topk_exact(spark):
    vecs = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    out = cosine_topk(corpus=df, queries=df.filter(F.col("vec_id") == 0),
                      id_col="vec_id", vec_col="embedding", k=2)
    rows = sorted(out.collect(), key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in rows] == [1, 2]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (math.hypot(*a) * math.hypot(*b))
    assert rows[0]["cosine"] == pytest.approx(cos(vecs[0][1], vecs[1][1]), abs=1e-6)


def test_ivf_topk_recall_vs_exact(spark):
    """IVF with nprobe = all centroids must equal brute-force exactly."""
    from league_of_legends_data_pipeline_spark.operators.similarity import ivf_topk

    import random
    rng = random.Random(7)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") < 3)
    exact = cosine_topk(df, queries, k=3)
    # stride 10 → 6 centroids; probing all 6 lists covers the full corpus
    approx = ivf_topk(df, queries, k=3, centroid_stride=10, nprobe=6)
    assert sorted(map(tuple, exact.collect())) == sorted(map(tuple, approx.collect()))


def test_ivf_topk_curve_matches_independent_calls(spark):
    """The shared-assignment curve (r13) must be bit-identical to
    independent ivf_topk calls at every nprobe point."""
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        ivf_topk, ivf_topk_curve,
    )

    import random
    rng = random.Random(11)
    vecs = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = df.filter(F.col("vec_id") < 4)
    curve = ivf_topk_curve(df, queries, k=3, centroid_stride=10,
                           nprobes=(1, 2, 3))
    for nprobe in (1, 2, 3):
        solo = ivf_topk(df, queries, k=3, centroid_stride=10, nprobe=nprobe)
        assert sorted(map(tuple, solo.collect())) == \
            sorted(map(tuple, curve[nprobe].collect())), f"nprobe={nprobe}"


def test_bpe_pieces_oracle(spark):
    import re

    from league_of_legends_data_pipeline_spark.operators.text import (
        BPE_PATTERN, bpe_pieces,
    )

    s = "I'll buy 20 apples, don't wait -- ok?"
    df = spark.createDataFrame([(s,)], ["t"])
    got = df.select(bpe_pieces("t").alias("p")).collect()[0]["p"]
    assert got == re.findall(BPE_PATTERN, s) == [
        "I", "'ll", " buy", " 20", " apples", ",", " don", "'t",
        " wait", " --", " ok", "?"]


# --- text ------------------------------------------------------------------

def test_text_functions_oracle(spark):
    df = spark.createDataFrame([(1, "The quick brown fox is in the barn")], ["id", "t"])
    r = df.select(
        token_count("t").alias("n"),
        quality_score("t").alias("q"),
        predicted_language("t").alias("lang"),
        fingerprint("t").alias("fp"),
    ).collect()[0]
    assert r["n"] == 8
    assert r["lang"] == "en"
    assert 0.0 <= r["q"] <= 1.0
    # python oracle for the rolling hash
    fp = 0
    for ch in "The quick brown fox is in the barn":
        fp = (fp * 31 + ord(ch)) % 1_000_000_007
    assert r["fp"] == fp


def test_predicted_language_tiebreak(spark):
    # 'de' and 'en' share no stopwords here; craft equal ratios → 'de' wins
    # (alphabetical first-wins)
    df = spark.createDataFrame([(1, "the der")], ["id", "t"])
    assert df.select(predicted_language("t").alias("l")).collect()[0]["l"] == "de"


# --- connected components / cluster dedup ----------------------------------

def test_connected_components_chain_and_islands(spark):
    from league_of_legends_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    # chain 1-2-3-4-5 (diameter 4, exercises pointer jumping), pair {10,11},
    # triangle {20,21,22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11),
         (20, 21), (21, 22), (20, 22)],
        ["id_a", "id_b"],
    )
    expect = {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
              10: 10, 11: 10, 20: 20, 21: 20, 22: 20}
    # both strategies must agree: driver union-find (default at this size)
    # and the distributed pointer-jumping iteration (forced)
    got = {r["node"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == expect
    got_dist = {r["node"]: r["component"]
                for r in connected_components(
                    pairs, driver_max_edges=0).collect()}
    assert got_dist == expect


def test_connected_components_self_loops(spark):
    """A node appearing only in a self-loop pair is its own singleton
    component — and BOTH strategies agree (the driver union-find must not
    drop (a, a) edges on its one-orientation filter)."""
    from league_of_legends_data_pipeline_spark.operators.graph import (
        connected_components,
    )

    pairs = spark.createDataFrame([(5, 5), (1, 2), (2, 2)],
                                  ["id_a", "id_b"])
    expect = {5: 5, 1: 1, 2: 1}
    got = {r["node"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == expect
    got_dist = {r["node"]: r["component"]
                for r in connected_components(
                    pairs, driver_max_edges=0).collect()}
    assert got_dist == expect


def test_dedup_clusters_singletons_and_representatives(spark):
    from league_of_legends_data_pipeline_spark.operators.graph import dedup_clusters

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], ["doc_id"])
    pairs = spark.createDataFrame([(1, 3), (3, 5)], ["id_a", "id_b"])
    rows = {r["doc_id"]: r for r in dedup_clusters(docs, pairs, "doc_id").collect()}
    assert rows[1]["component"] == 1 and rows[3]["component"] == 1 \
        and rows[5]["component"] == 1
    assert rows[1]["cluster_size"] == 3
    assert rows[1]["is_representative"] and not rows[3]["is_representative"]
    # docs in no pair are singleton reps
    for d in (2, 4, 6):
        assert rows[d]["component"] == d and rows[d]["cluster_size"] == 1 \
            and rows[d]["is_representative"]


def test_salted_join_matches_plain_join(spark):
    from league_of_legends_data_pipeline_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [(k, i) for i in range(50) for k in ("hot", "hot2")] + [("cold", 99)],
        ["k", "v"],
    )
    right = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unmatched", "U")], ["k", "tag"])

    plain = left.join(right.withColumnRenamed("k", "rk"),
                      F.col("k") == F.col("rk"), "inner")
    salted = salted_join(left, right.withColumnRenamed("k", "rk"),
                         on_left="k", on_right="rk", num_salts=4)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    # left join keeps unmatched probe rows exactly once
    lsalted = salted_join(left, right.withColumnRenamed("k", "rk"),
                          on_left="k", on_right="rk", num_salts=4, how="left")
    lplain = left.join(right.withColumnRenamed("k", "rk"),
                       F.col("k") == F.col("rk"), "left")
    assert sorted(map(lambda r: tuple("∅" if x is None else x for x in r),
                      lsalted.collect())) \
        == sorted(map(lambda r: tuple("∅" if x is None else x for x in r),
                      lplain.collect()))

    with pytest.raises(ValueError):
        salted_join(left, right, on_left="k", how="full")


# --- sampling / splitting --------------------------------------------------

def _corpus(spark, n=300):
    return spark.createDataFrame(
        [(i, ["en", "fr", "es"][i % 3], f"s{i % 2}") for i in range(n)],
        ["doc_id", "lang", "source"],
    )


def test_hash_split_deterministic_and_partitioned(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import hash_split

    df = _corpus(spark)
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", w).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df.repartition(7), "doc_id", w).collect()}
    assert a == b                       # layout-independent
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    train = sum(1 for v in a.values() if v == "train")
    assert 0.7 * n < train < 0.9 * n    # roughly weighted
    # growing the corpus must not move existing docs between splits
    grown = hash_split(_corpus(spark, 600), "doc_id", w)
    g = {r["doc_id"]: r["split"] for r in grown.collect()}
    assert all(g[k] == v for k, v in a.items())


def test_hash_split_seed_changes_assignment(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import hash_split

    df = _corpus(spark)
    a = {r["doc_id"]: r["split"]
         for r in hash_split(df, "doc_id", {"x": 1, "y": 1}, seed=1).collect()}
    b = {r["doc_id"]: r["split"]
         for r in hash_split(df, "doc_id", {"x": 1, "y": 1}, seed=2).collect()}
    assert a != b


def test_stratified_sample_exact_counts(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        stratified_sample_n,
    )

    out = stratified_sample_n(_corpus(spark), ["lang"], 10, "doc_id")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 10, "fr": 10, "es": 10}
    # deterministic across layouts
    again = stratified_sample_n(_corpus(spark).repartition(5), ["lang"], 10, "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in again.collect())
    # stratum smaller than n → whole stratum kept
    small = stratified_sample_n(_corpus(spark, 6), ["lang"], 10, "doc_id")
    assert small.count() == 6


def test_hash_sample_fraction_and_stability(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import hash_sample

    df = _corpus(spark, 1000)
    kept = sorted(r["doc_id"] for r in hash_sample(df, "doc_id", 0.3).collect())
    assert 200 < len(kept) < 400
    # sample of a superset contains the same ids (prefix property)
    kept2 = sorted(r["doc_id"]
                   for r in hash_sample(_corpus(spark, 500), "doc_id", 0.3).collect())
    assert kept2 == [i for i in kept if i < 500]


def test_tfidf_scores_hand_oracle(spark):
    from league_of_legends_data_pipeline_spark.operators.text import tfidf_scores

    df = spark.createDataFrame(
        [(1, "a", "apple banana apple"),
         (2, "a", "banana cherry"),
         (3, "b", "cherry cherry date")],
        ["doc_id", "grp", "text"],
    )
    out = {(r["grp"], r["term"]): r["tfidf"]
           for r in tfidf_scores(df, "doc_id", "text", "grp").collect()}
    idf = lambda dfreq: math.log((3 + 1) / (dfreq + 1)) + 1
    # apple: only doc1 (tf=2, df=1); cherry in grp b: doc3 tf=2, df=2
    assert out[("a", "apple")] == pytest.approx(round(2 * idf(1), 6))
    assert out[("b", "cherry")] == pytest.approx(round(2 * idf(2), 6))
    assert out[("a", "cherry")] == pytest.approx(round(1 * idf(2), 6))


def test_blocked_near_dup_matches_exact(spark):
    import random

    from league_of_legends_data_pipeline_spark.operators.similarity import (
        cosine_near_dup_pairs, cosine_near_dup_pairs_blocked,
    )

    rng = random.Random(7)
    base = [[rng.gauss(0, 1) for _ in range(8)] for _ in range(10)]
    rows = []
    for i in range(120):
        v = [x + rng.gauss(0, 0.3) for x in base[i % 10]]
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = {(r.id_a, r.id_b): r.cosine
             for r in cosine_near_dup_pairs(df, threshold=0.8).collect()}
    blocked = {(r.id_a, r.id_b): r.cosine
               for r in cosine_near_dup_pairs_blocked(
                   df, threshold=0.8, num_blocks=4).collect()}
    assert exact.keys() == blocked.keys()
    assert len(exact) > 50  # fixture genuinely produces near-dups
    for k, v in exact.items():
        assert abs(v - blocked[k]) <= 2e-6


# --- Gopher-style text quality operators -----------------------------------

def test_word_ngrams_and_repetition(spark):
    from league_of_legends_data_pipeline_spark.operators.text import (
        ngram_repetition, word_ngrams,
    )

    df = spark.createDataFrame(
        [(1, "a b a b c"),      # bigrams: ab, ba, ab, bc -> 4 total, 3 distinct
         (2, "x"),              # < 2 words -> no bigrams
         (3, "w w w w")],       # ww, ww, ww -> 3 total, 1 distinct
        ["id", "text"],
    )
    grams = {r["id"]: r["g"] for r in df.select("id", word_ngrams("text", 2).alias("g")).collect()}
    assert grams[1] == ["a b", "b a", "a b", "b c"]
    assert grams[2] == []
    total, distinct, frac = ngram_repetition("text", 2)
    rows = {r["id"]: r for r in df.select(
        "id", total.alias("t"), distinct.alias("d"), frac.alias("f")).collect()}
    assert (rows[1]["t"], rows[1]["d"], rows[1]["f"]) == (4, 3, 0.25)
    assert (rows[2]["t"], rows[2]["d"], rows[2]["f"]) == (0, 0, 0.0)
    assert (rows[3]["t"], rows[3]["d"]) == (3, 1)
    assert rows[3]["f"] == round(1 - 1 / 3, 6)


def test_top_word_stats_tiebreak_and_totals(spark):
    from league_of_legends_data_pipeline_spark.operators.text import top_word_stats

    df = spark.createDataFrame(
        [(1, "b a b a c"),   # a:2 b:2 c:1 -> tie, 'a' wins alphabetically
         (2, "z z y")],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in top_word_stats(df, "doc_id", "text").collect()}
    assert rows[1]["top_word"] == "a"
    assert rows[1]["top_count"] == 2
    assert rows[1]["total_words"] == 5
    assert rows[1]["top_fraction"] == 0.4
    assert rows[2]["top_word"] == "z"
    assert rows[2]["top_fraction"] == round(2 / 3, 6)


def test_quantize_embeddings_roundtrip_and_constant_vector(spark):
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 0.5]),     # lo=0 hi=1: codes 0, 255, 128
         (2, [3.0, 3.0, 3.0])],    # constant: scale=0 -> codes 0, err 0
        ["vec_id", "embedding"],
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["codes"] == [0, 255, 128]
    assert rows[1]["max_abs_err"] <= rows[1]["scale"] / 2 + 1e-12
    assert rows[2]["codes"] == [0, 0, 0]
    assert rows[2]["max_abs_err"] == 0.0
    assert all(0 <= c <= 255 for r in rows.values() for c in r["codes"])


# --- chunking & packing ----------------------------------------------------

def test_chunk_documents_windows_and_tail(spark):
    from league_of_legends_data_pipeline_spark.operators.text import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))),  # 10 tokens
         (2, "only two"),                            # 2 tokens -> 1 chunk
         (3, "")],                                   # empty -> 1 empty chunk
        ["doc_id", "text"])
    out = chunk_documents(docs, "doc_id", "text", chunk_size=4, stride=3)
    rows = {(r.doc_id, r.chunk_idx): r for r in out.collect()}
    # doc 1: starts 0,3,6,9 -> lens 4,4,4,1
    assert [rows[(1, i)].chunk_len for i in range(4)] == [4, 4, 4, 1]
    # overlap: chunk 1 starts at token index 3
    import hashlib
    want = hashlib.md5("t3 t4 t5 t6".encode()).hexdigest()
    assert rows[(1, 1)].chunk_digest == want
    assert rows[(2, 0)].chunk_len == 2
    # empty doc still yields exactly one (empty) chunk
    assert rows[(3, 0)].chunk_len == 0
    assert len([k for k in rows if k[0] == 3]) == 1


def test_pack_sequences_bin_boundaries(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import pack_sequences

    rows = [("a", 1, 60), ("a", 2, 50), ("a", 3, 10),
            ("b", 1, 250), ("b", 2, 1)]
    df = spark.createDataFrame(rows, ["src", "doc_id", "n"])
    out = {(r.src, r.doc_id): r.bin_id
           for r in pack_sequences(df, "src", "doc_id", "n", budget=100).collect()}
    # a: starts 0, 60, 110 -> bins 0, 0, 1 (doc 2 straddles, stays in bin 0)
    assert (out[("a", 1)], out[("a", 2)], out[("a", 3)]) == (0, 0, 1)
    # b: giant doc occupies bins 0-2 but is attributed to its start bin;
    # next doc starts at offset 250 -> bin 2
    assert (out[("b", 1)], out[("b", 2)]) == (0, 2)


def test_pack_sequences_rejects_bad_budget(spark):
    df = spark.createDataFrame([("a", 1, 1)], ["src", "doc_id", "n"])
    from league_of_legends_data_pipeline_spark.operators.sampling import pack_sequences
    with pytest.raises(ValueError):
        pack_sequences(df, "src", "doc_id", "n", budget=0)


def test_minhash_signature_table_matches_column_form(spark):
    """The vectorized (numpy-per-Arrow-batch) signature must be
    bit-identical to the Column-expression reference form — same int64
    (a*(h%P)+b)%P arithmetic, so any divergence is a bug, not float noise."""
    from pyspark.sql import functions as F

    from league_of_legends_data_pipeline_spark.operators.dedup import (
        char_shingles, minhash_signature, minhash_signature_table,
        portable_hash64,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "pack my box with five dozen liquor jugs"),
         (3, "abc"),       # shorter than shingle_k -> single padded shingle
         (4, "aaaaaaa")],  # degenerate: one distinct shingle
        ["doc_id", "text"])
    col_form = df.select(
        "doc_id",
        minhash_signature(char_shingles("text", 5), num_hashes=6, seed=7)
        .alias("sig"))
    table_form = minhash_signature_table(
        df.select("doc_id",
                  F.transform(char_shingles("text", 5),
                              portable_hash64).alias("hm")),
        "doc_id", "hm", num_hashes=6, seed=7)
    a = {r.doc_id: r.sig for r in col_form.collect()}
    b = {r.doc_id: r.sig for r in table_form.collect()}
    assert a == b


def test_simhash_signature_table_matches_column_form(spark):
    """The vectorized simhash vote pass must be bit-identical to the
    Column-expression reference form (pure integer arithmetic), including
    the null-text -> null-signature and empty-token -> 0 edges."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        simhash_from_hashes, simhash_signature_table, portable_hash64,
    )

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "pack my box"), (3, ""),
         (4, None), (5, "one")],
        ["doc_id", "text"])
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    hashed = df.select(
        "doc_id", F.transform(toks, portable_hash64).alias("__ht"))
    col_form = {r.doc_id: r.sig for r in hashed.select(
        "doc_id", simhash_from_hashes(F.col("__ht"), 60).alias("sig")
    ).collect()}
    table_form = {r.doc_id: r.sig for r in simhash_signature_table(
        hashed, "doc_id", "__ht", 60).collect()}
    assert col_form == table_form
    assert table_form[4] is None  # null text propagates


def test_approx_ntile_agreement_and_plan(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import approx_ntile
    from pyspark.sql import Window

    # deterministic skewed-ish values; unique -> no tie ambiguity
    n = 5000
    df = spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 2654435761) % 1000003).cast("double").alias("v"))
    out = approx_ntile(df, "v", 10)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    exact = df.select("id", F.ntile(10).over(w).cast("long").alias("t"))
    joined = out.join(exact, "id")
    agree = joined.filter(F.col("bucket") == F.col("t")).count()
    assert agree >= 0.99 * n
    # bucket domain + rough balance: every decile populated
    sizes = {r["bucket"]: r["cnt"] for r in
             out.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert set(sizes) == set(range(1, 11))
    assert min(sizes.values()) >= 0.8 * n / 10

    # the scale contract: NO sort, NO window anywhere in the operator's
    # plan (exact ntile needs a global single-partition sort; the sketch
    # path must not)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Sort" not in plan and "Window" not in plan
    assert "percentile_approx" in plan


def test_approx_ntile_rejects_bad_n(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import approx_ntile
    with pytest.raises(ValueError):
        approx_ntile(spark.range(5), "id", 1)


# --- semantic dedup + JL projection ---------------------------------------

def test_semantic_dedup_drops_within_cluster_dups(spark):
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    # three axis-aligned groups; ids 0,4,8 seed the clusters (stride 4).
    # Within a group vectors are near-identical (cosine ~1); across groups
    # orthogonal (cosine 0) — so exactly the smallest id per group survives.
    def vec(axis, eps):
        v = [eps] * 4
        v[axis] = 1.0
        return v

    rows = [(i, vec(i % 3, 0.01 * (i // 3))) for i in range(9)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, dim=4, centroid_stride=4, iterations=2,
                         threshold=0.9)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    # one survivor per axis-group, and it is that group's smallest id
    assert sorted(got) == [0, 1, 2]
    # survivors all kept their assigned cluster id (a long)
    assert all(isinstance(c, int) for c in got.values())


def test_semantic_dedup_keeps_everything_below_threshold(spark):
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    # mutually orthogonal vectors: nothing is a duplicate at any threshold
    rows = [(i, [1.0 if j == i else 0.0 for j in range(4)]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(df, dim=4, centroid_stride=2, iterations=2,
                         threshold=0.5)
    assert sorted(r["vec_id"] for r in out.collect()) == [0, 1, 2, 3]


def test_jl_sign_matrix_deterministic_and_balanced():
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        jl_sign_matrix,
    )

    m1 = jl_sign_matrix(64, 16)
    m2 = jl_sign_matrix(64, 16)
    assert m1 == m2
    assert len(m1) == 16 and all(len(r) == 64 for r in m1)
    flat = [x for r in m1 for x in r]
    assert set(flat) == {1.0, -1.0}
    # md5 parity should be roughly balanced (binomial, 1024 draws)
    plus = sum(1 for x in flat if x > 0)
    assert 400 < plus < 624


def test_random_projection_maponly_and_distance_preserving(spark):
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        random_projection,
    )

    # deterministic pseudo-random vectors (no RNG: hash-derived)
    import hashlib

    def hv(i, dim):
        return [((int(hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8], 16)
                  % 1000) / 500.0) - 1.0 for j in range(dim)]

    rows = [(i, hv(i, 64)) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = random_projection(df, dim=64, out_dim=16)
    got = {r["vec_id"]: list(r["proj"]) for r in out.collect()}
    assert len(got) == 40 and all(len(p) == 16 for p in got.values())

    # determinism across invocations
    got2 = {r["vec_id"]: list(r["proj"])
            for r in random_projection(df, dim=64, out_dim=16).collect()}
    assert got == got2

    # map-only contract: no shuffle in the executed plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    # JL property (loose): projected pairwise distance within 2x of the
    # original for the bulk of pairs at out_dim=16
    import math
    ids = sorted(got)
    ok = total = 0
    orig = {i: rows[i][1] for i in ids}
    for x in range(0, 40, 5):
        for y in range(x + 5, 40, 5):
            do = math.dist(orig[x], orig[y])
            dp = math.dist(got[x], got[y])
            total += 1
            if 0.5 * do <= dp <= 2.0 * do:
                ok += 1
    assert ok >= 0.9 * total


def test_kmeans_refine_assignment_is_maponly(spark):
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        kmeans_refine,
    )

    rows = [(i, [float((i * 7 + j * 3) % 11) for j in range(4)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_refine(df, dim=4, centroid_stride=8, iterations=2)
    got = {r["vec_id"]: (r["cluster"], r["cosine"]) for r in out.collect()}
    assert len(got) == 40
    assert set(c for c, _ in got.values()) <= {0, 8, 16, 24, 32}
    assert all(-1.0 - 1e-9 <= cos <= 1.0 + 1e-9 for _, cos in got.values())

    # the 100 TB contract: assignment is an in-row fold over ONE broadcast
    # centroid row. The final plan's only hash shuffle is the deliberate
    # up-front spread of the (id, vector) rows (input-split independence);
    # the N x C expansion itself never crosses an exchange (the mean steps
    # are materialized by collect() before this plan runs).
    # AQE appends "== Initial Plan ==" — count nodes in the final section only
    plan = out._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" in plan


def test_duplicated_spans_exact_and_stride(spark):
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        duplicated_spans,
    )

    shared = "the quick brown fox jumps over the lazy dog"  # 43 chars
    rows = [
        (1, "AAA " + shared + " BBB"),
        (2, "CCCCC " + shared + " DD"),
        (3, "nothing in common here at all with the others x"),
        (4, "short"),  # below span_len -> contributes no windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = {r["span"]: (r["n_docs"], r["n_occ"])
           for r in duplicated_spans(df, span_len=30).collect()}
    # the true shared run includes the flanking spaces: " <shared> " =
    # 45 chars -> every aligned 30-window inside it duplicates
    run = " " + shared + " "
    assert len(out) == len(run) - 30 + 1
    assert all(v == (2, 2) for v in out.values())
    assert all(span in run for span in out)

    # stride=8 still catches the run (43 >= 30 + 8 - 1) — at least one
    # aligned window pair survives sampling on both docs
    strided = duplicated_spans(df, span_len=30, stride=8).collect()
    assert len(strided) >= 0  # plan executes
    # the exact guarantee is on runs, not specific windows: re-check via
    # a shared PREFIX so offsets align across docs
    rows2 = [(1, shared + " tail one"), (2, shared + " other end")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    strided2 = duplicated_spans(df2, span_len=30, stride=8).collect()
    assert len(strided2) >= 1

    import pytest as _pytest
    with _pytest.raises(ValueError):
        duplicated_spans(df, stride=0)


def test_duplicated_spans_hashed_matches_exact(spark):
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        duplicated_spans,
    )

    shared = "one common run that is well past thirty characters long"
    rows = [(i, f"doc{i} prefix {shared} suffix {i}") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    exact = {(r["span"], r["n_docs"], r["n_occ"])
             for r in duplicated_spans(df, span_len=30).collect()}
    hashed = {(r["span"], r["n_docs"], r["n_occ"])
              for r in duplicated_spans(df, span_len=30,
                                        hash_spans=True).collect()}
    assert exact == hashed and len(exact) > 0


def test_semantic_dedup_hot_cluster_cap_is_conservative(spark):
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )

    # one big group of near-identical vectors (cluster of 6) + one pair
    def vec(axis, eps):
        v = [eps] * 4
        v[axis] = 1.0
        return v

    rows = [(i, vec(0, 0.001 * i)) for i in range(6)] + \
           [(6, vec(1, 0.0)), (7, vec(1, 0.001))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # uncapped: each cluster keeps exactly its smallest id
    full = sorted(r["vec_id"] for r in
                  semantic_dedup(df, dim=4, centroid_stride=6, iterations=2,
                                 threshold=0.9).collect())
    assert full == [0, 6]

    # cap below the big cluster's size: its 6 members all survive
    # (conservative skip), the small cluster still dedups
    capped = sorted(r["vec_id"] for r in
                    semantic_dedup(df, dim=4, centroid_stride=6, iterations=2,
                                   threshold=0.9,
                                   max_cluster_size=4).collect())
    assert capped == [0, 1, 2, 3, 4, 5, 6]


def test_span_dedup_filter_drops_mostly_duplicated_docs(spark):
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        span_dedup_filter,
    )

    boiler = "this exact boilerplate paragraph is repeated verbatim in many documents"
    rows = [
        (1, boiler),                                   # 100% duplicated
        (2, boiler),                                   # 100% duplicated
        (3, boiler + " but with a long unique tail that goes on and on and on, diluting the duplicated prefix far below the cutoff threshold for sure"),
        (4, "a fully unique document that shares nothing with the others at all"),
        (5, "tiny"),                                   # < span_len: kept
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["dup_fraction"]
           for r in span_dedup_filter(df, span_len=30,
                                      max_dup_fraction=0.5).collect()}
    assert 1 not in out and 2 not in out          # pure boilerplate dropped
    assert 3 in out and 0.0 < out[3] <= 0.5       # diluted copy survives
    assert out[4] == 0.0                          # unique doc untouched
    assert out[5] == 0.0                          # short doc always kept


def test_unigram_logprob_scores_hand_oracle(spark):
    import math

    from league_of_legends_data_pipeline_spark.operators.text import (
        unigram_logprob_scores,
    )

    rows = [(1, "a a b"), (2, "zzz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["mean_neg_logprob"])
           for r in unigram_logprob_scores(df, alpha=0.5).collect()}

    # corpus counts: a=2, b=1, zzz=1; total=4, V=3; denom = 4 + 0.5*3
    denom = 4 + 0.5 * 3
    p = {"a": 2.5 / denom, "b": 1.5 / denom, "zzz": 1.5 / denom}
    want1 = -(2 * math.log2(p["a"]) + math.log2(p["b"])) / 3
    want2 = -math.log2(p["zzz"])
    assert got[1][0] == 3 and abs(got[1][1] - round(want1, 6)) < 1e-9
    assert got[2][0] == 1 and abs(got[2][1] - round(want2, 6)) < 1e-9
    # the common-token doc scores LOWER (more probable) than the rare one
    assert got[1][1] < got[2][1]


# --- bloom filter pruning --------------------------------------------------

def test_bloom_no_false_negatives_and_fp_bound(spark):
    """Every inserted key must test positive (the guarantee pruning relies
    on); non-members must mostly test negative at the sized FP rate."""
    from league_of_legends_data_pipeline_spark.operators.bloom import (
        bloom_bitmap, bloom_prune,
    )

    m, k = 1 << 14, 4  # m/n = 16 for n=1000 → expected FP ≈ 0.24%
    keys = spark.range(1000).select(
        F.md5(F.col("id").cast("string")).alias("key"))
    bm = bloom_bitmap(keys, "key", m, k)
    probe = spark.range(5000).select(
        "id", F.md5(F.col("id").cast("string")).alias("key"))

    missed_members = bloom_prune(
        probe.filter("id < 1000"), F.col("key"), bm, m, k,
        keep_members=False).count()
    assert missed_members == 0

    fp = bloom_prune(
        probe.filter("id >= 1000"), F.col("key"), bm, m, k).count()
    assert fp / 4000 < 0.02  # ~8x headroom over the expected rate


def test_bloom_flag_col_partitions_stream(spark):
    """flag_col mode must tag without dropping rows, and the two verdicts
    must partition the input exactly."""
    from league_of_legends_data_pipeline_spark.operators.bloom import (
        bloom_bitmap, bloom_prune,
    )

    m, k = 1 << 12, 4
    keys = spark.createDataFrame([("a",), ("b",)], ["key"])
    bm = bloom_bitmap(keys, "key", m, k)
    probe = spark.createDataFrame([("a",), ("b",), ("zz",), ("yy",)], ["key"])
    tagged = bloom_prune(probe, F.col("key"), bm, m, k, flag_col="maybe")
    assert tagged.count() == 4
    got = {r["key"]: r["maybe"] for r in tagged.collect()}
    assert got["a"] and got["b"]  # members always flagged


def test_bloom_probe_side_is_broadcast_no_shuffle(spark):
    """The probe plan must broadcast the 1-row bitmap and keep the probe
    side shuffle-free: membership is an in-row expression."""
    from league_of_legends_data_pipeline_spark.operators.bloom import (
        bloom_bitmap, bloom_prune,
    )

    m, k = 1 << 12, 4
    keys = spark.range(100).select(F.col("id").cast("string").alias("key"))
    bm = bloom_bitmap(keys, "key", m, k)
    probe = spark.range(1000).select(F.col("id").cast("string").alias("key"))
    plan = bloom_prune(probe, F.col("key"), bm, m, k) \
        ._jdf.queryExecution().executedPlan().toString()
    first_exchange = plan.find("Exchange")
    bcast = plan.find("BroadcastNestedLoopJoin")
    assert bcast != -1
    # any exchange must sit BELOW the broadcast join (bitmap build side);
    # the probe branch above it is exchange-free
    assert first_exchange == -1 or first_exchange > bcast


# --- product quantization --------------------------------------------------

def test_pq_encode_picks_nearest_codeword(spark):
    """With codewords at known positions, each vector must encode to its
    nearest codeword per subspace (ties to the smaller codeword id)."""
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        pq_encode,
    )

    # ids 0 and 4 are codewords (stride 4); dim 4, 2 subspaces of 2
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (4, [1.0, 1.0, 1.0, 1.0]),
        (1, [0.1, 0.0, 0.9, 1.0]),   # sub0 → cw 0, sub1 → cw 4
        (2, [0.5, 0.5, 0.5, 0.5]),   # equidistant: ties → cid 0
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    enc = {(r["vec_id"], r["j"]): r["code"]
           for r in pq_encode(df, dim=4, num_subspaces=2,
                              centroid_stride=4).collect()}
    assert enc[(1, 0)] == 0 and enc[(1, 1)] == 4
    assert enc[(2, 0)] == 0 and enc[(2, 1)] == 0
    assert enc[(0, 0)] == 0 and enc[(4, 1)] == 4


def test_pq_topk_adc_and_rerank(spark):
    """ADC ranking must follow codeword distances; rerank must restore the
    exact-L2 order within the shortlist."""
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        pq_topk,
    )

    rows = [(i, [float(i), float(i), float(i), float(i)]) for i in range(8)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    q = df.filter("vec_id = 0")
    # rerank over the full corpus ⇒ exact order 1,2,3,...
    got = pq_topk(df, q, k=3, dim=4, num_subspaces=2, centroid_stride=1,
                  rerank_shortlist=8).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in got] == [1, 2, 3]
    assert got[0]["dist2"] == 4.0  # (1-0)^2 * 4 dims
    # stride 1 → every vector is its own codeword → ADC is exact too
    raw = pq_topk(df, q, k=3, dim=4, num_subspaces=2,
                  centroid_stride=1).orderBy("rank").collect()
    assert [r["neighbor_id"] for r in raw] == [1, 2, 3]


def test_pq_lut_is_broadcast(spark):
    """The ADC scoring join must broadcast the per-query LUT — the encoded
    corpus side must not shuffle for scoring."""
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        pq_topk,
    )

    rows = [(i, [float(i % 3), float(i % 5), 1.0, 0.0]) for i in range(64)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    plan = pq_topk(df, df.filter("vec_id < 2"), k=2, dim=4,
                   num_subspaces=2, centroid_stride=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# --- mixture sampling ------------------------------------------------------

def test_mixture_sample_exact_quotas(spark):
    """Quotas must hit the integer-ratio mixture exactly, bounded by the
    scarcest group, and exact mode must return exactly quota_g rows."""
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        mixture_sample,
    )

    rows = ([(i, "a") for i in range(100)]
            + [(i, "b") for i in range(100, 130)]
            + [(i, "c") for i in range(130, 190)]
            + [(i, "zz") for i in range(190, 200)])  # unlisted → dropped
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    # parts 5/3/2, W=10: T = min(100*10/5, 30*10/3, 60*10/2) = 100
    # quotas: a=50, b=30, c=20 — group b is the binding constraint
    out = mixture_sample(df, "grp", {"a": 5, "b": 3, "c": 2}, "doc_id")
    got = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    assert got == {"a": 50, "b": 30, "c": 20}


def test_mixture_sample_stable_under_other_group_appends(spark):
    """Appending rows to group c must not change which group-a rows are
    kept (per-group draw order)."""
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        mixture_sample,
    )

    base = ([(i, "a") for i in range(40)] + [(i, "c") for i in range(40, 80)])
    grown = base + [(i, "c") for i in range(80, 120)]
    kept = lambda rows: sorted(
        r["doc_id"] for r in mixture_sample(
            spark.createDataFrame(rows, ["doc_id", "grp"]),
            "grp", {"a": 1, "c": 1}, "doc_id").collect() if r["grp"] == "a")
    a0, a1 = kept(base), kept(grown)
    # quota for a is unchanged (a is binding: 40*2/1 vs c's larger pool)
    assert a0 == a1


def test_mixture_sample_probabilistic_mode_no_window(spark):
    """exact=False must be a pure filter — no window/sort in the plan —
    and keep roughly quota_g rows."""
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        mixture_sample,
    )

    rows = [(i, "a" if i % 2 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, ["doc_id", "grp"])
    out = mixture_sample(df, "grp", {"a": 3, "b": 1}, "doc_id", exact=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Sort" not in plan.split("Exchange")[0]
    got = {r["grp"]: r["count"] for r in out.groupBy("grp").count().collect()}
    # targets: T = min(1000*4/3, 1000*4/1) = 1333 → a=999, b=333
    assert abs(got["a"] - 999) < 80 and abs(got["b"] - 333) < 60


def test_mixture_sample_rejects_bad_parts(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        mixture_sample,
    )

    df = spark.createDataFrame([(1, "a")], ["doc_id", "grp"])
    with pytest.raises(ValueError):
        mixture_sample(df, "grp", {}, "doc_id")
    with pytest.raises(ValueError):
        mixture_sample(df, "grp", {"a": 0}, "doc_id")


# --- deterministic training shuffle ---------------------------------------

def test_deterministic_shuffle_reproducible_and_complete(spark):
    """Same input → identical (shard, pos); every row appears exactly
    once; positions are dense 1..n per shard."""
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        deterministic_shuffle,
    )

    df = spark.createDataFrame([(i,) for i in range(200)], ["doc_id"])
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in deterministic_shuffle(df, "doc_id", 4).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in deterministic_shuffle(df, "doc_id", 4).collect()}
    assert a == b and len(a) == 200
    by_shard = {}
    for s, p in a.values():
        by_shard.setdefault(s, []).append(p)
    for ps in by_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))


def test_deterministic_shuffle_append_keeps_relative_order(spark):
    """Appending rows must not flip the relative order of surviving rows
    within a shard (mid-epoch resume safety)."""
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        deterministic_shuffle,
    )

    small = spark.createDataFrame([(i,) for i in range(100)], ["doc_id"])
    big = spark.createDataFrame([(i,) for i in range(150)], ["doc_id"])
    order = lambda df: {
        s: [d for _, d in sorted(
            (r["pos"], r["doc_id"])
            for r in deterministic_shuffle(df, "doc_id", 4).collect()
            if r["shard"] == s)]
        for s in range(4)}
    o_small, o_big = order(small), order(big)
    for s in range(4):
        survivors = [d for d in o_big[s] if d < 100]
        assert survivors == o_small[s]


def test_canary_scan_exact_containment(spark):
    """Each canary counts exactly the docs containing it verbatim;
    unmatched canaries yield no row; broadcast, no text shuffle."""
    from league_of_legends_data_pipeline_spark.operators.text import (
        canary_scan,
    )

    docs = spark.createDataFrame([
        (1, "the CANARY-A sits here"),
        (2, "nothing to see"),
        (3, "CANARY-A and CANARY-B together"),
        (4, "canary-a is lowercase, no match"),
    ], ["doc_id", "text"])
    canaries = spark.createDataFrame(
        [("CANARY-A",), ("CANARY-B",), ("CANARY-Z",)], ["canary"])
    out = canary_scan(docs, "doc_id", "text", canaries)
    got = {r["canary"]: (r["n_docs"], r["first_doc_id"])
           for r in out.collect()}
    assert got == {"CANARY-A": (2, 1), "CANARY-B": (1, 3)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan


def test_key_skew_report_hand_oracle(spark):
    """Counts, shares, and skew ratios against a hand-computed oracle;
    top-N cut uses TakeOrdered (no full sort in the plan)."""
    from league_of_legends_data_pipeline_spark.operators.joins import (
        key_skew_report,
    )

    rows = [(k,) for k in
            ["a"] * 6 + ["b"] * 3 + ["c"] * 2 + ["d"] * 1]
    df = spark.createDataFrame(rows, ["k"])
    out = key_skew_report(df, "k", top_n=2)
    got = {r["rank"]: (r["key"], r["n"], r["share_pct"], r["skew_ratio"])
           for r in out.collect()}
    # 12 rows, 4 keys, mean 3/key
    assert got[1] == ("a", 6, 50.0, 2.0)
    assert got[2] == ("b", 3, 25.0, 1.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every near-dup pair must land in ONE split (the property a
    per-document hash split cannot give), components must cover all
    rows, and the split must be a pure function of the component."""
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        leakage_safe_split,
    )

    docs = spark.createDataFrame([(i,) for i in range(40)], ["doc_id"])
    # chain 0-1-2, pair 10-11, the rest singletons
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], ["id_a", "id_b"])
    out = leakage_safe_split(docs, "doc_id", pairs,
                             {"train": 0.5, "test": 0.5}).collect()
    assert len(out) == 40
    by_doc = {r["doc_id"]: (r["component"], r["split"]) for r in out}
    assert by_doc[0] == by_doc[1] == by_doc[2]
    assert by_doc[10] == by_doc[11]
    comp_split = {}
    for comp, split in by_doc.values():
        assert comp_split.setdefault(comp, split) == split


def test_calibrated_quality_filter_keep_rate(spark):
    """The exact cutoff must keep ~keep_fraction of rows (>= due to
    ties/interpolation), never fewer; bad fractions rejected."""
    from league_of_legends_data_pipeline_spark.operators.text import (
        calibrated_quality_filter,
    )

    rows = [(i, " ".join(f"w{j}" for j in range(i + 1))) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = calibrated_quality_filter(df, "text", 0.6, exact=True)
    n = kept.count()
    assert 30 <= n <= 35  # >= 60% of 50, small overshoot from ties
    assert {"quality", "cutoff"} <= set(kept.columns)
    # every kept row clears the cutoff
    assert kept.filter("quality < cutoff").count() == 0
    with pytest.raises(ValueError):
        calibrated_quality_filter(df, "text", 0.0)


def test_mixture_sample_missing_group_makes_mixture_unachievable(spark):
    """A listed group with no rows must yield the EMPTY result (T=0) —
    not a silent rebalance over the groups that exist."""
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        mixture_sample,
    )

    df = spark.createDataFrame([(i, "a") for i in range(20)],
                               ["doc_id", "grp"])
    out = mixture_sample(df, "grp", {"a": 1, "missing": 1}, "doc_id")
    assert out.count() == 0


def test_dataset_diff_all_statuses(spark):
    """Hand-built versions must classify every id correctly."""
    from league_of_legends_data_pipeline_spark.operators.joins import (
        dataset_diff,
    )

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["doc_id", "fp"])
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (4, "d")], ["doc_id", "fp"])
    got = {r["doc_id"]: r["status"]
           for r in dataset_diff(old, new, "doc_id", "fp").collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


# --- PQ encode python oracle -----------------------------------------------

def test_pq_encode_matches_python_oracle(spark):
    """pq_encode's argmin must equal a direct python computation on a
    deterministic pseudo-random corpus (ties to the smallest cid)."""
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        pq_encode,
    )

    dim, M, stride = 8, 2, 3
    d = dim // M
    vecs = {i: [((i * 7 + j * 13) % 19) / 19.0 for j in range(dim)]
            for i in range(20)}
    df = spark.createDataFrame(list(vecs.items()), ["vec_id", "embedding"])
    got = {(r["vec_id"], r["j"]): r["code"]
           for r in pq_encode(df, dim=dim, num_subspaces=M,
                              centroid_stride=stride).collect()}
    cids = [i for i in vecs if i % stride == 0]
    for i, v in vecs.items():
        for j in range(M):
            sub = v[j * d:(j + 1) * d]
            best = min(
                (sum((a - b) ** 2 for a, b in
                     zip(sub, vecs[c][j * d:(j + 1) * d])), c)
                for c in cids)
            assert got[(i, j)] == best[1]


def test_mixture_sample_tokens_budget_and_order(spark):
    """Token budgets computed from integer ratios; kept token mass within
    one document of each budget; admission follows hashed-id order."""
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        mixture_sample_tokens,
    )

    rows = ([(i, "a", 10) for i in range(30)]        # 300 tokens
            + [(i, "b", 25) for i in range(100, 112)])  # 300 tokens
    df = spark.createDataFrame(rows, ["doc_id", "grp", "tok"])
    # parts 2/1, W=3: T = min(300*3/2, 300*3/1) = 450 → budgets a=300, b=150
    out = mixture_sample_tokens(df, "grp", {"a": 2, "b": 1},
                                "doc_id", "tok")
    got = out.groupBy("grp").agg({"tok": "sum", "*": "count"}).collect()
    agg = {r["grp"]: (r["count(1)"], r["sum(tok)"]) for r in got}
    assert agg["a"] == (30, 300)           # whole group fits the budget
    assert agg["b"] == (6, 150)            # 150/25 = 6 docs exactly
    # missing listed group → unachievable → empty
    empty = mixture_sample_tokens(df, "grp", {"a": 1, "zz": 1},
                                  "doc_id", "tok")
    assert empty.count() == 0


def test_cdc_chunks_reassemble_and_insertion_robust(spark):
    """Chunks must partition the document exactly (lengths sum to doc
    length, in order); a mid-document edit must preserve the chunks
    before AND after the touched region; short docs are one chunk."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        cdc_chunks,
    )

    import hashlib

    # md5-stream text: every 16-char window distinct → boundaries land at
    # the expected ~modulus spacing (a short-period synthetic string can
    # legitimately produce zero boundaries)
    base = "".join(hashlib.md5(f"cdc{i}".encode()).hexdigest()
                   for i in range(20))  # 640 chars
    edited = base[:300] + "XXXX" + base[300:]
    df = spark.createDataFrame(
        [(1, base), (2, edited), (3, "tiny")], ["doc_id", "text"])
    rows = cdc_chunks(df, "doc_id", "text").collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_len"], r["chunk_digest"]))
    for d, text in [(1, base), (2, edited), (3, "tiny")]:
        chunks = sorted(by_doc[d])
        assert sum(n for _, n, _ in chunks) == len(text)
    assert by_doc[3] == [(0, 4, by_doc[3][0][2])]  # whole-doc chunk
    d1 = {dg for _, _, dg in by_doc[1]}
    d2 = {dg for _, _, dg in by_doc[2]}
    # the edit is local: most chunks survive on both sides of it
    assert len(d1 & d2) >= max(1, len(d1) - 3)
    with pytest.raises(ValueError):
        cdc_chunks(df, "doc_id", "text", window=1)
    with pytest.raises(ValueError):
        cdc_chunks(df, "doc_id", "text", mode="nope")


def test_cdc_md5_arrow_engine_matches_sql_engine(spark):
    """The Arrow md5 scan must produce the EXACT row set of the pure
    Column-expression rendering (same cuts, same chunk_idx numbering,
    same digests) — including non-ASCII text (window = chars, digest =
    UTF-8 bytes), empty/null docs, short docs, and a cut landing at the
    exact end of a document."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        cdc_chunks,
    )

    import hashlib
    import random

    rng = random.Random(20260814)
    docs = []
    alpha = "abcdefgh 0123456789éüλ漢"
    for i in range(40):
        n = rng.randrange(0, 200)
        docs.append((i, "".join(rng.choice(alpha) for _ in range(n))))
    # adversarial extras: a doc engineered to CUT AT ITS EXACT END — brute
    # force a 16-char suffix whose md5 top-60-bits ≡ 0 mod 4
    base = "".join(hashlib.md5(f"e{i}".encode()).hexdigest()
                   for i in range(6))
    for j in range(100000):
        tail = f"t{j:015d}"
        d = hashlib.md5(tail.encode()).digest()
        if (int.from_bytes(d[:8], "big") >> 4) % 4 == 0:
            docs.append((1000, base + tail))
            break
    docs += [(1001, ""), (1002, None), (1003, "short")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for w, m in [(16, 4), (8, 8), (5, 3)]:
        a = sorted(map(tuple, cdc_chunks(
            df, "doc_id", "text", window=w, modulus=m,
            engine="arrow").collect()))
        s = sorted(map(tuple, cdc_chunks(
            df, "doc_id", "text", window=w, modulus=m,
            engine="sql").collect()))
        assert a == s and len(a) > len(docs) - 3


def test_cdc_rolling_matches_direct_reference(spark):
    """The vectorized prefix-form Rabin-Karp (batched over concatenated
    docs, uint64 wraparound) must produce exactly the cuts of the direct
    per-window polynomial reference computed doc-by-doc in pure Python —
    proving the O(1)/byte incremental form and the cross-document
    masking lose nothing."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        _rk_boundary,
        _rk_window_hash,
        cdc_chunks,
    )

    import hashlib
    import random

    rng = random.Random(7)
    docs = []
    for i in range(60):
        n = rng.randrange(0, 400)
        docs.append((i, bytes(rng.randrange(256) for _ in range(n))
                     .decode("latin-1")))
    docs += [(900, ""), (901, None), (902, "ab")]
    w, m = 16, 32
    got = {}
    rows = cdc_chunks(spark.createDataFrame(docs, "doc_id long, text string"),
                      "doc_id", "text", window=w, modulus=m,
                      mode="rolling").collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_len"], r["chunk_digest"]))
    n_checked = 0
    for did, text in docs:
        if not text:
            assert did not in got
            continue
        b = text.encode("utf-8")
        cuts = [i + w for i, h in enumerate(_rk_window_hash(b, w))
                if _rk_boundary(h, m)]
        bounds = [0] + cuts + [len(b)]
        exp = []
        for idx, (x, y) in enumerate(zip(bounds[:-1], bounds[1:])):
            if y > x:
                exp.append((idx, y - x,
                            hashlib.md5(b[x:y]).hexdigest()))
        assert sorted(got.get(did, [])) == exp, f"doc {did}"
        n_checked += 1
        if len(cuts) > 0:
            n_checked += 100  # saw at least one real boundary
    assert n_checked > 150  # the corpus actually exercised boundaries


# --- duplicated-span removal -------------------------------------------------

def test_remove_duplicated_spans_splices_and_passes_through(spark):
    """Docs sharing a long span lose exactly the union of duplicated
    windows (merged, spliced); unique docs, short docs, and null text
    pass through untouched; removed_chars reconciles with lengths."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again!"
    docs = [
        (1, "AAA " + shared + " unique tail one zzz"),
        (2, "BBBBBB " + shared + " different ending here yyy"),
        (3, "totally unrelated content without any duplication at all"),
        (4, "tiny"),
        (5, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_duplicated_spans(
        df, "doc_id", "text", span_len=20, min_docs=2).collect()}
    assert out[3]["n_islands"] == 0 and out[3]["clean_text"] == docs[2][1]
    assert out[4]["clean_text"] == "tiny" and out[4]["removed_chars"] == 0
    assert out[5]["clean_text"] is None
    for d in (1, 2):
        assert shared not in out[d]["clean_text"]
        assert out[d]["n_islands"] == 1
        assert out[d]["removed_chars"] == \
            len(docs[d - 1][1]) - len(out[d]["clean_text"])
    # the non-duplicated prefix/suffix survive the splice
    assert out[1]["clean_text"].startswith("AAA")
    assert out[1]["clean_text"].endswith("unique tail one zzz")
    assert out[2]["clean_text"].startswith("BBBBBB")
    assert out[2]["clean_text"].endswith("different ending here yyy")


def test_remove_duplicated_spans_matches_python_oracle(spark):
    """Window-union reference: per doc, mark every position covered by a
    duplicated window, keep uncovered chars in order — must equal the
    operator's gaps-and-islands splice exactly."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        remove_duplicated_spans,
    )

    import random

    rng = random.Random(118)
    alpha = "abcd "
    texts = []
    for i in range(30):
        n = rng.randrange(0, 120)
        texts.append("".join(rng.choice(alpha) for _ in range(n)))
    L, MIN = 8, 2
    # python oracle
    from collections import defaultdict
    owners = defaultdict(set)
    for i, t in enumerate(texts):
        for p in range(len(t) - L + 1):
            owners[t[p:p + L]].add(i)
    dup = {s for s, o in owners.items() if len(o) >= MIN}
    expect = {}
    for i, t in enumerate(texts):
        covered = [False] * len(t)
        for p in range(len(t) - L + 1):
            if t[p:p + L] in dup:
                for k in range(p, p + L):
                    covered[k] = True
        expect[i] = "".join(c for c, cov in zip(t, covered) if not cov)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: r["clean_text"] for r in remove_duplicated_spans(
        df, "doc_id", "text", span_len=L, min_docs=MIN).collect()}
    assert got == expect


def test_minhash_bipartite_cross_corpus_only(spark):
    """Bipartite LSH reports only left-x-right pairs; a near-dup pair
    WITHIN one corpus never appears; jaccard matches the exact value."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs_bipartite,
    )

    body = "shared boilerplate sentence repeated for weight " * 4
    left = spark.createDataFrame(
        [(1, body + "left tail"), (2, body + "left tail")],  # dup WITHIN left
        "doc_id long, text string")
    right = spark.createDataFrame(
        [(10, body + "right tail"), (11, "nothing in common at all here")],
        "doc_id long, text string")
    rows = minhash_lsh_pairs_bipartite(left, right, "doc_id", "text",
                                       jaccard_threshold=0.5).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == {(1, 10), (2, 10)}
    for r in rows:
        assert 0.5 <= r["jaccard"] <= 1.0


def test_best_representatives_keeps_highest_score(spark):
    from league_of_legends_data_pipeline_spark.operators.graph import (
        best_representatives,
    )

    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 7.0), (4, 1.0), (5, 9.0), (6, 9.0)],
        "doc_id long, q double")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (5, 6)],
                                  "id_a long, id_b long")
    got = {r["doc_id"]: r for r in best_representatives(
        docs, pairs, "doc_id", "q").collect()}
    # cluster {1,2,3}: 2 wins on score
    assert got[2]["keep"] and not got[1]["keep"] and not got[3]["keep"]
    assert got[1]["component"] == 1 and got[1]["cluster_size"] == 3
    # singleton keeps itself
    assert got[4]["keep"] and got[4]["cluster_size"] == 1
    # tie on score -> smallest id
    assert got[5]["keep"] and not got[6]["keep"]


def test_normalize_text_portable(spark):
    from league_of_legends_data_pipeline_spark.operators.text import (
        normalize_text,
    )

    cases = [
        ("  Hello,\tWORLD!!  multi   space\n", "hello world multi space"),
        ("UPPER lower 123", "upper lower 123"),
        ("", ""),
        ("!!!", ""),
    ]
    df = spark.createDataFrame([(i, t) for i, (t, _) in enumerate(cases)],
                               "i int, t string")
    got = {r["i"]: r["n"] for r in df.select(
        "i", normalize_text("t").alias("n")).collect()}
    assert got == {i: want for i, (_, want) in enumerate(cases)}


def test_cdc_rolling_chunks_partition_documents(spark, sf_dir):
    """q117's pytest oracle: rolling-mode chunks partition every document
    exactly (sum of chunk byte lengths == UTF-8 byte length, one group
    per non-empty doc)."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        cdc_chunks,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text").limit(200)
    expected = {r["doc_id"]: len((r["text"] or "").encode("utf-8"))
                for r in docs.collect()}
    got = {r["doc_id"]: r["b"]
           for r in cdc_chunks(docs, "doc_id", "text", mode="rolling")
           .groupBy("doc_id")
           .agg(F.sum("chunk_len").alias("b")).collect()}
    assert got == {k: v for k, v in expected.items() if v > 0}


def test_minhash_table_matches_column_form(spark):
    """The fused Arrow minhash_table must produce EXACTLY the (hm, sig)
    of the pure-Column char_shingles+portable_hash64 +
    minhash_signature_table pipeline it replaced — including short docs
    (one whole-doc shingle), empty and null text (sentinel signature),
    and non-ASCII (md5 over UTF-8 bytes)."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        MINHASH_PRIME,
        char_shingles,
        minhash_signature_table,
        minhash_table,
        portable_hash64,
    )

    import random

    rng = random.Random(26)
    alpha = "abcdef é漢 "
    docs = [(i, "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 120))))
            for i in range(40)]
    docs += [(100, "abc"), (101, ""), (102, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fused = {r["doc_id"]: (r["hm"], r["sig"])
             for r in minhash_table(df, "doc_id", "text", shingle_k=5,
                                    num_hashes=8).collect()}
    hashed = df.select(
        "doc_id",
        F.transform(char_shingles("text", 5), portable_hash64).alias("hm"))
    sigs = {r["doc_id"]: r["sig"]
            for r in minhash_signature_table(hashed, "doc_id", "hm",
                                             num_hashes=8).collect()}
    hms = {r["doc_id"]: r["hm"] for r in hashed.collect()}
    for did, _ in docs:
        assert fused[did][1] == sigs[did], f"sig mismatch doc {did}"
        # null text reaches the Column form as [null] (char_shingles'
        # greatest floor); the quarantine strips it to [] on both paths
        want_hm = [x for x in (hms[did] or []) if x is not None]
        assert fused[did][0] == want_hm, f"hm mismatch doc {did}"
    # empty text yields ONE empty-string shingle (char_shingles'
    # greatest floor) → a real signature; only NULL text is sentinel
    assert fused[101][1] != [MINHASH_PRIME] * 8
    assert fused[102][1] == [MINHASH_PRIME] * 8


def test_signature_tables_keep_precision_next_to_null_lists(spark):
    """REGRESSION: one null list in an Arrow batch used to float the
    whole chunk's values buffer in the pandas conversion, silently
    rounding 60-bit hashes for EVERY doc in the partition (float64 has a
    53-bit mantissa). All rows forced into one partition so the null
    shares a batch with real hashes; signatures must be bit-exact."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        MINHASH_PRIME,
        minhash_coefficients,
        minhash_signature_table,
        simhash_signature_table,
    )

    big = [(1 << 59) + 12345, (1 << 59) + 98765, (1 << 58) + 7]
    rows = [(1, big), (2, None), (3, [(1 << 59) + 31337])]
    df = spark.createDataFrame(rows, "doc_id long, hm array<long>") \
        .repartition(1)
    got = {r["doc_id"]: r["sig"] for r in minhash_signature_table(
        df, "doc_id", "hm", num_hashes=4).collect()}
    cs = minhash_coefficients(4, 42)
    for did, hm in [(1, big), (3, [(1 << 59) + 31337])]:
        hr = [x % MINHASH_PRIME for x in hm]
        expect = [min((a * h + b) % MINHASH_PRIME for h in hr)
                  for a, b in cs]
        assert got[did] == expect, f"doc {did} lost precision"
    assert got[2] == [MINHASH_PRIME] * 4

    sgot = {r["doc_id"]: r["sig"] for r in simhash_signature_table(
        df.withColumnRenamed("hm", "ht"), "doc_id", "ht",
        bits=60).collect()}
    for did, hm in [(1, big), (3, [(1 << 59) + 31337])]:
        sig = 0
        for j in range(60):
            votes = sum(1 if (h >> j) & 1 else -1 for h in hm)
            if votes > 0:
                sig |= 1 << j
        assert sgot[did] == sig, f"simhash doc {did} lost precision"
    assert sgot[2] is None


def test_simhash_table_matches_split_path(spark):
    """The fused tokenize+hash+vote simhash_table must equal the
    split-path (JVM tokenize/hash -> simhash_signature_table) bit for
    bit, including null text (null sig), empty/whitespace-only text
    (sig 0), and non-ASCII tokens."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        portable_hash64,
        simhash_signature_table,
        simhash_table,
    )

    import random

    rng = random.Random(33)
    alpha = "abcé漢 \t\n"
    docs = [(i, "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 80))))
            for i in range(40)]
    docs += [(100, ""), (101, "   \t "), (102, None), (103, "one")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fused = {r["doc_id"]: r["sig"]
             for r in simhash_table(df, "doc_id", "text", bits=60).collect()}
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    hashed = df.select("doc_id", F.transform(toks, portable_hash64)
                       .alias("ht"))
    split_path = {r["doc_id"]: r["sig"]
                  for r in simhash_signature_table(
                      hashed, "doc_id", "ht", bits=60).collect()}
    assert fused == split_path
    assert fused[102] is None and fused[100] == 0 and fused[101] == 0


def test_word_ngram_table_matches_column_form(spark):
    """Fused Arrow n-gram table == array_distinct(word_ngrams(text, n))
    exactly: token class, space joining, first-seen dedup order, null
    text -> null array, < n tokens -> empty array."""
    from league_of_legends_data_pipeline_spark.operators.text import (
        word_ngram_table,
        word_ngrams,
    )

    import random

    rng = random.Random(69)
    words = ["alpha", "beta", "gamma", "delta", "alpha", "ée", "漢字"]
    docs = []
    for i in range(30):
        k = rng.randrange(0, 12)
        docs.append((i, " ".join(rng.choice(words) for _ in range(k))))
    docs += [(100, ""), (101, "  \t "), (102, None), (103, "one two")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for n in (2, 4):
        fused = {r["doc_id"]: r["gs"] for r in word_ngram_table(
            df, "doc_id", "text", n).collect()}
        col = {r["doc_id"]: r["gs"] for r in df.select(
            "doc_id",
            F.array_distinct(word_ngrams("text", n)).alias("gs")).collect()}
        assert fused == col, f"n={n}"


def test_bm25_matches_python_oracle(spark):
    """Textbook BM25 computed in pure python (same micro-unit rounding)
    must equal the operator row for row."""
    import math

    from league_of_legends_data_pipeline_spark.operators.text import bm25_scores

    docs = [
        (0, "spark window spark table"),
        (1, "stream stream stream window"),
        (2, "vector"),
        (3, "other words only here"),
        (4, ""),
        (5, "spark vector window stream spark spark"),
    ]
    terms = ["spark", "window", "stream", "vector"]
    k1, b = 1.2, 0.75
    toks = {i: [t for t in txt.split() if t] for i, txt in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    expect = {}
    for i, tk in toks.items():
        micro = 0
        for t in terms:
            tf = tk.count(t)
            if not tf:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            c = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(tk) / avgdl))
            micro += round(c * 1_000_000)
        if micro:
            expect[i] = round(micro / 1_000_000.0, 6)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(df, "doc_id", "text", terms).collect()}
    assert got == expect


def test_vocab_coverage_counts_and_empty_doc(spark):
    """Hand oracle: vocab_size=2 picks the two most frequent words (ties
    to smaller); OOV counts are per-doc; empty doc gets rate 0.0."""
    from league_of_legends_data_pipeline_spark.operators.text import vocab_coverage

    docs = [
        (0, "a a b z"),      # a:2 b:1 z:1 -> vocab {a, b}
        (1, "z z z b"),
        (2, ""),
        (3, "A b"),          # lowercased in-vocab
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["oov_tokens"], r["oov_rate"])
           for r in vocab_coverage(df, "doc_id", "text", vocab_size=2)
           .collect()}
    # corpus counts: a=3 b=3 z=4 -> top2 by (count desc, word asc) = z, a
    assert out == {
        0: (4, 1, 0.25),   # b is OOV
        1: (4, 1, 0.25),   # b is OOV
        2: (0, 0, 0.0),
        3: (2, 1, 0.5),    # "A" lowers to a (in), b OOV
    }


def test_label_centroid_pairs_matches_numpy(spark):
    """Centroid cosine/L2 must match a numpy reference computed with the
    same micro-unit rounding pipeline."""
    import numpy as np

    from league_of_legends_data_pipeline_spark.operators.similarity import (
        label_centroid_pairs,
    )

    rng = np.random.default_rng(127)
    rows, vecs = [], {}
    for lbl in range(3):
        vs = rng.normal(size=(4, 6)).astype(np.float32)
        vecs[lbl] = vs
        for i, v in enumerate(vs):
            rows.append((lbl, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    cents = {}
    for lbl, vs in vecs.items():
        micro = np.round(vs.astype(np.float64) * 1_000_000).sum(axis=0)
        cents[lbl] = micro / (len(vs) * 1_000_000.0)
    expect = {}
    for a in range(3):
        for bl in range(a + 1, 3):
            ca, cb = cents[a], cents[bl]
            dot = int(sum(int(round(x * y * 1e12)) for x, y in zip(ca, cb)))
            na = int(sum(int(round(x * x * 1e12)) for x in ca))
            nb = int(sum(int(round(x * x * 1e12)) for x in cb))
            d2 = int(sum(int(round((x - y) ** 2 * 1e12))
                         for x, y in zip(ca, cb)))
            expect[(a, bl)] = (round(dot / (na * float(nb)) ** 0.5, 6),
                               round((d2 / 1e12) ** 0.5, 6))
    got = {(r["label_a"], r["label_b"]): (r["cosine"], r["l2"])
           for r in label_centroid_pairs(df, "label", "embedding").collect()}
    assert got == expect


def test_logistic_fit_matches_local_reference(spark):
    """Distributed micro-unit GD must equal the pure-python reference
    exactly, and learn a separable rule."""
    import random

    from pyspark.sql import functions as F

    from league_of_legends_data_pipeline_spark.operators.classifier import (
        logistic_fit, logistic_fit_local, logistic_fit_report,
    )

    rng = random.Random(128)
    rows = []
    for _ in range(300):
        x = rng.uniform(0, 1)
        y = 1.0 if x > 0.5 else 0.0
        rows.append((y, [x, 1.0]))
    df = spark.createDataFrame([(y, x[0]) for y, x in rows],
                               "y double, x0 double")
    feats = [F.col("x0"), F.lit(1.0)]
    got = logistic_fit(df, feats, F.col("y"), iterations=4, lr=2.0)
    want = logistic_fit_local(rows, iterations=4, lr=2.0)
    assert got == want  # bit-identical, not approx
    rep = logistic_fit_report(df, feats, F.col("y"),
                              iterations=4, lr=2.0).collect()[0]
    assert rep["n"] == 300
    assert rep["train_accuracy"] >= 0.6  # beats the 0.5 base rate


def test_psi_drift_matches_python_oracle(spark):
    """PSI with Laplace smoothing over the union bin-universe, including
    a bin present on only one side."""
    import math

    from pyspark.sql import functions as F

    from league_of_legends_data_pipeline_spark.operators.joins import psi_drift

    ref_vals = [0, 0, 1, 1, 1, 2]
    new_vals = [0, 1, 1, 3, 3, 3, 3]        # bin 2 missing, bin 3 new
    ref = spark.createDataFrame([(v,) for v in ref_vals], "v int")
    new = spark.createDataFrame([(v,) for v in new_vals], "v int")
    out = psi_drift(ref, new, [("v", F.col("v"))]).collect()

    from collections import Counter
    cr, cn = Counter(ref_vals), Counter(new_vals)
    bins = sorted(set(cr) | set(cn))
    b, tr, tn = len(bins), len(ref_vals), len(new_vals)
    contribs = {}
    for x in bins:
        p = (cr.get(x, 0) + 1.0) / (tr + 1.0 * b)
        q = (cn.get(x, 0) + 1.0) / (tn + 1.0 * b)
        contribs[x] = (p - q) * math.log(p / q)
    psi = round(sum(int(round(c * 1e6)) for c in contribs.values()) / 1e6, 6)
    got = {r["bin"]: r for r in out}
    assert sorted(got) == bins
    for x in bins:
        assert got[x]["n_ref"] == cr.get(x, 0)
        assert got[x]["n_new"] == cn.get(x, 0)
        assert got[x]["contrib"] == round(contribs[x], 6)
        assert got[x]["psi"] == psi


def test_decayed_group_sum_matches_python_oracle(spark):
    """Decay weighting against a hand-computed reference (same micro-unit
    rounding and the same decimal lam literal)."""
    import datetime as dt
    import math

    from league_of_legends_data_pipeline_spark.operators.joins import (
        decayed_group_sum,
    )

    t_ref = dt.datetime(2024, 2, 1)
    rows = [
        (1, 10.0, dt.datetime(2024, 1, 31)),   # 1 day old
        (1, 10.0, dt.datetime(2024, 1, 18)),   # 14 days old
        (2, 5.0, dt.datetime(2024, 2, 1)),     # age 0 -> weight 1
        (2, -3.0, dt.datetime(2024, 1, 25)),   # negative values decay too
    ]
    lam = 0.099021
    expect = {}
    for uid, v, ts in rows:
        age = (t_ref - ts).total_seconds() / 86400.0
        m = int(math.floor(abs(v * math.exp(-lam * age) * 1e6) + 0.5)
                * (1 if v >= 0 else -1))
        n, s = expect.get(uid, (0, 0))
        expect[uid] = (n + 1, s + m)
    expect = {u: (n, round(s / 1e6, 6)) for u, (n, s) in expect.items()}
    df = spark.createDataFrame(rows, "user_id long, value double, ts timestamp")
    got = {r["user_id"]: (r["n_events"], r["decayed_sum"])
           for r in decayed_group_sum(df, "user_id", "value", "ts",
                                      "2024-02-01 00:00:00",
                                      lam).collect()}
    assert got == expect


def test_canary_scan_ac_matches_contains_path(spark):
    """The Aho-Corasick scale lever must return EXACTLY what the
    broadcast-contains form returns — including overlapping patterns,
    patterns that are substrings of each other, duplicates in the canary
    list, and docs with no hits."""
    import random

    from league_of_legends_data_pipeline_spark.operators.text import (
        canary_scan, canary_scan_ac,
    )

    rng = random.Random(109)
    alpha = "abc"
    docs = [(i, "".join(rng.choice(alpha) for _ in range(rng.randrange(0, 60))))
            for i in range(80)]
    pats = ["a", "ab", "ba", "abc", "cab", "bb", "zzz", "abab", "b"]
    cdf = spark.createDataFrame([(p,) for p in pats + pats[:3]],
                                "canary string")
    df = spark.createDataFrame(docs, "doc_id long, text string")
    want = {r["canary"]: (r["n_docs"], r["first_doc_id"])
            for r in canary_scan(df, "doc_id", "text", cdf).collect()}
    got = {r["canary"]: (r["n_docs"], r["first_doc_id"])
           for r in canary_scan_ac(df, "doc_id", "text", cdf).collect()}
    assert got == want
    assert "zzz" not in got          # no-hit canary absent in both forms


def test_pagerank_matches_python_oracle(spark):
    """2-iteration PageRank on a small directed graph vs a hand-rolled
    reference with the same 1e-9 integer contribution rounding."""
    from league_of_legends_data_pipeline_spark.operators.graph import pagerank

    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (3, 2), (4, 1), (1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (round(r["rank"], 9), r["deg"])
           for r in pagerank(df, iterations=2, damping=0.85).collect()}

    import math
    from collections import defaultdict
    out = defaultdict(list)
    deg = defaultdict(int)
    for s, d in edges:
        out[s].append(d)
        deg[s] += 1
    n = len(deg)
    r = {u: 1.0 / n for u in deg}
    for _ in range(2):
        m = defaultdict(int)
        for u in deg:
            c = int(math.floor(abs(r[u] / deg[u] * 1e9) + 0.5))
            for v in out[u]:
                m[v] += c
        r = {v: (1.0 - 0.85) / n + 0.85 * (m.get(v, 0) / 1e9)
             for v in deg}
    want = {u: (round(r[u], 9), deg[u]) for u in r}
    assert got == want
    # symmetric triangle {1,2,3} + pendant 4: node 1 (the hub) ranks top
    assert max(got, key=lambda u: got[u][0]) == 1


def test_pagerank_keeps_source_only_nodes(spark):
    """A node with outgoing but no incoming edges must survive every
    iteration at rank (1-d)/N — dropping it after iteration 1 would also
    delete its contribution to its successors from iteration 2 on."""
    from league_of_legends_data_pipeline_spark.operators.graph import pagerank

    # 3 -> 1 is the only edge touching 3; 1 <-> 2 cycle
    edges = [(1, 2), (2, 1), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: (r["rank"], r["deg"])
           for r in pagerank(df, iterations=3, damping=0.85).collect()}
    assert set(got) == {1, 2, 3}
    assert abs(got[3][0] - (1.0 - 0.85) / 3) < 1e-12
    # node 1 receives 3's 0.05 * 0.85 every round on top of 2's rank:
    # strictly above 2, which only receives from 1
    assert got[1][0] > got[2][0]
    # rank from a python oracle with the same coalesce-0 semantics
    import math
    from collections import defaultdict
    out, deg = defaultdict(list), defaultdict(int)
    for s, d in edges:
        out[s].append(d)
        deg[s] += 1
    n = len(deg)
    r = {u: 1.0 / n for u in deg}
    for _ in range(3):
        m = defaultdict(int)
        for u in deg:
            c = int(math.floor(abs(r[u] / deg[u] * 1e9) + 0.5))
            for v in out[u]:
                m[v] += c
        r = {v: (1.0 - 0.85) / n + 0.85 * (m.get(v, 0) / 1e9)
             for v in deg}
    assert {u: round(v, 9) for u, v in r.items()} \
        == {u: round(v[0], 9) for u, v in got.items()}


# --- sketches / layout / edit-distance (round 6) ----------------------------

def test_hll_matches_python_replica_and_merges(spark):
    """Register table and estimate replicate the md5-based python HLL
    bit-for-bit, and two slices' register tables merge by max into the
    whole corpus's sketch (the mergeability contract)."""
    import hashlib
    import math

    from league_of_legends_data_pipeline_spark.operators.sketch import (
        HLL_ALPHA_64, HLL_M, HLL_RHO_MAX, hll_estimate, hll_registers,
    )
    from pyspark.sql import functions as F

    vals = [(i % 2, f"v{i * 13 % 700}") for i in range(3000)]
    df = spark.createDataFrame(vals, ["g", "v"])
    got = {r["g"]: (r["estimate"], r["n_empty"])
           for r in hll_estimate(hll_registers(df, ["g"], "v"),
                                 ["g"]).collect()}

    regs: dict = {}
    for g, v in vals:
        h = int(hashlib.md5(f"hll42:{v}".encode()).hexdigest()[:15], 16)
        j, w = h % HLL_M, h >> 6
        rho = HLL_RHO_MAX if w == 0 else HLL_RHO_MAX - w.bit_length()
        regs.setdefault(g, {})[j] = max(regs.get(g, {}).get(j, 0), rho)
    for g, m in regs.items():
        sint = sum(1 << (HLL_RHO_MAX - mj) for mj in m.values()) \
            + (HLL_M - len(m)) * (1 << HLL_RHO_MAX)
        v_empty = HLL_M - len(m)
        raw = HLL_ALPHA_64 * HLL_M * HLL_M * float(1 << HLL_RHO_MAX) / sint
        e = HLL_M * math.log(HLL_M / v_empty) \
            if (raw <= 2.5 * HLL_M and v_empty > 0) else raw
        assert got[g] == (round(e, 4), v_empty)

    # mergeability: sketch(first half) ∪ sketch(second half), max-merged,
    # equals sketch(all)
    half1 = spark.createDataFrame(vals[:1500], ["g", "v"])
    half2 = spark.createDataFrame(vals[1500:], ["g", "v"])
    merged = (hll_registers(half1, ["g"], "v")
              .unionByName(hll_registers(half2, ["g"], "v"))
              .groupBy("g", "j").agg(F.max("mj").alias("mj")))
    whole = {(r["g"], r["j"]): r["mj"]
             for r in hll_registers(df, ["g"], "v").collect()}
    assert {(r["g"], r["j"]): r["mj"] for r in merged.collect()} == whole


def test_cms_never_undercounts(spark):
    from league_of_legends_data_pipeline_spark.operators.sketch import (
        cms_lookup, cms_table,
    )

    words = ("alpha beta alpha gamma alpha beta delta epsilon zeta eta "
             * 50).split()
    toks = spark.createDataFrame([(w,) for w in words], ["t"])
    # width 2 pigeonholes 7 distinct words into 2 buckets per row, so
    # some estimate genuinely overcounts (deterministic md5 hashing
    # makes the collision pattern fixed)
    table = cms_table(toks, "t", depth=3, width=2)
    import collections
    exact = collections.Counter(words)
    q = spark.createDataFrame([(w,) for w in set(words) | {"unseen"}], ["t"])
    est = {r["token"]: r["estimate"]
           for r in cms_lookup(table, q, "t", depth=3, width=2).collect()}
    for w, c in exact.items():
        assert est[w] >= c          # the CMS guarantee
    assert est["unseen"] >= 0
    assert sum(est[w] - exact[w] for w in exact) > 0  # collisions exist


def test_zorder_key_and_repartition(spark):
    from league_of_legends_data_pipeline_spark.operators.sketch import (
        zorder_key, zorder_repartition,
    )
    from pyspark.sql import functions as F

    df = spark.range(256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y"))
    got = {(r["x"], r["y"]): r["z"]
           for r in df.select("x", "y",
                              zorder_key("x", "y", 4).alias("z")).collect()}
    for (x, y), z in got.items():
        want = sum((((x >> b) & 1) << (2 * b)) | (((y >> b) & 1) << (2 * b + 1))
                   for b in range(4))
        assert z == want
    # z-order curve property: all 256 keys distinct, covering 0..255
    assert sorted(got.values()) == list(range(256))
    # layout: range partition + sort by the key, key column dropped
    out = zorder_repartition(df, "x", "y", 4, bits=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan and "Sort" in plan
    assert out.columns == ["x", "y"]


def test_edit_distance_pairs_finds_planted_edits(spark):
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        edit_distance_pairs,
    )
    import pytest as _pytest

    docs = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy hog"),   # 1 edit
            (3, "the quick brown fox jumped over a lazy hog"),    # few edits
            (4, "completely different content with other words here")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {(r["id_a"], r["id_b"]): r["distance"]
           for r in edit_distance_pairs(df, "doc_id", "text",
                                        length_tolerance=2,
                                        max_distance=5).collect()}
    assert got[(1, 2)] == 1
    assert (1, 4) not in got and (2, 4) not in got
    # default length_tolerance = max_distance (the lossless-blocking
    # condition): a 3-char insertion (length diff 3 > the old default
    # tolerance of 2) must be found with DEFAULT parameters
    df2 = spark.createDataFrame(
        docs + [(5, docs[0][1] + "xyz")], ["doc_id", "text"])
    got2 = {(r["id_a"], r["id_b"]): r["distance"]
            for r in edit_distance_pairs(df2, "doc_id", "text",
                                         max_distance=5).collect()}
    assert got2[(1, 5)] == 3
    # degenerate block refusal
    big = spark.createDataFrame([(i, "same") for i in range(9)],
                                ["doc_id", "text"])
    with _pytest.raises(ValueError, match="max_block_size"):
        edit_distance_pairs(big, "doc_id", "text", max_block_size=4).count()


def test_containment_pairs_detect_subset_docs(spark):
    """A document embedded inside a longer one: containment of the
    smaller side ~1.0 while symmetric Jaccard is low — the asymmetric
    signal minhash_lsh_containment_pairs exists to surface."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        minhash_lsh_containment_pairs, minhash_lsh_pairs,
    )

    core = ("the training corpus contains this exact paragraph verbatim "
            "and the dedup pass should notice that fact immediately ")
    long_doc = ("unrelated preamble text sits here first. " + core
                + " and then a long unrelated tail follows with plenty of "
                  "additional filler content to dominate the union of the "
                  "two shingle sets so plain jaccard stays low for sure "
                  "while containment of the smaller document stays high.")
    docs = spark.createDataFrame(
        [(1, long_doc), (2, core),
         (3, "совершенно другой текст without any shared shingles at")],
        ["doc_id", "text"])
    # DEFAULT parameters must detect the embedded doc: bands defaults to
    # num_hashes (1 row/band), the permissive S-curve end subset pairs
    # need — multi-row bands want high symmetric JACCARD, which subset
    # pairs deliberately lack
    got = {(r["id_a"], r["id_b"]): r
           for r in minhash_lsh_containment_pairs(
               docs, "doc_id", "text",
               containment_threshold=0.8).collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    # containment_b (the embedded doc) ~1.0; containment_a much lower
    assert r["containment_b"] >= 0.95
    assert r["containment_a"] < 0.6
    assert (1, 3) not in got and (2, 3) not in got
    # and symmetric jaccard misses it at the same bar
    j = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(
        docs, "doc_id", "text", jaccard_threshold=0.8).collect()}
    assert (1, 2) not in j


def test_bucket_cap_observation_surfaces_dropped_buckets(spark):
    """Round-7 ADVICE: the hot-bucket cap silently eats recall (worst
    with the permissive bands=num_hashes containment default). The
    Observation channel must report exactly which volume was dropped,
    piggybacked on the caller's own action — no extra job."""
    from pyspark.sql import Observation

    from league_of_legends_data_pipeline_spark.operators.dedup import (
        minhash_lsh_containment_pairs,
    )

    # 8 identical docs -> an 8-row bucket in EVERY band (identical text,
    # identical signature); 4 distinct docs -> singleton buckets
    docs = ([(i, "the shared viral boilerplate sentence that repeats "
                 "across this entire crawl snapshot") for i in range(8)]
            + [(100 + i, f"standalone document number {i} carrying its "
                         f"own entirely unrelated vocabulary")
               for i in range(4)])
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    obs = Observation("bucket_cap")
    pairs = minhash_lsh_containment_pairs(
        df, "doc_id", "text", num_hashes=16, max_bucket_size=4,
        bucket_cap_observation=obs)
    dup_pairs = [r for r in pairs.collect()
                 if r["id_a"] < 100 and r["id_b"] < 100]
    # the identical family's buckets exceed the cap in all 16 bands, so
    # none of its 28 pairs survive — that's the silent recall loss...
    assert dup_pairs == []
    # ...and the observation is the signal: 12 docs x 16 single-hash
    # bands in, the 8-doc bucket dropped in each band (a standalone doc
    # that chance-collides into a hot band only grows that bucket, so
    # >= the family's 8 rows per band, never fewer)
    m = obs.get
    assert m["banded_rows"] == 12 * 16
    assert 8 * 16 <= m["rows_in_dropped_buckets"] <= 12 * 16
    assert m["dropped_buckets"] == 16


def test_bucket_cap_observation_zero_when_cap_idle(spark):
    """No over-cap buckets -> all-zero drop metrics (callers key alerts
    off nonzero, so idle must read as exactly zero)."""
    from pyspark.sql import Observation

    from league_of_legends_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
    )

    df = spark.createDataFrame(
        [(i, f"document {i} has a private vocabulary all of its own "
             f"with marker token number{i}") for i in range(6)],
        ["doc_id", "text"])
    obs = Observation("bucket_cap_idle")
    minhash_lsh_pairs(df, "doc_id", "text", max_bucket_size=1000,
                      bucket_cap_observation=obs).collect()
    m = obs.get
    assert m["banded_rows"] > 0
    assert m["rows_in_dropped_buckets"] == 0
    assert m["dropped_buckets"] == 0


def test_kmv_sketch_estimates_and_merge_semantics(spark):
    """KMV bottom-k: the sketch is the k smallest distinct hashes;
    overlap estimate equals the exact Jaccard when both universes fit
    inside k (the sketch degenerates to the exact sets), and membership
    set-math matches a python oracle on a constructed overlap."""
    from pyspark.sql import functions as SF

    from league_of_legends_data_pipeline_spark.operators.sketch import (
        kmv_bottom_k, kmv_overlap_estimate,
    )

    a_vals = list(range(100, 400, 3))          # 100 hashes
    b_vals = list(range(100, 400, 5))          # 60 hashes, overlap = %15
    a = spark.createDataFrame([(v,) for v in a_vals], ["hv"])
    b = spark.createDataFrame([(v,) for v in b_vals], ["hv"])

    got = kmv_bottom_k(a, "hv", k=16).collect()[0]["kmv"]
    assert got == sorted(a_vals)[:16]

    # k large enough to hold everything -> estimator is EXACT
    row = kmv_overlap_estimate(a, b, "hv", k=256).collect()[0]
    inter = len(set(a_vals) & set(b_vals))
    union = len(set(a_vals) | set(b_vals))
    assert row["union_sketch_size"] == union
    assert row["shared_in_sketch"] == inter
    assert row["est_jaccard"] == round(inter / union, 6)
    assert row["est_card_a"] == float(len(a_vals))
    assert row["est_card_b"] == float(len(b_vals))

    # k smaller than the union: sketch membership math still matches
    # the python oracle computed from the same bottom-k arrays
    k = 16
    row = kmv_overlap_estimate(a, b, "hv", k=k).collect()[0]
    ka, kb = sorted(a_vals)[:k], sorted(b_vals)[:k]
    s = sorted(set(ka) | set(kb))[:k]
    shared = [x for x in s if x in set(ka) and x in set(kb)]
    assert row["union_sketch_size"] == len(s)
    assert row["shared_in_sketch"] == len(shared)
    assert row["kth_min"] == s[-1]


# ---------------------------------------------------------------------------
# cleaning tier: HTML extraction, URL canonicalization, PII, paragraph dedup
# ---------------------------------------------------------------------------


def test_strip_html_handles_containers_entities_comments(spark):
    from league_of_legends_data_pipeline_spark.operators.cleaning import strip_html
    import pyspark.sql.functions as F

    cases = [
        # script content with a '<' inside must vanish entirely
        ("<p>a</p><script>if(1<2){x()}</script><p>b</p>", "a b"),
        ("<style>p > em { color: red }</style>hi", "hi"),
        ("<!-- drop --><b>keep</b>", "keep"),
        ("x &amp;&lt;&gt;&quot;&#39;&nbsp; y", "x &<>\"' y"),
        ("<div>a</div><div>b</div>", "a b"),  # tags become word breaks
        ("  already   clean  ", "already clean"),
    ]
    df = spark.createDataFrame([(i, h) for i, (h, _) in enumerate(cases)],
                               ["i", "html"])
    got = {r["i"]: r["t"]
           for r in df.select("i", strip_html("html").alias("t")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_canonical_url_rules(spark):
    from league_of_legends_data_pipeline_spark.operators.cleaning import (
        canonical_url, registered_domain)

    cases = [
        ("https://WWW.Ex.COM:443/a/?utm_source=x&b=2&a=1#f",
         "https://www.ex.com/a?a=1&b=2", "ex.com"),
        ("http://Host.ORG:80/p/", "http://host.org/p", "host.org"),
        # non-default port survives; root path normalizes to "/"
        ("https://h.net:8443", "https://h.net:8443/", "h.net"),
        # all-tracking query drops entirely
        ("http://a.b.c.io/x?gclid=1&ref=t&fbclid=2", "http://a.b.c.io/x",
         "c.io"),
        # plain param named utm survives only if not utm_* prefixed
        ("http://e.co/x?utmost=1", "http://e.co/x?utmost=1", "e.co"),
    ]
    df = spark.createDataFrame([(i, u) for i, (u, _, _) in enumerate(cases)],
                               ["i", "url"])
    got = {r["i"]: (r["c"], r["d"]) for r in df.select(
        "i", canonical_url("url").alias("c"),
        registered_domain("url").alias("d")).collect()}
    for i, (_, want_c, want_d) in enumerate(cases):
        assert got[i] == (want_c, want_d), (i, got[i], (want_c, want_d))


def test_luhn_and_pii_detection(spark):
    from league_of_legends_data_pipeline_spark.operators.cleaning import (
        luhn_valid, pii_counts, redact_pii)
    import pyspark.sql.functions as F

    # classic known Luhn vectors
    df = spark.createDataFrame(
        [("4111111111111111", True), ("4111111111111112", False),
         ("79927398713", True), ("79927398710", False)], ["d", "want"])
    for r in df.select("want", luhn_valid("d").alias("got")).collect():
        assert r["got"] == r["want"]

    txt = ("mail a.b+c@ex.org and x@y.io call 555-867-5309 ssn 219-09-9999 "
           "ip 192.168.0.255 not-ip 999.1.1.1 card 4111111111111111 "
           "fake 1234567812345678")
    df2 = spark.createDataFrame([(txt,)], ["t"])
    row = df2.select(
        *[v.alias(k) for k, v in pii_counts("t").items()],
        redact_pii("t").alias("red")).collect()[0]
    assert row["n_email"] == 2
    assert row["n_phone"] == 1
    assert row["n_ssn"] == 1
    # 999.1.1.1 must NOT count (octet range), 192.168.0.255 must
    assert row["n_ipv4"] == 1
    assert row["n_cc_seen"] == 2 and row["n_cc_valid"] == 1
    red = row["red"]
    assert "[EMAIL]" in red and "@" not in red
    assert "[PHONE]" in red and "[SSN]" in red and "[IP]" in red
    # redaction is recall-first: both card-shaped runs scrubbed
    assert red.count("[CARD]") == 2


def test_paragraph_dedup_first_occurrence_total_order(spark):
    from league_of_legends_data_pipeline_spark.operators.cleaning import (
        paragraph_dedup)

    # doc 1 repeats its own first span; doc 2 repeats doc 1's span
    docs = spark.createDataFrame(
        [(1, "a b c a b c x y z"),
         (2, "a b c q r s")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in paragraph_dedup(docs, "doc_id", "text",
                                    span_tokens=3).collect()}
    assert out[1]["n_spans"] == 3 and out[1]["n_kept"] == 2
    assert out[1]["kept_text"] == "a b c x y z"  # within-doc repeat dropped
    assert out[2]["n_kept"] == 1 and out[2]["kept_text"] == "q r s"


def test_frequent_tokens_pigeonhole_is_lossless(spark):
    from league_of_legends_data_pipeline_spark.operators.sketch import (
        frequent_tokens)

    # 40 docs: 'hot' appears 3x/doc (120 total), 'warm' 1x/doc (40),
    # 'rare<i>' once each. threshold 100 -> only 'hot'.
    rows = [(i, "hot hot hot warm rare%d" % i) for i in range(40)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = frequent_tokens(docs, "doc_id", "text",
                          threshold=100, num_buckets=8).collect()
    assert len(out) == 1
    r = out[0]
    assert r["tok"] == "hot" and r["cnt"] == 120
    # phase-1 pruning visibly cut the candidate set: ceil(100/8)=13
    # per-bucket; 'warm' peaks at 5/bucket, rare* at 1 -> only 'hot'
    assert r["n_candidates"] == 1


def test_bpe_train_merge_sequence_and_trajectory(spark):
    from league_of_legends_data_pipeline_spark.operators.text import bpe_train

    # Sennrich-style toy corpus: low x3, lower x2, newest x1.
    # Round 1: (l,o)=5 ties (o,w)=5 -> pair-ASC tiebreak picks <l><o>.
    # Round 2: (lo,w)=5 wins. Weighted avg tokens: 20/6 then 15/6.
    docs = spark.createDataFrame(
        [(1, "low low low"), (2, "lower lower"), (3, "newest")],
        ["doc_id", "text"])
    out = [r.asDict() for r in bpe_train(docs, "text", num_merges=2).collect()]
    assert [r["step"] for r in out] == [1, 2]
    assert out[0]["pair"] == "<l><o>" and out[0]["new_symbol"] == "lo"
    assert out[0]["pair_count"] == 5
    assert out[0]["avg_tokens"] == round(20 / 6, 6)
    assert out[1]["pair"] == "<lo><w>" and out[1]["new_symbol"] == "low"
    assert out[1]["pair_count"] == 5
    assert out[1]["avg_tokens"] == 2.5


def test_bpe_merge_application_is_greedy_leftmost(spark):
    from league_of_legends_data_pipeline_spark.operators.text import bpe_train

    # 'aaa': pair (a,a) has weighted count 2; greedy leftmost BPE gives
    # 'aa a' (2 symbols), never 'a aa' — and never 1 symbol (overlap).
    docs = spark.createDataFrame([(1, "aaa")], ["doc_id", "text"])
    out = bpe_train(docs, "text", num_merges=1).collect()[0]
    assert out["pair"] == "<a><a>" and out["pair_count"] == 2
    assert out["avg_tokens"] == 2.0


def test_bigram_lm_scores_jelinek_mercer_exact(spark):
    from league_of_legends_data_pipeline_spark.operators.text import (
        bigram_logprob_scores)
    import math

    # corpus: doc1 'a a', doc2 'a b'. uni a=3 b=1, N=4.
    # P(a|a)=.75*1/3+.25*3/4=0.4375  P(b|a)=.75*1/3+.25*1/4=0.3125
    docs = spark.createDataFrame([(1, "a a"), (2, "a b")],
                                 ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in bigram_logprob_scores(docs, "doc_id", "text",
                                          lam=0.75).collect()}
    want1 = round(round(-math.log2(0.4375) * 1e6) / 1e6, 6)
    want2 = round(round(-math.log2(0.3125) * 1e6) / 1e6, 6)
    assert out[1]["n_bigrams"] == 1 and out[1]["mean_neg_logprob"] == want1
    assert out[2]["n_bigrams"] == 1 and out[2]["mean_neg_logprob"] == want2


def test_phrase_occurrences_counts_overlaps(spark):
    from league_of_legends_data_pipeline_spark.operators.text import (
        phrase_occurrences)

    docs = spark.createDataFrame(
        [(1, "a a a"),            # 'a a' overlaps: 2 hits
         (2, "x y x y x"),        # 'x y x' overlaps at 0 and 2: 2 hits
         (3, "no match here")],
        ["doc_id", "text"])
    out = {(r["doc_id"], r["phrase"]): r["n_occurrences"]
           for r in phrase_occurrences(docs, "doc_id", "text",
                                       ["a a", "x y x"]).collect()}
    assert out == {(1, "a a"): 2, (2, "x y x"): 2}


def test_ddsketch_bucket_exactness_and_merge(spark):
    from league_of_legends_data_pipeline_spark.operators.sketch import (
        ddsketch_quantiles, ddsketch_table)
    import pyspark.sql.functions as F

    # values 1..1000: p50 exact = 500, p99 exact = 990. Cell width at
    # octave b is 2^(b-1)/16, so the representative is within ~1/16
    # relative error of the true quantile.
    df = spark.range(1, 1001).select(F.col("id").alias("v"),
                                     (F.col("id") % 4).alias("g"))
    merged = ddsketch_table(df, "v")                     # one pass
    parts = ddsketch_table(df, "v", ["g"])               # sharded build
    remerged = parts.groupBy("octave", "sub") \
                    .agg(F.sum("cnt").alias("cnt"))
    a = {(r["octave"], r["sub"]): r["cnt"] for r in merged.collect()}
    b = {(r["octave"], r["sub"]): r["cnt"] for r in remerged.collect()}
    assert a == b  # mergeability: sum of shard sketches == whole sketch

    est = {(r["q_num"], r["q_den"]): r["est"]
           for r in ddsketch_quantiles(merged,
                                       [(1, 2), (99, 100)]).collect()}
    assert abs(est[(1, 2)] - 500) / 500 <= 1 / 16 + 0.01
    assert abs(est[(99, 100)] - 990) / 990 <= 1 / 16 + 0.01


def test_poisson_bootstrap_weights_and_ci(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        poisson_bootstrap_ci, poisson_bootstrap_means)
    import pyspark.sql.functions as F

    df = spark.range(0, 400).select(F.col("id").alias("doc_id"),
                                    (F.col("id") % 7).alias("x"))
    means = poisson_bootstrap_means(df, "doc_id", "x",
                                    n_replicates=20, seed=3)
    rows = means.collect()
    assert len(rows) == 20
    # Poisson(1) weights: n_eff concentrates near n (sd ~ sqrt(400)=20)
    for r in rows:
        assert 300 < r["n_eff"] < 500
    # determinism: same seed, same replicate means
    again = {r["replicate"]: r["est"]
             for r in poisson_bootstrap_means(df, "doc_id", "x",
                                              20, seed=3).collect()}
    assert {r["replicate"]: r["est"] for r in rows} == again

    ci = poisson_bootstrap_ci(df, "doc_id", "x",
                              n_replicates=20, seed=3).collect()[0]
    ests = sorted(r["est"] for r in rows)
    # B=20, alpha=.05: k_lo = floor(.025*20)+1 = 1, k_hi = ceil(.975*20)=20
    assert ci["ci_lo"] == ests[0] and ci["ci_hi"] == ests[-1]
    assert ci["ci_lo"] <= ci["point_est"] <= ci["ci_hi"]


def test_entropy_scores_known_distributions(spark):
    from league_of_legends_data_pipeline_spark.operators.text import (
        entropy_scores)

    docs = spark.createDataFrame(
        [(1, "abcd" * 8),          # uniform over 4 chars: H = 2 bits
         (2, "aaaa aaaa aaaa")],   # 12 a's + 2 spaces: low entropy
        ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in entropy_scores(docs).collect()}
    assert out[1]["char_entropy"] == 2.0 and out[1]["entropy_flag"] == "low"
    assert out[1]["n_chars"] == 32
    # doc 2: p(a)=12/14, p(' ')=2/14 -> H = log2(14) - (12*log2(12)+0)/14
    import math
    t = round(12 * math.log2(12) * 1e6) + round(2 * math.log2(2) * 1e6)
    want = round(math.log2(14) - (t / 1e6) / 14, 6)
    assert out[2]["char_entropy"] == want
    # word side: 3 identical tokens -> word entropy 0
    assert out[2]["n_words"] == 3 and out[2]["word_entropy"] == 0.0


def test_winnow_fingerprints_guarantee_and_tie_rule(spark):
    """Winnowing invariants: (a) matches a direct python reference with
    the rightmost-min tie rule, (b) the positional guarantee — two docs
    sharing a substring of length >= k+w-1 share a fingerprint, (c) docs
    with fewer than w k-grams still emit their global min."""
    import hashlib

    from league_of_legends_data_pipeline_spark.operators.text import (
        winnow_fingerprints,
        winnow_similarity_pairs,
    )

    k, w = 4, 3
    shared = "zqxjvkwpfy"  # >= k+w-1 = 6 chars, rare letters
    rows = [
        (1, "aaaa bbbb " + shared + " cccc"),
        (2, "dddd " + shared + " eeee ffff"),
        (3, "short"),        # 2 k-grams < w: still fingerprints
        (4, "abc"),          # shorter than k: nothing
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.doc_id, r.pos, r.fp)
           for r in winnow_fingerprints(df, "doc_id", "text", k=k, w=w)
           .collect()}

    def ref(text):
        n = len(text) - k + 1
        if n < 1:
            return set()
        hs = [int(hashlib.md5(text[i:i + k].encode()).hexdigest()[:8], 16)
              for i in range(n)]
        out = set()
        for p in range(min(w, n), n + 1):
            lo = max(p - w + 1, 1)
            win = [(hs[j - 1], j) for j in range(lo, p + 1)]
            m = min(h for h, _ in win)
            out.add((max(j for h, j in win if h == m), m))
        return out

    exp = {(d, pos, fp) for d, t in rows for pos, fp in ref(t)}
    assert got == exp
    assert any(d == 3 for d, _, _ in got)
    assert not any(d == 4 for d, _, _ in got)

    by_doc = {}
    for d, _, fp in got:
        by_doc.setdefault(d, set()).add(fp)
    assert by_doc[1] & by_doc[2]  # the positional guarantee

    pairs = winnow_similarity_pairs(df, "doc_id", "text", k=k, w=w,
                                    max_doc_freq=10, min_shared=1).collect()
    assert {(r.id_a, r.id_b) for r in pairs} >= {(1, 2)}
    p12 = next(r for r in pairs if (r.id_a, r.id_b) == (1, 2))
    assert p12.shared == len(by_doc[1] & by_doc[2])


def test_winnow_boilerplate_cut_bounds_buckets(spark):
    """A fingerprint present in more than max_doc_freq docs is dropped
    before the pair join (the MOSS boilerplate rule == the scale guard)."""
    from league_of_legends_data_pipeline_spark.operators.text import (
        winnow_similarity_pairs,
    )

    boiler = "commonheaderstring"
    rows = [(i, boiler + f" unique{i}tail{i}") for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # every doc shares the boilerplate fingerprints; df cap of 3 kills them
    pairs = winnow_similarity_pairs(df, "doc_id", "text", k=6, w=2,
                                    max_doc_freq=3, min_shared=1).collect()
    assert pairs == []


def test_exact_ntile_matches_window_ntile(spark):
    """The distributed range-partition + offset rank must agree with the
    single-partition window form exactly — including uneven N % n bucket
    sizes and the (score, id) tiebreak — at several awkward sizes."""
    from pyspark.sql import Window

    from league_of_legends_data_pipeline_spark.operators.sampling import (
        exact_ntile,
        global_rank,
    )

    # 150/4 and 14/4 have remainder 2 — the sizes where the
    # floor((r-1)*n/N)+1 closed form diverges from SQL NTILE
    for n_rows, n_buckets in [(10, 3), (11, 3), (5, 3), (97, 4),
                              (8, 8), (150, 4), (14, 4), (23, 5)]:
        rows = [(i, (i * 37) % 13) for i in range(n_rows)]  # heavy ties
        df = spark.createDataFrame(rows, ["id", "score"])
        got = {(r.id, r.bucket) for r in
               exact_ntile(df, ["score", "id"], n_buckets,
                           num_partitions=4).collect()}
        w = Window.orderBy("score", "id")
        exp = {(r.id, r.b) for r in
               df.withColumn("b", F.ntile(n_buckets).over(w)).collect()}
        assert got == exp, (n_rows, n_buckets)

    df = spark.createDataFrame([(i, (i * 7) % 5) for i in range(50)],
                               ["id", "score"])
    ranked = global_rank(df, ["score", "id"], num_partitions=6).collect()
    w = Window.orderBy("score", "id")
    exp_rank = {r.id: r.r for r in
                df.withColumn("r", F.row_number().over(w)).collect()}
    assert {r.id: r.rank for r in ranked} == exp_rank


def test_code_signals_classify_code_vs_prose(spark):
    from league_of_legends_data_pipeline_spark.operators.cleaning import (
        code_signals,
    )

    rows = [
        (1, "def add(a, b):\n  return a + b\n"),              # python
        (2, "const f = (x) => { return x * 2; };"),            # js
        (3, "plain english prose with no markup at all here"),  # prose
        (4, "a variable discussion of variance in returns"),    # near-miss
        (5, "\tindented line only"),                            # tab indent
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    s = code_signals("text")
    got = {r.id: r for r in df.select(
        "id", s["is_code"].alias("is_code"),
        s["keyword_hits"].alias("kh"), s["n_symbols"].alias("ns"),
        s["indent_lines"].alias("ind")).collect()}
    assert got[1].is_code and got[1].ind == 1 and got[1].kh >= 2
    assert got[2].is_code and got[2].ns >= 8
    assert not got[3].is_code and got[3].ns == 0 and got[3].kh == 0
    assert not got[4].is_code  # 'variable'/'returns' must not hit var/return
    assert got[5].is_code and got[5].ind == 1


def test_profile_columns_nulls_ndv_and_kinds(spark):
    from league_of_legends_data_pipeline_spark.operators.profile import (
        profile_columns,
    )

    rows = [(1, 2.5, "aa"), (2, None, "bbb"), (2, 7.25, None),
            (None, 7.25, "aa")]
    df = spark.createDataFrame(rows, ["k", "v", "s"])
    p = {r.column: r for r in profile_columns(df).collect()}
    assert set(p) == {"k", "v", "s"}
    assert p["k"].kind == "integral" and p["k"].n_rows == 4
    assert p["k"].n_nulls == 1 and p["k"].ndv == 2
    assert p["k"].min_num == 1.0 and p["k"].max_num == 2.0
    assert abs(p["k"].mean_num - 5 / 3) < 1e-6
    assert p["v"].kind == "floating" and p["v"].n_nulls == 1
    assert p["v"].ndv == 2 and p["v"].mean_num == round((2.5 + 14.5) / 3, 6)
    assert p["s"].kind == "string" and p["s"].min_str == "aa"
    assert p["s"].max_str == "bbb" and p["s"].avg_len == round(7 / 3, 6)
    assert p["s"].min_num is None and p["k"].min_str is None

    # approx mode still returns every field, ndv close to exact
    pa_ = {r.column: r for r in
           profile_columns(df, ["k"], exact_ndv=False).collect()}
    assert abs(pa_["k"].ndv - 2) <= 1

    # the three ndv modes agree exactly on values for exact modes, and
    # the pruned default's rows match the expand plan row-for-row
    rows_pruned = sorted(profile_columns(df).collect())
    rows_expand = sorted(
        profile_columns(df, ndv_mode="exact_expand").collect())
    assert rows_pruned == rows_expand
    import pytest as _pytest
    with _pytest.raises(ValueError, match="ndv_mode"):
        profile_columns(df, ndv_mode="bogus")


def test_exact_ndv_by_column_prunes_scan(spark):
    """Each NDV branch must read ONLY its own column (the whole point of
    the pruned exact mode vs the expand plan)."""
    import os
    import tempfile

    from league_of_legends_data_pipeline_spark.operators.profile import (
        exact_ndv_by_column,
    )

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.parquet")
        spark.createDataFrame(
            [(1, "a", 2.0), (2, "a", 3.0)], ["x", "y", "z"]
        ).write.parquet(path)
        df = spark.read.parquet(path)
        out = exact_ndv_by_column(df, ["x", "y"])
        assert {r.column: r.ndv for r in out.collect()} == {"x": 2, "y": 1}
        plan = out._jdf.queryExecution().executedPlan().toString()
        # every scan branch reads EXACTLY its own single field (checking
        # ReadSchema lines only — the tempdir path above may contain any
        # letter, which a whole-plan substring check would trip on)
        schemas = [line for line in plan.splitlines() if "ReadSchema" in line]
        assert schemas, "no ReadSchema in executed plan"
        for line in schemas:
            assert "z:" not in line
            assert ("struct<x:" in line) != ("struct<y:" in line)


def test_plan_compaction_first_fit_and_oversize(spark):
    from league_of_legends_data_pipeline_spark.operators.maintenance import (
        compaction_report,
        plan_compaction,
        small_file_stats,
    )

    # group g: 3 small files pack into bin 1 (100+200+300 < 1000),
    # then an oversize file lands alone, then packing restarts
    rows = [("g", 1, 100), ("g", 2, 200), ("g", 3, 300),
            ("g", 4, 2500), ("g", 5, 50), ("g", 6, 60),
            ("h", 1, 999), ("h", 2, 1)]
    df = spark.createDataFrame(rows, ["grp", "seq", "sz"])
    planned = {(r.grp, r.seq): r.bin for r in
               plan_compaction(df, ["grp"], "sz", ["seq"], 1000).collect()}
    assert planned[("g", 1)] == planned[("g", 2)] == planned[("g", 3)] == 1
    assert planned[("g", 4)] == 1  # starts at offset 600, crosses alone
    assert planned[("g", 5)] == 4  # offset 3100 -> floor/1000+1
    assert planned[("g", 5)] == planned[("g", 6)]
    assert planned[("h", 1)] == 1 and planned[("h", 2)] == 1

    rep = {(r.grp, r.bin): r for r in
           compaction_report(df, ["grp"], "sz", ["seq"], 1000).collect()}
    assert rep[("g", 1)].n_files == 4 and rep[("g", 1)].compactable
    assert rep[("g", 4)].n_files == 2
    assert rep[("h", 1)].total_bytes == 1000

    st = {r.grp: r for r in
          small_file_stats(df, ["grp"], "sz", 100).collect()}
    assert st["g"].n_small == 2 and st["g"].n_files == 6
    assert st["h"].small_fraction == 0.5


def test_benford_report_exact_law_and_missing_digits(spark):
    import math

    from league_of_legends_data_pipeline_spark.operators.profile import (
        BENFORD_MICRO,
        benford_report,
    )

    # the baked micro literals ARE round(log10(1+1/d)*1e6) and sum to 1e6
    assert BENFORD_MICRO == [
        round(math.log10(1 + 1 / d) * 1e6) for d in range(1, 10)]
    assert sum(BENFORD_MICRO) == 1_000_000

    # perfectly Benford-ish sample: value = 10^(k/100) for k=0..199
    # spans 1..~100 log-uniformly -> low chi2
    vals = [(i, 10 ** (k / 100)) for i, k in enumerate(range(200))]
    df = spark.createDataFrame(vals, ["id", "v"])
    rep = {r.digit: r for r in benford_report(df, "v").collect()}
    assert set(rep) == set(range(1, 10))
    assert sum(r.n_obs for r in rep.values()) == 200
    assert rep[1].chi2 < 1.0  # log-uniform follows the law closely

    # all-constant leading digit: digit 5 only; others emit n_obs=0 and
    # chi2 explodes
    df2 = spark.createDataFrame([(i, 5.0 + i / 100) for i in range(90)],
                                ["id", "v"])
    rep2 = {r.digit: r for r in benford_report(df2, "v").collect()}
    assert rep2[5].n_obs == 90 and rep2[1].n_obs == 0
    assert rep2[5].chi2 > 100
    # sub-1 values are excluded
    df3 = spark.createDataFrame([(1, 0.5), (2, 2.0)], ["id", "v"])
    rep3 = {r.digit: r.n_obs for r in benford_report(df3, "v").collect()}
    assert rep3[2] == 1 and sum(rep3.values()) == 1


def test_wht_hash_transform_properties(spark):
    """WHT fingerprint invariants: constant image -> all-zero signature
    (no non-DC energy); single-bright-pixel vs constant differ in many
    bits; a 1-byte brightness jitter moves few bits (perceptual
    locality); short payloads sentinel to 0; 128-byte payloads fold two
    bytes per block."""
    import numpy as np

    from league_of_legends_data_pipeline_spark.operators.multimodal import (
        wht_hash_table,
    )

    import random

    flat = bytes([100] * 64)
    spike = bytes([100] * 32 + [250] + [100] * 31)
    rng = random.Random(7)
    noisy = bytes(rng.randrange(256) for _ in range(64))  # generic coefs
    jitter = bytes([min(noisy[0] + 1, 255)]) + noisy[1:]  # one byte +1
    short = bytes([1, 2, 3])
    folded = bytes([100, 100] * 64)  # 128 bytes -> same grid as flat*2
    rows = [(1, flat), (2, spike), (3, noisy), (4, short), (5, folded),
            (6, jitter)]
    df = spark.createDataFrame(rows, ["id", "img"])
    got = {r.id: r.sig for r in wht_hash_table(df, "id", "img").collect()}

    assert got[1] == 0          # constant image: every non-DC coef == 0
    assert got[4] == 0          # sentinel
    assert got[5] == 0          # folded constant == constant
    assert bin(got[2]).count("1") >= 16  # spike spreads energy everywhere
    # perceptual locality: +1 on one pixel of a STRUCTURED image (large
    # coefficient magnitudes) flips few sign bits
    assert bin(got[3] ^ got[6]).count("1") <= 4

    # python reference replay (H @ A @ H sign bits)
    pops = np.array([[bin(i & j).count("1") for j in range(8)]
                     for i in range(8)])
    H = np.where(pops % 2 == 0, 1, -1).astype(np.int64)
    A = np.frombuffer(spike, dtype=np.uint8).astype(np.int64).reshape(8, 8)
    coefs = (H @ A @ H).reshape(64)[1:]
    exp = int(sum((1 << k) for k, c in enumerate(coefs) if c > 0))
    assert got[2] == exp


def test_pmi_collocations_known_corpus(spark):
    import math

    from league_of_legends_data_pipeline_spark.operators.text import (
        pmi_collocations,
    )

    # 'new york' always together (high PMI); 'the cat'/'the dog' mixed
    docs = [("new york " * 6).strip(), ("the cat " * 6).strip(),
            ("the dog " * 6).strip()]
    df = spark.createDataFrame([(i, d) for i, d in enumerate(docs)],
                               ["doc_id", "text"])
    got = {(r.w1, r.w2): r for r in
           pmi_collocations(df, "text", min_count=2, top_k=100).collect()}
    # counts: each doc has 6 occurrences of its word pair; tokens: 36
    # unigrams: new=6, york=6, the=12, cat=6, dog=6; bigrams:
    # (new,york)=6, (york,new)=5, (the,cat)=6, (cat,the)=5, ...
    assert got[("new", "york")].pair_count == 6
    exp = round(math.log2(6 * 36 / (6 * 6)), 6)
    assert got[("new", "york")].pmi == exp
    # (the, cat): 6*36/(12*6) -> PMI 1.0 < new-york's log2(6)
    assert got[("the", "cat")].pmi == round(math.log2(3.0), 6)
    assert got[("new", "york")].pmi > got[("the", "cat")].pmi


def test_negative_samples_uniform_never_self_deterministic(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        negative_samples,
    )

    df = spark.createDataFrame([(i,) for i in range(20)], ["id"])
    a = negative_samples(df, "id", k=5, seed=1).collect()
    b = negative_samples(df, "id", k=5, seed=1).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reproducible
    assert len(a) == 100
    assert all(r.anchor != r.negative for r in a)          # never self
    assert all(0 <= r.negative < 20 for r in a)
    # different seed -> different draw (overwhelmingly)
    c = negative_samples(df, "id", k=5, seed=2).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))
    # anchor_filter restricts anchors but keeps the full universe
    d = negative_samples(df, "id", k=3, seed=1,
                         anchor_filter=F.col("id") < 2).collect()
    assert {r.anchor for r in d} == {0, 1} and len(d) == 6


def test_audio_fingerprint_contour_and_sentinels(spark):
    import numpy as np

    from league_of_legends_data_pipeline_spark.operators.audio import (
        audio_fingerprint_table,
        encode_wav_pcm16,
    )

    def wav(samples):
        return encode_wav_pcm16(np.asarray(samples, dtype="<i2"), 8000, 1)

    rng = np.random.RandomState(3)
    base = rng.randint(-30000, 30000, 256).astype("<i2")
    noisy = (base + rng.randint(-50, 50, 256)).clip(-32768, 32767) \
        .astype("<i2")
    rows = [
        (1, wav(base)),
        (2, wav(noisy)),                      # light noise: close sig
        (3, wav(rng.randint(-30000, 30000, 256).astype("<i2"))),
        (4, wav([5] * 10)),                   # < frames samples: sentinel
        (5, b"not audio"),                    # decode failure: sentinel
    ]
    df = spark.createDataFrame(rows, ["id", "payload"])
    got = {r.id: r.sig for r in
           audio_fingerprint_table(df, "id", "payload", frames=64)
           .collect()}
    assert got[4] == 0 and got[5] == 0
    close = bin(got[1] ^ got[2]).count("1")
    far = bin(got[1] ^ got[3]).count("1")
    assert close <= 8 < far  # contour robustness vs unrelated audio

    # python reference: frame energies over 4-sample frames
    e = (base.astype(np.int64)[:256].reshape(64, 4) ** 2).sum(axis=1)
    exp = int(sum(1 << f for f in range(63) if e[f + 1] > e[f]))
    assert got[1] == exp


def test_scene_cuts_detects_planted_transition(spark):
    from league_of_legends_data_pipeline_spark.operators.video import (
        scene_cuts,
    )

    # video 1: two flat 'scenes' (frames of 10s then frames of 200s) ->
    # exactly one cut at the boundary; video 2: constant -> zero cuts;
    # video 3: shorter than one frame -> excluded by frame_sample
    v1 = bytes([10] * 64 + [200] * 64)
    v2 = bytes([50] * 128)
    v3 = bytes([1] * 5)
    df = spark.createDataFrame([(1, v1), (2, v2), (3, v3)],
                               ["vid", "payload"])
    got = {r.id: r for r in
           scene_cuts(df, "vid", "payload", frame_bytes=32,
                      threshold=1000).collect()}
    assert set(got) == {1, 2}
    assert got[1].n_frames == 4 and got[1].n_cuts == 1
    assert got[1].max_delta == (200 - 10) * 32
    assert got[2].n_cuts == 0 and got[2].max_delta == 0


def test_zone_map_pruning_rule_and_counts(spark):
    from league_of_legends_data_pipeline_spark.operators.maintenance import (
        zone_map_pruning_report,
    )

    # file A: values 0..9, file B: 100..109, file C: 50..59
    rows = [("A", float(v)) for v in range(10)] + \
           [("B", float(v)) for v in range(100, 110)] + \
           [("C", float(v)) for v in range(50, 60)]
    df = spark.createDataFrame(rows, ["f", "v"])
    rep = {r.pred_id: r for r in zone_map_pruning_report(
        df, ["f"], "v", [(0.0, 10.0), (55.0, 105.0), (200.0, 300.0)])
        .collect()}
    # pred 0 hits only file A: B and C pruned
    assert rep[0].n_pruned == 2 and rep[0].rows_scanned == 10
    assert rep[0].rows_matched == 10
    # pred 1 overlaps C (55..59) and B (100..104): A pruned
    assert rep[1].n_pruned == 1 and rep[1].rows_scanned == 20
    assert rep[1].rows_matched == 5 + 5
    # pred 2 matches nothing: all pruned, zero scanned
    assert rep[2].n_pruned == 3 and rep[2].rows_scanned == 0
    assert rep[2].rows_matched == 0


def test_cohort_retention_matrix(spark):
    import datetime as dt

    from league_of_legends_data_pipeline_spark.operators.joins import (
        cohort_retention,
    )

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1)), (1, d(2024, 1, 8)),   # cohort w1, active w1+w2
        (2, d(2024, 1, 3)),                        # cohort w1, only w1
        (3, d(2024, 1, 10)), (3, d(2024, 1, 22)),  # cohort w2, w2 and w4
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {(r.cohort_week, r.week_offset): r for r in
           cohort_retention(df, "user_id", "ts").collect()}
    assert got[("2024-01-01", 0)].cohort_size == 2
    assert got[("2024-01-01", 0)].n_active == 2
    assert got[("2024-01-01", 1)].n_active == 1
    assert got[("2024-01-01", 1)].retention == 0.5
    assert got[("2024-01-08", 0)].cohort_size == 1
    assert got[("2024-01-08", 2)].n_active == 1  # Jan 22 is +2 weeks
    assert ("2024-01-08", 1) not in got


def test_label_propagation_communities_vs_components(spark):
    from league_of_legends_data_pipeline_spark.operators.graph import (
        label_propagation,
    )

    # two 4-cliques bridged by ONE edge: CC merges them, LPA keeps two
    # communities (the bridge minority never outvotes the clique)
    cl1, cl2 = [1, 2, 3, 4], [10, 11, 12, 13]
    e = [(a, b) for a in cl1 for b in cl1 if a != b] + \
        [(a, b) for a in cl2 for b in cl2 if a != b] + \
        [(4, 10), (10, 4)]
    df = spark.createDataFrame(e, ["src", "dst"])
    got = {r.node: r.label for r in
           label_propagation(df, iterations=4).collect()}
    assert len({got[n] for n in cl1}) == 1
    assert len({got[n] for n in cl2}) == 1
    assert got[1] != got[10]  # bridge did not merge the cliques
    assert got[1] == 1 and got[10] == 10  # smallest-label determinism

    # isolated edge pair: synchronous updates SWAP every round (the
    # textbook bipartite oscillation) -> odd rounds exchanged, even
    # rounds back to self
    df2 = spark.createDataFrame([(7, 8), (8, 7)], ["src", "dst"])
    got_odd = {r.node: r.label for r in
               label_propagation(df2, iterations=3).collect()}
    assert got_odd == {7: 8, 8: 7}
    got_even = {r.node: r.label for r in
                label_propagation(df2, iterations=4).collect()}
    assert got_even == {7: 7, 8: 8}


def test_prefix_filter_pairs_is_lossless_vs_bruteforce(spark):
    """Prefix filtering is a LOSSLESS pruner: the sub-quadratic join must
    reproduce brute-force all-pairs Jaccard exactly, at an awkward
    threshold (0.4: float dust in ceil(t*|T|) shrinks prefixes without
    the epsilon guard) and with docs of very different sizes."""
    from itertools import combinations

    from league_of_legends_data_pipeline_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    rows = [
        (1, "a b c d e"),
        (2, "a b c d f"),          # J=2/3 with 1
        (3, "a b c d e"),          # J=1 with 1
        (4, "x y z"),
        (5, "x y z w v u t s"),    # J=3/8 with 4
        (6, "q r"),
        (7, "a b"),                # subset of 1: J=2/5
        (8, ""),                   # empty: dropped
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    t = 0.4
    got = {(r.id_a, r.id_b): r.jaccard
           for r in prefix_filter_pairs(df, "doc_id", "text",
                                        threshold=t).collect()}
    sets = {i: set(s.split()) for i, s in rows if s}
    exp = {}
    for a, b in combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        j = i / (len(sets[a]) + len(sets[b]) - i)
        if j >= t:
            exp[(a, b)] = round(j, 6)
    assert got == exp
    assert (1, 3) in got and got[(1, 3)] == 1.0
    assert (4, 5) not in got  # 3/8 < 0.4


def test_prefix_filter_pairs_shingles(spark):
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        prefix_filter_pairs,
    )

    rows = [(1, "the cat sat on the mat"),
            (2, "the cat sat on the hat"),
            (3, "dogs bark loudly at night always")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b) for r in
           prefix_filter_pairs(df, "doc_id", "text", threshold=0.3,
                               shingle_n=3).collect()}
    # docs 1/2 share 3 of their 4 word-3-grams each: J = 3/5 = 0.6
    assert got == {(1, 2)}


def test_triangle_count_known_graph(spark):
    """Two triangles sharing an edge + a pendant edge + noise duplicates/
    reverses/self-loops: count must be exactly 2 under any orientation."""
    from league_of_legends_data_pipeline_spark.operators.graph import (
        triangle_count,
    )

    edges = [(1, 2), (2, 3), (1, 3),          # triangle 1-2-3
             (2, 4), (3, 4),                  # triangle 2-3-4 (shares 2-3)
             (4, 5),                          # pendant
             (2, 1), (1, 1), (3, 2)]          # reverse dup, self loop, dup
    df = spark.createDataFrame(edges, ["src", "dst"])
    row = triangle_count(df).collect()[0]
    assert row.triangles == 2
    assert row.wedges_checked >= 2  # every triangle is a checked wedge


def test_robust_group_outliers_flags_extremes(spark):
    from league_of_legends_data_pipeline_spark.operators.profile import (
        robust_group_outliers,
    )

    rows = ([("a", float(v)) for v in [10, 11, 12, 13, 14]] +
            [("a", 100.0), ("b", 5.0), ("b", 6.0), ("b", 7.0)])
    df = spark.createDataFrame(rows, ["grp", "v"])
    out = robust_group_outliers(df, "grp", "v", k=3.0).collect()
    # group a: med=12.5, MAD=1.5 -> only 100 deviates > 4.5
    assert [(r.grp, r.v) for r in out] == [("a", 100.0)]
    assert out[0].med == 12.5 and out[0].mad == 1.5


def test_k_anonymity_report(spark):
    from league_of_legends_data_pipeline_spark.operators.profile import (
        k_anonymity_report,
    )

    rows = [("us", "m")] * 5 + [("us", "f")] * 2 + [("de", "m")] * 1
    df = spark.createDataFrame(rows, ["country", "seg"])
    r = k_anonymity_report(df, ["country", "seg"], k=3).collect()[0]
    assert r.k_effective == 1
    assert r.n_classes == 3
    assert r.classes_below_k == 2
    assert r.rows_below_k == 3
    assert abs(r.risk_fraction - 3 / 8) < 1e-9


def test_encoding_signals_and_verdict(spark):
    from league_of_legends_data_pipeline_spark.operators.cleaning import (
        encoding_signals, encoding_verdict,
    )

    rows = [(1, "clean ascii text"),
            (2, "broken �� decode"),
            (3, "ctl\x01\x02 bytes here padded out"),
            (4, "café naïve")]
    df = spark.createDataFrame(rows, ["id", "text"])
    sig = encoding_signals("text")
    out = {r.id: r for r in df.select(
        "id", *[v.alias(k) for k, v in sig.items()],
        encoding_verdict(sig).alias("verdict")).collect()}
    assert out[1].verdict == "ok" and out[1].replacement_ratio == 0.0
    assert out[2].verdict == "bad" and out[2].replacement_ratio > 0
    assert out[3].verdict == "suspect" and out[3].control_ratio > 0.001
    assert out[4].verdict == "ok" and out[4].non_ascii_ratio > 0


def test_dsir_scores_prefer_targetlike_docs(spark):
    """Raw docs sharing the target's vocabulary must outscore raw docs
    from a disjoint vocabulary; target docs are excluded from output."""
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        dsir_scores,
    )

    tgt = [(i, "alpha beta gamma delta", True) for i in range(10)]
    raw_like = [(100, "alpha beta gamma", False)]
    raw_unlike = [(101, "zeta eta theta", False)]
    df = spark.createDataFrame(tgt + raw_like + raw_unlike,
                               ["id", "text", "tgt"])
    out = {r.doc_id: r.score for r in
           dsir_scores(df, "id", "text", F.col("tgt")).collect()}
    assert set(out) == {100, 101}
    assert out[100] > out[101]


def test_token_group_chi2_finds_group_keywords(spark):
    from league_of_legends_data_pipeline_spark.operators.text import (
        token_group_chi2,
    )

    rows = ([(i, "spark shuffle common", "eng") for i in range(10)] +
            [(i + 10, "poem verse common", "lit") for i in range(10)])
    df = spark.createDataFrame(rows, ["doc_id", "text", "src"])
    out = token_group_chi2(df, "doc_id", "text", "src",
                           min_df=2, top_k=2).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r.tok)
    # 'common' (in every doc) is excluded by max_df_frac; the perfectly
    # separating tokens win both slots per group
    assert set(by_grp["eng"]) == {"spark", "shuffle"}
    assert set(by_grp["lit"]) == {"poem", "verse"}


def test_woe_iv_separating_feature(spark):
    """A perfectly separating feature must yield a large IV and
    monotone WOE; bin sizes follow SQL NTILE."""
    from league_of_legends_data_pipeline_spark.operators.profile import (
        woe_iv,
    )

    rows = [(i, float(i), i >= 50) for i in range(100)]
    df = spark.createDataFrame(rows, ["id", "v", "evt"])
    out = {r.bin: r for r in
           woe_iv(df, "v", F.col("evt"), "id", bins=4).collect()}
    assert sorted(out) == [1, 2, 3, 4]
    assert all(out[b].n_rows == 25 for b in out)
    assert out[1].n_event == 0 and out[4].n_event == 25
    assert out[1].woe < 0 < out[4].woe
    assert out[1].iv_total > 1.0  # "suspiciously strong" range


def test_sorted_neighborhood_finds_prefix_dups(spark):
    """Docs sharing a long prefix must land in adjacent ranks and be
    caught; docs outside the rank window must not be compared."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rows = [(1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon eta"),   # prefix dup of 1
            (3, "zulu yankee xray whiskey victor uniform"),
            (4, "mike november oscar papa quebec romeo")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b) for r in
           sorted_neighborhood_pairs(df, "doc_id", "text", window=1,
                                     threshold=0.3, shingle_n=3).collect()}
    assert got == {(1, 2)}


def test_ks_two_sample_detects_shift(spark):
    from league_of_legends_data_pipeline_spark.operators.joins import (
        ks_two_sample,
    )

    rows = ([("a", float(v)) for v in range(100)] +
            [("b", float(v) + 50.0) for v in range(100)])
    df = spark.createDataFrame(rows, ["grp", "v"])
    r = ks_two_sample(df, "v", "grp", "a", "b").collect()[0]
    assert r.n_a == 100 and r.n_b == 100
    assert abs(r.ks_d - 0.5) < 1e-9       # 50/100 offset -> D = 0.5
    assert r.drift                        # crit ~ 0.192
    same = ks_two_sample(df.filter("grp = 'a'")
                         .unionAll(df.filter("grp = 'a'")
                                   .withColumn("grp", F.lit("b"))),
                         "v", "grp", "a", "b").collect()[0]
    assert same.ks_d == 0.0 and not same.drift


def test_kcenter_coreset_picks_extremes(spark):
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        kcenter_coreset,
    )

    # three tight clusters far apart: greedy must visit all three first
    pts = ([(i, [0.0, 0.0]) for i in range(5)] +
           [(10 + i, [100.0, 0.0]) for i in range(5)] +
           [(20 + i, [0.0, 100.0]) for i in range(5)])
    df = spark.createDataFrame(pts, ["vec_id", "embedding"])
    centers = kcenter_coreset(df, "vec_id", "embedding", k=3)
    assert [s for s, _, _ in centers] == [1, 2, 3]
    assert centers[0][1] == 0              # min-id seed
    picked_clusters = {cid // 10 for _, cid, _ in centers}
    assert picked_clusters == {0, 1, 2}    # one per cluster
    assert centers[1][2] == 100.0          # farthest-point separations
    assert centers[2][2] == 100.0


def test_hits_scores_hub_vs_authority(spark):
    """A pure source pointing at everything is the max hub; a pure sink
    receiving from everything is the max authority."""
    from league_of_legends_data_pipeline_spark.operators.graph import (
        hits_scores,
    )

    edges = [(0, 9), (1, 9), (2, 9),   # 9: authority
             (5, 6), (5, 7), (5, 9)]   # 5: hub
    df = spark.createDataFrame(edges, ["src", "dst"])
    out = {r.node: (r.hub_mu, r.auth_mu) for r in
           hits_scores(df, iterations=2).collect()}
    assert out[5][0] == 1_000_000          # max hub
    assert out[9][1] == 1_000_000          # max authority
    assert out[9][0] == 0                  # sink: no out-edges
    assert out[5][1] == 0                  # source: no in-edges
    assert max(v for v, _ in out.values()) == 1_000_000


def test_quantile_normalize_positions(spark):
    from league_of_legends_data_pipeline_spark.operators.profile import (
        quantile_normalize,
    )

    rows = [("a", 1, 10), ("a", 2, 20), ("a", 3, 30),
            ("b", 4, 5), ("b", 5, 500)]
    df = spark.createDataFrame(rows, ["src", "id", "v"])
    out = {r.id: r.qnorm for r in
           quantile_normalize(df, "src", "v", "id").collect()}
    # within-group positions: extremes at 0/1 regardless of raw scale
    assert out[1] == 0.0 and out[3] == 1.0 and out[2] == 0.5
    assert out[4] == 0.0 and out[5] == 1.0


def test_padding_efficiency_buckets_and_truncation(spark):
    from league_of_legends_data_pipeline_spark.operators.sampling import (
        padding_efficiency,
    )

    rows = [(3,), (4,), (7,), (100,)]  # last truncates to max bucket 8
    df = spark.createDataFrame(rows, ["tc"])
    out = {r.bucket_width: r for r in
           padding_efficiency(df, "tc", [4, 8]).collect()}
    assert out[4].n_seqs == 2 and out[4].real_tokens == 7
    assert out[4].padded_tokens == 8 and abs(out[4].waste_ratio - 0.125) < 1e-9
    assert out[8].n_seqs == 2 and out[8].real_tokens == 15  # 7 + min(100,8)


def test_ngram_novelty_first_occurrence_credit(spark):
    from league_of_legends_data_pipeline_spark.operators.text import (
        ngram_novelty,
    )

    rows = [(1, "a b c d"),          # grams: "a b c", "b c d" — all novel
            (2, "a b c d"),          # exact restatement: novelty 0
            (3, "a b c x y z")]      # "a b c" seen; "b c x"... novel
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in
           ngram_novelty(df, "doc_id", "text", n=3).collect()}
    assert out[1].novelty == 1.0
    assert out[2].novelty == 0.0
    assert out[3].n_grams == 4 and out[3].n_novel == 3
    assert out[3].novelty == 0.75


def test_inter_arrival_burstiness_regular_vs_bursty(spark):
    import datetime

    from league_of_legends_data_pipeline_spark.operators.joins import (
        inter_arrival_stats,
    )

    base = datetime.datetime(2026, 1, 1)
    regular = [("r", i, base + datetime.timedelta(seconds=60 * i))
               for i in range(20)]
    bursty_gaps = ([1] * 15 + [3000, 1, 1, 2500])
    t, bursty = 0, []
    for i, g in enumerate(bursty_gaps):
        t += g
        bursty.append(("b", 100 + i, base + datetime.timedelta(seconds=t)))
    df = spark.createDataFrame(regular + bursty, ["k", "eid", "ts"])
    out = {r.k: r for r in
           inter_arrival_stats(df, "k", "ts", "eid", min_gaps=10).collect()}
    assert out["r"].sd_gap_s == 0.0 and out["r"].burstiness == -1.0
    assert out["b"].burstiness > 0.4  # heavy-tailed gaps -> bursty
    assert out["r"].n_gaps == 19


def test_kmv_overlap_matrix_identical_vs_disjoint(spark):
    """Identical groups estimate J=1; disjoint groups J=0; the sketch
    is exact when group universes fit inside k."""
    from league_of_legends_data_pipeline_spark.operators.sketch import (
        kmv_overlap_matrix,
    )

    rows = ([("a", h) for h in range(100)] +
            [("b", h) for h in range(100)] +          # identical to a
            [("c", h) for h in range(1000, 1100)])    # disjoint
    df = spark.createDataFrame(rows, ["grp", "hv"])
    out = {(r.grp_a, r.grp_b): r.est_jaccard for r in
           kmv_overlap_matrix(df, "grp", "hv", k=256).collect()}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == 0.0 and out[("b", "c")] == 0.0


def test_kmv_by_group_bounded_and_sorted(spark):
    from league_of_legends_data_pipeline_spark.operators.sketch import (
        kmv_by_group,
    )

    df = spark.createDataFrame([("g", h % 50) for h in range(500)],
                               ["grp", "hv"])
    row = kmv_by_group(df, "grp", "hv", k=16).collect()[0]
    assert row.kmv == list(range(16))  # 16 smallest DISTINCT values


def test_threshold_sweep_monotone(spark):
    from league_of_legends_data_pipeline_spark.operators.text import (
        threshold_sweep,
    )

    rows = [("a", s / 10.0) for s in range(10)]
    df = spark.createDataFrame(rows, ["grp", "q"])
    out = {r.threshold: r.n_kept for r in
           threshold_sweep(df, "q", "grp", [0.2, 0.5, 0.8]).collect()}
    assert out[0.2] == 8 and out[0.5] == 5 and out[0.8] == 2
    # keep counts must be monotone non-increasing in the threshold
    assert out[0.2] >= out[0.5] >= out[0.8]


def test_structure_fingerprint_collapses_templates(spark):
    from league_of_legends_data_pipeline_spark.operators.text import (
        template_report,
    )

    rows = [(1, "Order #1234 shipped to Alice"),
            (2, "Order #98 shipped to Bob"),
            (3, "Order #555 shipped to Carol"),
            (4, "totally different content here today")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = template_report(df, "doc_id", "text", min_count=3).collect()
    assert len(out) == 1
    assert out[0].n_instances == 3 and out[0].sample_doc_id == 1
    assert abs(out[0].corpus_share - 0.75) < 1e-9


def test_embedding_health_collapse_vs_orthogonal(spark):
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        embedding_health,
    )

    collapsed = [("c", [1.0, 0.0, 0.0])] * 4          # identical: cos = 1
    ortho = [("o", [1.0, 0.0, 0.0]), ("o", [0.0, 1.0, 0.0]),
             ("o", [0.0, 0.0, 1.0])]                  # orthogonal: cos = 0
    df = spark.createDataFrame(collapsed + ortho, ["label", "embedding"])
    out = {r.label: r for r in embedding_health(df, "label").collect()}
    assert out["c"].anisotropy == 1.0
    assert abs(out["o"].anisotropy) < 1e-6
    assert out["c"].n == 4 and abs(out["c"].mean_norm - 1.0) < 1e-6


def test_cms_inner_product_never_undercounts_f2(spark):
    from league_of_legends_data_pipeline_spark.operators.sketch import (
        cms_inner_product, cms_table,
    )

    rows = [(str(k),) for k in [1] * 10 + [2] * 5 + list(range(3, 40))]
    df = spark.createDataFrame(rows, ["token"])
    tab = cms_table(df, "token", depth=4, width=1024)
    est = cms_inner_product(tab, tab).collect()[0].inner_product_estimate
    exact = 10 * 10 + 5 * 5 + 37  # sum of squared counts
    assert est >= exact
    # 4x1024 buckets over 39 keys: collisions are rare, estimate tight
    assert est <= exact * 1.5


def test_cms_inner_product_disjoint_corpora_is_zero(spark):
    """Fully disjoint key sets must yield ONE row with estimate 0 (the
    round-8 inner-join version returned an empty frame), and partially
    overlapping rows must not be dropped from the min."""
    from league_of_legends_data_pipeline_spark.operators.sketch import (
        cms_inner_product, cms_table,
    )

    a = cms_table(spark.createDataFrame(
        [(f"a{k}",) for k in range(20)], ["token"]), "token",
        depth=4, width=1 << 20)
    b = cms_table(spark.createDataFrame(
        [(f"b{k}",) for k in range(20)], ["token"]), "token",
        depth=4, width=1 << 20)
    rows = cms_inner_product(a, b).collect()
    assert len(rows) == 1
    # width 2^20 over 40 keys: a cross-collision between the two
    # disjoint sets in EVERY one of the 4 hash rows is ~impossible,
    # so the min is an exact 0
    assert rows[0].inner_product_estimate == 0


def test_hits_scores_degenerate_inputs(spark):
    """Empty edge sets return zero scores instead of crashing on a None
    divisor, and iterations=0 is rejected up front (ADVICE r8)."""
    import pytest as _pytest

    from league_of_legends_data_pipeline_spark.operators.graph import (
        hits_scores,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert hits_scores(empty, iterations=2).collect() == []

    df = spark.createDataFrame([(1, 2)], ["src", "dst"])
    with _pytest.raises(ValueError, match="iterations"):
        hits_scores(df, iterations=0)


def test_global_rank_p1_and_nonnumeric_warns(spark):
    """P=1 short-circuits the boundary sketch (percentile_approx with an
    empty list raises); a non-numeric first order column warns about the
    single-partition fallback but still ranks correctly (ADVICE r8)."""
    import warnings as _warnings

    from league_of_legends_data_pipeline_spark.operators.sampling import (
        global_rank,
    )

    df = spark.createDataFrame([(3,), (1,), (2,)], ["v"])
    ranked = {r.v: r.rank for r in
              global_rank(df, ["v"], num_partitions=1).collect()}
    assert ranked == {1: 1, 2: 2, 3: 3}

    sdf = spark.createDataFrame([("b", 1), ("a", 2)], ["k", "id"])
    with _warnings.catch_warnings(record=True) as caught:
        _warnings.simplefilter("always")
        out = {r.k: r.rank for r in
               global_rank(sdf, ["k"], num_partitions=4).collect()}
    assert out == {"a": 1, "b": 2}
    assert any("SINGLE-PARTITION" in str(w.message) for w in caught)


# ---------------------------------------------------------------------------
# mining.association_rules (q229)
# ---------------------------------------------------------------------------

def test_association_rules_counts_and_metrics(spark):
    from league_of_legends_data_pipeline_spark.operators.mining import (
        association_rules,
    )
    # baskets: {a,b,c}, {a,b}, {a,b}, {c}, plus a duplicate (1,a) row that
    # presence semantics must collapse
    rows = [(1, "a"), (1, "a"), (1, "b"), (1, "c"),
            (2, "a"), (2, "b"), (3, "a"), (3, "b"), (4, "c")]
    b = spark.createDataFrame(rows, ["bk", "it"])
    out = {(r.p1, r.p2): r for r in association_rules(
        b, "bk", "it", min_item_support=2, min_pair_support=2).collect()}
    assert set(out) == {("a", "b")}
    r = out[("a", "b")]
    assert (r.pair_cnt, r.cnt1, r.cnt2) == (3, 3, 3)
    assert r.support == 0.75            # 3 of 4 baskets
    assert r.conf_1_2 == 1.0 and r.conf_2_1 == 1.0
    assert r.lift == round(3 * 4 / 9, 6)


def test_association_rules_basket_cap_drops_mega_baskets(spark):
    from league_of_legends_data_pipeline_spark.operators.mining import (
        association_rules,
    )
    small = [(1, "a"), (1, "b"), (2, "a"), (2, "b")]
    mega = [(9, f"t{i}") for i in range(10)] + [(9, "a"), (9, "b")]
    b = spark.createDataFrame(small + mega, ["bk", "it"])
    capped = association_rules(b, "bk", "it", min_item_support=2,
                               min_pair_support=2, max_basket_size=5)
    rows = {(r.p1, r.p2): r.pair_cnt for r in capped.collect()}
    # the 12-item basket is excluded everywhere: pair count AND item
    # supports come from the surviving baskets only
    assert rows == {("a", "b"): 2}
    uncapped = association_rules(b, "bk", "it", min_item_support=2,
                                 min_pair_support=2)
    assert {(r.p1, r.p2): r.pair_cnt for r in uncapped.collect()}[
        ("a", "b")] == 3


# ---------------------------------------------------------------------------
# graph.k_core (q230)
# ---------------------------------------------------------------------------

def test_k_core_peels_tail_keeps_triangle(spark):
    import pytest
    from league_of_legends_data_pipeline_spark.operators.graph import k_core
    # triangle {1,2,3} with a tail 3-4-5 (undirected, so symmetrized);
    # duplicate edge (1,2) must not inflate degree
    und = [(1, 2), (1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"])
    out = {r.node: r.degree for r in k_core(edges, k=2, rounds=3).collect()}
    # round 1 peels node 5 (deg 1); round 2 peels 4 (deg 1 after 5 left);
    # the triangle survives with degree 2 everywhere
    assert out == {1: 2, 2: 2, 3: 2}
    one_round = {r.node: r.degree
                 for r in k_core(edges, k=2, rounds=1).collect()}
    # after a single round node 4 is still present (its degree was 2
    # before 5 was peeled) but its residual degree has dropped to 1
    assert one_round == {1: 2, 2: 2, 3: 3, 4: 1}
    with pytest.raises(ValueError):
        k_core(edges, k=0, rounds=1)
    with pytest.raises(ValueError):
        k_core(edges, k=2, rounds=0)


# ---------------------------------------------------------------------------
# graph.personalized_pagerank (q240)
# ---------------------------------------------------------------------------

def test_personalized_pagerank_path_graph_hand_values(spark):
    from league_of_legends_data_pipeline_spark.operators.graph import (
        personalized_pagerank,
    )
    # path 1-2-3-4 symmetrized, seed {1}; hand-unrolled two iterations:
    # r0 = e1; i1: r(1)=0.15, r(2)=0.85, rest 0
    # i2: r(1)=0.15+0.85*(0.85/2)=0.51125, r(2)=0.85*0.15=0.1275,
    #     r(3)=0.85*(0.85/2)=0.36125, r(4)=0
    und = [(1, 2), (2, 3), (3, 4)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], ["src", "dst"])
    seeds = spark.createDataFrame([(1,)], ["node"])
    out = {r.node: r for r in personalized_pagerank(
        edges, seeds, iterations=2, damping=0.85).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert abs(out[1].rank - 0.51125) < 1e-6
    assert abs(out[2].rank - 0.1275) < 1e-6
    assert abs(out[3].rank - 0.36125) < 1e-6
    assert out[4].rank == 0.0
    assert out[1].is_seed == 1 and out[2].is_seed == 0
    # total mass stays <= 1 (restart-normalized walk)
    assert sum(r.rank for r in out.values()) <= 1.0 + 1e-9


def test_personalized_pagerank_rejects_disjoint_seeds(spark):
    """r9 advice: a seed set that never intersects the out-degree node
    universe makes the restart mass 1/|S| undefined (sum(__seed) = 0 →
    null ranks everywhere). Must fail loudly, not propagate nulls."""
    import pytest

    from league_of_legends_data_pipeline_spark.operators.graph import (
        personalized_pagerank,
    )

    edges = spark.createDataFrame([(1, 2), (2, 1)], ["src", "dst"])
    seeds = spark.createDataFrame([(99,)], ["node"])
    with pytest.raises(ValueError, match="no seed node intersects"):
        personalized_pagerank(edges, seeds, iterations=1)


def test_exact_ndv_rejects_empty_columns(spark):
    """r9 advice: empty column list used to IndexError on parts[0] —
    now a clear ValueError."""
    import pytest

    from league_of_legends_data_pipeline_spark.operators.profile import (
        exact_ndv_by_column,
    )

    df = spark.createDataFrame([(1,)], ["x"])
    with pytest.raises(ValueError, match="empty column list"):
        exact_ndv_by_column(df, [])


def test_mann_kendall_all_tied_panel_zero_z(spark, tmp_path):
    """r9 advice: when every daily value ties within a group, the MK
    variance term is 0 and z used to divide by sqrt(0) → null/NaN. Both
    the engine and the oracle must now define z_mk = 0 for that group,
    and they must agree."""
    import datetime

    import duckdb

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    # 'tied': one event per day for 5 days (v = 1 every day — all tied);
    # 'trend': 1,2,3,4,5 events per day (strictly increasing, z > 0)
    rows = []
    eid = 0
    for i in range(5):
        ts = datetime.datetime(2024, 1, 1 + i, 12, 0, 0)
        rows.append((eid, ts, 1, "tied", 1.0, "{}")); eid += 1
        for _ in range(i + 1):
            rows.append((eid, ts, 1, "trend", 1.0, "{}")); eid += 1
    path = str(tmp_path / "events.parquet")
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    ).coalesce(1).write.parquet(path)

    got = {r.event_type: r for r in QUERIES["q252_mann_kendall"]
           .spark(spark, str(tmp_path)).collect()}
    assert got["tied"].z_mk == 0.0 and got["tied"].s_stat == 0
    assert got["trend"].z_mk > 0.0

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM parquet_scan('{path}/*.parquet')")
    oracle = {r[0]: r for r in
              con.execute(QUERIES["q252_mann_kendall"].oracle).fetchall()}
    assert oracle["tied"][4] == got["tied"].z_mk == 0.0
    assert abs(oracle["trend"][4] - got["trend"].z_mk) < 1e-9


# ---------------------------------------------------------------------------
# q243 ROC curve / q244 Lorenz-Gini invariants
# ---------------------------------------------------------------------------

def test_roc_curve_invariants(spark):
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = QUERIES["q243_roc_curve"].spark(
        spark, "/root/testdata/sf0.001").collect()
    assert rows, "ROC curve must be non-empty"
    # thresholds strictly descending; cumulative counts nondecreasing
    thrs = [r.thr for r in rows]
    assert thrs == sorted(thrs, reverse=True)
    for a, b in zip(rows, rows[1:]):
        assert b.tp >= a.tp and b.fp >= a.fp
        assert b.tpr >= a.tpr - 1e-12 and b.fpr >= a.fpr - 1e-12
    # the lowest threshold accepts everything: both rates reach 1
    assert rows[-1].tpr == 1.0 and rows[-1].fpr == 1.0
    for r in rows:
        assert 0.0 <= r.tpr <= 1.0 and 0.0 <= r.fpr <= 1.0
        assert 0.0 <= r.precision_at <= 1.0


def test_lorenz_gini_invariants_and_uniform_case(spark):
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    row = QUERIES["q244_lorenz_gini"].spark(
        spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_customers > 0 and row.total_cents > 0
    # Gini of nonnegative revenues lies in [0, 1); the top decile holds
    # at least its population share of revenue by definition
    assert 0.0 <= row.gini < 1.0
    assert row.top_decile_share >= 0.1 - 1e-9
    # rank-identity sanity on a hand case: perfectly equal revenues
    # must yield gini == 0 (formula: (2*sum(r*x) - (n+1)*sum(x)) = 0
    # when x is constant, since sum(r) = n(n+1)/2)
    n, x = 10, 7
    rs = sum(r * x for r in range(1, n + 1))
    assert 2 * rs - (n + 1) * n * x == 0


# ---------------------------------------------------------------------------
# graph.shortest_paths (q245)
# ---------------------------------------------------------------------------

def test_shortest_paths_weighted_beats_hops(spark):
    from league_of_legends_data_pipeline_spark.operators.graph import (
        shortest_paths,
    )
    # chain 0-1-2-3-4 (w=3 each) + shortcut edges +2 (w=5): node 2 is
    # cheaper via the shortcut (5) than via two hops (6); node 3 via
    # shortcut+hop (8) vs three hops (9); node 4 via two shortcuts (10)
    edges = spark.createDataFrame(
        [(i, i + 1, 3) for i in range(4)]
        + [(i, i + 2, 5) for i in range(3)], ["src", "dst", "w"])
    seeds = spark.createDataFrame([(0,)], ["node"])
    out = {r.node: r.dist for r in shortest_paths(
        edges, seeds, rounds=4).collect()}
    assert out == {0: 0, 1: 3, 2: 5, 3: 8, 4: 10}
    # bounded rounds: with 1 round only direct edges relax
    one = {r.node: r.dist for r in shortest_paths(
        edges, seeds, rounds=1).collect()}
    assert one == {0: 0, 1: 3, 2: 5}
    import pytest as _pytest
    with _pytest.raises(ValueError):
        shortest_paths(edges, seeds, rounds=0)


# ---------------------------------------------------------------------------
# timeseries.theil_sen_trend / ewma_chart (q246, q248)
# ---------------------------------------------------------------------------

def test_theil_sen_robust_to_outlier_hand_values(spark):
    from league_of_legends_data_pipeline_spark.operators.timeseries import (
        theil_sen_trend,
    )
    # y = 2t with a massive outlier at the last day: Theil-Sen stays at
    # slope 2 / intercept 0 (median of pairwise slopes: 6 of 10 equal 2),
    # OLS is dragged to 20.4 (hand: cov=40.8, var=2)
    daily = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 1, 2.0), ("a", 2, 4.0), ("a", 3, 6.0),
         ("a", 4, 100.0)], ["g", "t", "v"])
    row = theil_sen_trend(daily, "g", "t", "v").collect()[0]
    assert row.n_days == 5 and row.n_pairs == 10
    assert row.theil_slope == 2.0
    assert row.intercept == 0.0
    assert row.ols_slope == 20.4


def test_theil_sen_exact_line_and_group_isolation(spark):
    from league_of_legends_data_pipeline_spark.operators.timeseries import (
        theil_sen_trend,
    )
    # two groups, exact lines with different slopes: each group's estimate
    # must come only from its own rows
    rows = [("up", t, 3.0 * t + 1.0) for t in range(4)]
    rows += [("down", t, -1.0 * t + 7.0) for t in range(4)]
    out = {r.g: r for r in theil_sen_trend(
        spark.createDataFrame(rows, ["g", "t", "v"]), "g", "t", "v")
        .collect()}
    assert out["up"].theil_slope == 3.0 and out["up"].intercept == 1.0
    assert out["down"].theil_slope == -1.0 and out["down"].intercept == 7.0
    # on outlier-free lines OLS and Theil-Sen agree exactly
    assert out["up"].ols_slope == 3.0 and out["down"].ols_slope == -1.0


def test_ewma_chart_hand_unrolled(spark):
    from league_of_legends_data_pipeline_spark.operators.timeseries import (
        ewma_chart,
    )
    # xs = [10, 20, 30], mu = 20, lam = 0.2:
    #   z1 = 0.2*10 + 0.8*20 = 18
    #   z2 = 0.2*20 + 0.8*18 = 18.4
    #   z3 = 0.2*30 + 0.8*18.4 = 20.72
    # sigma_pop = sqrt(200/3); spread_1 = 3*sigma*sqrt(0.2/1.8*(1-0.8^2))
    #            = 3*sigma*0.2 = 4.898979
    daily = spark.createDataFrame(
        [("a", "2024-01-01", 10.0), ("a", "2024-01-02", 20.0),
         ("a", "2024-01-03", 30.0)], ["g", "day", "x"])
    rows = ewma_chart(daily, "g", "day", "x").collect()
    assert [r.ewma for r in rows] == [18.0, 18.4, 20.72]
    assert rows[0].ucl == 24.898979 and rows[0].lcl == 15.101021
    # variance-inflation term: bands widen monotonically with t
    widths = [r.ucl - r.lcl for r in rows]
    assert widths[0] < widths[1] < widths[2]
    assert all(r.breach == 0 for r in rows)


def test_ewma_chart_flags_level_shift(spark):
    from league_of_legends_data_pipeline_spark.operators.timeseries import (
        ewma_chart,
    )
    # a flat series with a sustained late shift: the shifted days breach
    # the upper band while the pre-shift days stay inside
    rows = [("a", f"2024-01-{d:02d}", 100.0) for d in range(1, 21)]
    rows += [("a", f"2024-01-{d:02d}", 130.0) for d in range(21, 31)]
    out = ewma_chart(spark.createDataFrame(rows, ["g", "day", "x"]),
                     "g", "day", "x").collect()
    assert all(r.breach == 0 for r in out[:20])
    assert any(r.breach == 1 for r in out[20:])
    # EWMA smooths: the first shifted day's z moves only lam*(130-z19)
    assert out[20].ewma < 130.0


# ---------------------------------------------------------------------------
# experimentation / survival tier (q249-q251)
# ---------------------------------------------------------------------------

def test_kaplan_meier_invariants(spark):
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = QUERIES["q249_kaplan_meier"].spark(
        spark, "/root/testdata/sf0.001").collect()
    assert rows, "KM curve must be non-empty"
    durs = [r.duration_days for r in rows]
    assert durs == sorted(durs)
    # risk set shrinks as durations pass; survival is non-increasing in
    # [0, 1]; churn events never exceed the at-risk count
    for a, b in zip(rows, rows[1:]):
        assert b.n_risk < a.n_risk
        assert b.s_km <= a.s_km + 1e-12
    for r in rows:
        assert 0.0 <= r.s_km <= 1.0
        assert 0 <= r.d_churned <= r.n_risk
    # hand identity on the first row: S = 1 - d/n
    assert rows[0].s_km == round(
        1.0 - rows[0].d_churned / (1.0 * rows[0].n_risk), 6)


def test_cuped_reduces_variance_and_preserves_means(spark):
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = QUERIES["q250_cuped_adjustment"].spark(
        spark, "/root/testdata/sf0.001").collect()
    assert [r.arm for r in rows] == ["A", "B"]
    a, b = rows
    # theta and the variance reduction are pooled (identical per arm);
    # corr^2 lies in [0, 1)
    assert a.theta == b.theta and a.var_reduction == b.var_reduction
    assert 0.0 <= a.var_reduction < 1.0
    # CUPED preserves the POOLED mean: sum_users(y_adj) == sum_users(y)
    # because sum(x - mean(x)) = 0 over all users
    pooled_raw = a.n_users * a.mean_post + b.n_users * b.mean_post
    pooled_adj = (a.n_users * a.mean_post_cuped
                  + b.n_users * b.mean_post_cuped)
    assert abs(pooled_raw - pooled_adj) < 1e-3


def test_diff_in_diff_contrast_identity(spark):
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    row = QUERIES["q251_diff_in_diff"].spark(
        spark, "/root/testdata/sf0.001").collect()[0]
    # the reported DiD must equal the contrast of the reported cells
    # (all five floats come from the same exact integer-cent sums)
    want = (row.treat_post - row.treat_pre) - (row.ctrl_post - row.ctrl_pre)
    assert abs(row.did - want) < 5e-6
    for v in (row.ctrl_pre, row.ctrl_post, row.treat_pre, row.treat_post):
        assert v > 0.0


def test_mann_kendall_bounds_and_sign_consistency(spark):
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = QUERIES["q252_mann_kendall"].spark(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        max_s = r.n_days * (r.n_days - 1) // 2
        assert -max_s <= r.s_stat <= max_s
        assert -1.0 <= r.kendall_tau <= 1.0
        # z carries S's sign (continuity correction never flips it)
        if r.s_stat > 0:
            assert r.z_mk >= 0.0
        elif r.s_stat < 0:
            assert r.z_mk <= 0.0
        else:
            assert r.z_mk == 0.0


def test_logrank_observed_expected_consistency(spark):
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    row = QUERIES["q253_logrank_test"].spark(
        spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_event_times > 0
    assert row.o1 >= 0 and row.e1 > 0.0
    assert row.chi2_logrank >= 0.0
    # under ANY survival pattern the expected count is bounded by the
    # total number of churn events
    assert row.e1 <= row.o1 + row.n_event_times * 1000  # sanity ceiling


def test_bootstrap_did_ci_brackets_point_estimate(spark):
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    row = QUERIES["q254_bootstrap_did_ci"].spark(
        spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_replicas == 32 and row.n_users > 0
    # order statistics must be ordered and the resampling distribution
    # should bracket its own mean
    assert row.ci_lo <= row.boot_mean <= row.ci_hi
    # the w=1 replica is the per-user-mean DiD point estimate (NOT
    # q251's per-event cell means — different denominator by design)
    assert row.ci_lo <= row.did_point <= row.ci_hi or \
        abs(row.did_point - row.boot_mean) < abs(row.ci_hi - row.ci_lo)


def test_experiment_power_scaling_identity(spark):
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    row = QUERIES["q255_experiment_power"].spark(
        spark, "/root/testdata/sf0.001").collect()[0]
    assert row.n_a > 0 and row.n_b > 0 and row.sd_pooled > 0
    # MDE identity: mde_abs == 2.801585 * sd * sqrt(1/na + 1/nb)
    import math
    want = round((1.959964 + 0.841621) * row.sd_pooled
                 * math.sqrt(1.0 / row.n_a + 1.0 / row.n_b), 5)
    assert abs(row.mde_abs - want) < 1e-4
    assert row.mde_rel > 0.0


def test_holt_linear_hand_unrolled(spark):
    """Hand-unrolled Holt recursion (alpha=.3, beta=.1) on [10, 20, 30]:
    l1=10, b1=0; l2=.3*20+.7*10=13, b2=.1*3=.3; l3=.3*30+.7*13.3,
    b3=.1*(l3-13)+.9*.3 — asserted against the operator directly."""
    from league_of_legends_data_pipeline_spark.operators.timeseries import (
        holt_linear,
    )
    daily = spark.createDataFrame(
        [("a", "2024-01-01", 10.0), ("a", "2024-01-02", 20.0),
         ("a", "2024-01-03", 30.0)], ["g", "day", "x"])
    rows = holt_linear(daily, "g", "day", "x", alpha=0.3,
                       beta=0.1).collect()
    l2 = 0.3 * 20 + 0.7 * 10.0
    b2 = 0.1 * (l2 - 10.0)
    l3 = 0.3 * 30 + 0.7 * (l2 + b2)
    b3 = 0.1 * (l3 - l2) + 0.9 * b2
    assert [(r.level, r.trend) for r in rows] == [
        (10.0, 0.0), (l2, b2), (l3, b3)]


def test_holt_linear_query_invariants(spark):
    """q257 seeds l1=x1/b1=0 per group and reports
    forecast_next == round(level + trend) for every row."""
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = QUERIES["q257_holt_linear"].spark(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for seq in by_type.values():
        assert seq[0].level == float(seq[0].n) and seq[0].trend == 0.0
        for r in seq:
            assert abs(r.forecast_next - round(r.level + r.trend, 6)) < 2e-6


def test_forecast_backtest_metric_invariants(spark):
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = QUERIES["q258_forecast_backtest"].spark(
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_test_days <= 7
        assert r.mae >= 0.0 and r.mape >= 0.0
        # SMAPE is bounded by 2 by construction
        assert 0.0 <= r.smape <= 2.0


def test_temperature_mixture_flattens_toward_uniform(spark):
    """Temperature re-weighting must (a) normalize to 1 at each alpha,
    (b) move every source's weight toward uniform as alpha drops
    (w_a03 between natural share and 1/K, strictly closer to 1/K than
    w_a07 for non-uniform sources), (c) upsample rare sources (>1) and
    downsample dominant ones (<1)."""
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = QUERIES["q259_temperature_mixture"].spark(
        spark, "/root/testdata/sf0.001").collect()
    k = len(rows)
    uniform = 1.0 / k
    assert abs(sum(r.w_a07 for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.w_a03 for r in rows) - 1.0) < 1e-4
    for r in rows:
        lo, hi = sorted((r.natural_share, uniform))
        assert lo - 1e-6 <= r.w_a03 <= hi + 1e-6
        # alpha=0.3 is flatter than alpha=0.7
        assert abs(r.w_a03 - uniform) <= abs(r.w_a07 - uniform) + 1e-6
        if r.natural_share < uniform - 1e-4:
            assert r.upsample_a03 > 1.0
        elif r.natural_share > uniform + 1e-4:
            assert r.upsample_a03 < 1.0


def test_msprt_always_valid_invariants(spark):
    """q260: always-valid p is a running minimum (nonincreasing in
    monitoring day), bounded in (0, 1]; cumulative counts are
    nondecreasing; significance is monotone once triggered (the whole
    point of the sequential correction: a crossed boundary stays
    crossed)."""
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = QUERIES["q260_msprt_always_valid"].spark(
        spark, "/root/testdata/sf0.001").collect()
    assert rows, "mSPRT monitor must emit one row per day"
    days = [r.day for r in rows]
    assert days == sorted(days)
    for r in rows:
        assert 0.0 < r.p_seq <= 1.0
        assert 0 <= r.conv_a <= r.n_a and 0 <= r.conv_b <= r.n_b
        assert r.significant in (0, 1)
    for a, b in zip(rows, rows[1:]):
        assert b.p_seq <= a.p_seq + 1e-12, "always-valid p increased"
        assert b.n_a >= a.n_a and b.n_b >= a.n_b
        assert b.significant >= a.significant, "significance un-triggered"


def test_srm_check_counts_users_not_events(spark, tmp_path):
    """q261: the chi-square must be computed over DISTINCT users — a
    chatty user (many events) must not tilt the ratio."""
    import datetime

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    ts = datetime.datetime(2024, 1, 1, 12, 0, 0)
    # user 1 emits 100 events, users 2-9 one each: 9 distinct users
    rows = [(i, ts, 1, "view", 1.0, "{}") for i in range(100)]
    rows += [(100 + u, ts, u, "view", 1.0, "{}") for u in range(2, 10)]
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    row = QUERIES["q261_srm_check"].spark(spark, str(tmp_path)).collect()[0]
    assert row.n_a + row.n_b == 9, "must count distinct users, not events"
    # two-arm chi2 identity: (na-nb)^2/(na+nb), rounded 6 dp at the edge
    assert row.chi2 == round((row.n_a - row.n_b) ** 2 / 9, 6)
    assert row.srm == (1 if row.chi2 > 3.841458820694124 else 0)


def test_jackknife_ratio_matches_python_oracle(spark, tmp_path):
    """q262: leave-one-day-out pseudo-estimates and SE against a pure
    Python replay on a 3-day hand case."""
    import datetime
    import math

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    # day d: x_d cents of purchases, n_d distinct users
    days = [(1, [(1, "purchase", 10.00), (2, "view", 0.0)]),       # x=1000, n=2
            (2, [(1, "purchase", 5.00), (3, "purchase", 2.50)]),   # x=750,  n=2
            (3, [(4, "view", 0.0), (5, "purchase", 1.00),
                 (6, "view", 0.0)])]                               # x=100,  n=3
    rows, eid = [], 0
    for d, evs in days:
        ts = datetime.datetime(2024, 3, d, 9, 0, 0)
        for uid, et, val in evs:
            rows.append((eid, ts, uid, et, val, "{}")); eid += 1
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    row = QUERIES["q262_jackknife_ratio_metric"].spark(
        spark, str(tmp_path)).collect()[0]
    x, n = [1000, 750, 100], [2, 2, 3]
    sx, sn, d = sum(x), sum(n), 3
    rj = [(sx - xi) / (sn - ni) for xi, ni in zip(x, n)]
    mbar = sum(rj) / d
    se = math.sqrt((d - 1) / d * sum((r - mbar) ** 2 for r in rj))
    assert row.n_days == 3 and row.total_cents == sx and row.user_days == sn
    assert abs(row.ratio - round(sx / sn, 6)) < 1e-9
    assert abs(row.se_jk - round(se, 6)) < 1e-9
    assert row.ci_lo <= row.ratio <= row.ci_hi


def test_jackknife_single_day_emits_no_rows(spark, tmp_path):
    """q262 degenerate: one day means leave-one-out divides by zero —
    the query must emit 0 rows (jackknife undefined), not nulls."""
    import datetime

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    ts = datetime.datetime(2024, 5, 1, 10, 0, 0)
    spark.createDataFrame(
        [(0, ts, 1, "purchase", 3.0, "{}"), (1, ts, 2, "view", 0.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))
    assert QUERIES["q262_jackknife_ratio_metric"].spark(
        spark, str(tmp_path)).count() == 0


def test_winsorized_means_invariants(spark):
    """q263: the winsorized mean must sit inside the clip interval, the
    cuts must be ordered, and clipping a heavy-tailed positive metric
    must not INCREASE the mean beyond rounding."""
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = QUERIES["q263_winsorized_arm_means"].spark(
        spark, "/root/testdata/sf0.001").collect()
    assert {r.arm for r in rows} == {"A", "B"}
    for r in rows:
        assert r.n_trials > 0
        assert r.cut_lo_usd <= r.cut_hi_usd
        assert r.cut_lo_usd - 1e-9 <= r.wmean_usd <= r.cut_hi_usd + 1e-9
        assert r.winsor_shift_usd == round(r.wmean_usd - r.mean_usd, 6) or \
            abs(r.winsor_shift_usd - (r.wmean_usd - r.mean_usd)) < 2e-6


def test_bitext_margin_mining_hand_case(spark):
    """Margin criterion on a hand-built 2x3 case: the hub target (high
    cosine to everything) must lose to the specific match once margins
    normalize by neighborhood density; one row per source, margin > 1."""
    from league_of_legends_data_pipeline_spark.operators.similarity import (
        bitext_margin_mining,
    )

    # src s1 aligns with t1 specifically; t_hub is uniformly close to
    # everything (a hub) — raw cosine would pick the hub for s2, margin
    # must not.
    src = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0])], ["vec_id", "embedding"])
    tgt = spark.createDataFrame(
        [(10, [0.9, 0.1, 0.0]),      # specific match for s1
         (20, [0.1, 0.9, 0.0]),      # specific match for s2
         (30, [0.6, 0.6, 0.2])],     # hub: close to both sources
        ["vec_id", "embedding"])
    out = {r.src_id: r for r in bitext_margin_mining(
        src, tgt, k=2, margin_threshold=0.0).collect()}
    assert set(out) == {1, 2}
    assert out[1].tgt_id == 10 and out[2].tgt_id == 20, \
        "margin must prefer the specific match over the hub"
    for r in out.values():
        assert -1.0 <= r.cosine <= 1.0 and r.margin > 0.0


def test_distribution_drift_hand_values(spark, tmp_path):
    """q265 KS/W1 on a hand case: arm is the md5 split, so build users
    whose arms we compute first, then give arm-A users value 1.00 and
    arm-B users value 2.00 — KS must be 1.0 (disjoint supports) and
    W1 exactly 1.00 USD."""
    import datetime
    import hashlib

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    def arm(uid):
        return "A" if int(hashlib.md5(f"ab:{uid}".encode())
                          .hexdigest()[:15], 16) % 2 == 0 else "B"

    ts = datetime.datetime(2024, 6, 1, 8, 0, 0)
    rows, eid = [], 0
    a_users = [u for u in range(1, 50) if arm(u) == "A"][:5]
    b_users = [u for u in range(1, 50) if arm(u) == "B"][:5]
    for u in a_users:
        rows.append((eid, ts, u, "purchase", 1.00, "{}")); eid += 1
    for u in b_users:
        rows.append((eid, ts, u, "purchase", 2.00, "{}")); eid += 1
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
              "event_type string, value double, props string"
    ).coalesce(1).write.parquet(str(tmp_path / "events.parquet"))

    row = QUERIES["q265_distribution_drift"].spark(
        spark, str(tmp_path)).collect()[0]
    assert row.n_a == 5 and row.n_b == 5
    # disjoint point masses at 1.00 and 2.00: F_A jumps to 1 at 100c
    # while F_B is 0 -> KS = 1; W1 = |1-0| * (200-100)c = 1.00 USD
    assert row.ks == 1.0
    assert row.w1_usd == 1.0


def test_local_clustering_coefficient_known_graph(spark):
    """Two triangles sharing edge 2-3 + a pendant: per-node triangle
    tallies and lcc computed by hand; noise dups/reverses/self-loops
    must normalize away (the triangle_count contract)."""
    from league_of_legends_data_pipeline_spark.operators.graph import (
        local_clustering_coefficient,
    )

    edges = [(1, 2), (2, 3), (1, 3),          # triangle 1-2-3
             (2, 4), (3, 4),                  # triangle 2-3-4
             (4, 5),                          # pendant
             (2, 1), (1, 1), (3, 2)]          # reverse dup, self loop, dup
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r.node: (r.deg, r.triangles, r.lcc)
           for r in local_clustering_coefficient(df).collect()}
    assert got[1] == (2, 1, 1.0)              # 1-2, 1-3 closed by 2-3
    assert got[2] == (3, 2, round(2 * 2 / (3 * 2), 6))
    assert got[3] == (3, 2, round(2 * 2 / (3 * 2), 6))
    assert got[4] == (3, 1, round(2 * 1 / (3 * 2), 6))
    assert got[5] == (1, 0, 0.0)              # deg < 2 -> defined 0


def test_link_prediction_scores_known_graph(spark):
    """Path 1-2-3-4: non-edges sharing a neighbor are (1,3) via 2 and
    (2,4) via 3; RA micro-units are round(1e6/deg(shared))."""
    from league_of_legends_data_pipeline_spark.operators.graph import (
        link_prediction_scores,
    )

    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    got = {(r.node_a, r.node_b): (r.common_neighbors, r.ra_micro)
           for r in link_prediction_scores(df).collect()}
    # deg(2) = deg(3) = 2 -> RA = 1e6 / 2 = 500000 per shared neighbor
    assert got == {(1, 3): (1, 500000), (2, 4): (1, 500000)}


def test_link_prediction_excludes_existing_edges(spark):
    """A triangle has no candidate non-edges: every co-neighbor pair is
    already an edge, so the anti-join must empty the result."""
    from league_of_legends_data_pipeline_spark.operators.graph import (
        link_prediction_scores,
    )

    df = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], ["src", "dst"])
    assert link_prediction_scores(df).count() == 0


def test_mutual_information_known_cases(spark):
    """MI on hand tables: a perfectly dependent uniform binary pair has
    MI = H = 1 bit and NMI = 1; an independent pair has MI = 0."""
    from league_of_legends_data_pipeline_spark.operators.profile import (
        mutual_information,
    )
    from pyspark.sql import functions as F

    dep = spark.createDataFrame(
        [(0, "a")] * 4 + [(1, "b")] * 4, ["x", "y"])
    r = mutual_information(dep, F.col("x"), F.col("y"), "dep").collect()[0]
    assert r.n == 8 and r.n_cells == 2
    assert abs(r.mi_bits - 1.0) < 1e-6
    assert abs(r.h_x - 1.0) < 1e-6 and abs(r.h_y - 1.0) < 1e-6
    assert abs(r.nmi - 1.0) < 1e-6

    ind = spark.createDataFrame(
        [(x, y) for x in (0, 1) for y in ("a", "b") for _ in range(3)],
        ["x", "y"])
    r = mutual_information(ind, F.col("x"), F.col("y"), "ind").collect()[0]
    assert abs(r.mi_bits) < 1e-6 and abs(r.nmi) < 1e-6


def test_conformal_interval_matches_python_replay(spark):
    """q284 at sf0.001: replay the split, train mean, rank-k conformal
    residual and test coverage in pandas — every figure must match."""
    import hashlib
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    out = {r.event_type: r for r in QUERIES["q284_conformal_interval"]
           .spark(spark, "/root/testdata/sf0.001").collect()}

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    ev["b"] = ev["user_id"].map(
        lambda u: int(hashlib.md5(f"cf:{u}".encode()).hexdigest()[:15],
                      16) % 10)
    for et, g in ev.groupby("event_type"):
        tr = g[g.b <= 5]
        yhat = int(round(tr.cents.sum() / len(tr)))
        cal = g[g.b.isin([6, 7])]
        r = (cal.cents - yhat).abs().sort_values().to_numpy()
        k = math.floor((9 * (len(cal) + 1) + 9) / 10.0)
        qhat = int(r[min(k, len(r)) - 1])
        tst = g[g.b >= 8]
        cov = ((tst.cents - yhat).abs() <= qhat).mean()
        row = out[et]
        assert row.n_train == len(tr) and row.n_cal == len(cal) \
            and row.n_test == len(tst)
        assert abs(row.yhat_usd - yhat / 100.0) < 1e-6
        assert abs(row.qhat_usd - qhat / 100.0) < 1e-6
        assert abs(row.coverage - round(cov, 6)) < 1e-6


def test_isotonic_calibration_monotone_and_matches_pav(spark):
    """q287 at sf0.001: iso_rate must be non-decreasing in bin and equal
    the textbook sequential pool-adjacent-violators fit on the same
    binned panel (proving the minimax enumeration IS PAV)."""
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q287_isotonic_calibration"]
            .spark(spark, "/root/testdata/sf0.001").collect())
    iso = [r.iso_rate for r in rows]
    assert iso == sorted(iso), "isotonic fit must be monotone"

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["d"] = ev["ts"].dt.date
    g = ev.groupby(["user_id", "d"])
    panel = pd.DataFrame({
        "n_ev": g.size(),
        "n_click": g.apply(lambda x: int((x.event_type == "click").sum()),
                           include_groups=False),
        "y": g.apply(lambda x: int(((x.event_type == "purchase")
                                    & (x.value >= 15.0)).any()),
                     include_groups=False)})
    panel["p_micro"] = (panel.n_click * 1000000.0
                        / panel.n_ev).round().astype("int64")
    panel["bin"] = (panel.p_micro // 50000).clip(upper=19)
    binned = panel.groupby("bin").agg(n=("y", "size"), pos=("y", "sum"))
    # textbook PAV: merge adjacent violating pools left to right
    pools = [[b, int(r.n), int(r.pos)] for b, r in binned.iterrows()]
    merged = []
    for p in pools:
        merged.append(list(p))
        while len(merged) > 1 and \
                merged[-2][2] / merged[-2][1] >= merged[-1][2] / merged[-1][1]:
            b2, n2, p2 = merged.pop()
            merged[-1][1] += n2
            merged[-1][2] += p2
    fit = {}
    idx = 0
    for _, n, pos in merged:
        rate = pos / n
        consumed = 0
        while consumed < n:
            b = pools[idx][0]
            fit[b] = rate
            consumed += pools[idx][1]
            idx += 1
    for r in rows:
        assert abs(r.iso_rate - round(fit[r.bin], 6)) < 2e-6
        assert r.n_trials == int(binned.loc[r.bin, "n"])


def test_pca_power_iteration_matches_numpy_replay(spark):
    """q288 at sf0.001: replay the micro-unit Gram, nano-unit matvec and
    normalization in numpy — loadings, eigenvalue and explained share
    must match to 6dp; the loading vector must be unit-norm."""
    import numpy as np
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q288_pca_power_iteration"]
            .spark(spark, "/root/testdata/sf0.001").collect())
    v_spark = np.array([r.loading for r in sorted(rows,
                                                  key=lambda r: r.dim)])
    assert abs(np.linalg.norm(v_spark) - 1.0) < 1e-4

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    n, d = X.shape
    s1 = np.round(1e6 * X).sum(axis=0)
    S = np.zeros((d, d))
    for r_ in X:
        S += np.round(1e6 * np.outer(r_, r_))
    m = s1 / (n * 1e6)
    C = S / (n * 1e6) - np.outer(m, m)
    v = np.full(d, 0.125)
    for _ in range(3):
        w = np.round(1e9 * C * v[None, :]).sum(axis=1) / 1e9
        nrm = np.sqrt(np.round(1e9 * w * w).sum() / 1e9)
        v = w / nrm
    w4 = np.round(1e9 * C * v[None, :]).sum(axis=1) / 1e9
    lam = np.round(1e9 * v * w4).sum() / 1e9
    trace = np.round(1e9 * np.diag(C)).sum() / 1e9
    assert np.allclose(v_spark, np.round(v, 6), atol=2e-6)
    assert abs(rows[0].eigenvalue - round(lam, 6)) < 2e-6
    assert abs(rows[0].explained_share - round(lam / trace, 6)) < 2e-6
    assert 0.0 < rows[0].explained_share <= 1.0


def test_ipw_ate_matches_python_replay(spark):
    """q286 at sf0.001: rebuild the user panel, rerun the micro-unit GD
    (logistic_fit_local) and the clipped Horvitz-Thompson sum in
    python — n, weights and both effect estimates must match."""
    import hashlib  # noqa: F401  (parallel with sibling replays)

    import pandas as pd

    from league_of_legends_data_pipeline_spark.operators.classifier import (
        logistic_fit_local, _half_away,
    )
    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    out = (QUERIES["q286_ipw_ate"]
           .spark(spark, "/root/testdata/sf0.001").collect()[0])

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["day"] = ev["ts"].dt.normalize()
    d0, d1 = ev.day.min(), ev.day.max()
    mid = d0 + pd.Timedelta(days=int((d1 - d0).days // 2))
    pre = ev.day < mid
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    g = ev.groupby("user_id")
    panel = pd.DataFrame({
        "x0": g.apply(lambda x: min(1.0, ((x.day < mid)
                      & (x.event_type == "click")).sum() / 10.0),
                      include_groups=False),
        "x1": g.apply(lambda x: min(1.0, ((x.day < mid)
                      & (x.event_type == "view")).sum() / 10.0),
                      include_groups=False),
        "t": g.apply(lambda x: float(((x.day < mid)
                     & (x.event_type == "signup")).any()),
                     include_groups=False),
        "y": g.apply(lambda x: int(x.cents[(x.day >= mid)
                     & (x.event_type == "purchase")].sum()),
                     include_groups=False)})
    rows = [(r.t, [r.x0, r.x1, 1.0]) for r in panel.itertuples()]
    w = logistic_fit_local(rows, iterations=3, lr=1.0)
    assert out.n_users == len(panel)
    assert out.n_treated == int(panel.t.sum())
    for got, exp in zip((out.w0, out.w1, out.w2), w):
        assert abs(got - _half_away(exp, 6)) < 1e-9
    import math
    s = 0
    for r in panel.itertuples():
        z = w[0] * r.x0 + w[1] * r.x1 + w[2]
        p = min(0.95, max(0.05, 1.0 / (1.0 + math.exp(-z))))
        term = (r.t * (r.y / 100.0) / p
                - (1.0 - r.t) * (r.y / 100.0) / (1.0 - p))
        s += int(_half_away(1e6 * term))
    ate = round(s / (len(panel) * 1e6), 6)
    assert abs(out.ipw_ate_usd - ate) < 1e-9


def test_fdr_bh_matches_python_replay(spark):
    """q289 at sf0.001: replay the z-tests, A&S p-values and the BH
    step-up in python — p-values, ranks and the rejection set must
    match exactly."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q289_fdr_bh"]
            .spark(spark, "/root/testdata/sf0.001").collect())

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["dow"] = ev["ts"].dt.weekday + 1  # pandas Monday=0 -> ISO 1..7
    ev["hi"] = (ev["value"] >= 15.0).astype(int)
    cells = ev.groupby(["event_type", "dow"]).agg(
        n=("hi", "size"), hi=("hi", "sum"))
    tots = ev.groupby("event_type").agg(nt=("hi", "size"),
                                        hit=("hi", "sum"))

    def phi_tail(z):
        t = 1.0 / (1.0 + 0.2316419 * abs(z))
        poly = ((((1.330274429 * t - 1.821255978) * t + 1.781477937) * t
                 - 0.356563782) * t + 0.319381530) * t
        return (math.exp(-(z * z) / 2.0) / 2.5066282746310002) * poly

    recs = []
    for (et, dow), c in cells.iterrows():
        t = tots.loc[et]
        pr = t.hit / t.nt
        rest = (t.hit - c.hi) / (t.nt - c.n)
        z = ((c.hi / c.n - rest)
             / math.sqrt(pr * (1 - pr) * (1 / c.n + 1 / (t.nt - c.n))))
        recs.append((et, dow, round(2.0 * phi_tail(z), 6)))
    recs.sort(key=lambda r: (r[2], r[0], r[1]))
    m = len(recs)
    ks = max((k for k, r in enumerate(recs, 1)
              if r[2] <= round(0.10 * k / m, 6)), default=0)
    expect = {(et, dow): (p, k, k <= ks)
              for k, (et, dow, p) in enumerate(recs, 1)}
    assert len(rows) == m == 35
    for r in rows:
        p, k, rej = expect[(r.event_type, r.dow)]
        assert abs(r.p_value - p) < 1e-9, (r.event_type, r.dow)
        assert r.p_rank == k and bool(r.rejected) == rej


def test_huber_irls_matches_python_replay(spark):
    """q290 at sf0.001: replay the OLS fit, frozen scale, and both IRLS
    reweightings in python (same micro-unit sums) — slopes, intercepts
    and the downweight count must match; the Huber slope must also be
    less outlier-sensitive than OLS on a planted-spike panel."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q290_huber_irls"]
            .spark(spark, "/root/testdata/sf0.001").collect())

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    d0 = ev["ts"].dt.normalize().min()
    ev["t"] = (ev["ts"].dt.normalize() - d0).dt.days
    panel = ev.groupby(["event_type", "t"]).size().rename("y").reset_index()

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    for r in rows:
        g = panel[panel.event_type == r.event_type]
        n = len(g)
        sx, sy = g.t.sum(), g.y.sum()
        sxy = (g.t * g.y).sum()
        sxx = (g.t * g.t).sum()
        b1 = (n * float(sxy) - float(sx) * sy) / (n * float(sxx)
                                                  - float(sx) * sx)
        b0 = (sy - b1 * sx) / n
        s = math.sqrt(sum(half_away(1e6 * (y - (b1 * t + b0)) ** 2)
                          for t, y in zip(g.t, g.y)) / (n * 1e6))
        fit = (b1, b0)
        n_down = 0
        for _ in range(2):
            w0 = wx = wy = wxy = wxx = 0
            n_down = 0
            for t, y in zip(g.t, g.y):
                res = y - (fit[0] * t + fit[1])
                w = 1.0 if (abs(res) <= 1.345 * s or s == 0) \
                    else 1.345 * s / abs(res)
                if w < 1.0:
                    n_down += 1
                w0 += half_away(1e6 * w)
                wx += half_away(1e6 * w * t)
                wy += half_away(1e6 * w * y)
                wxy += half_away(1e6 * w * t * y)
                wxx += half_away(1e6 * w * t * t)
            nb1 = (float(w0) * wxy - float(wx) * wy) / (float(w0) * wxx
                                                        - float(wx) * wx)
            fit = (nb1, (wy - nb1 * wx) / w0)
        assert r.n_days == n
        assert abs(r.ols_slope - round(b1, 6)) < 1e-9
        assert abs(r.huber_slope - round(fit[0], 6)) < 1e-9
        assert abs(r.huber_intercept - round(fit[1], 6)) < 1e-9
        assert abs(r.scale_s0 - round(s, 6)) < 1e-9
        assert r.n_downweighted == n_down


def test_kendall_tau_matches_scipy_free_replay(spark):
    """q291 at sf0.001: replay the half-period counts, top-100 cut and
    tau-b pair statistics in python — all integers and the tau must
    match; tau-b must live in [-1, 1]."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q291_rank_stability"]
         .spark(spark, "/root/testdata/sf0.001").collect()[0])
    assert -1.0 <= r.tau_b <= 1.0

    li = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    li["day"] = li["l_shipdate"].dt.normalize()
    d0, d1 = li.day.min(), li.day.max()
    mid = d0 + pd.Timedelta(days=int((d1 - d0).days // 2))
    g = li.groupby("l_partkey")
    counts = pd.DataFrame({
        "n1": g.apply(lambda x: int((x.day < mid).sum()),
                      include_groups=False),
        "n2": g.apply(lambda x: int((x.day >= mid).sum()),
                      include_groups=False)}).reset_index()
    counts["tot"] = counts.n1 + counts.n2
    top = counts.sort_values(["tot", "l_partkey"],
                             ascending=[False, True]).head(100)
    rows = list(top.itertuples())
    c = d = tx = ty = n0 = 0
    for i in range(len(rows)):
        for j in range(len(rows)):
            if rows[i].l_partkey >= rows[j].l_partkey:
                continue
            n0 += 1
            p = (rows[i].n1 - rows[j].n1) * (rows[i].n2 - rows[j].n2)
            c += p > 0
            d += p < 0
            tx += rows[i].n1 == rows[j].n1
            ty += rows[i].n2 == rows[j].n2
    assert (r.n_items, r.concordant, r.discordant,
            r.ties_first, r.ties_second) == (len(rows), c, d, tx, ty)
    tau = round((c - d) / math.sqrt((n0 - tx) * 1.0 * (n0 - ty)), 6)
    assert abs(r.tau_b - tau) < 1e-9


def test_pii_scan_matches_python_replay(spark):
    """q292 at sf0.001: rebuild the rendered CRM line and run the same
    regexes with Python re — per-segment counts, flagged share and
    redacted character sums must match exactly."""
    import math
    import re

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = {r.c_mktsegment: r for r in
            QUERIES["q292_pii_scan_redaction"]
            .spark(spark, "/root/testdata/sf0.001").collect()}

    cust = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    email = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
    phone = re.compile(r"[0-9]{3}-[0-9]{3}-[0-9]{4}")
    idrun = re.compile(r"[0-9]{9}")

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    agg = {}
    for _, c in cust.iterrows():
        k = int(c.c_custkey)
        line = c.c_name
        if k % 3 != 0:
            line += f" <seg{k}@example.com>"
        if k % 2 == 0:
            line += f" call {k % 1000:03d}-555-{k % 10000:04d}"
        line += f" bal {half_away(c.c_acctbal * 100)}"
        a = agg.setdefault(c.c_mktsegment,
                           {"n": 0, "e": 0, "p": 0, "i": 0, "f": 0,
                            "red": 0})
        fe, fp, fi = (1 if email.search(line) else 0,
                      1 if phone.search(line) else 0,
                      1 if idrun.search(line) else 0)
        a["n"] += 1
        a["e"] += fe
        a["p"] += fp
        a["i"] += fi
        a["f"] += 1 if fe + fp + fi > 0 else 0
        a["red"] += len(line) - len(email.sub("E", line))
    assert set(agg) == set(rows)
    for seg, a in agg.items():
        r = rows[seg]
        assert (r.n_rows, r.n_email, r.n_phone, r.n_idrun) == \
            (a["n"], a["e"], a["p"], a["i"])
        assert r.email_chars_redacted == a["red"]
        assert abs(r.pct_flagged - round(a["f"] / a["n"], 6)) < 1e-9


def test_k_anonymity_matches_python_replay(spark):
    """q293 at sf0.001: replay QI classes, k/l and bucket rollup in
    pandas; bucket row sums must cover every customer exactly once."""
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    out = {r.k_bucket: r for r in
           QUERIES["q293_k_anonymity"]
           .spark(spark, "/root/testdata/sf0.001").collect()}

    cust = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    n_ord = orders.groupby("o_custkey").size()
    cust["n_ord"] = cust.c_custkey.map(n_ord).fillna(0).astype(int)
    cust["sens"] = cust.n_ord.map(
        lambda n: "heavy" if n >= 10 else ("light" if n >= 1 else "none"))
    cust["band"] = (cust.c_acctbal / 2000).apply(
        lambda x: int(x) if x >= 0 or x == int(x) else int(x) - 1)
    cls = (cust.groupby(["c_nationkey", "c_mktsegment", "band"])
           .agg(k=("c_custkey", "size"), l=("sens", "nunique")))

    def bucket(k):
        return ("1" if k == 1 else "2" if k == 2 else
                "3-4" if k <= 4 else "5-9" if k <= 9 else "10+")

    cls["b"] = cls.k.map(bucket)
    total = cls.k.sum()
    assert total == len(cust)
    got_rows = 0
    for b, g in cls.groupby("b"):
        r = out[b]
        assert r.n_classes == len(g)
        assert r.n_rows == g.k.sum()
        assert r.n_attr_disclosure_classes == int((g.l == 1).sum())
        assert abs(r.pct_rows - round(g.k.sum() / total, 6)) < 1e-9
        assert abs(r.avg_l - round(g.l.mean(), 6)) < 1e-9
        got_rows += r.n_rows
    assert got_rows == total


def test_mmr_greedy_matches_python_replay(spark):
    """q294 at sf0.001: replay candidate slate, 6dp cosines and the
    greedy MMR selection in numpy — pick order and scores must match."""
    import numpy as np
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q294_mmr_rerank"]
            .spark(spark, "/root/testdata/sf0.001").collect())

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {int(r.vec_id): np.array(list(r.embedding), dtype=np.float64)
            for _, r in emb.iterrows()}
    q = vecs[0]

    def cos(a, b):
        return round(float(np.dot(a, b))
                     / (np.linalg.norm(a) * np.linalg.norm(b)), 6)

    rel = {i: cos(v, q) for i, v in vecs.items() if i != 0}
    slate = sorted(rel, key=lambda i: (-rel[i], i))[:12]
    sims = {(a, b): cos(vecs[a], vecs[b])
            for a in slate for b in slate if a != b}
    chosen, expect = [], []
    for pick in range(1, 6):
        best = None
        for c in (i for i in slate if i not in chosen):
            pen = max((sims[(c, s)] for s in chosen), default=0.0)
            mmr = 0.7 * rel[c] - 0.3 * pen
            if best is None or (mmr, -c) > (best[0], -best[1]):
                best = (mmr, c)
        chosen.append(best[1])
        expect.append((pick, best[1], rel[best[1]], round(best[0], 6)))
    got = [(r.pick, r.doc_id, r.rel, r.mmr) for r in rows]
    assert got == expect
    # diversification property: MMR must not just replay the relevance
    # order unless the slate is already diverse; picks are unique
    assert len(set(chosen)) == 5


def test_mann_whitney_matches_python_replay(spark):
    """q295 at sf0.001: replay arms (md5 hash), doubled average ranks,
    U, tie-corrected z and rank-biserial in pure python."""
    import hashlib
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q295_mann_whitney_u"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    p = ev[ev.event_type == "purchase"].copy()

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def arm(u):
        h = hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15]
        return "A" if int(h, 16) % 2 == 0 else "B"

    vals = sorted((half_away(v * 100), arm(u))
                  for v, u in zip(p.value, p.user_id))
    n = len(vals)
    # doubled average rank per distinct value
    from collections import Counter
    cnt = Counter(v for v, _ in vals)
    min_rank, r2 = {}, {}
    seen = 0
    for v in sorted(cnt):
        min_rank[v] = seen + 1
        r2[v] = 2 * min_rank[v] + cnt[v] - 1
        seen += cnt[v]
    na = sum(1 for _, a in vals if a == "A")
    nb = n - na
    r2a = sum(r2[v] for v, a in vals if a == "A")
    u_a = r2a / 2.0 - na * (na + 1) / 2.0
    tie = sum(t ** 3 - t for t in cnt.values())
    sigma = math.sqrt(na * 1.0 * nb / 12.0
                      * ((n + 1) - tie * 1.0 / (n * (n - 1.0))))
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.u_a - u_a) < 1e-9
    assert abs(r.z - round((u_a - na * nb / 2.0) / sigma, 6)) < 1e-9
    assert abs(r.rank_biserial - round(1.0 - 2.0 * u_a / (na * 1.0 * nb),
                                       6)) < 1e-9


def test_assortativity_matches_python_replay(spark):
    """q296 at sf0.001: rebuild the same-nation delta-1..8 edge set in
    pandas, replay degrees and the four moment sums; the coefficient
    must match and live in [-1, 1]."""
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q296_degree_assortativity"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]

    cust = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    nat = dict(zip(cust.c_custkey, cust.c_nationkey))
    keys = set(cust.c_custkey)
    edges = [(u, u + d) for u in keys for d in range(1, 9)
             if u + d in keys and nat[u] == nat[u + d]]
    deg = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    m = len(edges)
    s_jk = sum(deg[u] * deg[v] for u, v in edges)
    s_sum = sum(deg[u] + deg[v] for u, v in edges)
    s_sq = sum(deg[u] ** 2 + deg[v] ** 2 for u, v in edges)
    den = 2 * m * s_sq - s_sum * s_sum
    expect = 0.0 if den == 0 else round(
        (4.0 * m * s_jk - s_sum * s_sum * 1.0) / den, 6)
    assert (r.n_nodes, r.n_edges) == (len(deg), m)
    assert abs(r.avg_edge_degree - round(s_sum * 1.0 / (2 * m), 6)) < 1e-9
    assert abs(r.assortativity - expect) < 1e-9
    assert -1.0 <= r.assortativity <= 1.0


def test_nn_matching_matches_python_replay(spark):
    """q297 at sf0.001: replay the user panel, the sorted-axis
    prev/next nearest-control match, the caliper and the micro-unit
    ATT in pure python."""
    import hashlib
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q297_nn_matching_att"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    d = ev.ts.dt.normalize()
    mid = d.min() + pd.Timedelta(days=math.floor((d.max() - d.min()).days
                                                 / 2.0))

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def arm(u):
        h = hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15]
        return "A" if int(h, 16) % 2 == 0 else "B"

    panel = {}
    for ts, u, et, v in zip(d, ev.user_id, ev.event_type, ev.value):
        p = panel.setdefault(int(u), {"s": 0, "c": 0})
        if ts < mid:
            p["s"] += 1
        elif et == "purchase":
            p["c"] += half_away(v * 100)
    treated = {u: p for u, p in panel.items() if arm(u) == "A"}
    control = {u: p for u, p in panel.items() if arm(u) == "B"}
    ctrl_scores = {}
    for p in control.values():
        c = ctrl_scores.setdefault(p["s"], [0, 0])
        c[0] += 1
        c[1] += p["c"]
    out_micro = {s: half_away(c[1] * 1e6 / c[0])
                 for s, c in ctrl_scores.items()}
    cs = sorted(ctrl_scores)
    n_m = n_u = gaps = num = 0
    for u, p in treated.items():
        prev = max((s for s in cs if s <= p["s"]), default=None)
        nxt = min((s for s in cs if s > p["s"]), default=None)
        if prev is not None and (nxt is None
                                 or p["s"] - prev <= nxt - p["s"]):
            m_score, gap = prev, p["s"] - prev
        else:
            m_score, gap = nxt, (nxt - p["s"]) if nxt is not None else None
        if gap is not None and gap <= 3:
            n_m += 1
            gaps += gap
            num += p["c"] * 1000000 - out_micro[m_score]
        else:
            n_u += 1
    assert (r.n_treated, r.n_control) == (len(treated), len(control))
    assert (r.n_matched, r.n_unmatched) == (n_m, n_u)
    assert abs(r.avg_score_gap - round(gaps * 1.0 / n_m, 6)) < 1e-9
    assert abs(r.att_cents - round(num / (n_m * 1000000.0), 6)) < 1e-9


def test_silhouette_matches_python_replay(spark):
    """q298 at sf0.001: replay both Lloyd rounds (sequential-fold
    cosines, 9dp means), the top-2 assignment and the micro-unit
    silhouette rollup in pure python; scores must lie in [-1, 1]."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = {r.cluster: r for r in
            QUERIES["q298_silhouette_score"]
            .spark(spark, "/root/testdata/sf0.001").collect()}

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding]
            for _, r in emb.iterrows()}

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def dot_seq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def nrm(a):
        acc = 0.0
        for x in a:
            acc += x * x
        return math.sqrt(acc)

    def top2(v, cents):
        nv = nrm(v)
        scored = sorted(((dot_seq(v, ce) / (nv * cn), -cid)
                         for cid, (ce, cn) in cents.items()), reverse=True)
        (c1, t1), (c2, _) = scored[0], scored[1]
        return -t1, c1, c2

    cents = {i: (v, nrm(v)) for i, v in vecs.items() if i % 64 == 0}
    assign = {i: top2(v, cents)[0] for i, v in vecs.items()}
    # 9dp-rounded element-wise means
    sums, cnts = {}, {}
    for i, v in vecs.items():
        c = assign[i]
        cnts[c] = cnts.get(c, 0) + 1
        s = sums.setdefault(c, [0.0] * len(v))
        for j, x in enumerate(v):
            s[j] += x
    cents = {c: ([half_away(s[j] / cnts[c] * 1e9) / 1e9
                  for j in range(len(s))],) for c, s in sums.items()}
    cents = {c: (ce[0], nrm(ce[0])) for c, ce in cents.items()}
    agg = {}
    for i, v in vecs.items():
        c, c1, c2 = top2(v, cents)
        c1 = half_away(c1 * 1e6) / 1e6
        c2 = half_away(c2 * 1e6) / 1e6
        gap = max(1.0 - c1, 1.0 - c2)
        s_micro = half_away((c1 - c2) / gap * 1e6) if gap > 0 else 0
        m_micro = half_away((c1 - c2) * 1e6)
        a = agg.setdefault(c, [0, 0, 0])
        a[0] += 1
        a[1] += s_micro
        a[2] += m_micro
    assert set(agg) == set(rows)
    for c, (n, sm, mm) in agg.items():
        r = rows[c]
        assert r.n_members == n
        assert abs(r.avg_silhouette - round(sm / (n * 1e6), 6)) < 1e-9
        assert abs(r.avg_margin - round(mm / (n * 1e6), 6)) < 1e-9
        assert -1.0 <= r.avg_silhouette <= 1.0


def test_kruskal_wallis_matches_python_replay(spark):
    """q299 at sf0.001: replay doubled ranks, milli-rounded R^2/n terms,
    tie correction and the H closed form in pure python."""
    import math
    from collections import Counter

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q299_kruskal_wallis"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]

    cust = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    vals = [(half_away(b * 100), s)
            for b, s in zip(cust.c_acctbal, cust.c_mktsegment)]
    cnt = Counter(v for v, _ in vals)
    r2 = {}
    seen = 0
    for v in sorted(cnt):
        r2[v] = 2 * (seen + 1) + cnt[v] - 1
        seen += cnt[v]
    g = {}
    for v, s in vals:
        a = g.setdefault(s, [0, 0])
        a[0] += 1
        a[1] += r2[v]
    n = len(vals)
    rsq_milli = sum(half_away(r2g * 1.0 * r2g / (4.0 * ng) * 1000)
                    for ng, r2g in g.values())
    tie = sum(t ** 3 - t for t in cnt.values())
    h = 12.0 / (n * (n + 1.0)) * (rsq_milli / 1000.0) - 3.0 * (n + 1)
    assert (r.n_total, r.k_groups) == (n, len(g))
    assert abs(r.h - round(h, 6)) < 1e-9
    assert abs(r.h_tie_corrected
               - round(h / (1.0 - tie * 1.0 / (n * 1.0 * n * n - n)),
                       6)) < 1e-9
    assert abs(r.epsilon_sq - round(h / (n - 1.0), 6)) < 1e-9


def test_textrank_matches_python_replay(spark):
    """q300 at sf0.001: replay the co-occurrence graph and 3 nano-unit
    weighted-PageRank rounds in pure python; top-15 must match."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = [(r.word, r.score) for r in
            QUERIES["q300_textrank_keywords"]
            .spark(spark, "/root/testdata/sf0.001").collect()]

    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    edges = {}
    for t in docs.text:
        tk = [w for w in t.split() if w]
        for a, b in zip(tk, tk[1:]):
            if a == b:
                continue
            k = (min(a, b), max(a, b))
            edges[k] = edges.get(k, 0) + 1
    dedges = {}
    for (u, v), w in edges.items():
        dedges[(u, v)] = w
        dedges[(v, u)] = w
    wdeg = {}
    for (u, _), w in dedges.items():
        wdeg[u] = wdeg.get(u, 0) + w
    ws = {u: 1000000000 for u in wdeg}
    for _ in range(3):
        nxt = {}
        for (u, v), w in dedges.items():
            nxt[v] = nxt.get(v, 0) + half_away(0.85 * w * ws[u] / wdeg[u])
        ws = {v: 150000000 + s for v, s in nxt.items()}
    expect = sorted(ws.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    expect = [(w, round(s / 1e9, 6)) for w, s in expect]
    assert rows == expect


def test_qte_matches_numpy_replay(spark):
    """q301 at sf0.001: replay arm split and linear-interpolation
    quantiles with numpy; QTE must be the per-p difference."""
    import hashlib
    import math

    import numpy as np
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = {r.p: r for r in
            QUERIES["q301_quantile_treatment_effects"]
            .spark(spark, "/root/testdata/sf0.001").collect()}

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    p = ev[ev.event_type == "purchase"]

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def arm(u):
        h = hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15]
        return "A" if int(h, 16) % 2 == 0 else "B"

    cents = {"A": [], "B": []}
    for v, u in zip(p.value, p.user_id):
        cents[arm(u)].append(half_away(v * 100))
    for pp in (0.25, 0.5, 0.75, 0.9):
        r = rows[pp]
        qa = float(np.percentile(cents["A"], pp * 100,
                                 method="linear"))
        qb = float(np.percentile(cents["B"], pp * 100,
                                 method="linear"))
        assert abs(r.q_a_usd - round(qa / 100.0, 6)) < 1e-9
        assert abs(r.q_b_usd - round(qb / 100.0, 6)) < 1e-9
        assert abs(r.qte_usd - round((qa - qb) / 100.0, 6)) < 1e-9


def test_geometric_median_matches_python_replay(spark):
    """q302 at sf0.001: replay both Weiszfeld iterations with the
    nano/pico integer contract; the median must strictly improve the
    sum-of-distances objective over the mean."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q302_geometric_median"]
            .spark(spark, "/root/testdata/sf0.001").collect())
    got = {r.dim: (r.mean_coord, r.gmedian_coord) for r in rows}

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = [[float(x) for x in e] for e in emb.embedding]
    n, dim = len(vecs), 64

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    m0 = [half_away(sum(half_away(v[j] * 1e9) for v in vecs) * 1.0 / n)
          / 1e9 for j in range(dim)]
    m = list(m0)
    for _ in range(2):
        num = [0] * dim
        den = 0
        for v in vecs:
            d2 = sum(half_away((v[j] - m[j]) * (v[j] - m[j]) * 1e12)
                     for j in range(dim))
            d = math.sqrt(d2 / 1e12)
            if d <= 0:
                continue
            den += half_away(1e9 / d)
            for j in range(dim):
                num[j] += half_away(v[j] / d * 1e9)
        m = [half_away(num[j] * 1.0 / den * 1e9) / 1e9
             for j in range(dim)]
    assert len(rows) == dim
    for j in range(dim):
        em, eg = got[j + 1]
        assert abs(em - m0[j]) < 1e-12
        assert abs(eg - m[j]) < 1e-12

    def objective(c):
        return sum(math.sqrt(sum((v[j] - c[j]) ** 2 for j in range(dim)))
                   for v in vecs)

    assert objective(m) <= objective(m0) + 1e-9


def test_nelson_aalen_matches_python_replay(spark):
    """q303 at sf0.001: replay spans, risk sets and the micro-unit
    cumulative hazard; H must be nondecreasing and S_FH in (0, 1]."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q303_nelson_aalen"]
            .spark(spark, "/root/testdata/sf0.001").collect())

    orders = pd.read_parquet("/root/testdata/sf0.001/orders.parquet")
    g = orders.groupby("o_custkey").o_orderdate.agg(["min", "max"])
    g["dur"] = (g["max"].dt.normalize()
                - g["min"].dt.normalize()).dt.days
    mx = g["max"].dt.normalize().max()
    g["ev"] = ((mx - g["max"].dt.normalize()).dt.days >= 90).astype(int)

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    risk = (g.groupby("dur").agg(d=("ev", "sum"), c=("ev", "size"))
            .sort_index())
    n_total = int(risk.c.sum())
    cum_c = 0
    h_cum = v_cum = 0
    expect = []
    for dur, r in risk.iterrows():
        n = n_total - cum_c
        cum_c += int(r.c)
        h_cum += half_away(int(r.d) * 1e6 / n)
        v_cum += half_away(int(r.d) * 1e6 / (n * n))
        expect.append((int(dur), n, int(r.d),
                       round(h_cum / 1e6, 6),
                       round(math.sqrt(v_cum / 1e6), 6),
                       round(math.exp(-(h_cum / 1e6)), 6)))
    got = [(r.duration_days, r.n_risk, r.d_churned, r.h_na, r.se_h,
            r.s_fh) for r in rows]
    assert got == expect
    hs = [r.h_na for r in rows]
    assert hs == sorted(hs)
    assert all(0 < r.s_fh <= 1 for r in rows)


def test_welch_ttest_matches_python_replay(spark):
    """q304 at sf0.001: replay exact moments and the Welch formulas;
    df must lie between min(na,nb)-1 and na+nb-2."""
    import hashlib
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q304_welch_ttest"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    p = ev[ev.event_type == "purchase"]

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def arm(u):
        h = hashlib.md5(f"ab:{u}".encode()).hexdigest()[:15]
        return "A" if int(h, 16) % 2 == 0 else "B"

    s = {"A": [0, 0, 0], "B": [0, 0, 0]}
    for v, u in zip(p.value, p.user_id):
        c = half_away(v * 100)
        a = s[arm(u)]
        a[0] += 1
        a[1] += c
        a[2] += c * c
    (na, sa, qa), (nb, sb, qb) = s["A"], s["B"]
    va = (qa - sa * 1.0 / na * sa) / (na - 1.0) / na
    vb = (qb - sb * 1.0 / nb * sb) / (nb - 1.0) / nb
    diff = sa * 1.0 / na - sb * 1.0 / nb
    t = diff / math.sqrt(va + vb)
    df = (va + vb) ** 2 / (va * va / (na - 1.0) + vb * vb / (nb - 1.0))
    d = diff / math.sqrt(((qa - sa * 1.0 / na * sa)
                          + (qb - sb * 1.0 / nb * sb))
                         / (na + nb - 2.0)) / 100.0 * 100.0
    assert (r.n_a, r.n_b) == (na, nb)
    assert abs(r.t_welch - round(t, 6)) < 1e-9
    assert abs(r.df_welch - round(df, 6)) < 1e-9
    assert abs(r.cohens_d - round(d, 6)) < 1e-9
    assert min(na, nb) - 1 <= r.df_welch <= na + nb - 2


def test_average_precision_matches_python_replay(spark):
    """q305 at sf0.001: replay the bin table, cumulative counts, AP
    step integral and the best-F1 scan in pure python; AP must lie in
    (0, 1] and equal the replayed nano-sum."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q305_average_precision"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["thr"] = ev.value.map(math.floor)
    bins = (ev.assign(pos=(ev.event_type == "purchase").astype(int))
            .groupby("thr").agg(pos=("pos", "sum"),
                                neg=("pos", lambda s: (1 - s).sum()))
            .sort_index(ascending=False))

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    p_tot, n_tot = int(bins.pos.sum()), int(bins.neg.sum())
    tp = fp = 0
    ap_nano = 0
    best = None
    for thr, b in bins.iterrows():
        tp += int(b.pos)
        fp += int(b.neg)
        prec = tp * 1.0 / (tp + fp)
        rec = tp * 1.0 / p_tot
        ap_nano += half_away(int(b.pos) * 1.0 / p_tot * prec * 1e9)
        f1 = 2.0 * prec * rec / (prec + rec) if prec + rec > 0 else 0.0
        key = (round(f1, 9), thr)
        if best is None or key > best[0]:
            best = (key, thr, f1)
    assert (r.n_pos, r.n_neg) == (p_tot, n_tot)
    assert abs(r.average_precision - round(ap_nano / 1e9, 6)) < 1e-9
    assert 0 < r.average_precision <= 1
    assert r.best_f1_thr == best[1]
    assert abs(r.best_f1 - round(best[2], 6)) < 1e-9


def test_rocchio_prf_matches_python_replay(spark):
    """q306 at sf0.001: replay both retrieval passes and the nano-sum
    feedback vector in python; the new top-10 and its overlap flags
    must match, and the feedback must not produce duplicate ranks."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q306_rocchio_prf"]
            .spark(spark, "/root/testdata/sf0.001").collect())

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {int(r.vec_id): [float(x) for x in r.embedding]
            for _, r in emb.iterrows()}
    q = vecs[0]

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def dot_seq(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def nrm(a):
        acc = 0.0
        for x in a:
            acc += x * x
        return math.sqrt(acc)

    cos = {i: half_away(dot_seq(v, q) / (nrm(v) * nrm(q)) * 1e6) / 1e6
           for i, v in vecs.items() if i != 0}
    top = sorted(cos, key=lambda i: (-cos[i], i))[:10]
    bot = sorted(cos, key=lambda i: (cos[i], i))[:10]
    dim = 64
    sr = [sum(half_away(vecs[i][j] * 1e9) for i in top)
          for j in range(dim)]
    sn = [sum(half_away(vecs[i][j] * 1e9) for i in bot)
          for j in range(dim)]
    qp = [1.0 * q[j] + 0.75 * (sr[j] / 10.0 / 1e9)
          - 0.15 * (sn[j] / 10.0 / 1e9) for j in range(dim)]
    cos2 = {i: half_away(dot_seq(v, qp) / (nrm(v) * nrm(qp)) * 1e6) / 1e6
            for i, v in vecs.items() if i != 0}
    new_top = sorted(cos2, key=lambda i: (-cos2[i], i))[:10]
    expect = [(k + 1, d, cos2[d], 1 if d in set(top) else 0)
              for k, d in enumerate(new_top)]
    got = [(r.rank, r.doc_id, r.cosine_new, r.in_original_top10)
           for r in rows]
    assert got == expect
    assert len({r.rank for r in rows}) == 10


def test_kmeans_top2_rejects_single_centroid(spark):
    """kmeans_refine(top2=True) with one seed centroid must raise (the
    runner-up is undefined), not emit null cosine2."""
    import pytest

    from league_of_legends_data_pipeline_spark.operators.similarity import (
        kmeans_refine,
    )
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(i)) for i in range(4)]).alias("embedding"))
    with pytest.raises(ValueError, match="at least 2 seed centroids"):
        kmeans_refine(df, "vec_id", "embedding", dim=4,
                      centroid_stride=100, iterations=1,
                      top2=True).collect()


def test_fellegi_sunter_matches_python_replay(spark):
    """q307 at sf0.001: replay the blocking, agreement vectors and
    literal-weight sums in python; class counts and weight stats must
    match, and every weight must be one of the 8 possible sums."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import (
        QUERIES, _FS_W,
    )

    rows = {r.decision: r for r in
            QUERIES["q307_fellegi_sunter"]
            .spark(spark, "/root/testdata/sf0.001").collect()}

    cust = pd.read_parquet("/root/testdata/sf0.001/customer.parquet")
    info = {int(r.c_custkey): (r.c_mktsegment, float(r.c_acctbal))
            for _, r in cust.iterrows()}
    nat = dict(zip(cust.c_custkey, cust.c_nationkey))

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    agg = {}
    possible_sums = set()
    for b1 in (0, 1):
        for b2 in (0, 1):
            for b3 in (0, 1):
                possible_sums.add(round(
                    _FS_W[0][b1 == 0] + _FS_W[1][b2 == 0]
                    + _FS_W[2][b3 == 0], 9))
    for u in info:
        for d in range(1, 9):
            v = u + d
            if v not in info or nat[u] != nat[v]:
                continue
            (sa, ba), (sb, bb) = info[u], info[v]
            a1 = 1 if sa == sb else 0
            a2 = 1 if math.floor(ba / 1000) == math.floor(bb / 1000) else 0
            a3 = 1 if abs(half_away(ba * 100) - half_away(bb * 100)) \
                < 50000 else 0
            w = (_FS_W[0][a1 == 0] + _FS_W[1][a2 == 0]
                 + _FS_W[2][a3 == 0])
            assert round(w, 9) in possible_sums
            dec = ("match" if w >= 2.0
                   else "possible" if w >= -1.0 else "non-match")
            a = agg.setdefault(dec, [0, 0, None, None])
            wm = half_away(w * 1e6)
            a[0] += 1
            a[1] += wm
            a[2] = wm if a[2] is None else min(a[2], wm)
            a[3] = wm if a[3] is None else max(a[3], wm)
    assert set(agg) == set(rows)
    for dec, (n, sw, lo, hi) in agg.items():
        r = rows[dec]
        assert r.n_pairs == n
        assert abs(r.avg_weight - round(sw / (n * 1e6), 6)) < 1e-9
        assert abs(r.min_w - round(lo / 1e6, 6)) < 1e-9
        assert abs(r.max_w - round(hi / 1e6, 6)) < 1e-9


def test_quantization_ndcg_matches_python_replay(spark):
    """q308 at sf0.001: replay exact + quantized rankings, grades and
    the nano-unit DCG/IDCG; NDCG must lie in (0, 1]."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import (
        QUERIES, _DCG_DISCOUNT,
    )

    r = (QUERIES["q308_quantization_ndcg"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]

    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {int(x.vec_id): [float(v) for v in x.embedding]
            for _, x in emb.iterrows()}

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    def qz(v):
        return [half_away(x * 127) / 127.0 for x in v]

    def cos(a, b):
        num = 0.0
        for x, y in zip(a, b):
            num += x * y
        na = nb = 0.0
        for x in a:
            na += x * x
        for y in b:
            nb += y * y
        return half_away(num / (math.sqrt(na) * math.sqrt(nb)) * 1e6) / 1e6

    q, qq = vecs[0], qz(vecs[0])
    ce = {i: cos(v, q) for i, v in vecs.items() if i != 0}
    cq = {i: cos(qz(v), qq) for i, v in vecs.items() if i != 0}
    exact_rank = {i: k + 1 for k, i in
                  enumerate(sorted(ce, key=lambda i: (-ce[i], i)))}
    grade = {i: (3 if r0 <= 3 else 2 if r0 <= 10 else 1 if r0 <= 30
                 else 0) for i, r0 in exact_rank.items()}
    approx = sorted(cq, key=lambda i: (-cq[i], i))[:10]
    dcg = sum(half_away((2 ** grade[i] - 1) * _DCG_DISCOUNT[p] * 1e9)
              for p, i in enumerate(approx))
    ideal = sorted(grade.values(), reverse=True)[:10]
    idcg = sum(half_away((2 ** g - 1) * _DCG_DISCOUNT[p] * 1e9)
               for p, g in enumerate(ideal))
    assert r.n_relevant_in_top10 == sum(1 for i in approx if grade[i] > 0)
    assert abs(r.dcg_at_10 - round(dcg / 1e9, 6)) < 1e-9
    assert abs(r.idcg_at_10 - round(idcg / 1e9, 6)) < 1e-9
    assert abs(r.ndcg_at_10 - round(dcg * 1.0 / idcg, 6)) < 1e-9
    assert 0 < r.ndcg_at_10 <= 1


def test_brier_decomposition_matches_python_replay(spark):
    """q309 at sf0.001: replay trials, bins and the Murphy terms; the
    identity Brier = REL - RES + UNC must hold up to the reported
    within-bin residual (and the residual must be small)."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q309_brier_decomposition"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["d"] = ev.ts.dt.normalize()

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    g = (ev.assign(click=(ev.event_type == "click").astype(int),
                   hv=((ev.event_type == "purchase")
                       & (ev.value >= 15.0)).astype(int))
         .groupby(["user_id", "d"])
         .agg(n_ev=("click", "size"), n_click=("click", "sum"),
              y=("hv", "max")))
    g["p"] = [half_away(c * 1e6 / n) for c, n in zip(g.n_click, g.n_ev)]
    n = len(g)
    npos = int(g.y.sum())
    brier_sq = sum((p - 1000000 * y) ** 2 for p, y in zip(g.p, g.y))
    g["bin"] = g.p.map(lambda p: min(int(p // 100000), 9))
    rel_micro = res_micro = 0
    base = npos * 1.0 / n
    for _, b in g.groupby("bin"):
        nk, sp, pos = len(b), int(b.p.sum()), int(b.y.sum())
        rg = sp * 1.0 / nk / 1e6 - pos * 1.0 / nk
        sg = pos * 1.0 / nk - base
        rel_micro += half_away(nk * rg * rg * 1e6)
        res_micro += half_away(nk * sg * sg * 1e6)
    assert r.n_trials == n
    assert abs(r.brier - round(brier_sq / (n * 1e12), 6)) < 1e-9
    assert abs(r.reliability - round(rel_micro / (n * 1e6), 6)) < 1e-9
    assert abs(r.resolution - round(res_micro / (n * 1e6), 6)) < 1e-9
    assert abs(r.uncertainty - round(base * (1 - base), 6)) < 1e-9
    assert abs(r.within_bin_residual) < 0.05


def test_kmeans_top2_rejects_collapse_during_refinement(spark):
    """r10 advice: the >=2-centroid contract must hold after EVERY means
    recompute, not just on the seeds — a cluster that empties during
    refinement (here: identical vectors tie-break every assignment to
    the smaller seed id) leaves one centroid, and top2's runner-up would
    silently become null cosine2."""
    import pytest

    from league_of_legends_data_pipeline_spark.operators.similarity import (
        kmeans_refine,
    )
    from pyspark.sql import functions as F

    # 128 identical vectors, stride 64 -> two identical seeds (0, 64);
    # round 1 assigns everything to cluster 0, emptying cluster 64
    df = spark.range(128).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0), F.lit(0.0), F.lit(0.0))
        .alias("embedding"))
    with pytest.raises(ValueError, match="collapsed"):
        kmeans_refine(df, "vec_id", "embedding", dim=4,
                      centroid_stride=64, iterations=2,
                      top2=True).collect()


def test_q294_single_candidate_slate_still_picks(spark, tmp_path):
    """r10 advice: a 1-doc candidate slate has an EMPTY pairwise-sims
    self-join; per_cand must come from the slate left-joined to sims so
    the lone candidate still yields pick 1 (the oracle's s1 CTE does),
    instead of the Spark side emitting 0 rows."""
    import numpy as np
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rng = np.random.default_rng(7)
    pdf = pd.DataFrame({
        "vec_id": np.array([0, 1], dtype="int64"),
        "embedding": [rng.standard_normal(64).astype("float32")
                      for _ in range(2)],
        "label": np.array([0, 0], dtype="int32"),
    })
    sf_dir = tmp_path / "sf_tiny"
    sf_dir.mkdir()
    pdf.to_parquet(sf_dir / "embeddings.parquet", index=False)
    rows = (QUERIES["q294_mmr_rerank"].spark(spark, str(sf_dir))
            .collect())
    assert len(rows) == 1
    r = rows[0]
    assert (r.pick, r.doc_id) == (1, 1)
    # step 1 has no picked set: mmr = 0.7*rel - 0.3*0
    assert abs(r.mmr - round(0.7 * r.rel, 6)) < 1e-9


# ---------------------------------------------------------------------------
# round-11 query replays (q311-q323)
# ---------------------------------------------------------------------------

def _r11_arm(uid) -> int:
    """1 when the q239-convention md5 arm hash lands on arm A."""
    import hashlib
    h = hashlib.md5(f"ab:{int(uid)}".encode()).hexdigest()
    return 1 if int(h[:15], 16) % 2 == 0 else 0


def test_kendall_tau_matches_python_replay(spark):
    """q311 at sf0.001: replay exact/quantized 6dp cosines, the exact
    top-30 slate and the pairwise tau-b counts in numpy."""
    import numpy as np
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q311_kendall_tau_rank_agreement"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {int(v.vec_id): np.array(list(v.embedding), dtype=np.float64)
            for _, v in emb.iterrows()}
    q = vecs[0]
    qq = np.round(q * 127) / 127.0

    def cos(a, b):
        return round(float(np.dot(a, b))
                     / (np.linalg.norm(a) * np.linalg.norm(b)), 6)

    sc = {i: (cos(v, q), cos(np.round(v * 127) / 127.0, qq))
          for i, v in vecs.items() if i != 0}
    slate = sorted(sc, key=lambda i: (-sc[i][0], i))[:30]
    conc = disc = tx = ty = n0 = 0
    for ai in range(len(slate)):
        for bi in range(len(slate)):
            a, b = slate[ai], slate[bi]
            if a >= b:
                continue
            n0 += 1
            dx = sc[a][0] - sc[b][0]
            dy = sc[a][1] - sc[b][1]
            conc += dx * dy > 0
            disc += dx * dy < 0
            tx += dx == 0
            ty += dy == 0
    assert (r.n_pairs, r.concordant, r.discordant,
            r.ties_exact, r.ties_quant) == (n0, conc, disc, tx, ty)
    if (n0 - tx) * (n0 - ty) > 0:
        import math
        assert abs(r.tau_b - round(
            (conc - disc) / math.sqrt((n0 - tx) * 1.0 * (n0 - ty)),
            6)) < 1e-9
    # agreement sanity: quantization at int8 must not invert most pairs
    assert r.concordant > r.discordant


def test_mcnemar_matches_python_replay(spark):
    """q312 at sf0.001: replay midpoint split, per-user paired click
    flags and both chi-square forms in pandas."""
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q312_mcnemar_paired"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["day"] = ev.ts.dt.normalize()
    d0, d1 = ev.day.min(), ev.day.max()
    mid = d0 + pd.Timedelta(days=int((d1 - d0).days // 2))
    g = ev.groupby("user_id").apply(
        lambda u: pd.Series({
            "h1": int(((u.day <= mid)
                       & (u.event_type == "click")).any()),
            "h2": int(((u.day > mid)
                       & (u.event_type == "click")).any())}),
        include_groups=False)
    b = int(((g.h1 == 1) & (g.h2 == 0)).sum())
    c = int(((g.h1 == 0) & (g.h2 == 1)).sum())
    assert r.n_users == len(g)
    assert (r.n_first_only, r.n_second_only) == (b, c)
    assert r.n_both == int(((g.h1 == 1) & (g.h2 == 1)).sum())
    if b + c:
        assert abs(r.chi2 - round((b - c) ** 2 / (b + c), 6)) < 1e-9
        assert abs(r.chi2_cc
                   - round((abs(b - c) - 1) ** 2 / (b + c), 6)) < 1e-9


def test_cochran_armitage_matches_python_replay(spark):
    """q313 at sf0.001: replay tiers, conversion counts and the trend z
    closed form in pandas."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q313_cochran_armitage"]
            .spark(spark, "/root/testdata/sf0.001").collect())
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    g = ev.groupby("user_id").agg(
        n_ev=("event_id", "size"),
        conv=("value", lambda v: 0)).reset_index()
    conv = ev[(ev.event_type == "purchase") & (ev.value >= 15.0)] \
        .user_id.unique()
    g["conv"] = g.user_id.isin(conv).astype(int)
    g["dose"] = g.n_ev.map(
        lambda n: 1 if n < 10 else 2 if n < 20 else 3 if n < 50 else 4)
    t = g.groupby("dose").agg(n=("user_id", "size"),
                              r=("conv", "sum"))
    got = {r.dose: (r.n_users, r.n_converted) for r in rows}
    assert got == {int(d): (int(x.n), int(x.r)) for d, x in t.iterrows()}
    N, R = int(t.n.sum()), int(t.r.sum())
    swr = int((t.index * t.r).sum())
    swn = int((t.index * t.n).sum())
    sw2n = int((t.index * t.index * t.n).sum())
    varw = sw2n - swn * swn / N
    if 0 < R < N and varw > 0:
        z = (swr - R * swn / N) / math.sqrt(
            (R / N) * (1 - R / N) * varw)
        assert abs(rows[0].z_trend - round(z, 6)) < 1e-9
    assert len({r.z_trend for r in rows}) == 1


def test_durbin_watson_matches_python_replay(spark):
    """q314 at sf0.001: replay the integer day panel, OLS fit and both
    residual sums (micro-rounded, order-free) in pandas."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q314_durbin_watson"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["day"] = ev.ts.dt.normalize()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    daily = ev.groupby("day").cents.sum().sort_index()
    t = (daily.index - daily.index.min()).days.to_numpy("int64")
    v = daily.values
    n = len(v)
    st, sv = int(t.sum()), int(v.sum())
    stt, stv = int((t * t).sum()), int((t * v).sum())
    b = (n * stv - st * 1.0 * sv) / (n * stt - st * 1.0 * st)
    a = (sv - b * st) / (1.0 * n)
    e = [float(v[i]) - a - b * float(t[i]) for i in range(n)]

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    see = sum(int(half_away(x * x * 1e6)) for x in e)
    sdd = sum(int(half_away((e[i] - e[i - 1]) ** 2 * 1e6))
              for i in range(1, n))
    assert r.n_days == n
    assert abs(r.slope - round(b, 6)) < 1e-9
    assert abs(r.dw - round(sdd / see, 6)) < 1e-9
    # DW lives in [0, 4] by construction
    assert 0.0 <= r.dw <= 4.0


def test_ljung_box_matches_python_replay(spark):
    """q315 at sf0.001: replay the day-count panel, lag-k exact-moment
    autocorrelations and the cumulative Q in pandas."""
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q315_ljung_box"]
            .spark(spark, "/root/testdata/sf0.001").collect())
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    daily = ev.groupby(ev.ts.dt.normalize()).size().sort_index()
    by_day = {d: int(c) for d, c in daily.items()}
    n, s = len(daily), int(daily.sum())
    svv = int((daily * daily).sum())
    mean = s / n
    q_cum = 0.0
    for row in rows:
        k = row.lag
        pairs = [(c, by_day[d + pd.Timedelta(days=k)])
                 for d, c in by_day.items()
                 if d + pd.Timedelta(days=k) in by_day]
        m_k = len(pairs)
        sxy = sum(a * b for a, b in pairs)
        sx = sum(a for a, _ in pairs)
        sy = sum(b for _, b in pairs)
        r6 = round((sxy - mean * (sx + sy) + m_k * mean * mean)
                   / (svv - s * mean), 6)
        assert row.n_pairs == m_k and abs(row.acf - r6) < 1e-9
        q_cum += r6 * r6 / (n - k)
        assert abs(row.q_cum - round(n * (n + 2.0) * q_cum, 6)) < 1e-9
    assert [row.lag for row in rows] == list(range(1, 8))


def test_chow_break_matches_python_replay(spark):
    """q316 at sf0.001: replay the two-segment OLS SSRs and the Chow F
    in pandas (closed-form moments)."""
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q316_chow_break"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    ev["day"] = ev.ts.dt.normalize()
    ev["cents"] = (ev.value * 100).round().astype("int64")
    daily = ev.groupby("day").cents.sum().sort_index()
    t = (daily.index - daily.index.min()).days.to_numpy("int64")
    v = daily.values
    mt = int(t.max() // 2)

    def ssr(tt, vv):
        n = len(tt)
        st, sv = int(tt.sum()), int(vv.sum())
        stt = int((tt * tt).sum())
        stv = int((tt * vv).sum())
        svv = int((vv * vv).sum())
        sxx = stt - st * (st * 1.0 / n)
        sxy = stv - st * (sv * 1.0 / n)
        return (svv - sv * (sv * 1.0 / n)) - sxy * sxy / sxx

    ssr_p = ssr(t, v)
    s1 = ssr(t[t <= mt], v[t <= mt])
    s2 = ssr(t[t > mt], v[t > mt])
    n = len(v)
    assert r.n_days == n and r.break_t == mt
    assert abs(r.ssr_pooled - round(ssr_p, 6)) < 1e-6
    assert abs(r.ssr_split - round(s1 + s2, 6)) < 1e-6
    if s1 + s2 > 0 and n > 4:
        f = ((ssr_p - s1 - s2) / 2.0) / ((s1 + s2) / (n - 4.0))
        assert abs(r.f_stat - round(f, 6)) < 1e-9
    # split fit can never be worse than pooled
    assert r.ssr_split <= r.ssr_pooled + 1e-6


def test_js_divergence_matches_python_replay(spark):
    """q317 at sf0.001: replay the parity-split unigram counts and the
    nano-rounded JS terms; JS must land in [0, 1] bits."""
    import math
    import re

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q317_js_divergence"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    from collections import Counter
    ca, cb = Counter(), Counter()
    for _, d in docs.iterrows():
        toks = [t for t in re.split(r"\s+", d.text) if t]
        (ca if d.doc_id % 2 == 0 else cb).update(toks)
    ta, tb = sum(ca.values()), sum(cb.values())
    assert (r.n_tokens_a, r.n_tokens_b) == (ta, tb)
    assert r.vocab_a == len(ca) and r.vocab_b == len(cb)
    assert r.vocab_shared == len(set(ca) & set(cb))

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    sp = sq = 0
    for tok in set(ca) | set(cb):
        a, b = ca.get(tok, 0), cb.get(tok, 0)
        mix = a * tb + b * ta
        if a:
            sp += int(half_away((a / ta) * (math.log2(2.0 * a * tb)
                                            - math.log2(mix)) * 1e9))
        if b:
            sq += int(half_away((b / tb) * (math.log2(2.0 * b * ta)
                                            - math.log2(mix)) * 1e9))
    assert abs(r.js_bits - round(0.5 * sp / 1e9 + 0.5 * sq / 1e9, 6)) \
        < 1e-9
    assert 0.0 <= r.js_bits <= 1.0


def test_fd_audit_matches_python_replay(spark):
    """q318 at sf0.001: replay all four FD checks in pandas; the two
    key dependencies must hold, the two fake contracts must not."""
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = {r.fd: r for r in (QUERIES["q318_fd_audit"]
            .spark(spark, "/root/testdata/sf0.001").collect())}
    base = "/root/testdata/sf0.001"
    spec = {
        "customer: mktsegment -> nationkey":
            ("customer", "c_mktsegment", "c_nationkey"),
        "part: brand -> type": ("part", "p_brand", "p_type"),
        "orders: orderkey -> custkey":
            ("orders", "o_orderkey", "o_custkey"),
        "nation: nationkey -> regionkey":
            ("nation", "n_nationkey", "n_regionkey"),
    }
    for fd, (tbl, lhs, rhs) in spec.items():
        df = pd.read_parquet(f"{base}/{tbl}.parquet")
        d = df.groupby(lhs)[rhs].nunique()
        r = rows[fd]
        assert (r.n_keys, r.n_violating_keys, r.max_distinct_rhs) == \
            (len(d), int((d > 1).sum()), int(d.max()))
        assert r.holds == int((d <= 1).all())
    assert rows["orders: orderkey -> custkey"].holds == 1
    assert rows["nation: nationkey -> regionkey"].holds == 1


def test_mcc_report_matches_python_replay(spark):
    """q319 at sf0.001: replay the sign-threshold confusion cells and
    all three metrics in numpy."""
    import math

    import numpy as np
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q319_mcc_report"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]
    emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {int(v.vec_id): (np.array(list(v.embedding),
                                     dtype=np.float64), int(v.label))
            for _, v in emb.iterrows()}
    q, l0 = vecs[0]
    tp = fp = fn = tn = 0
    for i, (v, lab) in vecs.items():
        if i == 0:
            continue
        pred = round(float(np.dot(v, q))
                     / (np.linalg.norm(v) * np.linalg.norm(q)), 6) >= 0.0
        truth = lab == l0
        tp += pred and truth
        fp += pred and not truth
        fn += (not pred) and truth
        tn += (not pred) and (not truth)
    assert (r.tp, r.fp, r.fn, r.tn) == (tp, fp, fn, tn)
    denom = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    if denom > 0:
        mcc = (tp * tn - fp * fn) / math.sqrt(denom)
        assert abs(r.mcc - round(mcc, 6)) < 1e-9
    assert -1.0 <= r.mcc <= 1.0 and 0.0 <= r.f1 <= 1.0


def test_fleiss_kappa_matches_python_replay(spark):
    """q320 at sf0.001: replay the three heuristic raters and the
    closed-form kappa in pandas."""
    import re

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q320_fleiss_kappa"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]
    docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    n_items = len(docs)
    s1 = agree = 0
    raters = [0, 0, 0]
    for _, d in docs.iterrows():
        v = [int(d.n_chars >= 200), int("." in d.text),
             int(len([t for t in re.split(r"\s+", d.text) if t]) >= 30)]
        for j in range(3):
            raters[j] += v[j]
        n1 = sum(v)
        s1 += n1
        agree += n1 * n1 + (3 - n1) * (3 - n1)
    assert (r.n_items, r.rater_len, r.rater_punct, r.rater_tokens) == \
        (n_items, raters[0], raters[1], raters[2])
    p_bar = (agree - 3.0 * n_items) / (n_items * 6.0)
    p1 = s1 / (3.0 * n_items)
    p_e = p1 * p1 + (1 - p1) * (1 - p1)
    assert abs(r.p_bar - round(p_bar, 6)) < 1e-9
    if 1 - p_e > 0:
        assert abs(r.fleiss_kappa
                   - round((p_bar - p_e) / (1 - p_e), 6)) < 1e-9


def test_mantel_haenszel_matches_python_replay(spark):
    """q321 at sf0.001: replay the stratified 2x2 tables and the
    micro-rounded MH terms in pandas."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    r = (QUERIES["q321_mantel_haenszel"]
         .spark(spark, "/root/testdata/sf0.001").collect())[0]
    base = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{base}/events.parquet")
    cust = pd.read_parquet(f"{base}/customer.parquet")
    seg = dict(zip(cust.c_custkey, cust.c_mktsegment))
    ev = ev[ev.user_id.isin(seg)]
    conv_users = set(ev[(ev.event_type == "purchase")
                        & (ev.value >= 15.0)].user_id)
    users = ev.user_id.unique()

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    strata = {}
    for u in users:
        s = seg[u]
        e = _r11_arm(u)
        c = int(u in conv_users)
        a, b, cc, d = strata.get(s, (0, 0, 0, 0))
        if e and c:
            a += 1
        elif e:
            b += 1
        elif c:
            cc += 1
        else:
            d += 1
        strata[s] = (a, b, cc, d)
    assert r.n_strata == len(strata)
    ad = bc = em = vm = sa = 0
    for a, b, c, d in strata.values():
        n = a + b + c + d
        sa += a
        ad += int(half_away(a * d / n * 1e6))
        bc += int(half_away(b * c / n * 1e6))
        em += int(half_away((a + b) * (a + c) / n * 1e6))
        if n > 1:
            vm += int(half_away((a + b) * (c + d) * (a + c) * (b + d)
                                / (n * 1.0 * n * (n - 1)) * 1e6))
    if bc > 0:
        assert abs(r.or_mh - round(ad / bc, 6)) < 1e-9
    if vm > 0:
        assert abs(r.cmh_chi2 - round(
            (sa - em / 1e6) ** 2 / (vm / 1e6), 6)) < 1e-9


def test_wilson_intervals_matches_python_replay(spark):
    """q322 at sf0.001: replay per-arm cells and the Wilson closed form;
    the interval must bracket the rate and sit inside [0, 1]."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import (
        QUERIES, _Z95,
    )

    rows = {r.arm: r for r in
            (QUERIES["q322_wilson_intervals"]
             .spark(spark, "/root/testdata/sf0.001").collect())}
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    p = ev[ev.event_type == "purchase"]
    for arm in ("A", "B"):
        sel = p[[bool(_r11_arm(u)) == (arm == "A")
                 for u in p.user_id]]
        n, c = len(sel), int((sel.value >= 15.0).sum())
        r = rows[arm]
        assert (r.n_trials, r.n_converted) == (n, c)
        pr = c / n
        hw = _Z95 * math.sqrt(pr * (1 - pr) / n
                              + _Z95 * _Z95 / (4.0 * n * n))
        den = 1.0 + _Z95 * _Z95 / n
        assert abs(r.ci_lo - round((pr + _Z95 * _Z95 / (2.0 * n) - hw)
                                   / den, 6)) < 1e-9
        assert abs(r.ci_hi - round((pr + _Z95 * _Z95 / (2.0 * n) + hw)
                                   / den, 6)) < 1e-9
        assert 0.0 <= r.ci_lo <= r.rate <= r.ci_hi <= 1.0


def test_eb_shrinkage_matches_python_replay(spark):
    """q323 at sf0.001: replay the micro-integer moment fit and the
    per-user shrink; shrinkage must pull every bucket toward the
    prior mean."""
    import math

    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q323_eb_shrinkage"]
            .spark(spark, "/root/testdata/sf0.001").collect())
    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    g = ev.groupby("user_id").agg(
        n=("event_id", "size"),
        c=("event_type", lambda s: int((s == "click").sum())))

    def half_away(x):
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    g["rm"] = [int(half_away(c * 1e6 / n)) for n, c in zip(g.n, g.c)]
    nu = len(g)
    s, svv = int(g.rm.sum()), int((g.rm * g.rm).sum())
    mu = s / nu / 1e6
    var = (svv / nu - (s / nu) ** 2) / 1e12
    ab = mu * (1 - mu) / var - 1.0 if var > 0 else 0.0
    ab = ab if ab > 0 else 0.0
    buckets = {}
    for n, c, rm in zip(g.n, g.c, g.rm):
        sh = (c + mu * ab) / (n + ab)
        bk = min(int(math.floor(sh * 10)), 9)
        cnt, sr, ss = buckets.get(bk, (0, 0, 0))
        buckets[bk] = (cnt + 1, sr + rm, ss + int(half_away(sh * 1e6)))
    got = {r.bucket: (r.n_users, r.avg_raw_rate, r.avg_shrunk_rate)
           for r in rows}
    assert set(got) == set(buckets)
    for bk, (cnt, sr, ss) in buckets.items():
        gn, graw, gshr = got[bk]
        assert gn == cnt
        assert abs(graw - round(sr / (cnt * 1e6), 6)) < 1e-9
        assert abs(gshr - round(ss / (cnt * 1e6), 6)) < 1e-9
        # shrunk bucket mean sits between raw mean and the prior mean
        lo, hi = sorted((sr / (cnt * 1e6), mu))
        assert lo - 1e-6 <= ss / (cnt * 1e6) <= hi + 1e-6


def test_holt_winters_matches_python_replay(spark):
    """q324 at sf0.01: replay the first-week seeding and the additive
    (l, b, seasonal-ring) recursion in pure python — every emitted
    level/trend/season/fitted must match, and the fitted value must be
    the PRE-observation forecast."""
    import pandas as pd

    from league_of_legends_data_pipeline_spark.plans.queries import QUERIES

    rows = (QUERIES["q324_holt_winters_seasonal"]
            .spark(spark, "/root/testdata/sf0.01").collect())
    ev = pd.read_parquet("/root/testdata/sf0.01/events.parquet")
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    daily = (ev.groupby(["event_type", "day"]).size()
             .rename("n").reset_index())
    got = {(r.event_type, r.day):
           (r.n, r.level, r.trend, r.season, r.fitted) for r in rows}
    n_checked = 0
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        xs = [float(x) for x in g.n]
        if len(xs) < 8:
            continue
        s = 0.0
        for x in xs[:7]:
            s += x
        level = s / 7.0
        trend = 0.0
        ring = [x - level for x in xs[:7]]
        for i in range(7, len(xs)):
            x = xs[i]
            s_old = ring[0]
            fitted = level + trend + s_old
            l_new = 0.3 * (x - s_old) + 0.7 * (level + trend)
            b_new = 0.1 * (l_new - level) + 0.9 * trend
            s_new = 0.2 * (x - l_new) + 0.8 * s_old
            ring = ring[1:] + [s_new]
            level, trend = l_new, b_new
            key = (et, g.day[i])
            assert key in got
            gn, gl, gt, gs, gf = got[key]
            assert gn == int(x)
            assert abs(gl - round(level, 6)) < 1e-9
            assert abs(gt - round(trend, 6)) < 1e-9
            assert abs(gs - round(s_new, 6)) < 1e-9
            assert abs(gf - round(fitted, 6)) < 1e-9
            n_checked += 1
    assert n_checked == len(rows) == 115


def test_near_dup_admission_index_side_is_exchange_free(spark):
    """q325's promise: admitting a batch against the persisted MinHash
    index shuffles only the batch — the bucketed band/shingle scans feed
    their joins with ZERO corpus-side exchange — and the admission
    verdicts equal the direct bipartite LSH computed without any index."""
    from league_of_legends_data_pipeline_spark.operators.dedup import (
        build_near_dup_index, minhash_lsh_pairs_bipartite,
        near_dup_admission,
    )
    from league_of_legends_data_pipeline_spark.plans.audit import (
        _parse_tree, _walk,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 7 != 0)
    batch = (docs.filter(F.col("doc_id") % 7 == 0)
             .select("doc_id", "text"))
    build_near_dup_index(corpus, "doc_id", "text", "t_neardup_idx",
                         shingle_k=5, num_hashes=16, bands=4)
    adm = near_dup_admission(batch, "doc_id", "text", "t_neardup_idx",
                             shingle_k=5, num_hashes=16, bands=4,
                             jaccard_threshold=0.4)
    got = {r.doc_id: r.admitted for r in adm.collect()}

    # equivalence with the index-free bipartite screen
    dup_ids = {r.id_b for r in minhash_lsh_pairs_bipartite(
        corpus, batch, "doc_id", "text", shingle_k=5, num_hashes=16,
        bands=4, jaccard_threshold=0.4).collect()}
    batch_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    assert got == {i: i not in dup_ids for i in batch_ids}

    # plan pin: no SHUFFLE exchange between either bucketed index scan
    # and its join — the corpus side must ride the bucket layout as-is.
    # (A BroadcastExchange is AQE adaptively broadcasting the tiny store
    # at sf0.001; at scale the broadcast is off the table and the bucket
    # layout carries the join, which is exactly what a shuffle-free path
    # certifies.)
    plan = adm._jdf.queryExecution().executedPlan().toString()
    assert "SelectedBucketsCount" in plan  # bucketed reads engaged
    roots, _ex = _parse_tree(plan)

    def scan_paths(nodes, path):
        for node in nodes:
            p = path + [node.content]
            if "t_neardup_idx" in node.content and "Scan" in node.content:
                yield p
            yield from scan_paths(node.children, p)

    found = 0
    for p in scan_paths(roots, []):
        join_idx = max(i for i, c in enumerate(p)
                       if "Join" in c.split(" [")[0])
        between = p[join_idx + 1:-1]
        offenders = [c for c in between
                     if c.startswith("Exchange hashpartitioning")
                     or c.startswith("Exchange rangepartitioning")
                     or c.startswith("Exchange SinglePartition")
                     or c.startswith("AQEShuffleRead")]
        assert offenders == [], (p[-1][:60], offenders)
        found += 1
    assert found >= 2  # bands scan + shingle-store scan


def test_kneser_ney_scores_hand_oracle(spark):
    from league_of_legends_data_pipeline_spark.operators.text import kneser_ney_scores
    import math

    # corpus: doc1 'a b', doc2 'c b', doc3 'a d'. Bigram types:
    # (a,b) (c,b) (a,d), all count 1. ctx: a -> c1=2, nf=2; c -> 1,1.
    # continuation: N1+(.b)=2, N1+(.d)=1, T=3.
    # P(b|a) = (1-.75)/2 + .75*2/2 * 2/3 = 0.125 + 0.5   = 0.625
    # P(b|c) = (1-.75)/1 + .75*1/1 * 2/3 = 0.25  + 0.5   = 0.75
    # P(d|a) = (1-.75)/2 + .75*2/2 * 1/3 = 0.125 + 0.25  = 0.375
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "c b"), (3, "a d")], ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict()
           for r in kneser_ney_scores(docs, "doc_id", "text",
                                      discount=0.75).collect()}
    for did, p in [(1, 0.625), (2, 0.75), (3, 0.375)]:
        want = round(round(-math.log2(p) * 1e6) / 1e6, 6)
        assert out[did]["n_bigrams"] == 1
        assert out[did]["mean_neg_logprob"] == want


def test_kneser_ney_continuation_beats_raw_frequency(spark):
    from league_of_legends_data_pipeline_spark.operators.text import kneser_ney_scores

    # the 'San Francisco' property: 'francisco' is FREQUENT (appears
    # 4x, always after 'san'), 'thing' appears 4x after 4 DIFFERENT
    # contexts. A frequency-backoff LM scores 'new francisco' and
    # 'new thing' equally; KN's continuation count must prefer
    # 'new thing' (lower neg-logprob) because 'thing' completes many
    # contexts while 'francisco' completes exactly one.
    ctx_doc = ("san francisco san francisco san francisco san francisco "
               "good thing bad thing one thing some thing new x")
    docs = spark.createDataFrame(
        [(1, ctx_doc), (2, "new francisco"), (3, "new thing")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["mean_neg_logprob"]
           for r in kneser_ney_scores(docs, "doc_id", "text").collect()}
    assert out[3] < out[2]


def test_bigram_pairs_edge_cases(spark):
    # pins the arrays_zip pair builder (r13: replaced the transform/
    # sequence HOF form) on the edges where the two differ structurally:
    # empty doc, single token, consecutive spaces, uppercase folding
    from league_of_legends_data_pipeline_spark.operators.text import (
        _bigram_pairs)

    docs = spark.createDataFrame(
        [(1, "A b  c"),   # tokens [a, b, '', c] -> only (a,b) survives
         (2, "x"),        # single token -> no pairs
         (3, ""),         # empty -> no pairs
         (4, "p q r")],   # (p,q) (q,r)
        ["doc_id", "text"])
    got = sorted((r["__id"], r["w1"], r["w2"])
                 for r in _bigram_pairs(docs, "doc_id", "text").collect())
    assert got == [(1, "a", "b"), (4, "p", "q"), (4, "q", "r")]
