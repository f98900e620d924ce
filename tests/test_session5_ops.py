"""Session-5 batch: kmv_distinct, bloom_prefilter, bm25_topk,
semdedup_pairs (datapipe.py).  DuckDB twins are queries[events_kmv_users,
dedup_bloom, retrieval_bm25_topk, dedup_semantic]; these pin the
estimator accuracy / sketch safety / ranking properties the hash gate
can't express."""

import math

import pytest
from pyspark.sql import functions as F

from lightrag_spark.operators import datapipe as dp


# ---------------------------------------------------------------- KMV ------


def test_kmv_accuracy(spark):
    # 2000 distinct values: KMV with k=64 has relative stderr
    # ~1/sqrt(k-2) = 12.7%; allow 3 sigma
    n = 2000
    df = spark.range(n * 2).select(
        F.lit("g").alias("grp"), (F.col("id") % n).cast("string").alias("v")
    )
    got = dp.kmv_distinct(df, group="grp", col="v").collect()[0]
    assert got["n_kept"] == 64
    assert abs(got["estimate"] - n) / n < 0.40, got["estimate"]
    assert got["exact"] == n


def test_kmv_small_set_is_exact(spark):
    # fewer distinct values than k: kept set IS the distinct set
    df = spark.range(300).select(
        F.lit("g").alias("grp"), (F.col("id") % 17).cast("string").alias("v")
    )
    got = dp.kmv_distinct(df, group="grp", col="v").collect()[0]
    assert got["n_kept"] == 17
    assert got["estimate"] == 17.0
    assert got["exact"] == 17


def test_kmv_duplicates_do_not_inflate(spark):
    one = spark.range(50).select(
        F.lit("g").alias("grp"), (F.col("id") % 50).cast("string").alias("v")
    )
    many = spark.range(5000).select(
        F.lit("g").alias("grp"), (F.col("id") % 50).cast("string").alias("v")
    )
    a = dp.kmv_distinct(one, group="grp", col="v").collect()[0]
    b = dp.kmv_distinct(many, group="grp", col="v").collect()[0]
    assert a["estimate"] == b["estimate"] == 50.0


def test_kmv_k_guard():
    with pytest.raises(ValueError):
        dp.kmv_distinct(None, group="g", col="v", k=1)


# -------------------------------------------------------------- Bloom ------


def _bloom_frame(spark, n=400, dup_every=10):
    # odd ids whose (id-1) % dup_every == 0 copy the preceding even id's
    # text -> guaranteed cross-parity true duplicates
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(
            (F.col("id") % 2 == 1) & ((F.col("id") - 1) % dup_every == 0),
            F.concat(F.lit("text-"), (F.col("id") - 1).cast("string")),
        )
        .otherwise(F.concat(F.lit("text-"), F.col("id").cast("string")))
        .alias("text"),
    )
    return base


def test_bloom_no_false_negatives(spark):
    out = dp.bloom_prefilter(_bloom_frame(spark)).collect()
    for r in out:
        if r["true_dup"]:
            assert r["bloom_hit"], f"false negative at doc {r['doc_id']}"
        assert r["false_positive"] == (r["bloom_hit"] and not r["true_dup"])


def test_bloom_dup_detection_matches_exact(spark):
    # the candidate set must contain exactly the planted dup ids
    out = {r["doc_id"]: r for r in dp.bloom_prefilter(_bloom_frame(spark)).collect()}
    planted = {i for i in range(1, 400, 2) if (i - 1) % 10 == 0}
    assert {d for d, r in out.items() if r["true_dup"]} == planted


def test_bloom_fp_rate_sane(spark):
    # 1000 probe docs, ~1000 build keys * 4 bits in m=2048: fill ~0.86,
    # FP rate ~0.55 worst-case; tiny m must still never miss, and the
    # production-sized filter (m=64k) must have near-zero FPs
    frame = _bloom_frame(spark, n=2000, dup_every=4)
    big = dp.bloom_prefilter(frame, m=65536)
    fps = big.filter(F.col("false_positive")).count()
    probes = big.count()
    assert probes == 1000
    assert fps <= probes * 0.02, fps


# --------------------------------------------------------------- BM25 ------


def _bm25_docs(spark):
    rows = [
        (0, "apple banana cherry"),
        (1, "apple apple apple apple apple apple apple apple"),
        (2, "apple banana"),
        (3, "banana cherry date elderberry fig grape"),
        (4, "date elderberry"),
        (5, "apple " + " ".join(f"filler{i}" for i in range(60))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_rank_contract(spark):
    out = dp.bm25_topk(_bm25_docs(spark), n_queries=2, k=3).collect()
    per = {}
    for r in out:
        per.setdefault(r["query_id"], []).append(r)
    for q, rows in per.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["score"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert all(r["doc_id"] != q for r in rows)


def test_bm25_tf_saturation_and_length_norm(spark):
    # query 0 = "apple banana cherry".  doc 2 (short, 2 shared terms)
    # must outrank doc 1 (8x apple but nothing else: saturation caps the
    # tf contribution) and doc 5 (one apple diluted in 61 tokens: length
    # normalization discounts it)
    out = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in dp.bm25_topk(_bm25_docs(spark), n_queries=1, k=5).collect()
    }
    assert out[(0, 2)] > out[(0, 1)], out
    assert out[(0, 1)] > out[(0, 5)], out


def test_bm25_idf_downweights_common_terms(spark):
    # "apple" appears in 4/6 docs, "elderberry" in 2/6: for a query
    # containing both, the rare-term doc must win against equal tf
    rows = [
        (0, "apple elderberry"),
        (1, "apple zzz"),
        (2, "elderberry zzz"),
        (3, "apple yyy"),
        (4, "apple xxx"),
        (5, "apple www"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["score"]
        for r in dp.bm25_topk(docs, n_queries=1, k=5).collect()
        if r["query_id"] == 0
    }
    assert out[2] > out[1], out


# ----------------------------------------------------------- SemDedup ------


def _twin_embeddings(spark, n=60, dim=8):
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(n):
        rows.append((i, [rnd.gauss(0, 1) for _ in range(dim)]))
    # twins: exact copies at id+1000 for every 6th vector
    for i in range(0, n, 6):
        rows.append((i + 1000, list(rows[i][1])))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semdedup_finds_exact_twins(spark):
    emb = _twin_embeddings(spark)
    out = dp.semdedup_pairs(emb, k=4, threshold=0.99)
    got = {(r["keep_id"], r["drop_id"]) for r in out.collect()}
    expected = {(i, i + 1000) for i in range(0, 60, 6)}
    # an exact copy always lands in the same cell as its base (identical
    # distances), so cluster bounding cannot miss it
    assert expected <= got, expected - got


def test_semdedup_pairs_within_cell_only(spark):
    from lightrag_spark.operators.ivf import assign_nearest_centroid

    emb = _twin_embeddings(spark)
    asg = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_nearest_centroid(emb, k=4, id_col="vec_id").collect()
    }
    for r in dp.semdedup_pairs(emb, k=4, threshold=0.5).collect():
        assert asg[r["keep_id"]] == asg[r["drop_id"]] == r["centroid_id"]
        assert r["keep_id"] < r["drop_id"]
        assert r["cos"] >= 0.5


def test_semdedup_orthogonal_vectors_no_pairs(spark):
    # one-hot basis vectors: all cosines are exactly 0
    rows = [(i, [1.0 if j == i else 0.0 for j in range(8)]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    assert dp.semdedup_pairs(emb, k=2, threshold=0.1).count() == 0


def test_semdedup_arrow_equals_expression(spark):
    # the Arrow einsum path (default) and the interpreted expression fold
    # (the oracle's independent twin) must agree exactly at the 4dp round
    emb = _twin_embeddings(spark)
    fast = {
        (r["keep_id"], r["drop_id"]): r["cos"]
        for r in dp.semdedup_pairs(emb, k=4, threshold=0.5, use_arrow=True).collect()
    }
    slow = {
        (r["keep_id"], r["drop_id"]): r["cos"]
        for r in dp.semdedup_pairs(emb, k=4, threshold=0.5, use_arrow=False).collect()
    }
    assert fast == slow


def test_semdedup_auto_k_rule(spark):
    import math

    # 100 vectors -> k = max(8, isqrt(100)) = 10 distinct centroid cells
    # possible; every emitted centroid_id must be one of the first 10 ids
    emb = _twin_embeddings(spark, n=100)
    n = emb.count()
    k = max(dp.SEMDEDUP_K, math.isqrt(n))
    ids = sorted(r["vec_id"] for r in emb.select("vec_id").collect())[:k]
    out = dp.semdedup_pairs(emb, threshold=0.5)
    cents = {r["centroid_id"] for r in out.select("centroid_id").distinct().collect()}
    assert cents <= set(ids)
