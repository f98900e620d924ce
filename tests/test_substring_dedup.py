"""Substring-dedup family (dup_ngram_windows / dup_ngram_spans), BPE pair
counts, scalar quantization, neighborhood sizes, grouped top-k.

Reference behaviors modeled: Lee et al. 2021 substring dedup (the
reference's dedup story is doc-level content-hash — pipeline.py:937-974 —
these extend it to the sub-document granularity a training-data pipeline
needs); Sennrich 2016 BPE inner loop; HyperBall exact twin.
"""

from __future__ import annotations

import pytest

from lightrag_spark.operators import datapipe as dp
from lightrag_spark.operators.graphs import neighborhood_sizes
from lightrag_spark.operators.sq import sq_quantize, sq_topk

W = 4  # window width for the tests


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


SHARED = "alpha bravo charlie delta echo foxtrot"


def test_dup_windows_counts(spark):
    docs = _docs(
        spark,
        [
            (1, SHARED + " golf hotel"),
            (2, "india " + SHARED),
            (3, "one two three"),  # shorter than W+... -> has windows but unique
            (4, "aa bb"),  # shorter than W -> zero windows
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in dp.dup_ngram_windows(docs, width=W).collect()}
    # SHARED has 6 tokens -> 3 windows of width 4, all present in both docs.
    assert out[1]["n_windows"] == 5  # 8 tokens -> 5 windows
    assert out[2]["n_windows"] == 4  # 7 tokens -> 4 windows
    assert out[1]["dup_windows"] == 3
    assert out[2]["dup_windows"] == 3
    assert out[3]["n_windows"] == 0  # 3 tokens < width
    assert out[4]["n_windows"] == 0 and out[4]["dup_frac"] == 0.0
    assert out[1]["dup_frac"] == round(3 / 5, 4)


def test_dup_windows_within_doc_repeat_counts(spark):
    # corpus_count >= 2 includes repeats WITHIN one doc (Lee et al. remove
    # those too): a doc that repeats its own 4-gram is self-duplicated.
    docs = _docs(spark, [(1, "p q r s zz p q r s")])
    row = dp.dup_ngram_windows(docs, width=W).collect()[0]
    assert row["n_windows"] == 6
    assert row["dup_windows"] == 2  # windows 0 and 5 share "p q r s"


def test_dup_spans_merge_and_split(spark):
    # doc 2 contains the shared run twice, separated by unique filler long
    # enough that the two duplicated regions cannot merge.
    filler = "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"
    docs = _docs(
        spark,
        [
            (1, SHARED),
            (2, SHARED + " " + filler + " " + SHARED),
        ],
    )
    spans = dp.dup_ngram_spans(docs, width=W).collect()
    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: one span covering the whole 6-token run (windows 0..2 merge).
    assert len(by_doc[1]) == 1
    s = by_doc[1][0]
    assert (s["span_start"], s["span_end"], s["span_tokens"]) == (0, 5, 6)
    # doc 2: two disjoint spans (positions 0-5 and 16-21).
    assert len(by_doc[2]) == 2
    ss = sorted((r["span_start"], r["span_end"]) for r in by_doc[2])
    assert ss == [(0, 5), (16, 21)]


def test_bpe_pair_counts(spark):
    docs = _docs(spark, [(1, "abab cd abab"), (2, "cd x")])
    out = {r["pair"]: r["pair_count"] for r in dp.bpe_pair_counts(docs, top_n=10).collect()}
    # "abab" x2 occurrences: pairs ab,ba,ab per occurrence -> ab:4, ba:2;
    # "cd" x2 -> cd:2; "x" has no pairs.
    assert out == {"ab": 4, "ba": 2, "cd": 2}
    ranks = {r["pair"]: r["rnk"] for r in dp.bpe_pair_counts(docs, top_n=10).collect()}
    assert ranks["ab"] == 1
    # tie between ba and cd breaks lexicographically: ba before cd
    assert ranks["ba"] == 2 and ranks["cd"] == 3


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_sq_codes_bounds_and_extremes(spark):
    emb = _emb(spark, [[0.0, -1.0], [1.0, 1.0], [0.5, 0.0], [0.25, 0.25]])
    codes = {r["vec_id"]: r["codes"] for r in sq_quantize(emb).collect()}
    for cs in codes.values():
        assert all(-127 <= c <= 127 for c in cs)
    # symmetric codes: zero maps to 0, the absolute max to +-127
    assert codes[0][0] == 0 and codes[1][0] == 127
    assert codes[0][1] == -127 and codes[1][1] == 127
    assert codes[2][0] == 64  # round(63.5) half-away
    assert codes[3][0] == 32  # round(31.75)


def test_sq_constant_dimension_codes_equal(spark):
    emb = _emb(spark, [[7.0, 0.0], [7.0, 1.0]])
    codes = {r["vec_id"]: r["codes"] for r in sq_quantize(emb).collect()}
    # a constant dimension quantizes to the same code everywhere (rank-
    # neutral); an all-zero dimension stays 0
    assert codes[0][0] == codes[1][0] == 127
    assert codes[0][1] == 0 and codes[1][1] == 127


def test_sq_topk_matches_bruteforce(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.uniform(-1, 1, size=(40, 8)).astype("float32")
    emb = _emb(spark, vecs.tolist())
    codes = {r["vec_id"]: np.array(r["codes"]) for r in sq_quantize(emb).collect()}
    q = codes[0]
    dots = {i: int(c @ q) for i, c in codes.items()}
    expected = sorted(dots, key=lambda i: (-dots[i], i))[:5]
    got = [r["vec_id"] for r in sq_topk(emb, query_id=0, k=5).orderBy("rnk").collect()]
    assert got == expected
    with pytest.raises(ValueError):
        sq_topk(emb, query_id=999, k=5)


def test_neighborhood_sizes_path_graph(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, tgt string"
    )
    out = {r["entity"]: (r["ball1"], r["ball2"]) for r in neighborhood_sizes(edges).collect()}
    assert out == {"a": (1, 2), "b": (2, 3), "c": (2, 3), "d": (1, 2)}


def test_neighborhood_sizes_hub_pruning(spark):
    # star: hub h connected to x1..x4; via the hub every leaf sees all
    # others at radius 2 unless the hub midpoint is pruned.
    edges = spark.createDataFrame(
        [("h", f"x{i}") for i in range(4)], "src string, tgt string"
    )
    full = {r["entity"]: r["ball2"] for r in neighborhood_sizes(edges).collect()}
    assert full["x0"] == 4  # h + 3 siblings
    pruned = {
        r["entity"]: r["ball2"]
        for r in neighborhood_sizes(edges, max_degree=2).collect()
    }
    assert pruned["x0"] == 1  # hub midpoint dropped: only h remains


def test_top_event_users(spark):
    rows = [(t, u) for t, us in [("view", [1, 1, 1, 2, 2, 3]), ("buy", [5, 5, 6])] for u in us]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    out = dp.top_event_users(ev, k=2).orderBy("event_type", "rnk").collect()
    assert [(r["event_type"], r["user_id"], r["n_events"], r["rnk"]) for r in out] == [
        ("buy", 5, 2, 1),
        ("buy", 6, 1, 2),
        ("view", 1, 3, 1),
        ("view", 2, 2, 2),
    ]


def test_containment_vs_jaccard(spark):
    # B is a strict prefix-subset of A: containment(B in A) ~ 1.0 while
    # Jaccard is diluted by A's extra content.
    # extra stays small so the pair still band-collides (banding is
    # resemblance-tuned — the documented containment_pairs contract)
    core = " ".join(f"c{i}" for i in range(30))
    extra = "x1 x2 x3"
    docs = _docs(spark, [(1, core + " " + extra), (2, core)])
    cont = dp.containment_pairs(docs, threshold=0.5).collect()
    assert len(cont) == 1 and cont[0]["containment"] >= 0.9
    jac = dp.near_duplicate_pairs(docs, threshold=0.5).collect()
    jacv = jac[0]["jaccard"] if jac else 0.0
    assert jacv < cont[0]["containment"]


def test_near_duplicate_pairs_rejects_bad_measure(spark):
    docs = _docs(spark, [(1, "a b c")])
    import pytest

    with pytest.raises(ValueError):
        dp.near_duplicate_pairs(docs, measure="dice")


def test_sq_topk_recall_vs_exact_dot(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.uniform(-1, 1, size=(200, 16)).astype("float32")
    emb = _emb(spark, vecs.tolist())
    exact = np.argsort(-(vecs @ vecs[0]))[:10].tolist()
    got = [r["vec_id"] for r in sq_topk(emb, query_id=0, k=10).collect()]
    recall = len(set(got) & set(exact)) / 10
    assert recall >= 0.6  # int8 codes preserve most of the dot ranking


def test_weighted_sample_biases_to_weight(spark):
    from lightrag_spark.operators.sampling import weighted_sample_per_group
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, "g") for i in range(200)], "doc_id long, source string"
    )
    heavy = {i for i in range(200) if i % 10 == 0}
    w = spark.createDataFrame(
        [(i, 100.0 if i in heavy else 0.01) for i in range(200)],
        "doc_id long, weight double",
    )
    out = weighted_sample_per_group(docs.select("source", "doc_id"), w, k=5)
    picked = [r["doc_id"] for r in out.collect()]
    assert len(picked) == 5
    # 10000x weight ratio dominates the hash spread: all picks are heavy
    assert all(p in heavy for p in picked)
    # determinism: second run identical
    assert picked == [r["doc_id"] for r in out.collect()]
