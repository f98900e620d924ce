"""Quality-aware canonical pick, TransE scoring, readability, HLL users."""

from __future__ import annotations

import hashlib

from lightrag_spark.operators import datapipe as dp
from lightrag_spark.operators.graphs import (
    TRANSE_DIMS,
    TRANSE_MOD,
    kg_negative_samples,
    transe_l1_scores,
)


def test_readability_scores(spark):
    docs = spark.createDataFrame(
        [(1, "the cat sat. the dog ran!"), (2, "xyz")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in dp.readability_scores(docs).collect()}
    r1 = out[1]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    # syllables: the=1 cat=1 sat.=1 the=1 dog=1 ran!=1 -> 6
    assert r1["n_syllables"] == 6
    expected = round(0.39 * (6 / 2) + 11.8 * (6 / 6) - 15.59, 4)
    assert r1["fk_grade"] == expected
    r2 = out[2]
    # no vowels ("y" counts, so xyz has 1), no sentence punctuation -> 1/1/1
    assert (r2["n_words"], r2["n_sentences"], r2["n_syllables"]) == (1, 1, 1)


def test_pick_canonical_prefers_quality(spark):
    # two near-identical docs; doc 2 repeats a token (lower type/token
    # ratio -> lower quality), doc 1 should be kept even though min-id
    # labeling makes doc 1 the component label anyway; so ALSO add a pair
    # where the higher-quality doc has the HIGHER id.
    words = [f"w{i}" for i in range(40)]
    base = "the quick brown fox jumps over a quiet river " + " ".join(words)
    degraded = base.replace("quiet", "the")  # more stopwords, fewer types
    docs = spark.createDataFrame(
        [(10, degraded), (11, base)], "doc_id long, text string"
    )
    out = dp.pick_canonical(docs).collect()
    assert len(out) == 1
    row = out[0]
    assert row["canonical_doc_id"] == 10  # min-id component label
    assert row["component_size"] == 2
    q = {r["doc_id"]: r["quality"] for r in dp.quality_scores(docs).collect()}
    assert row["keep_doc_id"] == max(q, key=lambda d: (q[d], -d))


def _py_embed(name: str, d: int) -> int:
    return int(hashlib.md5(f"{d}:{name}".encode()).hexdigest()[:4], 16) % TRANSE_MOD


def test_transe_scores_match_python(spark):
    edges = spark.createDataFrame(
        [("alpha", "beta"), ("beta", "gamma")], "src string, tgt string"
    )
    nodes = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",)], "entity_name string"
    )
    neg = kg_negative_samples(edges, nodes, k=2)
    out = transe_l1_scores(neg).collect()
    assert out, "negative sampling produced no surviving rows"
    rel = [
        int.from_bytes(hashlib.md5(f"{d}:__rel__".encode()).digest()[:2], "big")
        % TRANSE_MOD
        for d in range(TRANSE_DIMS)
    ]
    for r in out:
        pos = sum(
            abs(_py_embed(r["src"], d) + rel[d] - _py_embed(r["tgt"], d))
            for d in range(TRANSE_DIMS)
        )
        negs = sum(
            abs(_py_embed(r["src"], d) + rel[d] - _py_embed(r["neg_tgt"], d))
            for d in range(TRANSE_DIMS)
        )
        assert (r["pos_score"], r["neg_score"], r["margin"]) == (pos, negs, negs - pos)


def test_hll_users_close_to_exact(spark):
    rows = [(f"type{u % 3}", u % 40) for u in range(4000)]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    out = {r["event_type"]: r["estimate"] for r in dp.hll_distinct(ev, "event_type", "user_id").collect()}
    exact = {"type0": len({u % 40 for u in range(4000) if u % 3 == 0})}
    # m=256 registers -> ~6.5% stderr; small-range correction applies here
    assert abs(out["type0"] - exact["type0"]) / exact["type0"] < 0.2


def test_token_entropy(spark):
    docs = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d"), (3, "a a b b")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in dp.token_entropy(docs).collect()}
    assert out[1]["token_entropy"] == 0.0  # single repeated token
    assert out[2]["token_entropy"] == 2.0  # 4 unique tokens -> log2(4)
    assert out[3]["token_entropy"] == 1.0  # two 50/50 tokens
    assert out[2]["n_types"] == 4 and out[3]["n_types"] == 2


def test_transe_hits_consistent_with_scores(spark):
    from lightrag_spark.operators.graphs import transe_hits

    edges = spark.createDataFrame(
        [("alpha", "beta"), ("beta", "gamma")], "src string, tgt string"
    )
    nodes = spark.createDataFrame(
        [("alpha",), ("beta",), ("gamma",), ("delta",), ("epsilon",)],
        "entity_name string",
    )
    neg = kg_negative_samples(edges, nodes, k=2)
    rows = transe_l1_scores(neg).collect()
    hits = {(r["src"], r["tgt"]): r.asDict() for r in transe_hits(neg).collect()}
    for (s, t), h in hits.items():
        mine = [r for r in rows if (r["src"], r["tgt"]) == (s, t)]
        assert h["n_neg"] == len(mine)
        assert h["n_hits"] == sum(1 for r in mine if r["neg_score"] > r["pos_score"])
        assert h["hit_all"] == int(h["n_hits"] == h["n_neg"])


def test_filter_report_verdicts(spark):
    good = " ".join(f"tok{i} the" for i in range(20))  # varied + stopwords
    docs = spark.createDataFrame(
        [
            (1, good),
            (2, "a a a a a a a a a a a a"),  # low entropy, low type ratio
            (3, "x y"),  # too short
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r.asDict() for r in dp.filter_report(docs, dup_width=4).collect()}
    assert out[1]["keep"] == 1 and out[1]["reasons"] == []
    assert out[2]["keep"] == 0 and "low_entropy" in out[2]["reasons"]
    assert "dup_heavy" in out[2]["reasons"]  # self-repeated 4-grams
    # 2 tokens also means entropy <= 1 bit, so both floors fire, in order
    assert out[3]["keep"] == 0 and out[3]["reasons"] == ["too_short", "low_entropy"]


def test_domain_js_divergence_orders_domains(spark):
    import math

    # domain A ~ corpus-dominant; domain B shares tokens; domain C disjoint
    rows = (
        [(i, "common tokens here " * 5, "A") for i in range(8)]
        + [(100 + i, "common tokens mixed extra", "B") for i in range(4)]
        + [(200 + i, "zzq qqz zqq", "C") for i in range(2)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r["jsd"] for r in dp.domain_js_divergence(docs, top_v=10).collect()}
    assert set(out) == {"A", "B", "C"}
    for v in out.values():
        assert -1e-9 <= v <= math.log(2) + 1e-9  # JSD(ln) in [0, ln 2]
    assert out["A"] < out["B"] < out["C"]  # distance from corpus ordering


def test_events_ewma_recurrence(spark):
    from datetime import datetime

    rows = []
    # hours with counts 4, 2, 8 for one type
    for h, n in [(0, 4), (1, 2), (2, 8)]:
        rows += [("view", datetime(2024, 1, 1, h, m)) for m in range(n)]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {r["hour"].hour: r.asDict() for r in dp.events_ewma(ev).collect()}
    assert out[0]["ewma"] == 4.0 and out[0]["residual"] == 0.0
    assert out[1]["ewma"] == 3.0  # 0.5*2 + 0.5*4
    assert out[1]["residual"] == 2 - 4.0
    assert out[2]["ewma"] == 5.5  # 0.5*8 + 0.5*3
    assert out[2]["residual"] == 8 - 3.0


def test_url_dedup_report_collapses_variants(spark):
    docs = spark.createDataFrame(
        [
            (1, "HTTP://A.COM:80/x"),
            (2, "http://a.com/x/"),
            (3, "http://a.com/x?utm_source=z#f"),
            (4, "http://b.com/y"),
        ],
        "doc_id long, url string",
    )
    out = {r["canonical_url"]: r.asDict() for r in dp.url_dedup_report(docs).collect()}
    a = out["http://a.com/x"]
    assert a["n_docs"] == 3 and a["n_raw_forms"] == 3 and a["keep_doc_id"] == 1
    assert out["http://b.com/y"]["n_docs"] == 1


def test_interarrival_quantiles(spark):
    from datetime import datetime

    # user 1: events at t=0, 10, 30 -> gaps 10s, 20s
    rows = [
        ("view", 1, 1, datetime(2024, 1, 1, 0, 0, 0)),
        ("view", 1, 2, datetime(2024, 1, 1, 0, 0, 10)),
        ("view", 1, 3, datetime(2024, 1, 1, 0, 0, 30)),
        ("view", 2, 4, datetime(2024, 1, 1, 0, 0, 0)),  # single event: no gap
    ]
    ev = spark.createDataFrame(rows, "event_type string, user_id long, event_id long, ts timestamp")
    out = {r["q"]: r.asDict() for r in dp.interarrival_quantiles(ev).collect()}
    assert out[0.5]["n"] == 2
    assert out[0.5]["value_at"] == 10_000_000  # median of {10s, 20s}
    assert out[0.9]["value_at"] == 20_000_000
