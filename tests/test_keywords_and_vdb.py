"""Keyword extraction + cache (operate.py:4563-4668), relation-VDB rows +
_get_edge_data (operate.py:3179-3200, 5849-5905), and VDB content
truncation (operate.py:293-340)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lightrag_spark.functions import keywords as kw
from lightrag_spark.functions.tokenizer import (
    get_tokenizer,
    truncate_by_token_limit,
    truncate_vdb_content,
)
from lightrag_spark.operators.embedding import get_edge_data, relation_vdb


def test_mock_keyword_model_shape():
    hl, ll = kw.extract_keywords_only("What are the economic implications of trade policy?")
    assert "economic" in hl and "implications" in hl
    assert "trade" in ll
    assert hl == sorted(set(hl)) and ll == sorted(set(ll))


def test_keyword_cache_hits_skip_model():
    calls = []

    def counting_model(text):
        calls.append(text)
        return kw.mock_keyword_model(text)

    cache: dict = {}
    q = "quantum computing hardware advances"
    r1 = kw.extract_keywords_only(q, model_fn=counting_model, cache=cache)
    r2 = kw.extract_keywords_only(q, model_fn=counting_model, cache=cache)
    assert r1 == r2 and len(calls) == 1
    assert kw.keywords_cache_key("hybrid", q) in cache
    # a different mode is a different cache row
    kw.extract_keywords_only(q, mode="local", model_fn=counting_model, cache=cache)
    assert len(calls) == 2


def test_invalid_cached_payload_requeries():
    cache = {kw.keywords_cache_key("hybrid", "q"): "garbage not json"}
    hl, ll = kw.extract_keywords_only("q economic keywords here", mode="hybrid")
    # direct call works; now force key collision with invalid payload
    key = kw.keywords_cache_key("hybrid", "some query text")
    cache = {key: "garbage"}
    hl, ll = kw.extract_keywords_only("some query text", cache=cache)
    assert kw.parse_keywords_payload(cache[key])[0]  # overwritten with valid


def test_parse_keywords_tolerant():
    ok, hl, ll = kw.parse_keywords_payload(
        '```json\n{"high_level_keywords": ["a"], "low_level_keywords": ["b"]}\n```'
    )
    assert ok and hl == ["a"] and ll == ["b"]
    ok, hl, ll = kw.parse_keywords_payload(
        'prefix "high_level_keywords": ["x", "y"] suffix'
    )
    assert ok and hl == ["x", "y"] and ll == []
    assert kw.parse_keywords_payload("no keywords at all") == (False, [], [])
    assert kw.parse_keywords_payload("") == (False, [], [])


def test_extract_keywords_batch(spark):
    df = spark.createDataFrame(
        [("q1", "economic implications of trade"), ("q2", "quantum computing hardware")],
        "query_id string, text string",
    )
    rows = {r.query_id: r for r in kw.extract_keywords_batch(df).collect()}
    assert "economic" in rows["q1"].hl_keywords
    assert rows["q2"].args_hash == kw.keywords_cache_key("hybrid", "quantum computing hardware")


def test_truncate_by_token_limit_verified_fit():
    tok = get_tokenizer("regex")
    text = "word " * 100
    out = truncate_by_token_limit(tok, text, 17)
    assert tok.count(out) <= 17
    assert text.startswith(out)
    assert truncate_by_token_limit(tok, "short", 100) == "short"
    with pytest.raises(ValueError):
        truncate_by_token_limit(tok, "x", 0)


def test_truncate_vdb_content_noop_paths():
    tok = get_tokenizer("regex")
    assert truncate_vdb_content("", tok, 5) == ""
    assert truncate_vdb_content("abc", None, 5) == "abc"
    assert truncate_vdb_content("abc", tok, None) == "abc"
    assert truncate_vdb_content("a b c d e", tok, 0) == "a b c d e"


def _edges(spark):
    return spark.createDataFrame(
        [
            ("apple", "fruit", 3.0, ["is_a"], "apple is a fruit"),
            ("car", "engine", 2.0, ["has_part"], "a car has an engine"),
            ("apple", "tree", 1.0, ["grows_on"], "apples grow on trees"),
        ],
        "src string, tgt string, weight double, keywords array<string>, description string",
    )


def test_relation_vdb_rows(spark):
    rows = {r.vdb_id: r for r in relation_vdb(_edges(spark)).collect()}
    from lightrag_spark.functions.hashing import compute_mdhash_id

    rid = compute_mdhash_id("apple" + "fruit", prefix="rel-")
    assert rid in rows
    r = rows[rid]
    assert r.content == "is_a\tapple\nfruit\napple is a fruit"
    assert len(r.embedding) == 64


def test_relation_vdb_truncation(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1.0, ["k"], "word " * 500)],
        "src string, tgt string, weight double, keywords array<string>, description string",
    )
    r = relation_vdb(edges, embedding_token_limit=20, tokenizer_kind="regex").collect()[0]
    tok = get_tokenizer("regex")
    assert tok.count(r.content) <= 20


def test_get_edge_data_vector_order(spark):
    hits = get_edge_data(_edges(spark), "apple fruit orchards", k=2, min_sim=0.0).collect()
    assert 1 <= len(hits) <= 2
    assert [h.pos for h in sorted(hits, key=lambda h: h.pos)] == list(range(1, len(hits) + 1))
    top = min(hits, key=lambda h: h.pos)
    assert top.src == "apple"  # shared tokens -> highest cosine under the mock embedder
    assert top.weight is not None  # payload joined back
