"""Rerank operator: differential vs the reference's pure functions
(rerank.py chunking/aggregation, utils.py result normalization +
apply_rerank_if_enabled semantics) plus integration into kg_query."""

from __future__ import annotations

import asyncio

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from refshim import load_reference

from lightrag_spark.operators.rerank import (
    aggregate_chunk_scores,
    apply_rerank,
    chunk_documents_for_rerank,
    filter_by_min_rerank_score,
    lexical_rerank_fn,
    normalize_rerank_result,
    rerank_documents,
)

ref = load_reference()
ref_rerank = None
ref_utils = None
if ref is not None:
    import lightrag.rerank as ref_rerank  # noqa: E402
    import lightrag.utils as ref_utils  # noqa: E402

needs_ref = pytest.mark.skipif(ref is None, reason="reference unavailable")


# ---------------------------------------------------------------- chunking

DOC_CASES = [
    [],
    ["short"],
    ["a" * 5000],
    ["short", "b" * 3000, "", "c" * 1921],
    ["x" * 1920],  # exactly max_chars at max_tokens=480
    ["y" * 1921],  # one over
]


@needs_ref
@pytest.mark.parametrize("docs", DOC_CASES)
@pytest.mark.parametrize("max_tokens,overlap", [(480, 32), (100, 10), (64, 63), (1, 0)])
def test_chunking_differential_char_fallback(docs, max_tokens, overlap):
    """tiktoken is absent in this sandbox, so the reference takes its
    character-approximation path — our tokenizer=None path must be
    bit-identical on both outputs (chunks and the doc-index back-map)."""
    ours = chunk_documents_for_rerank(docs, max_tokens, overlap, tokenizer=None)
    theirs = ref_rerank.chunk_documents_for_rerank(docs, max_tokens, overlap)
    assert ours == theirs


@needs_ref
@given(
    docs=st.lists(st.text(alphabet="ab \n", max_size=600), max_size=5),
    max_tokens=st.integers(min_value=1, max_value=200),
    overlap=st.integers(min_value=0, max_value=250),
)
@settings(max_examples=60, deadline=None)
def test_chunking_differential_fuzz(docs, max_tokens, overlap):
    ours = chunk_documents_for_rerank(docs, max_tokens, overlap, tokenizer=None)
    theirs = ref_rerank.chunk_documents_for_rerank(docs, max_tokens, overlap)
    assert ours == theirs


def test_chunking_zero_max_tokens_raises():
    with pytest.raises(ValueError):
        chunk_documents_for_rerank(["abc"], max_tokens=0)


def test_chunking_with_tokenizer_covers_and_terminates():
    from lightrag_spark.functions.tokenizer import RegexTokenizer

    tok = RegexTokenizer()
    doc = "the quick brown fox jumps over the lazy dog " * 50
    chunks, idx = chunk_documents_for_rerank(
        [doc, "tiny"], max_tokens=40, overlap_tokens=8, tokenizer=tok
    )
    assert idx[-1] == 1 and chunks[-1] == "tiny"
    assert all(i in (0, 1) for i in idx)
    # windows cover the document: concatenating with overlap removed
    # reproduces a superset of the text; cheap sanity: every window is a
    # substring and the first/last windows anchor the ends
    body = [c for c, i in zip(chunks, idx) if i == 0]
    assert len(body) > 1
    assert doc.startswith(body[0])
    assert doc.endswith(body[-1])
    for c in body:
        assert c in doc
        assert len(tok.encode(c)) <= 40


# ------------------------------------------------------------- aggregation


AGG_CASES = [
    ([], [], 0),
    ([{"index": 0, "relevance_score": 0.5}], [0], 1),
    (
        [
            {"index": 0, "relevance_score": 0.2},
            {"index": 1, "relevance_score": 0.9},
            {"index": 2, "relevance_score": 0.5},
        ],
        [0, 0, 1],
        2,
    ),
    # malformed entries interleaved
    (
        [
            {"index": 0, "relevance_score": 0.2},
            "garbage",
            {"index": True, "relevance_score": 0.9},
            {"index": 5, "relevance_score": 0.9},
            {"index": 1, "relevance_score": float("nan")},
            {"index": 1, "relevance_score": 0.7},
        ],
        [0, 1],
        2,
    ),
]


@needs_ref
@pytest.mark.parametrize("results,indices,n", AGG_CASES)
@pytest.mark.parametrize("agg", ["max", "mean", "first", "bogus"])
def test_aggregate_differential(results, indices, n, agg):
    ours = aggregate_chunk_scores(results, indices, n, agg)
    theirs = ref_rerank.aggregate_chunk_scores(results, indices, n, agg)
    assert ours == theirs


@needs_ref
@pytest.mark.parametrize(
    "result,max_index",
    [
        ({"index": 0, "relevance_score": 0.5}, 1),
        ({"index": 0, "relevance_score": "0.5"}, 1),
        ({"index": True, "relevance_score": 0.5}, 2),
        ({"index": -1, "relevance_score": 0.5}, 2),
        ({"index": 2, "relevance_score": 0.5}, 2),
        ({"index": 1, "relevance_score": True}, 2),
        ({"index": 1, "relevance_score": float("inf")}, 2),
        ({"index": 1, "relevance_score": None}, 2),
        ({"index": 1}, 2),
        ("not a dict", 2),
        ({"index": 1, "relevance_score": 0.0}, 2),
    ],
)
def test_normalize_differential(result, max_index):
    assert normalize_rerank_result(result, max_index) == ref_utils.normalize_rerank_result(
        result, max_index
    )


# ------------------------------------------- apply_rerank vs the reference


@needs_ref
def test_apply_rerank_differential_with_mock_scorer():
    """Run the reference's apply_rerank_if_enabled (async) and our
    apply_rerank over the same docs + the same deterministic scorer; the
    outputs must agree, including the attached rerank_score."""
    docs = [
        {"content": "spark shuffle partitions tuning", "chunk_id": "a"},
        {"content": "gardening tomatoes in spring", "chunk_id": "b"},
        {"content": "spark broadcast join thresholds", "chunk_id": "c"},
    ]
    query = "spark join tuning"

    async def ref_fn(query, documents, top_n=None):
        return lexical_rerank_fn(query, documents, top_n)

    theirs = asyncio.run(
        ref_utils.apply_rerank_if_enabled(
            query=query,
            retrieved_docs=docs,
            global_config={"rerank_model_func": ref_fn},
            enable_rerank=True,
            top_n=3,
        )
    )
    ours = apply_rerank(query, docs, lexical_rerank_fn, top_n=3)
    assert ours == theirs
    assert ours[0]["chunk_id"] in ("a", "c")
    assert all("rerank_score" in d for d in ours)


def test_apply_rerank_fallbacks():
    docs = [{"content": "alpha"}, {"content": "beta"}]
    # no scorer -> passthrough (reference warns + returns originals)
    assert apply_rerank("q", docs, None) == docs
    # empty results -> originals
    assert apply_rerank("q", docs, lambda **k: []) == docs
    # all-malformed results -> originals
    assert apply_rerank("q", docs, lambda **k: [{"bogus": 1}]) == docs

    # scorer exception -> originals, not a raised error
    def boom(**k):
        raise RuntimeError("scorer down")

    assert apply_rerank("q", docs, boom) == docs
    assert apply_rerank("q", [], lexical_rerank_fn) == []


def test_min_score_filter_defaults_unscored_to_pass():
    docs = [{"rerank_score": 0.9}, {"rerank_score": 0.1}, {"no_score": True}]
    kept = filter_by_min_rerank_score(docs, 0.5)
    assert kept == [{"rerank_score": 0.9}, {"no_score": True}]
    assert filter_by_min_rerank_score(docs, 0.0) == docs


def test_rerank_documents_chunked_top_n_is_document_level():
    """With chunking on, top_n limits DOCUMENTS post-aggregation — a long
    document whose best window scores high must survive even when its
    other windows are weak."""
    long_doc = ("filler words here " * 400) + " spark join tuning secret"
    docs = ["spark join tuning", long_doc, "unrelated gardening text"]
    out = rerank_documents(
        "spark join tuning secret",
        docs,
        lexical_rerank_fn,
        top_n=2,
        enable_chunking=True,
        max_tokens_per_doc=64,
    )
    assert len(out) == 2
    kept = {r["index"] for r in out}
    assert 0 in kept and 1 in kept  # the long doc survives via its best window


# ----------------------------------------------------- kg_query integration


@pytest.fixture(scope="module")
def kg_result(spark):
    import __spark_entry__ as m

    return m._build(spark, "/root/testdata/sf0.001")


def test_kg_query_context_rerank_reorders_and_filters(spark, kg_result):
    from lightrag_spark.plans.query import kg_query_context

    base_ctx, _, base_dbg = kg_query_context(
        kg_result, "united_states network", mode="local", top_k=8
    )
    ctx, _, dbg = kg_query_context(
        kg_result,
        "united_states network",
        mode="local",
        top_k=8,
        enable_rerank=True,
        rerank_fn=lexical_rerank_fn,
        min_rerank_score=0.0,
        chunk_top_k=3,
    )
    assert len(dbg["chunk_ids"]) <= 3
    assert set(dbg["chunk_ids"]) <= set(base_dbg["chunk_ids"])
    # absent scorer: enable_rerank degrades to passthrough (reference
    # warns and keeps the original order)
    ctx2, _, dbg2 = kg_query_context(
        kg_result, "united_states network", mode="local", top_k=8,
        enable_rerank=True, rerank_fn=None, min_rerank_score=0.0,
    )
    assert dbg2["chunk_ids"] == base_dbg["chunk_ids"]


def test_kg_query_rerank_scopes_answer_cache(spark, kg_result):
    from lightrag_spark.plans.query import kg_query

    calls = []

    def response_fn(user_query, system_prompt):
        calls.append(user_query)
        return f"answer #{len(calls)}"

    cache: dict = {}
    common = dict(
        response_fn=response_fn, answer_cache=cache, mode="local", top_k=6
    )
    out1 = kg_query(kg_result, "what links united_states and network?", **common)
    out2 = kg_query(
        kg_result,
        "what links united_states and network?",
        enable_rerank=True,
        rerank_fn=lexical_rerank_fn,
        **common,
    )
    # rerank changes the cache identity: no cross-service of answers
    assert out1["cache_hit"] is False and out2["cache_hit"] is False
    assert out1["args_hash"] != out2["args_hash"]
    out3 = kg_query(
        kg_result,
        "what links united_states and network?",
        enable_rerank=True,
        rerank_fn=lexical_rerank_fn,
        **common,
    )
    assert out3["cache_hit"] is True and out3["content"] == out2["content"]


# ----------------------------------------------------- DataFrame-side twin


def test_rerank_scores_df_matches_list_scorer(spark):
    from lightrag_spark.operators.rerank import rerank_scores_df

    rows = [
        ("c1", "spark shuffle partitions tuning"),
        ("c2", "gardening tomatoes in spring sun"),
        ("c3", "spark broadcast JOIN thresholds"),
        ("c4", ""),
    ]
    df = spark.createDataFrame(rows, "chunk_id string, content string")
    query = "spark join tuning"
    got = {
        r["chunk_id"]: round(r["rerank_score"], 9)
        for r in rerank_scores_df(df, query).collect()
    }
    want_scores = lexical_rerank_fn(query, [t for _, t in rows], None)
    want = {
        rows[r["index"]][0]: round(r["relevance_score"], 9) for r in want_scores
    }
    assert got == want
