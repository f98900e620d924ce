"""pick_by_weighted_polling: hypothesis differential against the
REFERENCE's own function (utils.py:5189-5270), plus the kg_query_context
driver end-to-end on a small build."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lightrag_spark.functions.chunk_pick import pick_by_weighted_polling

CHUNKLIST = st.lists(st.sampled_from([f"c{i}" for i in range(12)]), max_size=8)
ENTS = st.lists(
    CHUNKLIST.map(lambda ch: {"sorted_chunks": ch}),
    max_size=6,
)


def _reference_fn():
    from refshim import load_reference

    ref_pkg = load_reference()
    assert ref_pkg is not None, "reference package failed to import"
    return ref_pkg.utils.pick_by_weighted_polling


@settings(max_examples=300, deadline=None)
@given(ents=ENTS, max_rel=st.integers(min_value=0, max_value=8),
       min_rel=st.integers(min_value=0, max_value=4))
def test_weighted_polling_matches_reference(ents, max_rel, min_rel):
    ref = _reference_fn()
    assert pick_by_weighted_polling(ents, max_rel, min_rel) == ref(
        ents, max_rel, min_rel
    )


def test_weighted_polling_shape_examples():
    ents = [
        {"sorted_chunks": ["a1", "a2", "a3", "a4"]},
        {"sorted_chunks": ["b1", "b2"]},
        {"sorted_chunks": ["c1", "c2", "c3"]},
    ]
    # quotas: n=3, max=3, min=1 -> expected [3, 2, 1]
    got = pick_by_weighted_polling(ents, 3, 1)
    assert got == ["a1", "a2", "a3", "b1", "b2", "c1"]
    # single entity: plain head
    assert pick_by_weighted_polling([{"sorted_chunks": ["x", "y", "z"]}], 2) == ["x", "y"]
    assert pick_by_weighted_polling([], 5) == []
    assert pick_by_weighted_polling(ents, 0) == []


def test_weighted_polling_second_round_reallocates():
    ents = [
        {"sorted_chunks": ["a1"]},            # quota 3, has 1 -> 2 remaining
        {"sorted_chunks": ["b1", "b2", "b3", "b4"]},  # quota 1
    ]
    got = pick_by_weighted_polling(ents, 3, 1)
    # first round: a1, b1; second round scans re-allocating 2 -> b2, b3
    assert got == ["a1", "b1", "b2", "b3"]


def test_build_sorted_chunks_reference_semantics():
    """Steps 2-3 of _find_related_text_unit_from_entities
    (operate.py:5740-5766) / ..._from_relations (operate.py:6009-6057):
    first-seen dedup, occurrence-count sort, exclude set, and the
    entity/relation drop_empty asymmetry."""
    from lightrag_spark.functions.chunk_pick import build_sorted_chunks

    items = [
        {"name": "e1", "chunks": ["a", "b", "shared"]},
        {"name": "e2", "chunks": ["shared", "c"]},   # shared deduped away
        {"name": "e3", "chunks": ["shared", "b"]},   # both deduped away
    ]
    out, counts = build_sorted_chunks(items)
    assert counts == {"a": 1, "b": 2, "shared": 3, "c": 1}
    # e1 keeps first-seen copies; sort is by FINAL count desc (stable):
    # shared(3) > b(2) > a(1)
    assert out[0]["sorted_chunks"] == ["shared", "b", "a"]
    assert out[1]["sorted_chunks"] == ["c"]
    # entity path keeps emptied items in the polling gradient
    assert out[2]["sorted_chunks"] == [] and len(out) == 3
    # inputs are not mutated
    assert "sorted_chunks" not in items[0]

    # relation path: exclude entity-selected ids, drop emptied relations
    out2, counts2 = build_sorted_chunks(
        items, exclude_chunk_ids=["a", "b"], drop_empty=True
    )
    assert counts2 == {"shared": 3, "c": 1}
    assert [it["sorted_chunks"] for it in out2] == [["shared"], ["c"]]

    # stable sort: equal counts keep first-seen order within an item
    out3, _ = build_sorted_chunks([{"chunks": ["x", "y", "z"]}])
    assert out3[0]["sorted_chunks"] == ["x", "y", "z"]

    assert build_sorted_chunks([]) == ([], {})


def test_round_robin_merge_chunk_ids():
    """_merge_all_chunks id-level core (operate.py:5210-5258): iteration i
    takes vector[i], entity[i], relation[i], first-seen dedup."""
    from lightrag_spark.functions.chunk_pick import round_robin_merge_chunk_ids

    got = round_robin_merge_chunk_ids(
        ["v1", "v2"], ["e1", "v1", "e2"], ["r1"]
    )
    assert got == ["v1", "e1", "r1", "v2", "e2"]
    assert round_robin_merge_chunk_ids([], [], []) == []
    assert round_robin_merge_chunk_ids(["a"], [], ["a", "b"]) == ["a", "b"]
    # empty/None ids are skipped
    assert round_robin_merge_chunk_ids(["", "a"], ["a"]) == ["a"]


def test_kg_query_context_relation_and_mix_chunks(spark):
    """The driver's chunk list draws from all three sources: relation
    chunks are disjoint from entity chunks (exclude-set dedup), and mix
    mode prepends naive vector retrieval, vector-first in the merge
    (operate.py:5210-5258)."""
    import __spark_entry__ as m
    from lightrag_spark.plans.query import kg_query_context

    r = m._build(spark, "/root/testdata/sf0.001")
    ctx, refs, dbg = kg_query_context(
        r, "network customer united_states analysis", mode="hybrid",
        top_k=8, related_chunk_number=2,
    )
    assert dbg["entity_chunk_ids"]
    assert not (set(dbg["entity_chunk_ids"]) & set(dbg["relation_chunk_ids"]))
    assert dbg["vector_chunk_ids"] == []  # hybrid has no naive branch
    # no rerank / no chunk_top_k: merged list is exactly entity ∪ relation
    assert set(dbg["chunk_ids"]) == set(
        dbg["entity_chunk_ids"] + dbg["relation_chunk_ids"]
    )

    ctx2, refs2, dbg2 = kg_query_context(
        r, "network customer united_states analysis", mode="mix",
        top_k=8, related_chunk_number=2, chunk_top_k=6,
    )
    assert dbg2["vector_chunk_ids"]
    # vector chunk leads the merged order (V slot first in iteration 0)
    assert dbg2["chunk_ids"][0] == dbg2["vector_chunk_ids"][0]
    # chunk_top_k caps the final list
    assert len(dbg2["chunk_ids"]) <= 6


def test_kg_query_context_end_to_end(spark):
    import __spark_entry__ as m
    from lightrag_spark.plans.query import kg_query_context

    r = m._build(spark, "/root/testdata/sf0.001")
    cache: dict = {}
    for mode in ("local", "global", "hybrid"):
        ctx, refs, dbg = kg_query_context(
            r, "network customer united_states analysis", mode=mode,
            top_k=8, related_chunk_number=2, keywords_cache=cache,
        )
        assert "-----Entities-----" in ctx and "-----Chunks-----" in ctx
        assert dbg["entities"], mode
        if mode != "local":
            assert dbg["relations"], mode
        assert refs, mode
    assert cache  # keywords were cached
    # VECTOR pick method also runs
    ctx, refs, dbg = kg_query_context(
        r, "network customer analysis", mode="hybrid", top_k=5,
        related_chunk_number=2, kg_chunk_pick_method="VECTOR",
    )
    assert dbg["chunk_ids"]


def test_kg_query_context_degenerate_inputs(spark):
    """Nonsense queries and empty modes must not crash the driver — the
    reference returns an empty-context failure payload; here the render
    still produces a well-formed (mostly empty) context."""
    import __spark_entry__ as m
    from lightrag_spark.plans.query import kg_query_context

    r = m._build(spark, "/root/testdata/sf0.001")
    ctx, refs, dbg = kg_query_context(
        r, "zzzz qqqq xxxx", mode="local", top_k=3, related_chunk_number=1,
    )
    assert "-----Entities-----" in ctx  # well-formed even when sparse
    # pick_chunks_by_vector degenerate args
    from lightrag_spark.plans.query import pick_chunks_by_vector

    assert pick_chunks_by_vector(None, [], "q", 5) == []
    assert pick_chunks_by_vector(None, ["c1"], "q", 0) == []


def test_kg_query_full_loop_with_answer_cache(spark):
    """The complete kg_query (plans/query.py kg_query): mock response fn,
    reference-shaped rag_response prompt, cache hit on the second call."""
    import __spark_entry__ as m
    from lightrag_spark.plans.query import kg_query
    from lightrag_spark.prompts import PROMPTS

    r = m._build(spark, "/root/testdata/sf0.001")
    calls = []

    def response_fn(user_query, system_prompt):
        calls.append((user_query, system_prompt))
        return f"ANSWER about {user_query.split()[0]}"

    cache: dict = {}
    out = kg_query(
        r, "network customer united_states analysis", mode="hybrid",
        top_k=8, related_chunk_number=2,
        response_fn=response_fn, answer_cache=cache,
    )
    assert out["content"].startswith("ANSWER about")
    assert out["cache_hit"] is False
    assert len(calls) == 1
    # the system prompt the model saw is the verbatim reference template
    # rendered around the assembled context
    uq, sp = calls[0]
    assert sp == PROMPTS["rag_response"].format(
        context_data=out["context"],
        response_type="Multiple Paragraphs",
        user_prompt="n/a",
    )
    assert "-----Entities-----" in sp

    # second identical call: served from cache, model NOT called again
    out2 = kg_query(
        r, "network customer united_states analysis", mode="hybrid",
        top_k=8, related_chunk_number=2,
        response_fn=response_fn, answer_cache=cache,
    )
    assert out2["cache_hit"] is True
    assert out2["content"] == out["content"]
    assert len(calls) == 1

    # a different parameter vector is a different cache key
    out3 = kg_query(
        r, "network customer united_states analysis", mode="hybrid",
        top_k=8, related_chunk_number=2, response_type="Bullet Points",
        response_fn=response_fn, answer_cache=cache,
    )
    assert out3["cache_hit"] is False
    assert out3["args_hash"] != out["args_hash"]
    assert len(calls) == 2

    # a DIFFERENT model sharing the same answer_cache must not be served
    # the first model's answer: identity is folded into the cache key
    other_calls = []

    def other_model(user_query, system_prompt):
        other_calls.append(user_query)
        return "OTHER MODEL ANSWER"

    out4 = kg_query(
        r, "network customer united_states analysis", mode="hybrid",
        top_k=8, related_chunk_number=2,
        response_fn=other_model, answer_cache=cache,
    )
    assert out4["cache_hit"] is False
    assert out4["args_hash"] != out["args_hash"]
    assert out4["content"] == "OTHER MODEL ANSWER"
    assert len(other_calls) == 1

    # an explicit model_identity overrides the derived one and keys alone
    out5 = kg_query(
        r, "network customer united_states analysis", mode="hybrid",
        top_k=8, related_chunk_number=2,
        response_fn=other_model, model_identity="modelX",
        answer_cache=cache,
    )
    assert out5["args_hash"] not in (out["args_hash"], out4["args_hash"])


def test_kg_query_prompt_and_degenerate_paths(spark):
    import __spark_entry__ as m
    from lightrag_spark.plans.query import kg_query
    from lightrag_spark.prompts import PROMPTS

    r = m._build(spark, "/root/testdata/sf0.001")
    # only_need_prompt: stops before the model; prompt carries the query
    out = kg_query(
        r, "network analysis", mode="local", top_k=4, related_chunk_number=1,
        only_need_prompt=True,
    )
    assert out["content"].endswith("---User Query---\n\nnetwork analysis")
    assert "---Role---" in out["content"]
    # only_need_context returns the raw context string
    out = kg_query(
        r, "network analysis", mode="local", top_k=4, related_chunk_number=1,
        only_need_context=True,
    )
    assert "-----Entities-----" in out["content"]
    # empty query fails closed with the reference's literal fail string
    assert kg_query(r, "")["content"] == PROMPTS["fail_response"]
    # keywordless long query fails closed too
    long_junk = "zq " * 40
    out = kg_query(r, long_junk, keyword_model_fn=lambda q: "not json at all")
    assert out["content"] == PROMPTS["fail_response"]
    # keywordless short query falls back to the raw query as ll keyword
    out = kg_query(
        r, "zq zq", keyword_model_fn=lambda q: "not json",
        only_need_context=True,
    )
    assert out["ll_keywords"] == ["zq zq"]
    # missing response_fn is a clear error, not a silent None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="response_fn"):
        kg_query(r, "network analysis", top_k=3)
