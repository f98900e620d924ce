"""query_data — the structured retrieval API (lightrag.py:3701 aquery_data,
utils.py:6138 convert_to_user_format).  Schema parity for every mode, the
bypass/failure contracts, and the invariant that the reported chunks are
exactly the budget-admitted LLM-context chunks."""

from __future__ import annotations

import pytest

from lightrag_spark.constants import GRAPH_FIELD_SEP
from lightrag_spark.plans.query_data import convert_to_user_format, query_data

ENTITY_FIELDS = {
    "entity_name", "entity_type", "description", "source_id", "file_path",
    "created_at",
}
RELATION_FIELDS = {
    "src_id", "tgt_id", "description", "keywords", "weight", "source_id",
    "file_path", "created_at",
}
CHUNK_FIELDS = {"reference_id", "content", "file_path", "chunk_id"}


@pytest.fixture(scope="module")
def kg(spark):
    import __spark_entry__ as m

    return m._build(spark, "/root/testdata/sf0.001")


def test_convert_to_user_format_field_fallbacks():
    out = convert_to_user_format(
        [{"entity_name": "A", "source_ids": ["c1", "c2"]}],
        [{"src": "A", "tgt": "B", "keywords": ["x", "y"], "weight": None}],
        [{"chunk_id": "c1", "content": "t", "file_path": None}],
        [{"reference_id": 1, "file_path": "f.txt"}],
        "hybrid",
    )
    assert out["status"] == "success"
    e = out["data"]["entities"][0]
    assert e["entity_type"] == "UNKNOWN"
    assert e["source_id"] == "c1" + GRAPH_FIELD_SEP + "c2"
    assert e["file_path"] == "unknown_source"
    r = out["data"]["relationships"][0]
    assert r["keywords"] == "x, y"
    assert r["weight"] == 1.0
    c = out["data"]["chunks"][0]
    assert c["file_path"] == "unknown_source"
    assert out["data"]["references"][0]["reference_id"] == "1"
    assert out["metadata"]["query_mode"] == "hybrid"


def test_query_data_hybrid_structure(kg):
    out = query_data(kg, "network customer united_states analysis", mode="hybrid")
    assert out["status"] == "success"
    data = out["data"]
    assert data["entities"] and data["relationships"] and data["chunks"]
    for e in data["entities"]:
        assert set(e) == ENTITY_FIELDS
        assert e["entity_name"]
    for r in data["relationships"]:
        assert set(r) == RELATION_FIELDS
        assert isinstance(r["weight"], float)
    for c in data["chunks"]:
        assert set(c) == CHUNK_FIELDS
    # chunks reported = budget-admitted context chunks, each resolving into
    # the reference list
    ref_ids = {ref["reference_id"] for ref in data["references"]}
    for c in data["chunks"]:
        assert c["reference_id"] in ref_ids
    pi = out["metadata"]["processing_info"]
    assert pi["final_chunks_count"] == len(data["chunks"])
    assert pi["merged_chunks_count"] >= pi["final_chunks_count"]
    assert pi["total_entities_found"] >= pi["entities_after_truncation"]
    kw = out["metadata"]["keywords"]
    assert set(kw) == {"high_level", "low_level"}


def test_query_data_modes_subset(kg):
    hybrid = query_data(kg, "network customer united_states analysis", mode="hybrid")
    local = query_data(kg, "network customer united_states analysis", mode="local")
    glob = query_data(kg, "network customer united_states analysis", mode="global")
    h_ents = {e["entity_name"] for e in hybrid["data"]["entities"]}
    assert {e["entity_name"] for e in local["data"]["entities"]} <= h_ents | set()
    assert local["metadata"]["query_mode"] == "local"
    assert glob["metadata"]["query_mode"] == "global"
    # hybrid interleaves both sides: at least as many entities as either
    assert len(hybrid["data"]["entities"]) >= len(local["data"]["entities"])


def test_query_data_naive(kg):
    out = query_data(kg, "network customer united_states analysis", mode="naive", top_k=5)
    assert out["status"] == "success"
    assert out["data"]["entities"] == []
    assert out["data"]["relationships"] == []
    assert out["data"]["chunks"]
    for c in out["data"]["chunks"]:
        assert set(c) == CHUNK_FIELDS
    pi = out["metadata"]["processing_info"]
    assert pi["final_chunks_count"] == len(out["data"]["chunks"])
    assert out["metadata"]["query_mode"] == "naive"


def test_query_data_bypass_and_failure(kg):
    out = query_data(kg, "anything", mode="bypass")
    assert out["status"] == "success"
    assert out["data"] == {
        "entities": [], "relationships": [], "chunks": [], "references": []
    }
    assert out["metadata"]["query_mode"] == "bypass"

    fail = query_data(kg, "", mode="hybrid")
    assert fail["status"] == "failure"
    assert fail["metadata"]["failure_reason"] == "no_results"

    with pytest.raises(ValueError):
        query_data(kg, "x", mode="nope")


def test_kg_query_bypass_mode(kg):
    from lightrag_spark.plans.query import kg_query

    calls = []

    def model(q, sys_prompt):
        calls.append((q, sys_prompt))
        return "direct answer"

    r = kg_query(kg, "what is up", mode="bypass", response_fn=model)
    assert r["content"] == "direct answer"
    assert calls == [("what is up", None)]
    assert r["context"] is None


def test_query_llm_combined(kg):
    from lightrag_spark.plans.query_data import query_llm

    def model(q, sys_prompt):
        return f"ANSWER({len(sys_prompt or '')})"

    out = query_llm(
        kg, "network customer united_states analysis", mode="hybrid",
        response_fn=model,
    )
    assert out["status"] == "success"
    assert out["data"]["entities"]
    llm = out["llm_response"]
    assert llm["is_streaming"] is False and llm["response_iterator"] is None
    assert llm["content"].startswith("ANSWER(")

    # failure shape carries fail_response as the answer
    fail = query_llm(kg, "", mode="hybrid", response_fn=model)
    assert fail["status"] == "failure"
    assert fail["llm_response"]["content"]

    # bypass: model called with no system prompt, empty data
    byp = query_llm(kg, "hello", mode="bypass", response_fn=model)
    assert byp["llm_response"]["content"] == "ANSWER(0)"
    assert byp["data"]["entities"] == []


def test_conversation_history_bypasses_cache(kg):
    """operate.py:4156-4190: history-conditioned answers never read from
    or write to the answer cache; the history reaches the model hook as
    history_messages."""
    from lightrag_spark.plans.query import kg_query

    seen = []

    def model(q, sys_prompt, history_messages=None):
        seen.append(history_messages)
        return f"answer-{len(seen)}"

    cache: dict = {}
    q = "network customer united_states analysis"
    r1 = kg_query(kg, q, mode="local", response_fn=model, answer_cache=cache)
    assert r1["content"] == "answer-1" and cache  # cached, no history
    r2 = kg_query(kg, q, mode="local", response_fn=model, answer_cache=cache)
    assert r2["cache_hit"] is True  # warm

    hist = [{"role": "user", "content": "earlier turn"}]
    r3 = kg_query(
        kg, q, mode="local", response_fn=model, answer_cache=cache,
        conversation_history=hist,
    )
    assert r3["cache_hit"] is False and r3["content"] == "answer-2"
    assert seen[-1] == hist  # history reached the model
    assert len(cache) == 1  # the history answer was NOT written

    # a 2-arg model hook still works with history (no kwargs leak)
    def plain_model(q2, s2):
        return "plain"

    r4 = kg_query(
        kg, q, mode="local", response_fn=plain_model, conversation_history=hist,
    )
    assert r4["content"] == "plain"

    # bypass forwards history too
    r5 = kg_query(kg, "hi", mode="bypass", response_fn=model,
                  conversation_history=hist)
    assert seen[-1] == hist and r5["content"].startswith("answer-")
