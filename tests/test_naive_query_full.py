"""The full naive_query loop (plans/query.py naive_query) — reference
parity for the frequency-prioritized reference list + chunk-context render
(utils.py:6262-6350, hypothesis differential against the reference's own
functions), and the end-to-end loop: dynamic token budget, naive context
render, answer cache, pluggable model hook (operate.py:6145-6430)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lightrag_spark.plans.context import (
    generate_reference_list_from_chunks,
    render_chunks_context_text,
)

FP = st.sampled_from(["a.txt", "b.txt", "c.txt", "unknown_source", ""])
CHUNK = st.fixed_dictionaries(
    {"file_path": FP, "content": st.text(max_size=20)},
    optional={"content_headings": st.sampled_from(["", "H1 > H2"])},
)


def _reference_fns():
    from refshim import load_reference

    ref_pkg = load_reference()
    assert ref_pkg is not None, "reference package failed to import"
    return (
        ref_pkg.utils.generate_reference_list_from_chunks,
        ref_pkg.utils.render_chunks_context_text,
    )


@settings(max_examples=300, deadline=None)
@given(chunks=st.lists(CHUNK, max_size=10))
def test_reference_list_matches_reference(chunks):
    ref_gen, ref_render = _reference_fns()
    got_list, got_chunks = generate_reference_list_from_chunks(
        [dict(c) for c in chunks]
    )
    want_list, want_chunks = ref_gen([dict(c) for c in chunks])
    assert got_list == want_list
    assert got_chunks == want_chunks
    assert render_chunks_context_text(got_chunks) == ref_render(want_chunks)


def _chunks_df(spark):
    import __spark_entry__ as m

    r = m._build(spark, "/root/testdata/sf0.001")
    return r.chunks


def test_naive_query_full_loop_with_answer_cache(spark):
    from lightrag_spark.plans.query import naive_query
    from lightrag_spark.prompts import PROMPTS

    chunks = _chunks_df(spark)
    calls = []

    def response_fn(user_query, system_prompt):
        calls.append((user_query, system_prompt))
        return f"NAIVE ANSWER about {user_query.split()[0]}"

    cache: dict = {}
    out = naive_query(
        chunks, "customer network analysis", top_k=5,
        response_fn=response_fn, answer_cache=cache,
    )
    assert out is not None
    assert out["content"].startswith("NAIVE ANSWER")
    assert out["cache_hit"] is False
    assert len(calls) == 1

    # the system prompt the model saw is the verbatim naive_rag_response
    # template rendered around the naive chunk context
    uq, sp = calls[0]
    assert sp == PROMPTS["naive_rag_response"].format(
        content_data=out["context"],
        response_type="Multiple Paragraphs",
        user_prompt="n/a",
    )
    # the context is the verbatim naive_query_context template with a
    # frequency-prioritized reference list
    assert "Document Chunks" in out["context"]
    assert out["references"], "retrieval hits must yield references"
    assert out["references"][0]["reference_id"] == "1"
    assert '"reference_id": "1"' in out["context"]

    # second identical call: cache hit, model NOT called again
    out2 = naive_query(
        chunks, "customer network analysis", top_k=5,
        response_fn=response_fn, answer_cache=cache,
    )
    assert out2["cache_hit"] is True
    assert out2["content"] == out["content"]
    assert len(calls) == 1

    # different response_type = different cache key
    out3 = naive_query(
        chunks, "customer network analysis", top_k=5,
        response_type="Bullet Points",
        response_fn=response_fn, answer_cache=cache,
    )
    assert out3["cache_hit"] is False
    assert out3["args_hash"] != out["args_hash"]
    assert len(calls) == 2


def test_naive_query_prompt_context_and_degenerate_paths(spark):
    from lightrag_spark.plans.query import naive_query
    from lightrag_spark.prompts import PROMPTS

    chunks = _chunks_df(spark)

    # empty query -> fail_response verbatim (operate.py:6201-6202)
    out = naive_query(chunks, "")
    assert out["content"] == PROMPTS["fail_response"]

    # only_need_context stops before the prompt; no model required
    ctx = naive_query(chunks, "customer network", top_k=3, only_need_context=True)
    assert ctx["content"] == ctx["context"]
    assert "Document Chunks" in ctx["content"]

    # only_need_prompt: system prompt + ---User Query--- trailer
    pr = naive_query(chunks, "customer network", top_k=3, only_need_prompt=True)
    assert pr["content"].endswith("---User Query---\n\ncustomer network")

    # missing response_fn when an answer is demanded -> explicit error
    import pytest

    with pytest.raises(ValueError, match="response_fn"):
        naive_query(chunks, "customer network", top_k=3)

    # empty retrieval (impossible similarity cutoff via empty table) -> None
    empty = chunks.limit(0)
    assert naive_query(empty, "customer network", top_k=3) is None


def test_naive_query_rerank_reorders_context(spark):
    """enable_rerank routes chunks through the pluggable scorer before the
    reference list is built (process_chunks_unified, utils.py:5601-5707)."""
    from lightrag_spark.operators.rerank import lexical_rerank_fn
    from lightrag_spark.plans.query import naive_query

    chunks = _chunks_df(spark)
    plain = naive_query(
        chunks, "customer network analysis", top_k=6, only_need_context=True
    )
    rr = naive_query(
        chunks, "customer network analysis", top_k=6, only_need_context=True,
        enable_rerank=True, rerank_fn=lexical_rerank_fn,
        min_rerank_score=0.0, chunk_top_k=3,
    )
    assert rr is not None and plain is not None
    # chunk_top_k caps the context at 3 rendered chunk lines
    body = rr["context"].split("```")[1]
    n_lines = len([ln for ln in body.splitlines() if ln.startswith("{")])
    assert 0 < n_lines <= 3
