"""End-to-end extraction parity vs the reference's OWN extract_entities.

Runs /root/reference's ``extract_entities`` (operate.py:3658) with a mocked
LLM that serves our deterministic MockExtractorModel responses (initial +
gleaning pass), then runs OUR extraction path on the same chunks with the
same model — and computes triple-level P/R between the two.  This is the
north rule's "P/R >= 0.95 vs reference LightRAG extraction" measured
against the reference binary itself, including its gleaning merge and
response parsing, not just the ported parser.
"""

from __future__ import annotations

import asyncio
from unittest.mock import AsyncMock

import pytest

from lightrag_spark.functions.extraction_parser import (
    merge_gleaning,
    parse_extraction_result,
)
from lightrag_spark.functions.mock_llm import MockExtractorModel
from refshim import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")

CHUNK_TEXTS = {
    f"chunk-{i:03d}": (
        f"alpha{i} united_states market energy beta{i} gamma{i % 3} "
        f"climate policy shared_entity delta{i} " * 3
    )
    for i in range(6)
}


def _ref_extract(model: MockExtractorModel):
    import lightrag.operate as ro
    from lightrag.utils import Tokenizer, TokenizerInterface

    class DummyTokenizer(TokenizerInterface):
        def encode(self, content: str):
            return [ord(c) for c in content]

        def decode(self, tokens):
            return "".join(chr(t) for t in tokens)

    def find_chunk(text: str) -> str:
        for content in CHUNK_TEXTS.values():
            if content in text:
                return content
        raise AssertionError("chunk content not found in prompt")

    def side_effect(prompt, *args, **kwargs):
        history = kwargs.get("history_messages") or []
        if history:
            return model.respond(find_chunk(history[0]["content"]), 1)
        return model.respond(find_chunk(prompt), 0)

    llm = AsyncMock(side_effect=side_effect)
    global_config = {
        "llm_model_func": llm,
        "role_llm_funcs": {k: llm for k in ("extract", "keyword", "query", "vlm")},
        "entity_extract_max_gleaning": 1,
        "entity_extract_max_records": 100,
        "entity_extract_max_entities": 40,
        "addon_params": {},
        "tokenizer": Tokenizer("dummy", DummyTokenizer()),
        "llm_model_max_async": 1,
    }
    chunks = {
        cid: {
            "tokens": len(text),
            "content": text,
            "full_doc_id": f"doc-{cid}",
            "chunk_order_index": 0,
        }
        for cid, text in CHUNK_TEXTS.items()
    }
    results = asyncio.run(
        ro.extract_entities(chunks=chunks, global_config=global_config)
    )
    return results, llm


def _ours_extract(model: MockExtractorModel):
    out = {}
    for cid, text in CHUNK_TEXTS.items():
        n0, e0 = parse_extraction_result(model.respond(text, 0), cid, 0, "f")
        n1, e1 = parse_extraction_result(model.respond(text, 1), cid, 0, "f")
        out[cid] = merge_gleaning(n0, e0, n1, e1)
    return out


def _norm_nodes(nodes):
    return {
        name: sorted((r["entity_type"], r["description"]) for r in recs)
        for name, recs in nodes.items()
    }


def _norm_edges(edges):
    return {
        tuple(k): sorted((r["keywords"], r["description"], r["weight"]) for r in recs)
        for k, recs in edges.items()
    }


def test_extract_entities_parity_and_pr():
    model = MockExtractorModel(corruption=True)
    ref_results, llm = _ref_extract(model)
    ours = _ours_extract(model)

    # the reference made exactly 2 calls per chunk (initial + gleaning)
    assert llm.await_count == 2 * len(CHUNK_TEXTS)

    ref_pairs, our_pairs = set(), set()
    matched_chunks = 0
    for item in ref_results:
        nodes, edges = item[0], item[1]
        cid = None
        for recs in nodes.values():
            cid = recs[0]["source_id"]
            break
        assert cid in ours
        my_nodes, my_edges = ours[cid]
        assert _norm_nodes(nodes) == _norm_nodes(my_nodes), cid
        assert _norm_edges(edges) == _norm_edges(my_edges), cid
        matched_chunks += 1
        ref_pairs.update((cid, *k) for k in edges)
        our_pairs.update((cid, *k) for k in my_edges)

    assert matched_chunks == len(CHUNK_TEXTS)
    tp = len(ref_pairs & our_pairs)
    precision = tp / max(1, len(our_pairs))
    recall = tp / max(1, len(ref_pairs))
    assert precision == 1.0 and recall == 1.0
    assert len(ref_pairs) > 20
