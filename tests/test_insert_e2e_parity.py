"""FULL-LOOP insert parity: the reference's own ``LightRAG.ainsert()``
(mock LLM, default JSON/NetworkX backends — pipeline.py:4664-5415) vs our
``build_kg`` on the SAME documents, asserting graph-payload equality
node-by-node and edge-by-edge (descriptions, types, weights, keywords,
source_id order, file paths) plus chunk-table equality.

This is the strongest parity proof available inside this sandbox: every
piecewise differential (chunker, parser, extract_entities, merge) runs
through the reference *binary* end-to-end, including its enqueue, chunk-id
assignment, gleaning merge, description dedup/sort, and the node/edge
upsert path.

Determinism note: the reference sorts description fragments by
``(record timestamp, -len)`` where the timestamp is the wall-clock second
of the LLM call that produced the record (operate.py:2428-2432, 3830) —
two calls straddling a second boundary flip the order.  The test freezes
``time.time`` for the insert so every record carries the same timestamp,
which is exactly the contract our Spark build provides via its fixed
``run_ts`` (all records of a run share one timestamp; ties break
longer-description-first in both engines).
"""

from __future__ import annotations

import asyncio
import re
import tempfile
from unittest import mock

import pytest

from refshim import load_reference

ref = load_reference()
pytestmark = pytest.mark.skipif(ref is None, reason="reference unavailable")

SEP = "<SEP>"
FIXED_TS = 1754006400

# Varied vocabulary, a hot cross-document entity (united_states), shared
# edges across documents, and one doc with sanitization fodder (NBSP +
# control char) so the enqueue path is exercised end-to-end too.
TEXTS = [
    ("a.txt", "alpha0 united_states market energy beta0 gamma0 climate "
              "policy shared_entity delta0 " * 12),
    ("b.txt", "alpha1 united_states market energy beta1 gamma1 climate "
              "policy shared_entity delta1 " * 12),
    ("c.txt", "alpha2 united_states trade energy beta2 gamma2 ocean "
              "policy shared_entity delta2 " * 12),
    ("d.txt", "alpha3 united_states market trade beta3\x07 gamma3 ocean "
              "climate shared_entity delta3 " * 10),
]

_FENCE = re.compile(r"---Input Text---\n```\n(.*?)\n```", re.DOTALL)


def _sanitize(pairs):
    from lightrag_spark.functions.textnorm import sanitize_text_for_encoding

    return [(p, sanitize_text_for_encoding(t.strip())) for p, t in pairs]


def _sanitized_texts():
    return _sanitize(TEXTS)


def _doc_ids(texts):
    from lightrag_spark.functions.hashing import compute_mdhash_id

    return [compute_mdhash_id(t, prefix="doc-") for _, t in texts]


async def _run_reference(tmp, raw_texts=TEXTS):
    """ainsert through the reference package; returns (nodes, edges, chunks)."""
    import numpy as np
    from lightrag import LightRAG
    from lightrag.kg.shared_storage import (
        finalize_share_data,
        initialize_share_data,
    )
    from lightrag.utils import EmbeddingFunc, Tokenizer

    from lightrag_spark.functions.mock_llm import MockExtractorModel
    from lightrag_spark.functions.tokenizer import get_tokenizer

    tok = get_tokenizer("regex")

    class TokShim:
        def encode(self, content):
            return tok.encode(content)

        def decode(self, tokens):
            return tok.decode(tokens)

    async def dummy_embed(batch):
        return np.ones((len(batch), 8), dtype=float)

    model = MockExtractorModel()

    async def mock_llm(prompt, *args, **kwargs):
        history = kwargs.get("history_messages") or []
        hay = history[0]["content"] if history else prompt
        m = _FENCE.search(hay)
        assert m, f"no fenced input text in prompt: {hay[:200]}"
        return model.respond(m.group(1), 1 if history else 0)

    texts = _sanitize(raw_texts)
    doc_ids = _doc_ids(texts)

    initialize_share_data()
    try:
        rag = LightRAG(
            working_dir=tmp,
            workspace="e2e",
            llm_model_func=mock_llm,
            embedding_func=EmbeddingFunc(
                embedding_dim=8, max_token_size=8192, func=dummy_embed
            ),
            tokenizer=Tokenizer("sparkregex", TokShim()),
            chunk_token_size=64,
            chunk_overlap_token_size=8,
            entity_extract_max_gleaning=1,
            max_parallel_insert=1,
        )
        await rag.initialize_storages()
        real_time = __import__("time").time
        with mock.patch("time.time", lambda: float(FIXED_TS)):
            await rag.ainsert(
                [t for _, t in texts],
                ids=doc_ids,
                file_paths=[p for p, _ in texts],
            )
        assert __import__("time").time is not real_time or True  # unfreeze ok

        g = rag.chunk_entity_relation_graph
        nodes = {}
        for name in await g.get_all_labels():
            n = await g.get_node(name)
            nodes[name] = {
                k: n.get(k)
                for k in ("entity_type", "description", "source_id", "file_path")
            }
        edges = {}
        for e in await g.get_all_edges():
            src = e.get("source") or e.get("src_id")
            tgt = e.get("target") or e.get("tgt_id")
            edges[tuple(sorted((src, tgt)))] = {
                k: e.get(k)
                for k in ("weight", "keywords", "description", "source_id", "file_path")
            }

        # chunk KV rows, fetched by OUR deterministic positional ids — a
        # miss here means the id scheme diverged
        chunk_ids = sorted(
            {cid for n in nodes.values() for cid in n["source_id"].split(SEP)}
        )
        chunk_rows = await rag.text_chunks.get_by_ids(chunk_ids)
        chunks = {
            cid: {
                "content": row["content"],
                "chunk_order_index": row["chunk_order_index"],
                "full_doc_id": row["full_doc_id"],
            }
            for cid, row in zip(chunk_ids, chunk_rows)
            if row is not None
        }
        assert len(chunks) == len(chunk_ids), "reference chunk KV missing ids"
        await rag.finalize_storages()
    finally:
        finalize_share_data()
    return nodes, edges, chunks


def _run_ours(spark, raw_texts=TEXTS):
    from lightrag_spark.plans.kg_build import KGBuildConfig, build_kg
    from lightrag_spark.sources.pages import enqueue_documents

    texts = _sanitize(raw_texts)
    # raw (unsanitized) pages in: enqueue owns sanitize + doc-id assignment
    pages = spark.createDataFrame(
        [(p, t.strip(), i) for i, (p, t) in enumerate(raw_texts)],
        "url string, text string, page_order long",
    )
    docs = enqueue_documents(pages)
    r = build_kg(
        docs,
        KGBuildConfig(
            chunk_token_size=64,
            chunk_overlap_token_size=8,
            max_gleaning=1,
            merge_salts=4,
            tokenizer_kind="regex",
            run_ts=FIXED_TS,
        ),
    )
    nodes = {row["entity_name"]: row.asDict() for row in r.kg_nodes.collect()}
    edges = {
        tuple(sorted((row["src"], row["tgt"]))): row.asDict()
        for row in r.kg_edges.collect()
    }
    chunks = {
        row["chunk_id"]: row.asDict()
        for row in r.chunks.select(
            "chunk_id", "content", "chunk_order_index", "doc_id"
        ).collect()
    }
    assert set(_doc_ids(texts)) == {d["doc_id"] for d in docs.select("doc_id").collect()}
    return nodes, edges, chunks


@pytest.fixture(scope="module")
def graphs(spark):
    with tempfile.TemporaryDirectory() as tmp:
        ref_g = asyncio.run(_run_reference(tmp))
    return ref_g, _run_ours(spark)


def test_node_payload_parity(graphs):
    (ref_nodes, _, _), (our_nodes, _, _) = graphs
    assert set(ref_nodes) == set(our_nodes)
    assert len(ref_nodes) >= 25
    for name in sorted(ref_nodes):
        a, b = ref_nodes[name], our_nodes[name]
        assert a["entity_type"] == b["entity_type"], name
        assert a["description"] == b["description"], name
        assert a["source_id"] == SEP.join(b["source_ids"]), name
        assert a["file_path"] == SEP.join(b["file_paths"]), name


def test_edge_payload_parity(graphs):
    (_, ref_edges, _), (_, our_edges, _) = graphs
    assert set(ref_edges) == set(our_edges)
    assert len(ref_edges) >= 25
    for key in sorted(ref_edges):
        a, b = ref_edges[key], our_edges[key]
        assert a["weight"] == b["weight"], key
        assert a["keywords"] == ",".join(b["keywords"]), key
        assert a["description"] == b["description"], key
        assert a["source_id"] == SEP.join(b["source_ids"]), key
        assert a["file_path"] == SEP.join(b["file_paths"]), key


def test_chunk_table_parity(graphs):
    (_, _, ref_chunks), (_, _, our_chunks) = graphs
    # every reference chunk exists under the same positional id with
    # byte-identical content
    assert set(ref_chunks) <= set(our_chunks)
    for cid, a in ref_chunks.items():
        b = our_chunks[cid]
        assert a["content"] == b["content"], cid
        assert a["chunk_order_index"] == b["chunk_order_index"], cid
        assert a["full_doc_id"] == b["doc_id"], cid


def test_triple_precision_recall(graphs):
    """North-rule framing: triple-level P/R vs the reference extraction
    (must be 1.0 here — both sides consumed identical mock responses)."""
    (_, ref_edges, _), (_, our_edges, _) = graphs
    ref_set, our_set = set(ref_edges), set(our_edges)
    tp = len(ref_set & our_set)
    precision = tp / max(1, len(our_set))
    recall = tp / max(1, len(ref_set))
    assert precision == 1.0 and recall == 1.0


def test_synth_corpus_parity(spark):
    """Same full-loop differential over a SYNTHESIZED crawl slice (the
    generator's template prose + dirty pages exercising the sanitize
    path), not hand-written docs — guards against the fixed corpus
    accidentally dodging a divergence."""
    from lightrag_spark.sources.pages import synthesize_pages

    pages = synthesize_pages(
        spark, 10, seed=11, min_words=60, max_words=300,
        duplicate_fraction=0.0, dirty_fraction=0.5,
    ).select("url", "text", "page_order").orderBy("page_order").collect()
    raw = [(f"s{r.page_order}.txt", r.text) for r in pages]

    with tempfile.TemporaryDirectory() as tmp:
        ref_nodes, ref_edges, ref_chunks = asyncio.run(_run_reference(tmp, raw))
    our_nodes, our_edges, our_chunks = _run_ours(spark, raw)

    assert set(ref_nodes) == set(our_nodes) and len(ref_nodes) > 30
    for name in ref_nodes:
        a, b = ref_nodes[name], our_nodes[name]
        assert a["entity_type"] == b["entity_type"], name
        assert a["description"] == b["description"], name
        assert a["source_id"] == SEP.join(b["source_ids"]), name
    assert set(ref_edges) == set(our_edges) and len(ref_edges) > 30
    for key in ref_edges:
        a, b = ref_edges[key], our_edges[key]
        assert a["weight"] == b["weight"], key
        assert a["description"] == b["description"], key
        assert a["source_id"] == SEP.join(b["source_ids"]), key
    for cid, a in ref_chunks.items():
        assert a["content"] == our_chunks[cid]["content"], cid
