"""Single-threaded reference-semantics oracle for the KG build pipeline.

An independent, dict-based reimplementation of the reference insert path
(chunk -> extract -> merge; /root/reference/lightrag/operate.py:3304-3655)
that deliberately does NOT share the Spark dataflow: it loops documents in
order and merges with plain dicts, exactly like the reference's
single-process engine.  It *does* share the leaf parity functions
(parser, normalizer, chunker core, summarizer core) — those are ported
verbatim-semantics and differentially tested against the reference package
itself in test_reference_parity.py.

The Spark pipeline must reproduce this oracle's kg_nodes / kg_edges exactly
(P/R = 1.0 on pairs, full payload equality) — that is what proves the
distributed aggregation (salting, two-phase caps, carried order keys) is
exact and not approximate.
"""

from __future__ import annotations

from collections import Counter

from lightrag_spark.constants import (
    GRAPH_FIELD_SEP,
    MAX_DESCRIPTION_FRAGMENTS,
    MAX_FILE_PATHS,
    MAX_SOURCE_IDS,
    UNKNOWN_ENTITY_TYPE,
)
from lightrag_spark.functions.chunking_core import chunk_id_for, chunk_text_by_tokens
from lightrag_spark.functions.extraction_parser import (
    merge_gleaning,
    parse_extraction_result,
)
from lightrag_spark.functions.mock_llm import MockExtractorModel
from lightrag_spark.functions.summary_core import summarize_description_list
from lightrag_spark.functions.tokenizer import get_tokenizer


def _ordered_dedup(values, cap):
    seen, out = set(), []
    for v in values:
        if v and v not in seen:
            seen.add(v)
            out.append(v)
            if len(out) >= cap:
                break
    return out


def oracle_build_kg(
    docs,
    tokenizer_kind="regex",
    chunk_token_size=1200,
    chunk_overlap_token_size=100,
    max_gleaning=1,
    run_ts=1754006400,
    model_min_len=5,
    model_corruption=False,
    max_fragments=MAX_DESCRIPTION_FRAGMENTS,
):
    """docs: list of dicts (doc_id, text, file_path, doc_order) -> dict of tables."""
    tokenizer = get_tokenizer(tokenizer_kind)
    model = MockExtractorModel(min_len=model_min_len, corruption=model_corruption)

    all_nodes: dict[str, list[dict]] = {}
    all_edges: dict[tuple[str, str], list[dict]] = {}
    chunk_rows = []

    for doc in sorted(docs, key=lambda d: d["doc_order"]):
        pieces = chunk_text_by_tokens(
            tokenizer,
            doc["text"],
            chunk_overlap_token_size=chunk_overlap_token_size,
            chunk_token_size=chunk_token_size,
        )
        for piece in pieces:
            chunk_id = chunk_id_for(doc["doc_id"], piece["chunk_order_index"])
            chunk_rows.append(
                {
                    "chunk_id": chunk_id,
                    "doc_id": doc["doc_id"],
                    "chunk_order_index": piece["chunk_order_index"],
                    "tokens": piece["tokens"],
                    "content": piece["content"],
                }
            )
            nodes, edges = parse_extraction_result(
                model.respond(piece["content"], 0), chunk_id, run_ts, doc["file_path"]
            )
            if max_gleaning > 0:
                g_nodes, g_edges = parse_extraction_result(
                    model.respond(piece["content"], 1), chunk_id, run_ts, doc["file_path"]
                )
                nodes, edges = merge_gleaning(nodes, edges, g_nodes, g_edges)
            for name, recs in nodes.items():
                for r in recs:
                    r["_doc_i"] = doc["doc_order"]
                all_nodes.setdefault(name, []).extend(recs)
            for pair, recs in edges.items():
                key = tuple(sorted(pair))  # undirected identity (operate.py:3383-3386)
                for r in recs:
                    r["_doc_i"] = doc["doc_order"]
                all_edges.setdefault(key, []).extend(recs)

    kg_nodes = {}
    for name, recs in all_nodes.items():
        # entity_type: majority vote, stable ties (operate.py:2409-2415)
        counts = Counter(r["entity_type"] for r in recs)
        entity_type = sorted(counts.items(), key=lambda kv: kv[1], reverse=True)[0][0]
        source_ids = _ordered_dedup((r["source_id"] for r in recs), MAX_SOURCE_IDS)
        file_paths = _ordered_dedup((r["file_path"] for r in recs), MAX_FILE_PATHS)
        # descriptions: keep-first dedup, then DOC-EPOCH append ordering —
        # the reference merges one document at a time and appends unseen
        # fragments (operate.py:2436 _combine_descriptions_dedup), so the
        # first producing doc fixes position; within an epoch the sort is
        # stable (ts, -len) (operate.py:2417-2432).
        uniq = {}
        for r in recs:
            d = r.get("description")
            if d and d not in uniq:
                uniq[d] = r
        ordered = sorted(
            uniq.values(),
            key=lambda r: (r["_doc_i"], r["timestamp"], -len(r["description"])),
        )
        fragments = [r["description"] for r in ordered][:max_fragments]
        if not fragments:
            fragments = [f"Entity {name}"]
        description, llm_used = summarize_description_list(
            "Entity", name, fragments, tokenizer
        )
        kg_nodes[name] = {
            "entity_name": name,
            "entity_type": entity_type,
            "description": description,
            "descriptions": fragments,
            "source_ids": source_ids,
            "file_paths": file_paths,
            "mention_count": len(recs),
            "created_at": run_ts,
        }

    kg_edges = {}
    for (src, tgt), recs in sorted(all_edges.items()):
        weight = sum(r["weight"] for r in recs)
        kw = set()
        for r in recs:
            if r.get("keywords"):
                kw.update(k.strip() for k in r["keywords"].split(",") if k.strip())
        source_ids = _ordered_dedup((r["source_id"] for r in recs), MAX_SOURCE_IDS)
        file_paths = _ordered_dedup((r["file_path"] for r in recs), MAX_FILE_PATHS)
        uniq = {}
        for r in recs:
            d = r.get("description")
            if d and d not in uniq:
                uniq[d] = r
        # doc-epoch append ordering, same contract as the node merge
        ordered = sorted(
            uniq.values(),
            key=lambda r: (r["_doc_i"], r["timestamp"], -len(r["description"])),
        )
        fragments = [r["description"] for r in ordered][:max_fragments]
        description, llm_used = summarize_description_list(
            "Relation", f"({src}, {tgt})", fragments, tokenizer
        )
        kg_edges[(src, tgt)] = {
            "src": src,
            "tgt": tgt,
            "weight": weight,
            "keywords": sorted(kw),
            "description": description,
            "descriptions": fragments,
            "source_ids": source_ids,
            "file_paths": file_paths,
            "relation_count": len(recs),
            "created_at": run_ts,
        }

    # UNKNOWN endpoint nodes (operate.py:2955-3037), deterministic order:
    # first incident edge by (created_at, src, tgt).
    for (src, tgt), edge in sorted(kg_edges.items()):
        for endpoint in (src, tgt):
            if endpoint in kg_nodes:
                continue
            kg_nodes[endpoint] = {
                "entity_name": endpoint,
                "entity_type": UNKNOWN_ENTITY_TYPE,
                "description": edge["description"],
                "descriptions": [edge["description"]],
                "source_ids": list(edge["source_ids"]),
                "file_paths": list(edge["file_paths"]),
                "mention_count": 0,
                "created_at": edge["created_at"],
            }
        # subsequent incident edges extend the UNKNOWN node's source ids
        for endpoint in (src, tgt):
            node = kg_nodes[endpoint]
            if node["entity_type"] == UNKNOWN_ENTITY_TYPE:
                node["source_ids"] = _ordered_dedup(
                    node["source_ids"] + list(edge["source_ids"]), MAX_SOURCE_IDS
                )
                node["file_paths"] = _ordered_dedup(
                    node["file_paths"] + list(edge["file_paths"]), MAX_FILE_PATHS
                )

    degree = Counter()
    for src, tgt in kg_edges:
        degree[src] += 1
        degree[tgt] += 1
    for name, node in kg_nodes.items():
        node["degree"] = degree.get(name, 0)
    for (src, tgt), edge in kg_edges.items():
        edge["rank"] = degree.get(src, 0) + degree.get(tgt, 0)

    return {"chunks": chunk_rows, "kg_nodes": kg_nodes, "kg_edges": kg_edges}
