"""Structured data-retrieval API — ``query_data`` / ``aquery_data`` parity.

The reference exposes a "retrieval without generation" surface
(lightrag.py:3701-3906 aquery_data) that runs the exact kg_query /
naive_query retrieval pipeline, stops before the LLM, and returns the
entities / relationships / chunks / references that WOULD have been sent,
plus query metadata.  ``convert_to_user_format`` mirrors utils.py:6138-6258
(field names, fallback values, reference_id assignment); the
processing_info counters mirror operate.py:5551-5562 (kg modes) and
operate.py:6302-6306 (naive).

Spark mapping: retrieval itself is the Spark-side ``kg_query_context`` /
``naive_query`` drivers (plans/query.py) — everything here formats their
top-k-bounded outputs, so this file adds zero corpus-scale work.
"""

from __future__ import annotations

from typing import Any

from ..constants import GRAPH_FIELD_SEP

__all__ = ["convert_to_user_format", "query_data", "query_llm"]


def _join_multi(v) -> str:
    """Stored multi-valued fields are arrays in the Spark tables; the user
    format carries the reference's GRAPH_FIELD_SEP-joined string export."""
    if v is None:
        return ""
    if isinstance(v, (list, tuple)):
        return GRAPH_FIELD_SEP.join(str(x) for x in v)
    return str(v)


def _fmt_ts(v) -> str:
    return "" if v is None else str(v)


def convert_to_user_format(
    entities: list[dict],
    relationships: list[dict],
    chunks: list[dict],
    references: list[dict],
    query_mode: str,
) -> dict[str, Any]:
    """utils.py:6138-6258 — normalize internal rows to the public schema.

    ``entities`` rows come from the stored kg_nodes payloads (entity_name,
    entity_type, description, source_ids, file_paths, created_at);
    ``relationships`` from kg_edges (src, tgt, description, keywords,
    weight, source_ids, file_paths, created_at); ``chunks`` carry
    (chunk_id, content, file_path, reference_id).  Missing fields fall back
    exactly like the reference ("UNKNOWN" type, "unknown_source" path,
    1.0 weight, empty strings).
    """
    formatted_entities = [
        {
            "entity_name": e.get("entity_name", ""),
            "entity_type": e.get("entity_type") or "UNKNOWN",
            "description": e.get("description", "") or "",
            "source_id": _join_multi(e.get("source_ids", e.get("source_id"))),
            "file_path": _join_multi(e.get("file_paths", e.get("file_path")))
            or "unknown_source",
            "created_at": _fmt_ts(e.get("created_at")),
        }
        for e in entities
    ]
    formatted_relationships = [
        {
            "src_id": r.get("src", r.get("src_id", "")),
            "tgt_id": r.get("tgt", r.get("tgt_id", "")),
            "description": r.get("description", "") or "",
            "keywords": (
                ", ".join(r["keywords"])
                if isinstance(r.get("keywords"), (list, tuple))
                else (r.get("keywords") or "")
            ),
            "weight": float(r.get("weight", 1.0) or 1.0),
            "source_id": _join_multi(r.get("source_ids", r.get("source_id"))),
            "file_path": _join_multi(r.get("file_paths", r.get("file_path")))
            or "unknown_source",
            "created_at": _fmt_ts(r.get("created_at")),
        }
        for r in relationships
    ]
    formatted_chunks = [
        {
            "reference_id": str(c.get("reference_id", "") or ""),
            "content": c.get("content", ""),
            "file_path": c.get("file_path") or "unknown_source",
            "chunk_id": c.get("chunk_id", ""),
        }
        for c in chunks
    ]
    return {
        "status": "success",
        "message": "Query processed successfully",
        "data": {
            "entities": formatted_entities,
            "relationships": formatted_relationships,
            "chunks": formatted_chunks,
            "references": [
                {
                    "reference_id": str(r.get("reference_id", "")),
                    "file_path": r.get("file_path", ""),
                }
                for r in references
            ],
        },
        "metadata": {
            "query_mode": query_mode,
            "keywords": {"high_level": [], "low_level": []},
        },
    }


def _failure(message: str, mode: str) -> dict[str, Any]:
    return {
        "status": "failure",
        "message": message,
        "data": {},
        "metadata": {"failure_reason": "no_results", "mode": mode},
    }


def query_data(
    result,
    query_text: str,
    mode: str = "hybrid",
    **kwargs,
) -> dict[str, Any]:
    """The aquery_data dispatch (lightrag.py:3811-3906): same retrieval as
    kg_query / naive_query with only_need_context semantics, returning the
    structured payload instead of an answer.

    ``result`` is a KGBuildResult (kg_nodes / kg_edges / chunks);
    ``kwargs`` pass through to the underlying driver (top_k,
    kg_chunk_pick_method, enable_rerank, rerank_fn, hl_keywords, ...).

    Modes: local / global / hybrid / mix -> kg_query_context; naive ->
    naive_query (retrieval half); bypass -> empty data (the reference's
    bypass contract: no retrieval, LLM-only downstream).  Empty retrieval
    returns the reference's failure shape (lightrag.py:3874-3887).
    """
    from .query import kg_query_context, naive_query

    q = (query_text or "").strip()

    if mode == "bypass":
        out = convert_to_user_format([], [], [], [], "bypass")
        out["metadata"]["processing_info"] = {
            "total_entities_found": 0,
            "total_relations_found": 0,
            "merged_chunks_count": 0,
            "final_chunks_count": 0,
        }
        return out

    if not q:
        return _failure("Query returned no results", mode)

    if mode == "naive":
        naive_kwargs = {
            k: v
            for k, v in kwargs.items()
            if k
            in (
                "top_k", "max_total_tokens", "enable_rerank", "rerank_fn",
                "min_rerank_score", "chunk_top_k", "response_type",
                "user_prompt",
            )
        }
        r = naive_query(
            result.chunks, q, only_need_context=True, **naive_kwargs
        )
        if r is None or not r.get("chunks"):
            return _failure("No relevant document chunks found.", mode)
        out = convert_to_user_format(
            [], [], r["chunks"], r["references"], "naive"
        )
        out["metadata"]["processing_info"] = {
            "total_chunks_found": len(r["chunks"]),
            "final_chunks_count": len(r["chunks"]),
        }
        return out

    if mode not in ("local", "global", "hybrid", "mix"):
        raise ValueError(f"Unknown mode {mode}")

    context, refs, debug = kg_query_context(result, q, mode=mode, **kwargs)
    ents = debug["entity_payloads"]
    rels = debug["relation_payloads"]
    kept = debug["kept_chunks"]
    if not ents and not rels and not kept:
        return _failure("Query returned no results", mode)
    out = convert_to_user_format(
        [dict(e) for e in ents],
        [dict(r) for r in rels],
        kept,
        refs,
        mode,
    )
    out["metadata"]["keywords"] = {
        "high_level": list(debug["hl_keywords"]),
        "low_level": list(debug["ll_keywords"]),
    }
    out["metadata"]["processing_info"] = {
        "total_entities_found": len(debug["entities"]),
        "total_relations_found": len(debug["relations"]),
        "entities_after_truncation": len(ents),
        "relations_after_truncation": len(rels),
        "merged_chunks_count": len(debug["chunk_ids"]),
        "final_chunks_count": len(kept),
    }
    return out


def query_llm(
    result,
    query_text: str,
    mode: str = "hybrid",
    response_fn=None,
    **kwargs,
) -> dict[str, Any]:
    """aquery_llm (lightrag.py:3908-4052): one call returning BOTH the
    structured retrieval payload and the synthesized answer, without
    running retrieval twice — query_data formats the context, then the
    mode's answer loop (kg_query / naive_query / bypass) runs with the
    same parameters, and the answer is attached as ``llm_response``.

    Streaming is out of scope here (Spark drivers return materialized
    answers), so ``is_streaming`` is always False and
    ``response_iterator`` always None — the reference's non-streaming
    branch shape (lightrag.py:4026-4035).
    """
    from ..prompts import PROMPTS
    from .query import kg_query, naive_query

    data = query_data(result, query_text, mode=mode, **kwargs)
    if data.get("status") == "failure":
        data["llm_response"] = {
            "content": PROMPTS["fail_response"],
            "response_iterator": None,
            "is_streaming": False,
        }
        return data

    if mode == "bypass":
        if response_fn is None:
            raise ValueError(
                "bypass mode needs response_fn(user_query, system_prompt) -> str"
            )
        content = response_fn((query_text or "").strip(), None)
    elif mode == "naive":
        naive_kwargs = {
            k: v
            for k, v in kwargs.items()
            if k
            in (
                "top_k", "max_total_tokens", "enable_rerank", "rerank_fn",
                "min_rerank_score", "chunk_top_k", "response_type",
                "user_prompt", "model_identity", "answer_cache",
                "conversation_history",
            )
        }
        r = naive_query(
            result.chunks, query_text, response_fn=response_fn, **naive_kwargs
        )
        content = r["content"] if r else PROMPTS["fail_response"]
    else:
        kg_kwargs = {
            k: v
            for k, v in kwargs.items()
            if k
            in (
                "top_k", "related_chunk_number", "kg_chunk_pick_method",
                "max_entity_tokens", "max_relation_tokens",
                "max_total_tokens", "enable_rerank", "rerank_fn",
                "min_rerank_score", "chunk_top_k", "response_type",
                "user_prompt", "model_identity", "answer_cache",
                "keywords_cache", "keyword_model_fn", "conversation_history",
            )
        }
        r = kg_query(result, query_text, mode=mode, response_fn=response_fn, **kg_kwargs)
        content = r["content"]
    data["llm_response"] = {
        "content": content,
        "response_iterator": None,
        "is_streaming": False,
    }
    return data
