"""Parser for LLM extraction responses (reference-parity, pure Python).

Reproduces the text-mode record parser of the reference:

- record splitting + glued-record repair  ~ /root/reference/lightrag/operate.py:1411-1538
- entity record validation                ~ operate.py:614-696
- relation record validation              ~ operate.py:699-776
- mis-prefixed relation recovery          ~ operate.py:779-798

The response format is rows of
``entity<|#|>name<|#|>type<|#|>description`` (4 fields) and
``relation<|#|>src<|#|>tgt<|#|>keywords<|#|>description`` (5 fields),
terminated by ``<|COMPLETE|>`` (prompt.py:80-84).  This module is pure
Python and runs verbatim inside the extraction pandas UDF; it is also what
the pytest oracle uses, so Spark output and oracle share one parser by
construction (parity then rests on the dataflow around it).
"""

from __future__ import annotations

from typing import Any

from .textnorm import (
    fix_tuple_delimiter_corruption,
    normalize_entity_name,
    sanitize_and_normalize_extracted_text,
    split_string_by_multi_markers,
    truncate_entity_identifier,
)

ENTITY_TYPE_FORBIDDEN_CHARS = ("'", "(", ")", "<", ">", "|", "/", "\\")


def parse_entity_record(
    attrs: list[str], chunk_key: str, timestamp: int, file_path: str = "unknown_source"
) -> dict[str, Any] | None:
    """Validate a 4-field entity row -> mention record, or None (operate.py:614-696)."""
    if len(attrs) != 4 or "entity" not in attrs[0]:
        return None
    entity_name = normalize_entity_name(attrs[1])
    if not entity_name or not entity_name.strip():
        return None
    entity_type = sanitize_and_normalize_extracted_text(attrs[2], remove_inner_quotes=True)
    if not entity_type.strip() or any(c in entity_type for c in ENTITY_TYPE_FORBIDDEN_CHARS):
        return None
    if "," in entity_type:
        tokens = [t.strip() for t in entity_type.split(",") if t.strip()]
        if not tokens:
            return None
        entity_type = tokens[0]
    entity_type = entity_type.replace(" ", "").lower()
    description = sanitize_and_normalize_extracted_text(attrs[3])
    if not description.strip():
        return None
    return {
        "entity_name": entity_name,
        "entity_type": entity_type,
        "description": description,
        "source_id": chunk_key,
        "file_path": file_path,
        "timestamp": timestamp,
    }


def parse_relation_record(
    attrs: list[str], chunk_key: str, timestamp: int, file_path: str = "unknown_source"
) -> dict[str, Any] | None:
    """Validate a 5-field relation row -> triple record, or None (operate.py:699-776).

    "relationship" and "relation" prefixes are interchangeable; self-loops are
    dropped; weight is the constant 1.0 (text rows carry no weight field).
    """
    if len(attrs) != 5 or "relation" not in attrs[0]:
        return None
    source = normalize_entity_name(attrs[1])
    target = normalize_entity_name(attrs[2])
    if not source or not target or source == target:
        return None
    keywords = sanitize_and_normalize_extracted_text(attrs[3], remove_inner_quotes=True)
    keywords = keywords.replace("，", ",")
    description = sanitize_and_normalize_extracted_text(attrs[4])
    if not description.strip():
        return None
    return {
        "src_id": source,
        "tgt_id": target,
        "weight": 1.0,
        "description": description,
        "keywords": keywords,
        "source_id": chunk_key,
        "file_path": file_path,
        "timestamp": timestamp,
    }


def _recover_misprefixed_relation(attrs: list[str]) -> list[str]:
    """A 5-field row whose prefix says "entity" is a mislabeled relation
    (operate.py:779-798)."""
    if len(attrs) != 5:
        return attrs
    prefix = attrs[0].strip().lower()
    if "entity" not in prefix or "relation" in prefix:
        return attrs
    fixed = list(attrs)
    fixed[0] = "relation"
    return fixed


def split_into_records(
    result: str,
    tuple_delimiter: str = "<|#|>",
    completion_delimiter: str = "<|COMPLETE|>",
) -> list[str]:
    """Split a raw LLM response into candidate record strings, repairing the
    glued-records failure where the model used the tuple delimiter (instead of
    a newline) to separate records (operate.py:1443-1472)."""
    records = split_string_by_multi_markers(
        result, ["\n", completion_delimiter, completion_delimiter.lower()]
    )
    fixed: list[str] = []
    for record in records:
        record = record.strip()
        if not record:
            continue
        for ent_piece in split_string_by_multi_markers(
            record, [f"{tuple_delimiter}entity{tuple_delimiter}"]
        ):
            if not ent_piece.startswith("entity") and not ent_piece.startswith("relation"):
                ent_piece = f"entity<|{ent_piece}"
            for rel_piece in split_string_by_multi_markers(
                ent_piece,
                [
                    f"{tuple_delimiter}relationship{tuple_delimiter}",
                    f"{tuple_delimiter}relation{tuple_delimiter}",
                ],
            ):
                if not rel_piece.startswith("entity") and not rel_piece.startswith("relation"):
                    rel_piece = f"relation{tuple_delimiter}{rel_piece}"
                fixed.append(rel_piece)
    return fixed


def parse_extraction_result(
    result: str,
    chunk_key: str,
    timestamp: int,
    file_path: str = "unknown_source",
    tuple_delimiter: str = "<|#|>",
    completion_delimiter: str = "<|COMPLETE|>",
) -> tuple[dict[str, list[dict]], dict[tuple[str, str], list[dict]]]:
    """Parse one LLM response into (entities-by-name, relations-by-(src,tgt)).

    Mirrors _process_extraction_result (operate.py:1411-1538): split/repair
    records, repair delimiter corruption (both original and lowercased core),
    split fields, recover mis-prefixed relations, then validate as entity
    first and relation second.  Identifiers are clamped to 256 chars / 512
    UTF-8 bytes.
    """
    maybe_nodes: dict[str, list[dict]] = {}
    maybe_edges: dict[tuple[str, str], list[dict]] = {}

    core = tuple_delimiter[2:-2]
    core_lower = core.lower()
    for record in split_into_records(result, tuple_delimiter, completion_delimiter):
        record = record.strip()
        if not record:
            continue
        record = fix_tuple_delimiter_corruption(record, core, tuple_delimiter)
        if core != core_lower:
            record = fix_tuple_delimiter_corruption(record, core_lower, tuple_delimiter)
        attrs = split_string_by_multi_markers(record, [tuple_delimiter])
        attrs = _recover_misprefixed_relation(attrs)

        entity = parse_entity_record(attrs, chunk_key, timestamp, file_path)
        if entity is not None:
            name = truncate_entity_identifier(entity["entity_name"])
            entity["entity_name"] = name
            maybe_nodes.setdefault(name, []).append(entity)
            continue

        relation = parse_relation_record(attrs, chunk_key, timestamp, file_path)
        if relation is not None:
            src = truncate_entity_identifier(relation["src_id"])
            tgt = truncate_entity_identifier(relation["tgt_id"])
            relation["src_id"] = src
            relation["tgt_id"] = tgt
            maybe_edges.setdefault((src, tgt), []).append(relation)

    return maybe_nodes, maybe_edges


def merge_gleaning(
    base_nodes: dict[str, list[dict]],
    base_edges: dict[tuple[str, str], list[dict]],
    glean_nodes: dict[str, list[dict]],
    glean_edges: dict[tuple[str, str], list[dict]],
) -> tuple[dict[str, list[dict]], dict[tuple[str, str], list[dict]]]:
    """Combine a gleaning pass with the initial pass (operate.py:3928-3965).

    For keys present in both, the gleaned records win only if their (first)
    description is strictly longer; brand-new keys are added.
    """

    def desc_len(records: list[dict]) -> int:
        if not records:
            return 0
        return len(records[0].get("description") or "")

    nodes = {k: list(v) for k, v in base_nodes.items()}
    for name, records in glean_nodes.items():
        if name not in nodes or desc_len(records) > desc_len(nodes[name]):
            nodes[name] = list(records)

    edges = {k: list(v) for k, v in base_edges.items()}
    for pair, records in glean_edges.items():
        if pair not in edges or desc_len(records) > desc_len(edges[pair]):
            edges[pair] = list(records)
    return nodes, edges
