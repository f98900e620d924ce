"""JSON-mode extraction parsing (reference-parity subset).

Mirrors ``_process_json_extraction_result`` (/root/reference/lightrag/
operate.py:817-1002) and the recovery contract of
``tolerant_load_json_dict`` (utils.py:5072-5190):

- accepts one JSON object, optionally fenced or wrapped in leading/trailing
  prose (trailing braces included);
- rejects any top-level array (returns {} -> caller falls back);
- repairs the common object-level slips of weak models: trailing commas,
  single-quoted strings, unquoted keys, truncated objects;
- field validation identical to text mode (same normalize/type/self-loop
  rules), records shaped {"entities": [{name,type,description}...],
  "relationships": [{source,target,keywords,description}...]}.

Not ported: the LaTeX escape-damage repair (utils.py:4897-4983) — it exists
for VLM formula output, which the mock corpus does not exercise; the hook
point is ``tolerant_load_json_dict`` callers, same as the reference.
"""

from __future__ import annotations

import json
import re
from typing import Any

from .textnorm import strip_markdown_code_fence, truncate_entity_identifier
from .extraction_parser import parse_entity_record, parse_relation_record


def _first_structural_opener(text: str) -> tuple[str | None, int]:
    """First '{' or '[' outside a double-quoted string."""
    in_str = False
    escape = False
    for i, ch in enumerate(text):
        if in_str:
            if escape:
                escape = False
            elif ch == "\\":
                escape = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch in "{[":
            return ch, i
    return None, -1


def _balanced_object_slice(text: str) -> str | None:
    """The first brace-balanced {...} slice (string-aware); None if the
    object never closes (truncation -> caller appends closers)."""
    depth = 0
    in_str = False
    escape = False
    start = None
    for i, ch in enumerate(text):
        if in_str:
            if escape:
                escape = False
            elif ch == "\\":
                escape = True
            elif ch == '"':
                in_str = False
            continue
        if ch == '"':
            in_str = True
        elif ch == "{":
            if start is None:
                start = i
            depth += 1
        elif ch == "}":
            depth -= 1
            if depth == 0 and start is not None:
                return text[start : i + 1]
    return None


_TRAILING_COMMA = re.compile(r",\s*([}\]])")
_UNQUOTED_KEY = re.compile(r"([{,]\s*)([A-Za-z_][A-Za-z0-9_]*)(\s*:)")


def _repair_json_object(s: str) -> dict | None:
    """Minimal object repair: trailing commas, single quotes, unquoted keys,
    truncated closers."""
    candidates = [s]
    # close truncated objects/arrays
    opens = s.count("{") - s.count("}")
    brackets = s.count("[") - s.count("]")
    if opens > 0 or brackets > 0:
        candidates.append(s + "]" * max(brackets, 0) + "}" * max(opens, 0))
    repaired = []
    for c in candidates:
        c2 = _TRAILING_COMMA.sub(r"\1", c)
        c2 = _UNQUOTED_KEY.sub(r'\1"\2"\3', c2)
        repaired.append(c2)
        if "'" in c2 and '"' not in c2.replace('\\"', ""):
            repaired.append(c2.replace("'", '"'))
        elif "'" in c2:
            repaired.append(re.sub(r"'([^']*)'", r'"\1"', c2))
    for c in candidates + repaired:
        try:
            obj = json.loads(c)
            if isinstance(obj, dict):
                return obj
        except Exception:
            continue
    return None


def tolerant_load_json_dict(text: str) -> dict[str, Any]:
    if not text:
        return {}
    candidate = strip_markdown_code_fence(text).strip()
    opener, index = _first_structural_opener(candidate)
    if opener != "{":
        return {}
    suffix = candidate[index:]
    try:
        obj, _end = json.JSONDecoder().raw_decode(suffix)
        if isinstance(obj, dict):
            return obj
    except Exception:
        pass
    sliced = _balanced_object_slice(suffix)
    obj = _repair_json_object(sliced if sliced is not None else suffix)
    return obj if obj is not None else {}


def parse_json_extraction_result(
    result: str,
    chunk_key: str,
    timestamp: int,
    file_path: str = "unknown_source",
) -> tuple[dict[str, list[dict]], dict[tuple[str, str], list[dict]]]:
    """JSON-mode twin of parse_extraction_result — same validated record
    shapes, routed through the same per-field rules (via the text-mode
    validators, which share every normalization branch)."""
    maybe_nodes: dict[str, list[dict]] = {}
    maybe_edges: dict[tuple[str, str], list[dict]] = {}

    parsed = tolerant_load_json_dict(result)
    if not parsed:
        return maybe_nodes, maybe_edges

    entities = parsed.get("entities", [])
    if isinstance(entities, list):
        for ent in entities:
            if not isinstance(ent, dict):
                continue
            rec = parse_entity_record(
                ["entity", str(ent.get("name", "")), str(ent.get("type", "")),
                 str(ent.get("description", ""))],
                chunk_key,
                timestamp,
                file_path,
            )
            if rec is not None:
                name = truncate_entity_identifier(rec["entity_name"])
                rec["entity_name"] = name
                maybe_nodes.setdefault(name, []).append(rec)

    relationships = parsed.get("relationships", [])
    if isinstance(relationships, list):
        for rel in relationships:
            if not isinstance(rel, dict):
                continue
            rec = parse_relation_record(
                ["relation", str(rel.get("source", "")), str(rel.get("target", "")),
                 str(rel.get("keywords", "")), str(rel.get("description", ""))],
                chunk_key,
                timestamp,
                file_path,
            )
            if rec is not None:
                src = truncate_entity_identifier(rec["src_id"])
                tgt = truncate_entity_identifier(rec["tgt_id"])
                rec["src_id"], rec["tgt_id"] = src, tgt
                maybe_edges.setdefault((src, tgt), []).append(rec)

    return maybe_nodes, maybe_edges
