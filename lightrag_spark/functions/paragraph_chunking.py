"""Paragraph-semantic chunker — the reference's "P" strategy
(/root/reference/lightrag/chunker/paragraph_semantic.py).

Scope, stated precisely:

- **Text-only input (this pipeline's input shape — pages carry a ``text``
  column, SURVEY §2.1)**: the reference's P *itself* falls back to
  recursive-character chunking when no ``.blocks.jsonl`` sidecar exists
  (paragraph_semantic.py:2200-2224, "the document contract is explicit
  that P falls back to R").  ``chunk_text_paragraph`` reproduces exactly
  that: the R kernel with the reference's ``_bounded_overlap`` clamp
  (paragraph_semantic.py:126-132).
- **Block input** (rows ``{content, heading, level, parent_headings}`` —
  what a sidecar-producing parser emits): ``chunk_blocks_paragraph``
  implements the two core passes:
  * AnchorSplit-lite (paragraph_semantic.py:1252+): a block over the max
    budget is re-split recursively; each fragment's heading gets a
    row-local ``[part n]`` suffix (:158-171).
  * LevelMerge (bottom-up, hierarchy-gated; :1554-1650): adjacent blocks
    merge while the result stays within target_ideal = 75% of
    chunk_token_size (_IDEAL_RATIO, :81), and ONLY when they are true
    siblings (identical parent chain, :1568-1578 — the documented
    anti-cross-topic-pollution guarantee) or the earlier block is an
    ancestor of the later (:1581-1598).
  The table machinery (TableRowSplit, header re-injection, bridge
  blocks; ~1,200 LoC of paragraph_semantic.py) operates on parser table
  tags that never occur in this pipeline's input and is intentionally
  absent; a ``<table``-tagged block is treated as atomic.
- ``drop_references`` (:2226-2245): blocks whose heading starts with a
  reference prefix, scanned within the trailing ``references_tail_n``
  window (0 = all), are dropped before splitting/merging.
"""

from __future__ import annotations

import re
from typing import Any

from .recursive_chunking import chunk_text_recursive

IDEAL_RATIO = 0.75  # paragraph_semantic.py:81
DEFAULT_P_REFERENCES_HEADINGS = ["references", "bibliography", "参考文献"]
DEFAULT_P_REFERENCES_TAIL_N = 5

_PART_SUFFIX_RE = re.compile(r"\s*\[part \d+\]$")


def bounded_overlap(target_max: int, chunk_overlap_token_size: int) -> int:
    """paragraph_semantic.py:126-132."""
    overlap = max(int(chunk_overlap_token_size), 0)
    if target_max <= 1:
        return 0
    return min(overlap, target_max - 1)


def strip_part_suffix(heading: str) -> str:
    return _PART_SUFFIX_RE.sub("", heading)


def chunk_text_paragraph(
    tokenizer,
    content: str,
    chunk_token_size: int = 2000,
    chunk_overlap_token_size: int = 100,
) -> list[dict[str, Any]]:
    """P over plain text == the reference's own no-sidecar fallback:
    recursive-character with the bounded overlap (paragraph_semantic.py:
    2200-2224)."""
    target_max = max(int(chunk_token_size), 1)
    return chunk_text_recursive(
        tokenizer,
        content,
        chunk_token_size=target_max,
        chunk_overlap_token_size=bounded_overlap(target_max, chunk_overlap_token_size),
    )


def _same_parent_path(a: dict, b: dict) -> bool:
    """Identical parent-heading chains (paragraph_semantic.py:1568-1578)."""
    return list(a.get("parent_headings") or []) == list(b.get("parent_headings") or [])


def _is_descendant(shallow: dict, deep: dict) -> bool:
    """deep is nested under shallow (paragraph_semantic.py:1581-1598)."""
    head = strip_part_suffix(shallow.get("heading") or "")
    shallow_full = list(shallow.get("parent_headings") or []) + ([head] if head else [])
    deep_parents = list(deep.get("parent_headings") or [])
    return deep_parents[: len(shallow_full)] == shallow_full


def _drop_reference_blocks(
    blocks: list[dict],
    references_headings: list[str],
    references_tail_n: int,
) -> list[dict]:
    start = 0 if references_tail_n == 0 else max(0, len(blocks) - references_tail_n)
    prefixes = [p.lower() for p in references_headings]
    out = []
    for i, b in enumerate(blocks):
        if i >= start:
            h = (b.get("heading") or "").strip().lower()
            if any(h.startswith(p) for p in prefixes):
                continue
        out.append(b)
    return out


def chunk_blocks_paragraph(
    tokenizer,
    blocks: list[dict[str, Any]],
    chunk_token_size: int = 2000,
    chunk_overlap_token_size: int = 100,
    drop_references: bool = False,
    references_headings: list[str] | None = None,
    references_tail_n: int = DEFAULT_P_REFERENCES_TAIL_N,
) -> list[dict[str, Any]]:
    """Structured-block P: AnchorSplit-lite + hierarchy-gated LevelMerge.

    ``blocks``: ordered rows {content:str, heading:str|None, level:int,
    parent_headings:list[str]}.  Returns chunk dicts
    {tokens, content, chunk_order_index, heading:{level, heading,
    parent_headings}}.
    """
    target_max = max(int(chunk_token_size), 1)
    target_ideal = max(int(target_max * IDEAL_RATIO), 1)
    overlap = bounded_overlap(target_max, chunk_overlap_token_size)

    if drop_references:
        blocks = _drop_reference_blocks(
            blocks,
            references_headings or DEFAULT_P_REFERENCES_HEADINGS,
            references_tail_n,
        )

    # ---- AnchorSplit-lite: oversized blocks re-split, [part n] suffixes ----
    split: list[dict] = []
    for b in blocks:
        text = b.get("content") or ""
        n = tokenizer.count(text)
        atomic = text.lstrip().startswith("<table")  # parser tag: atomic here
        if n <= target_max or atomic:
            split.append({**b, "tokens": n})
            continue
        pieces = chunk_text_recursive(
            tokenizer, text, chunk_token_size=target_max,
            chunk_overlap_token_size=overlap,
        )
        base = strip_part_suffix(b.get("heading") or "")
        for i, p in enumerate(pieces, start=1):
            frag_heading = f"{base} [part {i}]" if base else f"[part {i}]"
            split.append(
                {
                    **b,
                    "content": p["content"],
                    "tokens": p["tokens"],
                    "heading": frag_heading,
                }
            )

    # ---- LevelMerge: bottom-up absorb while within target_ideal -------------
    # Forward pass over adjacent blocks; b absorbs its successor when the
    # merged size stays within the ideal target AND they are siblings under
    # the same parent or the successor is b's descendant.
    merged: list[dict] = []
    for b in split:
        if merged:
            prev = merged[-1]
            combined = prev["tokens"] + b["tokens"]
            compatible = _same_parent_path(prev, b) or _is_descendant(prev, b)
            if combined <= target_ideal and compatible:
                prev["content"] = prev["content"] + "\n\n" + (b.get("content") or "")
                prev["tokens"] = tokenizer.count(prev["content"])
                continue
        merged.append(dict(b))

    return [
        {
            "tokens": m["tokens"],
            "content": m["content"],
            "chunk_order_index": i,
            "heading": {
                "level": m.get("level", 0),
                "heading": m.get("heading"),
                "parent_headings": list(m.get("parent_headings") or []),
            },
        }
        for i, m in enumerate(merged)
    ]
