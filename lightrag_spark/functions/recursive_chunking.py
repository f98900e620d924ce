"""Recursive-character chunking — the "R" strategy (SURVEY.md §2.2).

Clean-room implementation of the classic recursive text-splitting
algorithm the reference wraps (chunker/recursive_character.py wraps
LangChain's RecursiveCharacterTextSplitter): walk a separator cascade
from strongest boundary to weakest, recursively re-split any piece still
over the token cap, then greedily merge adjacent pieces into chunks of at
most ``chunk_token_size`` tokens with ``chunk_overlap_token_size`` of
carried-over tail pieces.

Token accounting uses the pipeline tokenizer (length in tokens, not
chars), matching the reference's ``length_function`` plug-in.  Oversized
unsplittable pieces pass through — the embedding hard-split guard
(chunking_core.enforce_embedding_token_limit) is the final cap, same
division of labor as the reference.
"""

from __future__ import annotations

from typing import Any

from .tokenizer import Tokenizer

# Default cascade incl. CJK-aware boundaries (the reference's dispatcher
# feeds a CJK cascade; these cover both scripts).
DEFAULT_SEPARATORS = ["\n\n", "\n", "。", "！", "？", ". ", " ", ""]


def _split_keep_nonempty(text: str, sep: str) -> list[str]:
    if sep == "":
        return [c for c in text]
    parts = text.split(sep)
    return [p for p in parts if p != ""]


def _recursive_split(
    text: str, separators: list[str], cap: int, count: Any
) -> list[str]:
    """Pieces each <= cap tokens where some separator allows it."""
    if count(text) <= cap:
        return [text] if text else []
    sep = separators[-1]
    rest: list[str] = []
    for i, s in enumerate(separators):
        if s == "" or s in text:
            sep = s
            rest = separators[i + 1 :]
            break
    out: list[str] = []
    for piece in _split_keep_nonempty(text, sep):
        if count(piece) <= cap or not rest:
            out.append(piece)
        else:
            out.extend(_recursive_split(piece, rest, cap, count))
    return out


def chunk_text_recursive(
    tokenizer: Tokenizer,
    content: str,
    chunk_token_size: int = 1200,
    chunk_overlap_token_size: int = 100,
    separators: list[str] | None = None,
) -> list[dict[str, Any]]:
    """content -> [{tokens, content, chunk_order_index}] chunks."""
    seps = separators if separators is not None else DEFAULT_SEPARATORS
    count = tokenizer.count
    pieces = _recursive_split(content, seps, chunk_token_size, count)

    # greedy merge with piece-level overlap carry-over
    chunks: list[str] = []
    window: list[str] = []
    window_tokens = 0
    joiner = " "
    for piece in pieces:
        n = count(piece)
        if window and window_tokens + n > chunk_token_size:
            chunks.append(joiner.join(window).strip())
            # carry tail pieces up to the overlap budget
            carried: list[str] = []
            carried_tokens = 0
            for prev in reversed(window):
                pn = count(prev)
                if carried_tokens + pn > chunk_overlap_token_size:
                    break
                carried.insert(0, prev)
                carried_tokens += pn
            window = carried
            window_tokens = carried_tokens
        window.append(piece)
        window_tokens += n
    if window:
        chunks.append(joiner.join(window).strip())

    return [
        {"tokens": count(c), "content": c, "chunk_order_index": i}
        for i, c in enumerate(chunks)
        if c
    ]
