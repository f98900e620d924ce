"""Fixed-size token-window chunking (reference-parity, pure Python).

Semantics of /root/reference/lightrag/chunker/token_size.py:130-256:

- encode the full text; emit windows ``tokens[i : i+size]`` for
  ``i in range(0, len(tokens), size - overlap)``;
- each chunk's ``content`` is ``decode(window).strip()`` and ``tokens`` is
  ``min(size, len(tokens) - i)``; ``chunk_order_index`` is 0-based;
- ``overlap >= size`` raises ValueError (token_size.py:114-127);
- optional ``split_by_character`` pre-split: each segment is kept whole when
  it fits, sub-windowed when oversized, or (``only=True``) rejected with an
  error when oversized;
- optional source spans map each window back to exact char offsets using an
  anchored delta decode with a +-32 char ``find`` fallback
  (token_size.py:50-93) — O(N) total.

Defaults: size=1200 overlap=100 (token_size.py:135-136).
"""

from __future__ import annotations

from typing import Any, Sequence

from .tokenizer import Tokenizer


class ChunkTokenLimitExceeded(ValueError):
    def __init__(self, chunk_tokens: int, limit: int, preview: str):
        super().__init__(
            f"segment of {chunk_tokens} tokens exceeds chunk_token_size {limit}: {preview!r}"
        )
        self.chunk_tokens = chunk_tokens
        self.limit = limit


def _stride(size: int, overlap: int) -> int:
    if overlap >= size:
        raise ValueError(
            f"chunk_overlap_token_size ({overlap}) must be < chunk_token_size ({size})"
        )
    return size - overlap


def _strip_span(text: str, start: int, end: int) -> tuple[int, int]:
    start = max(0, min(start, len(text)))
    end = max(start, min(end, len(text)))
    while start < end and text[start].isspace():
        start += 1
    while end > start and text[end - 1].isspace():
        end -= 1
    return start, end


def _span_or_none(text: str, start: int, end: int) -> dict[str, int] | None:
    start, end = _strip_span(text, start, end)
    if start >= end:
        return None
    return {"start": start, "end": end}


def _window_span(
    tokenizer: Tokenizer,
    text: str,
    tokens: Sequence,
    start_tok: int,
    end_tok: int,
    anchor: tuple[int, int],
) -> tuple[dict[str, int] | None, tuple[int, int]]:
    """Locate ``decode(tokens[start_tok:end_tok])`` in ``text``.

    ``anchor`` is the previous verified (token_index, char_offset); only the
    delta since the anchor is decoded, keeping total cost O(N).  A +-32 char
    ``find`` window absorbs non-concatenative BPE boundaries; an unlocatable
    window yields span None and leaves the anchor unchanged.
    """
    anchor_tok, anchor_char = anchor
    window = tokenizer.decode(tokens[start_tok:end_tok])
    if start_tok >= anchor_tok:
        start = anchor_char + len(tokenizer.decode(tokens[anchor_tok:start_tok]))
    else:
        start = len(tokenizer.decode(tokens[:start_tok]))
    end = start + len(window)
    if text[start:end] != window:
        lo = max(0, start - 32)
        hi = min(len(text), end + 32 + len(window))
        found = text.find(window, lo, hi)
        if found < 0:
            return None, anchor
        start, end = found, found + len(window)
    return _span_or_none(text, start, end), (start_tok, start)


def chunk_text_by_tokens(
    tokenizer: Tokenizer,
    content: str,
    split_by_character: str | None = None,
    split_by_character_only: bool = False,
    chunk_overlap_token_size: int = 100,
    chunk_token_size: int = 1200,
    with_source_spans: bool = False,
) -> list[dict[str, Any]]:
    """Chunk ``content`` into token windows.

    Returns ``[{tokens, content, chunk_order_index[, _source_span]}]`` with
    the exact reference semantics described in the module docstring.
    """
    results: list[dict[str, Any]] = []

    def emit(content_piece: str, tok_count: int, span: dict[str, int] | None) -> None:
        item: dict[str, Any] = {
            "tokens": tok_count,
            "content": content_piece.strip(),
            "chunk_order_index": len(results),
        }
        if with_source_spans and span is not None:
            item["_source_span"] = span
        results.append(item)

    if split_by_character:
        segments = content.split(split_by_character)
        offsets: list[tuple[int, int]] = []
        cursor = 0
        for seg in segments:
            offsets.append((cursor, cursor + len(seg)))
            cursor += len(seg) + len(split_by_character)
        for seg, (seg_start, seg_end) in zip(segments, offsets):
            seg_tokens = tokenizer.encode(seg)
            if len(seg_tokens) <= chunk_token_size:
                span = _span_or_none(content, seg_start, seg_end) if with_source_spans else None
                emit(seg, len(seg_tokens), span)
                continue
            if split_by_character_only:
                raise ChunkTokenLimitExceeded(len(seg_tokens), chunk_token_size, seg[:120])
            anchor = (0, 0)
            for start in range(0, len(seg_tokens), _stride(chunk_token_size, chunk_overlap_token_size)):
                end = min(start + chunk_token_size, len(seg_tokens))
                piece = tokenizer.decode(seg_tokens[start:end])
                span = None
                if with_source_spans:
                    span, anchor = _window_span(tokenizer, seg, seg_tokens, start, end, anchor)
                    if span is not None:
                        span = {"start": seg_start + span["start"], "end": seg_start + span["end"]}
                emit(piece, min(chunk_token_size, len(seg_tokens) - start), span)
        return results

    tokens = tokenizer.encode(content)
    anchor = (0, 0)
    for start in range(0, len(tokens), _stride(chunk_token_size, chunk_overlap_token_size)):
        end = min(start + chunk_token_size, len(tokens))
        piece = tokenizer.decode(tokens[start:end])
        span = None
        if with_source_spans:
            span, anchor = _window_span(tokenizer, content, tokens, start, end, anchor)
        emit(piece, min(chunk_token_size, len(tokens) - start), span)
    return results


def enforce_embedding_token_limit(
    chunks: list[dict[str, Any]],
    tokenizer: Tokenizer,
    embedding_token_limit: int,
    overlap: int = 100,
) -> list[dict[str, Any]]:
    """Post-chunk guard: re-split any chunk exceeding the embedding token
    limit into (limit, overlap) windows, in place, then renumber
    (enforce_chunk_token_limit_before_embedding, called at
    pipeline.py:5105-5144 BEFORE chunk-id assignment — ids stay positional
    over the final sequence).  No-op when every chunk fits."""
    out: list[dict[str, Any]] = []
    for ch in chunks:
        if ch["tokens"] <= embedding_token_limit:
            out.append(dict(ch))
            continue
        toks = tokenizer.encode(ch["content"])
        for start in range(0, len(toks), _stride(embedding_token_limit, overlap)):
            end = min(start + embedding_token_limit, len(toks))
            out.append(
                {
                    "tokens": min(embedding_token_limit, len(toks) - start),
                    "content": tokenizer.decode(toks[start:end]).strip(),
                    "chunk_order_index": -1,
                }
            )
    for i, ch in enumerate(out):
        ch["chunk_order_index"] = i
    return out


def chunk_id_for(doc_id: str, order: int) -> str:
    """Positional chunk id ``{doc_id}-chunk-{order:03d}``
    (utils_pipeline.py:152-170)."""
    return f"{doc_id}-chunk-{order:03d}"
