"""Semantic-vector chunker — the reference's "V" strategy
(/root/reference/lightrag/chunker/semantic_vector.py, dispatched from
pipeline.py:4903-4928).

The reference wraps LangChain's SemanticChunker; that package is not a
dependency here, so this module implements the SAME algorithm directly
(the reference file documents it precisely, semantic_vector.py:1-27 and
its _semantic_groups_with_spans mirror, :122-196):

1. split text into sentences (DEFAULT_SENTENCE_SPLIT_REGEX,
   reference constants.py:132 — English terminators + Chinese 。？！);
2. combine each sentence with ``buffer_size`` neighbours on each side;
3. embed the combined windows (pluggable embed_fn — the deterministic
   mock by default, a real endpoint in production);
4. distance[i] = 1 - cosine(emb[i], emb[i+1]);
5. breakpoints where distance exceeds a threshold derived from the chosen
   distribution: percentile (default, 95) / standard_deviation (3) /
   interquartile (1.5) / gradient (95);
6. groups between breakpoints keep their EXACT source spans (the
   reference re-derives spans rather than " ".join reflow,
   semantic_vector.py:94-121); groups shorter than ``min_chunk_size``
   characters are skipped as breakpoints (merged forward);
7. SemanticChunker does not enforce a max size, so any group over
   ``chunk_token_size`` tokens is re-split by the recursive-character
   chunker (losing its span), per semantic_vector.py:20-24.
"""

from __future__ import annotations

import math
import re
from typing import Any, Callable, Sequence

from .mock_embed import embed_text
from .recursive_chunking import chunk_text_recursive

# reference constants.py:132
DEFAULT_SENTENCE_SPLIT_REGEX = r"(?<=[.?!])\s+|(?<=[。？！])"

_THRESHOLD_DEFAULTS = {
    "percentile": 95.0,
    "standard_deviation": 3.0,
    "interquartile": 1.5,
    "gradient": 95.0,
}


def _percentile(values: Sequence[float], pct: float) -> float:
    """numpy.percentile, linear interpolation — inlined so workers don't
    need numpy for a 10-element list."""
    xs = sorted(values)
    if not xs:
        return 0.0
    if len(xs) == 1:
        return xs[0]
    rank = (pct / 100.0) * (len(xs) - 1)
    lo = int(math.floor(rank))
    hi = int(math.ceil(rank))
    frac = rank - lo
    return xs[lo] * (1 - frac) + xs[hi] * frac


def _gradient(values: Sequence[float]) -> list[float]:
    """numpy.gradient with unit spacing (central differences, one-sided
    at the ends)."""
    n = len(values)
    if n == 1:
        return [0.0]
    out = []
    for i in range(n):
        if i == 0:
            out.append(values[1] - values[0])
        elif i == n - 1:
            out.append(values[-1] - values[-2])
        else:
            out.append((values[i + 1] - values[i - 1]) / 2.0)
    return out


def _cosine_distance(a: Sequence[float], b: Sequence[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na == 0.0 or nb == 0.0:
        return 1.0
    return 1.0 - dot / (na * nb)


def _sentence_spans(text: str, sentences: list[str]) -> list[tuple[int, int]]:
    """Exact source span per sentence (semantic_vector.py:94-108)."""
    spans: list[tuple[int, int]] = []
    cursor = 0
    for sentence in sentences:
        if not sentence:
            spans.append((cursor, cursor))
            continue
        start = text.find(sentence, cursor)
        if start < 0:
            start = text.find(sentence)
        if start < 0:
            start = cursor
        end = start + len(sentence)
        spans.append((start, end))
        cursor = end
    return spans


def _trim_span(text: str, start: int, end: int) -> tuple[int, int]:
    start = max(0, min(start, len(text)))
    end = max(start, min(end, len(text)))
    while start < end and text[start].isspace():
        start += 1
    while end > start and text[end - 1].isspace():
        end -= 1
    return start, end


def semantic_breakpoint_threshold(
    distances: Sequence[float],
    threshold_type: str = "percentile",
    amount: float | None = None,
) -> tuple[float, list[float]]:
    """(threshold, breakpoint_array) per LangChain's
    _calculate_breakpoint_threshold semantics (the reference pins and
    mirrors them, semantic_vector.py:122-196)."""
    if threshold_type not in _THRESHOLD_DEFAULTS:
        raise ValueError(f"unknown breakpoint_threshold_type: {threshold_type!r}")
    if amount is None:
        amount = _THRESHOLD_DEFAULTS[threshold_type]
    ds = list(distances)
    if threshold_type == "percentile":
        return _percentile(ds, amount), ds
    if threshold_type == "standard_deviation":
        mean = sum(ds) / len(ds)
        var = sum((x - mean) ** 2 for x in ds) / len(ds)
        return mean + amount * math.sqrt(var), ds
    if threshold_type == "interquartile":
        q1, q3 = _percentile(ds, 25.0), _percentile(ds, 75.0)
        mean = sum(ds) / len(ds)
        return mean + amount * (q3 - q1), ds
    if threshold_type == "gradient":
        grad = _gradient(ds)
        return _percentile(grad, amount), grad
    raise ValueError(f"unknown breakpoint_threshold_type: {threshold_type!r}")


def semantic_groups_with_spans(
    text: str,
    embed_fn: Callable[[list[str]], list[list[float]]],
    breakpoint_threshold_type: str = "percentile",
    breakpoint_threshold_amount: float | None = None,
    buffer_size: int = 1,
    sentence_split_regex: str = DEFAULT_SENTENCE_SPLIT_REGEX,
    min_chunk_size: int | None = None,
) -> list[tuple[str, int, int]]:
    """text -> [(group_text, char_start, char_end)] — the semantic grouping
    with exact source spans (semantic_vector.py:122-196)."""
    sentences = re.split(sentence_split_regex, text)
    spans = _sentence_spans(text, sentences)

    def group(start_index: int, end_index: int) -> tuple[str, int, int] | None:
        start, _ = spans[start_index]
        _, end = spans[end_index]
        start, end = _trim_span(text, start, end)
        if start >= end:
            return None
        return text[start:end], start, end

    if len(sentences) == 1:
        g = group(0, 0)
        return [g] if g else []
    if breakpoint_threshold_type == "gradient" and len(sentences) == 2:
        return [g for i in range(2) if (g := group(i, i)) is not None]

    combined = [
        " ".join(sentences[max(0, i - buffer_size) : i + buffer_size + 1])
        for i in range(len(sentences))
    ]
    embs = embed_fn(combined)
    distances = [
        _cosine_distance(embs[i], embs[i + 1]) for i in range(len(embs) - 1)
    ]
    threshold, breakpoint_array = semantic_breakpoint_threshold(
        distances, breakpoint_threshold_type, breakpoint_threshold_amount
    )
    indices_above = [i for i, x in enumerate(breakpoint_array) if x > threshold]

    chunks: list[tuple[str, int, int]] = []
    start_index = 0
    for index in indices_above:
        group_sentences = sentences[start_index : index + 1]
        combined_text = " ".join(group_sentences)
        if min_chunk_size is not None and len(combined_text) < min_chunk_size:
            continue
        g = group(start_index, index)
        if g is not None:
            chunks.append(g)
        start_index = index + 1
    if start_index < len(sentences):
        g = group(start_index, len(sentences) - 1)
        if g is not None:
            chunks.append(g)
    return chunks


def chunk_text_semantic(
    tokenizer,
    content: str,
    chunk_token_size: int = 1200,
    chunk_overlap_token_size: int = 100,
    embed_fn: Callable[[list[str]], list[list[float]]] | None = None,
    breakpoint_threshold_type: str = "percentile",
    breakpoint_threshold_amount: float | None = None,
    buffer_size: int = 1,
    min_chunk_size: int | None = None,
) -> list[dict[str, Any]]:
    """content -> [{tokens, content, chunk_order_index, _source_span?}] —
    chunking_by_semantic_vector (semantic_vector.py:199-376).  Groups over
    ``chunk_token_size`` are re-split recursively and lose their spans."""
    if embed_fn is None:
        embed_fn = lambda texts: [embed_text(t) for t in texts]  # noqa: E731
    groups = semantic_groups_with_spans(
        content,
        embed_fn,
        breakpoint_threshold_type=breakpoint_threshold_type,
        breakpoint_threshold_amount=breakpoint_threshold_amount,
        buffer_size=buffer_size,
        min_chunk_size=min_chunk_size,
    )
    out: list[dict[str, Any]] = []
    order = 0
    for text, start, end in groups:
        n = tokenizer.count(text)
        if n <= chunk_token_size:
            out.append(
                {
                    "tokens": n,
                    "content": text,
                    "chunk_order_index": order,
                    "_source_span": {"start": start, "end": end},
                }
            )
            order += 1
        else:
            for piece in chunk_text_recursive(
                tokenizer,
                text,
                chunk_token_size=chunk_token_size,
                chunk_overlap_token_size=chunk_overlap_token_size,
            ):
                out.append(
                    {
                        "tokens": piece["tokens"],
                        "content": piece["content"],
                        "chunk_order_index": order,
                    }
                )
                order += 1
    return out
