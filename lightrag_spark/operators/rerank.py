"""Rerank: pluggable relevance re-scoring of retrieved chunks.

Reference behavior re-expressed (file:line into /root/reference):
- chunk_documents_for_rerank (rerank.py:36-133): per-document overlapping
  token windows so long documents fit a rerank model's context; the
  overlap clamp (>= max_tokens -> max_tokens // 2) and the max_tokens >= 1
  guard are loop-termination invariants, kept verbatim.  When no tokenizer
  is available the reference falls back to a 1-token~4-chars character
  approximation — that path is reproduced bit-identically (it is the
  common path in this sandbox, where tiktoken is absent).
- aggregate_chunk_scores (rerank.py:158-231): window scores -> document
  scores under max/mean/first, sorted descending.
- normalize_rerank_result (utils.py:5569-5598): one validation boundary
  for provider results — bool-typed ints rejected, scores coerced to
  finite floats.
- apply_rerank_if_enabled (utils.py:5470-5566): attach rerank_score to
  the retrieved dicts in result order; empty/malformed/exceptional rerank
  output falls back to the original ordering rather than failing the
  query.
- process_chunks_unified steps 1-3 (utils.py:5601-5707): rerank ->
  min_rerank_score filter (score defaults to 1.0 when absent) ->
  chunk_top_k head.  Token truncation stays in build_context_str.

The provider HTTP adapters (rerank.py:233-593, cohere/jina/aliyun) are
out of scope by design: the pluggable ``rerank_fn(query, documents,
top_n) -> [{"index": i, "relevance_score": s}]`` IS that adapter's seam —
a production deployment passes a thin wrapper over its rerank endpoint;
tests and offline runs use ``lexical_rerank_fn``, a deterministic
model-free stand-in (the same pattern as the mock LLM extractor).

Scale contract: the list-shaped functions run driver-side over top-k
bounded retrieval results (a few hundred rows — the reference shape).
The corpus-scale face is ``rerank_scores_df``: the same lexical scorer as
a vectorized Arrow batch over a DataFrame of candidate chunks, for the
batched N-question query path.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_RERANK_MAX_TOKENS_PER_DOC = 4096
MIN_PRACTICAL_RERANK_MAX_TOKENS = 64
DEFAULT_MIN_RERANK_SCORE = 0.5

RerankFn = Callable[..., list]


def normalize_rerank_result(
    result: Any, max_index: int
) -> tuple[dict | None, str | None]:
    """Validate one rerank result into {"index", "relevance_score"} or
    (None, reason) — the single validation boundary (utils.py:5569-5598)."""
    if not isinstance(result, dict):
        return None, "not an object"
    index = result.get("index")
    if isinstance(index, bool) or not isinstance(index, int):
        return None, "invalid index"
    if not 0 <= index < max_index:
        return None, "index out of range"
    score_value = result.get("relevance_score")
    if isinstance(score_value, bool):
        return None, "invalid relevance score"
    try:
        score = float(score_value)
    except (TypeError, ValueError, OverflowError):
        return None, "invalid relevance score"
    if not math.isfinite(score):
        return None, "non-finite relevance score"
    return {"index": index, "relevance_score": score}, None


def chunk_documents_for_rerank(
    documents: Sequence[str],
    max_tokens: int = 480,
    overlap_tokens: int = 32,
    tokenizer=None,
) -> tuple[list[str], list[int]]:
    """Split long documents into overlapping windows for a token-limited
    rerank model (rerank.py:36-133).  Returns (chunks, doc_indices) where
    doc_indices[i] is the source document of chunks[i].

    ``tokenizer=None`` takes the reference's no-tokenizer fallback:
    windows of ``max_tokens * 4`` characters with ``overlap_tokens * 4``
    character overlap.  With a tokenizer (any encode/decode pair — the
    repo default is the lossless regex pre-tokenizer), windows are token
    slices decoded back to text.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if overlap_tokens >= max_tokens:
        # clamp to half the window, not max_tokens-1: a 1-token advance
        # explodes a document into O(tokens) windows
        overlap_tokens = max_tokens // 2

    chunked_docs: list[str] = []
    doc_indices: list[int] = []

    if tokenizer is None:
        max_chars = max_tokens * 4
        overlap_chars = overlap_tokens * 4
        for idx, doc in enumerate(documents):
            if len(doc) <= max_chars:
                chunked_docs.append(doc)
                doc_indices.append(idx)
                continue
            start = 0
            while start < len(doc):
                end = min(start + max_chars, len(doc))
                chunked_docs.append(doc[start:end])
                doc_indices.append(idx)
                if end >= len(doc):
                    break
                start = end - overlap_chars
        return chunked_docs, doc_indices

    for idx, doc in enumerate(documents):
        tokens = tokenizer.encode(doc)
        if len(tokens) <= max_tokens:
            chunked_docs.append(doc)
            doc_indices.append(idx)
            continue
        start = 0
        while start < len(tokens):
            end = min(start + max_tokens, len(tokens))
            chunked_docs.append(tokenizer.decode(tokens[start:end]))
            doc_indices.append(idx)
            if end >= len(tokens):
                break
            start = end - overlap_tokens
    return chunked_docs, doc_indices


def aggregate_chunk_scores(
    chunk_results: list[dict],
    doc_indices: Sequence[int],
    num_original_docs: int,
    aggregation: str = "max",
) -> list[dict]:
    """Window scores -> document scores (rerank.py:158-231): group by the
    source document, reduce with max/mean/first (unknown -> max), sort
    descending.  Documents whose every window was malformed are dropped."""
    if not chunk_results or not doc_indices:
        return []
    doc_scores: dict[int, list[float]] = {i: [] for i in range(num_original_docs)}
    for result in chunk_results:
        normalized, _ = normalize_rerank_result(result, len(doc_indices))
        if normalized is None:
            continue
        original = doc_indices[normalized["index"]]
        if isinstance(original, int) and 0 <= original < num_original_docs:
            doc_scores[original].append(normalized["relevance_score"])
    aggregated = []
    for doc_idx, scores in doc_scores.items():
        if not scores:
            continue
        if aggregation == "mean":
            final = sum(scores) / len(scores)
        elif aggregation == "first":
            final = scores[0]
        else:  # "max" and any unknown strategy
            final = max(scores)
        aggregated.append({"index": doc_idx, "relevance_score": final})
    aggregated.sort(key=lambda x: x["relevance_score"], reverse=True)
    return aggregated


def rerank_documents(
    query: str,
    documents: Sequence[str],
    rerank_fn: RerankFn,
    top_n: int | None = None,
    enable_chunking: bool = False,
    max_tokens_per_doc: int = 480,
    tokenizer=None,
) -> list[dict]:
    """The provider-independent core of generic_rerank_api
    (rerank.py:233-440 minus HTTP): optionally window the documents, score
    with ``rerank_fn``, validate every result, aggregate window scores
    back to documents (max), and apply ``top_n`` at the DOCUMENT level
    post-aggregation — an API-level top_n over windows would silently
    drop coverage of documents whose windows all rank low."""
    original_documents = list(documents)
    doc_indices = None
    original_top_n = top_n
    docs = original_documents
    if enable_chunking:
        docs, doc_indices = chunk_documents_for_rerank(
            original_documents, max_tokens=max_tokens_per_doc, tokenizer=tokenizer
        )
        top_n = None  # score every window; limit after aggregation

    results = rerank_fn(query=query, documents=docs, top_n=top_n)
    if not results:
        return []
    standardized = []
    for result in results:
        normalized, _ = normalize_rerank_result(result, len(docs))
        if normalized is not None:
            standardized.append(normalized)
    if not standardized:
        return []
    if enable_chunking and doc_indices:
        standardized = aggregate_chunk_scores(
            standardized, doc_indices, len(original_documents), aggregation="max"
        )
        if original_top_n is not None and len(standardized) > original_top_n:
            standardized = standardized[:original_top_n]
    return standardized


def apply_rerank(
    query: str,
    retrieved_docs: list[dict],
    rerank_fn: RerankFn | None,
    top_n: int | None = None,
) -> list[dict]:
    """Re-order retrieved chunk dicts by rerank score
    (apply_rerank_if_enabled, utils.py:5470-5566).  Each winning dict is
    copied with ``rerank_score`` attached; a missing rerank_fn, empty or
    fully-malformed results, or a scorer exception all fall back to the
    original list — rerank failure must degrade, not fail, the query."""
    if not retrieved_docs:
        return retrieved_docs
    if rerank_fn is None:
        return retrieved_docs
    try:
        texts = [
            doc.get("content")
            or doc.get("text")
            or doc.get("chunk_content")
            or doc.get("document")
            or str(doc)
            for doc in retrieved_docs
        ]
        results = rerank_fn(query=query, documents=texts, top_n=top_n)
        if not results:
            return retrieved_docs
        reranked = []
        for result in results:
            normalized, _ = normalize_rerank_result(result, len(retrieved_docs))
            if normalized is None:
                continue
            doc = dict(retrieved_docs[normalized["index"]])
            doc["rerank_score"] = normalized["relevance_score"]
            reranked.append(doc)
        return reranked if reranked else retrieved_docs
    except Exception:
        return retrieved_docs


def filter_by_min_rerank_score(
    docs: list[dict], min_score: float = DEFAULT_MIN_RERANK_SCORE
) -> list[dict]:
    """process_chunks_unified step 2 (utils.py:5642-5664): drop chunks
    below the floor; a chunk without a score passes (defaults to 1.0 —
    the un-scored fallback must not be filtered away)."""
    if min_score <= 0.0:
        return docs
    return [d for d in docs if d.get("rerank_score", 1.0) >= min_score]


def _lexical_scores(query_tokens: set, texts: Sequence[str]) -> list[float]:
    scores = []
    for t in texts:
        toks = set((t or "").lower().split())
        if not toks or not query_tokens:
            scores.append(0.0)
            continue
        inter = len(query_tokens & toks)
        union = len(query_tokens | toks)
        scores.append(inter / union if union else 0.0)
    return scores


def lexical_rerank_fn(
    query: str, documents: Sequence[str], top_n: int | None = None
) -> list[dict]:
    """Deterministic model-free scorer: Jaccard overlap of lowercase
    whitespace token sets, descending, index tiebreak.  The offline twin
    of a rerank endpoint — same contract, reproducible in tests and in
    the DuckDB oracle (plain set arithmetic)."""
    q = set(query.lower().split())
    scored = [
        {"index": i, "relevance_score": s}
        for i, s in enumerate(_lexical_scores(q, documents))
    ]
    scored.sort(key=lambda r: (-r["relevance_score"], r["index"]))
    if top_n is not None:
        scored = scored[:top_n]
    return scored


lexical_rerank_fn.model_identity = "lexical-jaccard-rerank-v1"


def rerank_scores_batch(
    df: DataFrame,
    question_col: str = "question",
    text_col: str = "content",
    score_col: str = "rerank_score",
) -> DataFrame:
    """N-question face of the lexical scorer: ``df`` carries BOTH a
    question column and a text column (one row per candidate pair, as the
    batched query path produces); the token-set Jaccard is computed row
    by row with built-in array functions — whole-stage codegen, no
    shuffle, no Python, any number of questions in one pass.

    Scores are rounded to 6 decimals so the DuckDB oracle twin hashes
    identically across engines."""

    def toks(c):
        return F.array_distinct(
            F.filter(
                F.split(F.lower(F.trim(F.col(c))), r"\s+"), lambda x: x != ""
            )
        )

    qt, dt = toks(question_col), toks(text_col)
    inter = F.size(F.array_intersect(dt, qt))
    union = F.size(F.array_union(dt, qt))
    return df.withColumn(
        score_col,
        F.round(
            F.when(
                union > 0, inter.cast("double") / union.cast("double")
            ).otherwise(F.lit(0.0)),
            6,
        ),
    )


def rerank_scores_df(
    chunks: DataFrame,
    query_text: str,
    text_col: str = "content",
    score_col: str = "rerank_score",
) -> DataFrame:
    """Corpus-scale face of the lexical scorer: one narrow projection, no
    shuffle, no Python — the token-set Jaccard is expressed with built-in
    array functions so it stays inside whole-stage codegen.  Used by the
    batched query path to score candidate chunks for N questions in one
    pass (the per-question driver uses the list form above).

    Ties broken downstream by (score desc, chunk_id) for determinism.
    """
    q_tokens = list(dict.fromkeys(query_text.lower().split()))
    q_arr = F.array(*[F.lit(t) for t in q_tokens]) if q_tokens else F.array().cast(
        "array<string>"
    )
    doc_tokens = F.array_distinct(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    )
    inter = F.size(F.array_intersect(doc_tokens, q_arr))
    union = F.size(F.array_union(doc_tokens, q_arr))
    return chunks.withColumn(
        score_col,
        F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
            F.lit(0.0)
        ),
    )
