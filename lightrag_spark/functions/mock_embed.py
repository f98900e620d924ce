"""Deterministic mock embedder (feature hashing).

Stands in for the embedding endpoint the reference calls when populating
its vector stores (kg/nano_vector_db_impl.py).  Classic hashing trick:
tokens map to dimensions via md5, signed by one hash bit, L2-normalized —
deterministic across processes and languages, no model weights needed.
Similar texts (shared tokens) get high cosine similarity, so retrieval
behavior is meaningful, not just plumbing.

A real deployment swaps :func:`embed_text` for a batched client; the Spark
operator (operators.embedding) keeps the same Arrow-batched shape either
way.
"""

from __future__ import annotations

import math
from hashlib import md5

DEFAULT_DIM = 64


def embed_text(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    vec = [0.0] * dim
    for tok in text.split():
        h = md5(tok.encode("utf-8", "replace")).digest()
        idx = int.from_bytes(h[:4], "big") % dim
        sign = 1.0 if h[4] & 1 else -1.0
        vec[idx] += sign
    norm = math.sqrt(sum(v * v for v in vec))
    if norm > 0:
        vec = [v / norm for v in vec]
    return vec
