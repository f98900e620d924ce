"""Keyword extraction for query routing — extract_keywords_only
(/root/reference/lightrag/operate.py:4563-4668) + its answer cache
(:4326-4349, keyed by compute_args_hash over mode/text/language).

The reference sends the query to the LLM with a keywords-extraction prompt
and expects a JSON payload {"high_level_keywords": [...],
"low_level_keywords": [...]}; responses are cached in llm_response_cache
under cache_type="keywords".  Here the model is pluggable
(``model_fn(text) -> response_str``); the default is a deterministic mock
so tests and the driver need no endpoint.  A real deployment passes a
client callable — the cache contract is unchanged.

Queries are driver-side singletons, so this is plain Python (the correct
altitude — one LLM call, no data to distribute); ``extract_keywords_batch``
is the mapInPandas variant for bulk offline query workloads.
"""

from __future__ import annotations

import json
import re
from typing import Callable

from .hashing import compute_args_hash
from .textnorm import strip_markdown_code_fence

DEFAULT_SUMMARY_LANGUAGE = "English"


def keywords_cache_key(mode: str, text: str, language: str = DEFAULT_SUMMARY_LANGUAGE) -> str:
    """Cache key (operate.py:4586-4592): args-hash over (mode, text,
    language) — the llm-identity suffix is a constant here (one mock
    model), folded in as a fixed tag."""
    return compute_args_hash(mode, text, language, "keywords")


def mock_keyword_model(text: str) -> str:
    """Deterministic stand-in for the keywords-extraction LLM call:
    high-level = longer tokens (>=7 chars), low-level = mid-length tokens
    (4-6 chars); sorted unique, capped like the reference's prompt asks
    (at most 5 high / 10 low)."""
    toks = [t.strip(".,;:!?\"'()[]").lower() for t in text.split()]
    hl = sorted({t for t in toks if len(t) >= 7})[:5]
    ll = sorted({t for t in toks if 4 <= len(t) < 7})[:10]
    return json.dumps(
        {"high_level_keywords": hl, "low_level_keywords": ll}, ensure_ascii=False
    )


def parse_keywords_payload(response: str) -> tuple[bool, list[str], list[str]]:
    """Tolerant parse of the keywords JSON (operate.py:4600-4640 behavior):
    strip code fences, try json, fall back to a regex scrape; returns
    (is_valid, hl_keywords, ll_keywords)."""
    if not response:
        return False, [], []
    body = strip_markdown_code_fence(response.strip())
    try:
        data = json.loads(body)
        hl = data.get("high_level_keywords", [])
        ll = data.get("low_level_keywords", [])
        if isinstance(hl, list) and isinstance(ll, list):
            return True, [str(x) for x in hl], [str(x) for x in ll]
    except (json.JSONDecodeError, AttributeError):
        pass
    m_hl = re.search(r'"high_level_keywords"\s*:\s*\[(.*?)\]', body, re.DOTALL)
    m_ll = re.search(r'"low_level_keywords"\s*:\s*\[(.*?)\]', body, re.DOTALL)
    if not (m_hl or m_ll):
        return False, [], []

    def items(m):
        return re.findall(r'"([^"]*)"', m.group(1)) if m else []

    return True, items(m_hl), items(m_ll)


def extract_keywords_only(
    text: str,
    mode: str = "hybrid",
    model_fn: Callable[[str], str] | None = None,
    cache: dict[str, str] | None = None,
    language: str = DEFAULT_SUMMARY_LANGUAGE,
) -> tuple[list[str], list[str]]:
    """(hl_keywords, ll_keywords) with cache-first semantics
    (operate.py:4563-4668).  ``cache`` is a mutable mapping acting as the
    llm_response_cache KV table; a hit skips the model entirely — and an
    INVALID cached payload is ignored and overwritten, matching the
    reference's is_valid_payload re-query."""
    model_fn = model_fn or mock_keyword_model
    key = keywords_cache_key(mode, text, language)
    if cache is not None and key in cache:
        ok, hl, ll = parse_keywords_payload(cache[key])
        if ok:
            return hl, ll
    response = model_fn(text)
    ok, hl, ll = parse_keywords_payload(response)
    if not ok:
        return [], []
    if cache is not None:
        cache[key] = response
    return hl, ll


def extract_keywords_batch(
    queries_df,
    mode: str = "hybrid",
    language: str = DEFAULT_SUMMARY_LANGUAGE,
):
    """Bulk variant over a DataFrame(query_id, text) -> (query_id,
    args_hash, hl_keywords, ll_keywords) via mapInPandas (offline query
    workloads; one Python stage, scales with partitions)."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("query_id", StringType()),
            StructField("args_hash", StringType()),
            StructField("hl_keywords", ArrayType(StringType())),
            StructField("ll_keywords", ArrayType(StringType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in ("query_id", "args_hash", "hl_keywords", "ll_keywords")}
            for qid, text in zip(pdf["query_id"], pdf["text"]):
                hl, ll = extract_keywords_only(text or "", mode=mode, language=language)
                out["query_id"].append(qid)
                out["args_hash"].append(keywords_cache_key(mode, text or "", language))
                out["hl_keywords"].append(hl)
                out["ll_keywords"].append(ll)
            yield pd.DataFrame(out)

    return queries_df.select("query_id", "text").mapInPandas(run, schema=schema)
