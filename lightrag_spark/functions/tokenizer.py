"""Tokenizers for the token-window chunker.

The reference uses tiktoken (model "gpt-4o-mini" -> o200k_base,
/root/reference/lightrag/lightrag.py:537, utils.py:3096-3123).  tiktoken is
not guaranteed in this environment, so three implementations share one
protocol:

- :class:`TiktokenTokenizer` — import-gated; token-identical to the
  reference when tiktoken is installed.
- :class:`RegexTokenizer` — the deterministic default: a lossless
  GPT-2-style pre-tokenization split.  ``decode(encode(s)) == s`` for every
  string, so token-window chunking + overlap semantics (windows over the
  token sequence, decode of each window) behave exactly like a BPE tokenizer
  whose merges never cross the pre-tokenization boundary.
- :class:`CharTokenizer` — 1:1 char<->token, mirroring the reference's
  test ``DummyTokenizer`` (tests/extraction/test_extract_entities.py:20-57).

Executors instantiate tokenizers via module-level singletons (one init per
worker process), never per row.
"""

from __future__ import annotations

import re
from typing import Protocol, Sequence


class Tokenizer(Protocol):
    def encode(self, text: str) -> list:  # token sequence (ids or strings)
        ...

    def decode(self, tokens: Sequence) -> str:
        ...

    def count(self, text: str) -> int:
        ...


# GPT-2-style pre-tokenization: contraction suffixes, space-prefixed word /
# number / punctuation runs, then whitespace runs.  The alternation covers
# every character, so concatenating the pieces reproduces the input exactly.
_PRETOKEN = re.compile(
    r"'(?:[sdmt]|ll|ve|re)"
    r"| ?[^\W\d_]+"
    r"| ?\d+"
    r"| ?(?:[^\s\w]|_)+"  # punctuation runs; '_' is \w but not a letter, so
    #                       it must be claimed here or findall would drop it
    r"|\s+(?!\S)"
    r"|\s+"
    r"|\S",  # safety net: any remaining single char (keeps decode lossless)
    re.UNICODE,
)


class RegexTokenizer:
    """Lossless deterministic tokenizer (default when tiktoken is absent)."""

    name = "regex-pretoken"

    def encode(self, text: str) -> list[str]:
        return _PRETOKEN.findall(text)

    def decode(self, tokens: Sequence[str]) -> str:
        return "".join(tokens)

    def count(self, text: str) -> int:
        return len(self.encode(text))


class CharTokenizer:
    """1 char = 1 token; matches the reference tests' DummyTokenizer."""

    name = "char"

    def encode(self, text: str) -> list[str]:
        return list(text)

    def decode(self, tokens: Sequence[str]) -> str:
        return "".join(tokens)

    def count(self, text: str) -> int:
        return len(text)


class WhitespaceTokenizer:
    """Whitespace-word tokenizer.

    Used by the SQL-checkable "simple mode" pipeline: the same tokenization is
    expressible in ANSI SQL (``regexp_split_to_array(trim(text), '\\s+')``),
    which lets DuckDB act as an independent oracle for the Spark chunker.
    Decode joins with single spaces, so it is lossless only for
    single-space-separated text (which the simple-mode path normalizes first).
    """

    name = "whitespace"

    def encode(self, text: str) -> list[str]:
        return text.split()

    def decode(self, tokens: Sequence[str]) -> str:
        return " ".join(tokens)

    def count(self, text: str) -> int:
        return len(text.split())


class TiktokenTokenizer:
    """Token-identical to the reference when tiktoken is available."""

    def __init__(self, model_name: str = "gpt-4o-mini"):
        import tiktoken  # gated: not guaranteed in this environment

        try:
            self._enc = tiktoken.encoding_for_model(model_name)
        except KeyError:
            self._enc = tiktoken.get_encoding("o200k_base")
        self.name = f"tiktoken:{self._enc.name}"

    def encode(self, text: str) -> list[int]:
        return self._enc.encode(text)

    def decode(self, tokens: Sequence[int]) -> str:
        return self._enc.decode(list(tokens))

    def count(self, text: str) -> int:
        return len(self.encode(text))


_SINGLETONS: dict[str, Tokenizer] = {}


def get_tokenizer(kind: str = "auto") -> Tokenizer:
    """Per-process tokenizer singleton. kinds: auto|tiktoken|regex|char|whitespace."""
    if kind in _SINGLETONS:
        return _SINGLETONS[kind]
    if kind == "auto":
        try:
            tok: Tokenizer = TiktokenTokenizer()
        except Exception:
            tok = RegexTokenizer()
    elif kind == "tiktoken":
        tok = TiktokenTokenizer()
    elif kind == "regex":
        tok = RegexTokenizer()
    elif kind == "char":
        tok = CharTokenizer()
    elif kind == "whitespace":
        tok = WhitespaceTokenizer()
    else:
        raise ValueError(f"unknown tokenizer kind: {kind}")
    _SINGLETONS[kind] = tok
    return tok


def truncate_by_token_limit(tokenizer: Tokenizer, text: str, limit: int) -> str:
    """Longest prefix of ``text`` that VERIFIABLY fits ``limit`` tokens —
    the reference's Tokenizer.truncate_by_token_limit contract
    (operate.py:293-340 relies on it): the candidate is re-encoded and
    shrunk until it actually fits, because decode(tokens[:k]) is not
    guaranteed to round-trip to <= k tokens for every tokenizer.
    """
    if limit <= 0:
        raise ValueError(f"token limit must be positive, got {limit}")
    toks = tokenizer.encode(text)
    if len(toks) <= limit:
        return text
    k = limit
    cand = tokenizer.decode(toks[:k])
    while k > 1 and tokenizer.count(cand) > limit:
        k -= 1
        cand = tokenizer.decode(toks[:k])
    return cand


def truncate_vdb_content(
    content: str,
    tokenizer: Tokenizer | None,
    embedding_token_limit: int | None,
) -> str:
    """_truncate_vdb_content (operate.py:293-340): clamp a vector-store
    payload under the embedding model's input limit; no-op when no limit
    or no tokenizer is configured."""
    if not content or embedding_token_limit is None or tokenizer is None:
        return content
    threshold = int(embedding_token_limit)
    if threshold <= 0:
        return content
    return truncate_by_token_limit(tokenizer, content, threshold)


def truncate_list_by_token_size(
    list_data: list,
    key,
    separator: str,
    max_token_size: int,
    tokenizer: Tokenizer,
) -> list:
    """Keep the first K whole items whose separator-joined rendering fits
    ``max_token_size`` — reference-exact semantics (utils.py:3395-3436):
    the separator's own tokens count toward the budget, items are never
    partially truncated, and the kept prefix is independently re-verified
    (BPE token counts are not monotonic in text length)."""
    if max_token_size <= 0 or not list_data:
        return []
    rendered = [key(d) for d in list_data]
    full_text = separator.join(rendered)
    try:
        safe_prefix = truncate_by_token_limit(tokenizer, full_text, max_token_size)
    except ValueError:
        return []
    end = len(safe_prefix)

    k, pos = 0, 0
    for i, r in enumerate(rendered):
        item_end = pos + len(r)
        if item_end <= end:
            k = i + 1
            pos = item_end + len(separator)
        else:
            break
    while k > 0:
        if tokenizer.count(separator.join(rendered[:k])) <= max_token_size:
            break
        k -= 1
    return list_data[:k]
