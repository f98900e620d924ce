"""Deterministic mock "LLM" extractor.

The reference calls a real LLM per chunk with the extraction prompt
(/root/reference/lightrag/prompt.py:54-159) and parses the delimiter-format
response.  This environment has no LLM, so tests and benchmarks use a
deterministic stand-in that derives entity/relation rows from the chunk
content itself and renders them in the reference's exact response format
(rows ``entity<|#|>...`` / ``relation<|#|>...`` + ``<|COMPLETE|>``).

The rule set is intentionally simple and *independently re-expressible in
ANSI SQL*, which lets DuckDB act as a full-pipeline oracle:

- tokens   = whitespace-split of the chunk content
- entities = tokens of length >= ``min_len`` (distinct, first-appearance
  order); entity type chosen from the reference's default type list by a
  stable hash of the name
- relations = adjacent pairs in the entity-token stream (consecutive
  occurrences, self-pairs skipped), weight 1.0 each

A gleaning pass (pass_index=1, reference gleans once by default —
constants.py:17) re-emits every 3rd entity with a strictly longer
description plus one synthetic extra entity, exercising the
longer-description-wins merge (operate.py:3928-3965).

``corruption=True`` re-spells some delimiters in the corruption shapes that
``fix_tuple_delimiter_corruption`` repairs, so parsed output is unchanged —
used by tests to prove the repair path.

A real deployment swaps :class:`MockExtractorModel` for a client that sends
Arrow batches of prompts to an inference endpoint; the surrounding Spark
dataflow is identical.
"""

from __future__ import annotations

from hashlib import md5

from ..constants import COMPLETION_DELIMITER, DEFAULT_ENTITY_TYPES, TUPLE_DELIMITER

# Corruption spellings fixed by fix_tuple_delimiter_corruption (utils.py:5967-6090).
_CORRUPT_FORMS = ["<|##|>", "<#>", "<|#>", "<#|>", "<X|#|>", "<|#|Y>", "||#||", "|#|>"]


def _stable_bucket(name: str, buckets: int) -> int:
    return int(md5(name.encode("utf-8")).hexdigest()[:8], 16) % buckets


def entity_type_for(name: str) -> str:
    """Deterministic entity type: hash-pick from the 11 default types
    (excluding the 'Other' catch-all)."""
    return DEFAULT_ENTITY_TYPES[_stable_bucket(name, len(DEFAULT_ENTITY_TYPES) - 1)]


def rule_entities(tokens: list[str], min_len: int = 5) -> list[str]:
    """Distinct entity tokens in first-appearance order."""
    seen: set[str] = set()
    out: list[str] = []
    for t in tokens:
        if len(t) >= min_len and t not in seen:
            seen.add(t)
            out.append(t)
    return out


def rule_relations(tokens: list[str], min_len: int = 5) -> list[tuple[str, str]]:
    """Adjacent pairs of the (duplicate-preserving) entity-token stream."""
    stream = [t for t in tokens if len(t) >= min_len]
    return [(a, b) for a, b in zip(stream, stream[1:]) if a != b]


class MockExtractorModel:
    """Deterministic chunk -> extraction-response generator."""

    def __init__(self, min_len: int = 5, corruption: bool = False):
        self.min_len = min_len
        self.corruption = corruption

    def _maybe_corrupt(self, row: str, salt: str) -> str:
        if not self.corruption:
            return row
        bucket = _stable_bucket(salt + row, 3)
        if bucket == 0:
            return row
        form = _CORRUPT_FORMS[_stable_bucket(row, len(_CORRUPT_FORMS))]
        # Re-spell only the first delimiter; the parser must repair it.
        return row.replace(TUPLE_DELIMITER, form, 1)

    def respond(
        self, chunk_content: str, pass_index: int = 0, prior_response: str | None = None
    ) -> str:
        # prior_response is part of the respond() duck-type (gleaning history
        # for real endpoints, llm_adapter.py); the deterministic mock derives
        # the gleaning rows from the chunk alone.
        tokens = chunk_content.split()
        entities = rule_entities(tokens, self.min_len)
        relations = rule_relations(tokens, self.min_len)
        rows: list[str] = []
        d = TUPLE_DELIMITER
        if pass_index == 0:
            for name in entities:
                desc = f"{name} is mentioned in this passage"
                rows.append(f"entity{d}{name}{d}{entity_type_for(name)}{d}{desc}")
            for a, b in relations:
                desc = f"{a} occurs adjacent to {b}"
                rows.append(f"relation{d}{a}{d}{b}{d}cooccurrence, adjacency{d}{desc}")
        else:
            # Gleaning: longer descriptions for every 3rd entity + one extra.
            for name in entities[::3]:
                desc = f"{name} is mentioned in this passage and recurs as a salient term"
                rows.append(f"entity{d}{name}{d}{entity_type_for(name)}{d}{desc}")
            if entities:
                extra = f"{entities[0]}x"
                rows.append(
                    f"entity{d}{extra}{d}{entity_type_for(extra)}{d}{extra} is a gleaned variant term"
                )
        rows = [self._maybe_corrupt(r, chunk_content[:16]) for r in rows]
        return "\n".join(rows) + "\n" + COMPLETION_DELIMITER
