"""Description summarization finalizer (reference-parity control flow).

Mirrors ``_handle_entity_relation_summary`` + ``_summarize_descriptions``
(/root/reference/lightrag/operate.py:368-611):

1. empty list -> ("", no-LLM); single fragment -> sanitized as-is;
2. while the fragment list is large: if total tokens <= summary_context_size
   (12000) or <=2 items left, finish — joining with <SEP> when under both the
   force-merge count (8) and the token budget (1200), else one final model
   summary;
3. otherwise greedy-pack fragments into <=context-size groups (minimum 2 per
   group to guarantee progress), summarize each group, repeat.

The model is a deterministic stand-in (:func:`mock_summarize`); a real
deployment swaps in a batched client.  The loop is bounded by the merge-side
fragment cap, so it runs entirely inside the per-entity finalizer UDF — no
cross-partition reduce is needed.
"""

from __future__ import annotations

from typing import Callable

from ..constants import (
    FORCE_LLM_SUMMARY_ON_MERGE,
    GRAPH_FIELD_SEP,
    SUMMARY_CONTEXT_SIZE,
    SUMMARY_MAX_TOKENS,
)
from .textnorm import sanitize_text_for_encoding
from .tokenizer import Tokenizer

Summarizer = Callable[[str, str, list[str]], str]


def mock_summarize(kind: str, name: str, fragments: list[str]) -> str:
    """Deterministic model stand-in: stable over content of the group."""
    head = fragments[0] if fragments else ""
    return f"{kind} summary of {name}: {head} [+{max(0, len(fragments) - 1)} merged fragments]"


def summarize_description_list(
    kind: str,
    name: str,
    fragments: list[str],
    tokenizer: Tokenizer,
    summarizer: Summarizer = mock_summarize,
    summary_context_size: int = SUMMARY_CONTEXT_SIZE,
    summary_max_tokens: int = SUMMARY_MAX_TOKENS,
    force_llm_summary_on_merge: int = FORCE_LLM_SUMMARY_ON_MERGE,
    separator: str = GRAPH_FIELD_SEP,
) -> tuple[str, bool]:
    if not fragments:
        return "", False
    if len(fragments) == 1:
        return sanitize_text_for_encoding(fragments[0]), False

    current = list(fragments)
    used = False
    while True:
        counts = [tokenizer.count(d) for d in current]
        total = sum(counts)

        if total <= summary_context_size or len(current) <= 2:
            if len(current) < force_llm_summary_on_merge and total < summary_max_tokens:
                joined = sanitize_text_for_encoding(separator.join(current))
                return (joined if joined else ""), used
            return summarizer(kind, name, current), True

        # Map phase: greedy-pack into <= context-size groups, min 2 per group.
        groups: list[list[str]] = []
        group: list[str] = []
        group_tokens = 0
        for desc, n in zip(current, counts):
            if group_tokens + n > summary_context_size and group:
                if len(group) == 1:
                    group.append(desc)
                    groups.append(group)
                    group = []
                    group_tokens = 0
                else:
                    groups.append(group)
                    group = [desc]
                    group_tokens = n
            else:
                group.append(desc)
                group_tokens += n
        if group:
            groups.append(group)

        # Reduce phase
        reduced: list[str] = []
        for g in groups:
            if len(g) == 1:
                reduced.append(g[0])
            else:
                reduced.append(summarizer(kind, name, g))
                used = True
        current = reduced
