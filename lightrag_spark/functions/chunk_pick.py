"""Chunk-selection algorithms for query context assembly.

- ``pick_by_weighted_polling`` — reference-exact port of
  /root/reference/lightrag/utils.py:5189-5270: linear-gradient quota from
  ``max_related_chunks`` (most important entity) down to
  ``min_related_chunks`` (least), first-round allocation per entity, then
  multi-round scanning that re-allocates unfilled quota to entities that
  still have unused chunks (importance order).  Pure function — runs
  driver-side over the COLLECTED top-k entity lists (bounded by
  construction) exactly like the reference's in-memory lists.
- ``pick_by_vector_similarity`` lives Spark-side
  (plans/query.pick_chunks_by_vector): candidate chunk ids are filtered in
  the chunks-VDB table and ranked by query cosine — that step can touch a
  corpus-scale table, so it stays a DataFrame op.
"""

from __future__ import annotations


def pick_by_weighted_polling(
    entities_or_relations: list[dict],
    max_related_chunks: int,
    min_related_chunks: int = 1,
) -> list[str]:
    """utils.py:5189-5270, verbatim semantics.  Each element carries
    ``sorted_chunks``: its chunk ids in selection order."""
    if not entities_or_relations:
        return []
    if max_related_chunks <= 0:
        return []

    n = len(entities_or_relations)
    if n == 1:
        return entities_or_relations[0].get("sorted_chunks", [])[:max_related_chunks]

    expected_counts = []
    for i in range(n):
        ratio = i / (n - 1) if n > 1 else 0
        expected = max_related_chunks - ratio * (max_related_chunks - min_related_chunks)
        expected_counts.append(int(round(expected)))

    selected_chunks: list[str] = []
    used_counts: list[int] = []
    total_remaining = 0
    for i, entity_rel in enumerate(entities_or_relations):
        entity_chunks = entity_rel.get("sorted_chunks", [])
        expected = expected_counts[i]
        actual = min(expected, len(entity_chunks))
        selected_chunks.extend(entity_chunks[:actual])
        used_counts.append(actual)
        remaining = expected - actual
        if remaining > 0:
            total_remaining += remaining

    for _ in range(total_remaining):
        allocated = False
        for i, entity_rel in enumerate(entities_or_relations):
            entity_chunks = entity_rel.get("sorted_chunks", [])
            if used_counts[i] < len(entity_chunks):
                selected_chunks.append(entity_chunks[used_counts[i]])
                used_counts[i] += 1
                allocated = True
                break
        if not allocated:
            break

    return selected_chunks
