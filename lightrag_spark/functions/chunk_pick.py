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


def build_sorted_chunks(
    items: list[dict],
    exclude_chunk_ids=None,
    drop_empty: bool = False,
) -> tuple[list[dict], dict]:
    """Steps 2-3 shared by _find_related_text_unit_from_entities
    (operate.py:5739-5766) and ..._from_relations (operate.py:6001-6056):
    occurrence counting + first-seen dedup over rank-ordered chunk lists,
    then a per-item STABLE sort by final occurrence count descending (a
    chunk shared with later items outranks an unshared one even though
    only its first owner kept it).

    ``exclude_chunk_ids`` drops chunks before counting — the relation
    path's dedup against the already-selected entity chunks.
    ``drop_empty`` removes items left with no chunks: the reference does
    this for relations but NOT for entities, where empty items keep their
    slot in the weighted-polling quota gradient.

    Each input item carries ``chunks``; each output item gains
    ``sorted_chunks``.  Returns (items, occurrence_counts).
    """
    exclude = set(exclude_chunk_ids or ())
    counts: dict[str, int] = {}
    staged: list[tuple[dict, list[str]]] = []
    for it in items:
        kept: list[str] = []
        for cid in it.get("chunks", []):
            if cid in exclude:
                continue
            counts[cid] = counts.get(cid, 0) + 1
            if counts[cid] == 1:
                kept.append(cid)
        staged.append((it, kept))
    out: list[dict] = []
    for it, kept in staged:
        if drop_empty and not kept:
            continue
        new = dict(it)
        new["sorted_chunks"] = sorted(
            kept, key=lambda c: counts.get(c, 0), reverse=True
        )
        out.append(new)
    return out, counts


def round_robin_merge_chunk_ids(*ordered_id_lists: list[str]) -> list[str]:
    """The id-level core of _merge_all_chunks (operate.py:5210-5258):
    iteration i takes list0[i], list1[i], ... skipping already-seen ids.
    Callers pass (vector, entity, relation) in that reference order."""
    merged: list[str] = []
    seen: set[str] = set()
    for i in range(max((len(l) for l in ordered_id_lists), default=0)):
        for lst in ordered_id_lists:
            if i < len(lst):
                cid = lst[i]
                if cid and cid not in seen:
                    seen.add(cid)
                    merged.append(cid)
    return merged


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
