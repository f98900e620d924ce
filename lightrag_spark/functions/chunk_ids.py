"""Incremental chunk-id delta application — compute_incremental_chunk_ids
(/root/reference/lightrag/utils.py:5825-5890) as both a scalar function
(reference-exact, used by tests as the oracle) and a Spark column
expression (the distributed form: one projection applies the delta to
every entity's tracking row at once, no Python).

Authority model (utils.py docstring, preserved): the existing tracking
list is AUTHORITATIVE; an id present in both old and new but absent from
existing was intentionally pruned and is NOT restored — only genuine
additions (new - old) are appended, in new-list order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def compute_incremental_chunk_ids(
    existing_full_chunk_ids: list[str],
    old_chunk_ids: list[str],
    new_chunk_ids: list[str],
) -> list[str]:
    """Reference-exact scalar port (utils.py:5825-5890)."""
    chunks_to_remove = set(old_chunk_ids) - set(new_chunk_ids)
    chunks_to_add = set(new_chunk_ids) - set(old_chunk_ids)
    updated = [c for c in existing_full_chunk_ids if c and c not in chunks_to_remove]
    seen = set(updated)
    for cid in new_chunk_ids:
        if cid and cid in chunks_to_add and cid not in seen:
            seen.add(cid)
            updated.append(cid)
    return updated


def incremental_chunk_ids_col(
    existing: Column, old: Column, new: Column
) -> Column:
    """The same delta applied as a pure array expression — whole-stage
    codegen applies, so an incremental upsert can update every tracking
    row in one scan-side projection instead of a rebuild.

    Semantics proven equal to the scalar port by the hypothesis
    differential in tests/test_chunk_ids.py.
    """
    to_remove = F.array_except(old, new)
    to_add = F.array_except(new, old)
    kept = F.filter(
        existing,
        lambda x: (x != F.lit("")) & ~F.array_contains(to_remove, x),
    )
    additions = F.array_distinct(
        F.filter(
            new,
            lambda x: (x != F.lit(""))
            & F.array_contains(to_add, x)
            & ~F.array_contains(kept, x),
        )
    )
    return F.concat(kept, additions)


def subtract_source_ids(source_ids, ids_to_remove) -> list[str]:
    """Remove ids while preserving order, dropping empties — the deletion
    path's source-id subtraction (utils.py:5893-5908)."""
    removal = set(ids_to_remove)
    if not removal:
        return [s for s in source_ids if s]
    return [s for s in source_ids if s and s not in removal]


def make_relation_chunk_key(src: str, tgt: str) -> str:
    """Deterministic relation chunk-tracking key (utils.py:5910-5913)."""
    from ..constants import GRAPH_FIELD_SEP

    return GRAPH_FIELD_SEP.join(sorted((src, tgt)))


def parse_relation_chunk_key(key: str) -> tuple[str, str]:
    """Inverse of make_relation_chunk_key (utils.py:5916-5922)."""
    from ..constants import GRAPH_FIELD_SEP

    parts = key.split(GRAPH_FIELD_SEP)
    if len(parts) != 2:
        raise ValueError(f"Invalid relation chunk key: {key}")
    return parts[0], parts[1]
