"""compute_incremental_chunk_ids: reference-docstring example, authority-
model cases, and a hypothesis differential proving the Spark column
expression equals the scalar port."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from lightrag_spark.functions.chunk_ids import (
    compute_incremental_chunk_ids,
    incremental_chunk_ids_col,
)


def test_reference_docstring_example():
    assert compute_incremental_chunk_ids(
        ["chunk-1", "chunk-2", "chunk-3"],
        ["chunk-1", "chunk-2"],
        ["chunk-2", "chunk-4"],
    ) == ["chunk-2", "chunk-3", "chunk-4"]


def test_authority_model_no_resurrection():
    """An id in both old and new but absent from existing was intentionally
    pruned -> NOT restored (utils.py:5838-5856)."""
    assert compute_incremental_chunk_ids(
        ["c3"], ["c1", "c2"], ["c1", "c5"]
    ) == ["c3", "c5"]


def test_empty_ids_dropped_and_order():
    assert compute_incremental_chunk_ids(
        ["", "a", "b"], [""], ["b", "", "d", "c", "d"]
    ) == ["a", "b", "d", "c"]
    assert compute_incremental_chunk_ids([], [], []) == []


IDS = st.lists(st.sampled_from(["", "a", "b", "c", "d", "e", "f"]), max_size=8)


@settings(max_examples=200, deadline=None)
@given(existing=IDS, old=IDS, new=IDS)
def test_scalar_is_pure_and_deduped_additions(existing, old, new):
    out = compute_incremental_chunk_ids(existing, old, new)
    # additions appear at most once and only from new-old
    added = out[len([c for c in existing if c and c not in (set(old) - set(new))]):]
    assert len(added) == len(set(added))
    assert set(added) <= (set(new) - set(old))


def test_column_matches_scalar_differential(spark):
    import itertools

    pool = ["", "a", "b", "c", "d"]
    cases = []
    # exhaustive over small cross-products + the docstring/authority cases
    small = [[], ["a"], ["a", "b"], ["b", "a", "b"], ["", "c"], ["c", "d", "a"]]
    for e, o, n in itertools.product(small, repeat=3):
        cases.append((e, o, n))
    cases.append((["chunk-1", "chunk-2", "chunk-3"], ["chunk-1", "chunk-2"],
                  ["chunk-2", "chunk-4"]))
    df = spark.createDataFrame(
        [(i, e, o, n) for i, (e, o, n) in enumerate(cases)],
        "id long, existing array<string>, old array<string>, new array<string>",
    )
    got = {
        r.id: list(r.out)
        for r in df.select(
            "id",
            incremental_chunk_ids_col(
                df["existing"], df["old"], df["new"]
            ).alias("out"),
        ).collect()
    }
    for i, (e, o, n) in enumerate(cases):
        assert got[i] == compute_incremental_chunk_ids(e, o, n), (e, o, n)
