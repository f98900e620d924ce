"""Sequence packing (operators/packing.py): the distributed two-phase
prefix scan must reproduce the sequential tape layout bit-for-bit,
independent of input partitioning, with NO single-partition global window
in the physical plan (the scale killer it exists to avoid)."""

from __future__ import annotations

import pytest

from lightrag_spark.operators.packing import pack_block_stats, pack_sequences


def _docs(spark, rows, partitions=None):
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return df.repartition(partitions) if partitions else df


ROWS = [
    (f"d{i:03d}", " ".join(f"w{j}" for j in range((i * 37) % 90 + 1)))
    for i in range(40)
]


def _sequential_layout(rows, block_size, sep=1):
    out, offset = {}, 0
    for doc_id, text in sorted(rows):
        tokens = len(text.split())
        cost = tokens + sep
        out[doc_id] = (
            tokens, offset, offset // block_size, (offset + cost - 1) // block_size
        )
        offset += cost
    return out


def test_layout_matches_sequential_semantics(spark):
    got = {
        r["doc_id"]: (r["tokens"], r["offset"], r["start_block"], r["end_block"])
        for r in pack_sequences(_docs(spark, ROWS), block_size=64).collect()
    }
    assert got == _sequential_layout(ROWS, 64)


def test_partition_invariance(spark):
    base = {
        tuple(r)
        for r in pack_sequences(_docs(spark, ROWS), block_size=64).collect()
    }
    for n in (1, 3, 17):
        shuffled = {
            tuple(r)
            for r in pack_sequences(
                _docs(spark, ROWS, partitions=n), block_size=64, partitions=5
            ).collect()
        }
        assert shuffled == base, n


def test_long_doc_spans_blocks_and_stats(spark):
    rows = [
        ("a", " ".join(["x"] * 10)),
        ("b", " ".join(["y"] * 300)),  # spans several 64-blocks
        ("c", "z z z"),
    ]
    packed = pack_sequences(_docs(spark, rows), block_size=64)
    by_id = {r["doc_id"]: r for r in packed.collect()}
    assert by_id["b"]["n_blocks"] >= 4
    assert by_id["a"]["start_block"] == 0
    # stats: every block between min and max start appears; doc b counted
    # in each block it spans
    stats = {r["block_id"]: r for r in pack_block_stats(packed, 64).collect()}
    for blk in range(by_id["b"]["start_block"], by_id["b"]["end_block"] + 1):
        assert blk in stats
        assert stats[blk]["first_doc"] <= "b" <= stats[blk]["last_doc"]
    total_positions = sum(r["tokens"] + 1 for r in packed.collect())
    assert max(stats) == (total_positions - 1) // 64


def test_no_global_single_partition_window(spark):
    """The physical plan must not contain a partition-less Window —
    the whole point of the two-phase scan."""
    plan = pack_sequences(_docs(spark, ROWS), block_size=64)._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan  # the partition-local cumsum is a window...
    # ...but every Window node carries a partition spec (_pid)
    for line in plan.splitlines():
        if "Window [" in line or "RunningWindowFunction" in line:
            assert "_pid" in line, line


def test_validation(spark):
    with pytest.raises(ValueError):
        pack_sequences(_docs(spark, ROWS), block_size=0)
