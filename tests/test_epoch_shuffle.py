"""epoch_shuffle — permutation/balance contracts, epoch independence,
partitioning invariance (the property that bans RNG-state sampling),
and the distributed-rank vs single-window differential."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lightrag_spark.operators.sampling import epoch_shuffle


def _docs(spark, n):
    return spark.createDataFrame([(i,) for i in range(n)], "doc_id long")


def test_each_epoch_is_a_permutation(spark):
    out = epoch_shuffle(_docs(spark, 50), epochs=3).collect()
    by_epoch: dict = {}
    for r in out:
        by_epoch.setdefault(r.epoch, []).append(r.shuffle_pos)
    assert set(by_epoch) == {0, 1, 2}
    for poss in by_epoch.values():
        assert sorted(poss) == list(range(1, 51))


def test_epochs_differ_and_shards_balance(spark):
    out = epoch_shuffle(_docs(spark, 40), epochs=2, n_shards=4).collect()
    order = {
        e: [r.doc_id for r in sorted(out, key=lambda r: r.shuffle_pos) if r.epoch == e]
        for e in (0, 1)
    }
    assert order[0] != order[1]  # fresh order per epoch
    from collections import Counter

    sizes = Counter((r.epoch, r.shard_id) for r in out)
    assert all(v == 10 for v in sizes.values())


def test_partitioning_invariance(spark):
    """The order must be a pure function of (seed, epoch, doc_id):
    repartitioning the input must not move anything."""
    docs = _docs(spark, 64)
    a = {(r.doc_id, r.epoch): r.shuffle_pos for r in epoch_shuffle(docs, epochs=2, partitions=2).collect()}
    b = {(r.doc_id, r.epoch): r.shuffle_pos for r in epoch_shuffle(docs.repartition(13), epochs=2, partitions=9).collect()}
    assert a == b


def test_matches_single_window_rank(spark):
    """Distributed grouped scan == literal per-epoch row_number (the
    DuckDB twin's formulation)."""
    docs = _docs(spark, 100)
    got = {
        (r.doc_id, r.epoch): r.shuffle_pos
        for r in epoch_shuffle(docs, epochs=2, partitions=8).collect()
    }
    hashed = docs.withColumn(
        "epoch", F.explode(F.array(F.lit(0), F.lit(1)))
    ).select(
        "doc_id",
        F.col("epoch").cast("long").alias("epoch"),
        F.md5(
            F.concat_ws(":", F.lit("epoch"), F.col("epoch").cast("string"), "doc_id")
        ).alias("h"),
    )
    w = Window.partitionBy("epoch").orderBy("h")
    exp = {
        (r.doc_id, r.epoch): r.pos
        for r in hashed.withColumn("pos", F.row_number().over(w)).collect()
    }
    assert got == exp


def test_param_validation(spark):
    with pytest.raises(ValueError):
        epoch_shuffle(_docs(spark, 3), epochs=0)
