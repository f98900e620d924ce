"""Deterministic sampling/splits — the properties DataFrame.sample lacks:
membership invariant under repartitioning, exact reproducibility, stable
splits as the corpus grows.  (queries[data_splits] hash-gates the split
math against DuckDB.)"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lightrag_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
    hash_uniform,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_membership_invariant_under_repartitioning(docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.3, "doc_id").collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs.repartition(17), 0.3, "doc_id").collect()
    }
    assert a == b and 0 < len(a) < docs.count()


def test_fraction_lands_near_target(docs):
    n = docs.count()
    got = deterministic_sample(docs, 0.3, "doc_id").count()
    assert abs(got / n - 0.3) < 0.08  # 500 docs, 48-bit uniform


def test_nested_samples_are_subsets(docs):
    """Same salt: a smaller fraction is a strict subset of a larger one —
    the property that makes staged corpus scaling reproducible."""
    small = {r.doc_id for r in deterministic_sample(docs, 0.1, "doc_id").collect()}
    big = {r.doc_id for r in deterministic_sample(docs, 0.5, "doc_id").collect()}
    assert small < big


def test_split_assignment_stable_as_corpus_grows(docs):
    """A doc's split never changes when more docs arrive — eval-set
    stability across crawl epochs."""
    w = {"train": 0.9, "valid": 0.05, "test": 0.05}
    full = {r.doc_id: r.split for r in hash_split(docs, w, "doc_id").collect()}
    half = {
        r.doc_id: r.split
        for r in hash_split(docs.filter(F.col("doc_id") < 250), w, "doc_id").collect()
    }
    assert all(full[d] == s for d, s in half.items())
    counts = {}
    for s in full.values():
        counts[s] = counts.get(s, 0) + 1
    assert set(counts) == {"train", "valid", "test"}
    assert counts["train"] / len(full) > 0.8


def test_uniform_range_and_salt_independence(docs):
    rows = docs.select(
        hash_uniform(F.col("doc_id")).alias("u1"),
        hash_uniform(F.col("doc_id"), salt="other").alias("u2"),
    ).collect()
    assert all(0.0 <= r.u1 < 1.0 and 0.0 <= r.u2 < 1.0 for r in rows)
    assert sum(r.u1 != r.u2 for r in rows) > len(rows) * 0.99


def test_stratified_exact_sample(docs, spark):
    from lightrag_spark.operators.sampling import stratified_exact_sample

    got = stratified_exact_sample(docs, 7, ["lang"], "doc_id")
    per = {
        r.lang: r.n
        for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r.lang: min(7, r.n)
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert per == want

    # membership is a pure function of the key set — invariant under
    # repartitioning (the DataFrame.sample failure mode this replaces)
    a = {r.doc_id for r in got.collect()}
    b = {
        r.doc_id
        for r in stratified_exact_sample(
            docs.repartition(17), 7, ["lang"], "doc_id"
        ).collect()
    }
    assert a == b


def test_domain_quota_salted_equals_single_window(docs):
    """The salted two-phase top-k must pick EXACTLY the single-window
    survivor set (the subset-ranking argument), at several salt counts
    including the degenerate salts=1, and be partition-invariant."""
    from pyspark.sql.window import Window

    from lightrag_spark.operators.sampling import domain_quota_sample

    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    plain = {
        (r.doc_id, r.domain_rank)
        for r in docs.withColumn(
            "domain_rank", F.row_number().over(w).cast("long")
        )
        .filter(F.col("domain_rank") <= 7)
        .select("doc_id", "domain_rank")
        .collect()
    }
    assert plain
    for salts, df in (
        (1, docs),
        (8, docs),
        (64, docs.repartition(13)),
    ):
        got = {
            (r.doc_id, r.domain_rank)
            for r in domain_quota_sample(
                df,
                max_per_key=7,
                key_col="source",
                order_cols=[F.col("n_chars").desc()],
                id_col="doc_id",
                salts=salts,
            )
            .select("doc_id", "domain_rank")
            .collect()
        }
        assert got == plain, f"salts={salts}"


def test_domain_quota_validates_args(docs):
    from lightrag_spark.operators.sampling import domain_quota_sample

    with pytest.raises(ValueError):
        domain_quota_sample(docs, 0, "source", [F.col("n_chars")], "doc_id")
    with pytest.raises(ValueError):
        domain_quota_sample(
            docs, 5, "source", [F.col("n_chars")], "doc_id", salts=0
        )


def test_mixture_resample_shares_and_invariance(docs):
    """Downsample-only mixture: binding domains keep ALL rows, the rest
    keep w*n_out/n in expectation; membership is partition-invariant."""
    from lightrag_spark.operators.sampling import mixture_resample

    weights = {f"src{i}": (0.08 if i < 10 else 0.02) for i in range(20)}
    out = mixture_resample(docs, weights, key_col="source", id_col="doc_id")
    got = {r.doc_id for r in out.collect()}
    # n_d = 25 for every source at sf0.01 -> n_out = 25/0.08 = 312.5;
    # p = 1.0 for the 0.08 sources (binding), 0.25 for the 0.02 sources.
    per = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for i in range(10):
        assert per[f"src{i}"] == 25, per
    small = sum(per.get(f"src{i}", 0) for i in range(10, 20))
    assert 30 <= small <= 95  # 10 domains x Binomial(25, 0.25), generous band
    again = {
        r.doc_id
        for r in mixture_resample(
            docs.repartition(17), weights, key_col="source", id_col="doc_id"
        ).collect()
    }
    assert again == got


def test_mixture_resample_validates_args(docs):
    from lightrag_spark.operators.sampling import mixture_resample

    with pytest.raises(ValueError):
        mixture_resample(docs, {}, key_col="source", id_col="doc_id")
    with pytest.raises(ValueError):
        mixture_resample(docs, {"src0": 0.0}, key_col="source", id_col="doc_id")


def test_mixture_upsample_epochs_and_invariance(docs):
    """Every doc in a repeated domain carries full epochs 0..k-1 plus a
    hash-stable fractional epoch k; totals land on the per-domain budget
    in expectation; assignment is partition-invariant."""
    from lightrag_spark.operators.sampling import mixture_upsample

    weights = {f"src{i}": (0.08 if i < 10 else 0.02) for i in range(20)}
    out = mixture_upsample(
        docs, weights, 1000, key_col="source", id_col="doc_id"
    ).cache()
    rows = out.collect()
    # n=25 per source; big sources owe 80 rows (k=3, f=0.2), small owe 20
    # (k=0, f=0.8).  Every big-source doc must carry epochs {0,1,2} at
    # least; epoch 3 only for the fractional subset.
    by_doc = {}
    for r in rows:
        by_doc.setdefault((r.source, r.doc_id), set()).add(r.epoch)
    for (src, _), epochs in by_doc.items():
        if int(src[3:]) < 10:
            assert {0, 1, 2} <= epochs and epochs <= {0, 1, 2, 3}
        else:
            assert epochs == {0}
    per = {r.source: r.n for r in out.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for i in range(10):
        assert 75 <= per[f"src{i}"] <= 105  # 75 full + Binomial(25, .2)
    for i in range(10, 20):
        assert 10 <= per.get(f"src{i}", 0) <= 25  # Binomial(25, .8)
    again = sorted(
        (r.source, r.doc_id, r.epoch)
        for r in mixture_upsample(
            docs.repartition(13), weights, 1000, key_col="source", id_col="doc_id"
        ).collect()
    )
    assert again == sorted((r.source, r.doc_id, r.epoch) for r in rows)
    out.unpersist()


def test_mixture_upsample_validates_args(docs):
    from lightrag_spark.operators.sampling import mixture_upsample

    with pytest.raises(ValueError):
        mixture_upsample(docs, {"src0": 1.0}, 0, key_col="source", id_col="doc_id")
    with pytest.raises(ValueError):
        mixture_upsample(docs, {}, 10, key_col="source", id_col="doc_id")
