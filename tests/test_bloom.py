"""bloom_anti_join: Bloom-prefiltered exact anti-join (datapipe.py).
DuckDB twin is queries[doc_blocklist_scrub]."""

from pyspark.sql import functions as F

from lightrag_spark.operators import datapipe as dp


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_exact_vs_plain_anti_join(spark):
    big = spark.range(2000).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("h")
    )
    small = big.filter(F.col("doc_id") % 7 == 0).select("h")
    fast = dp.bloom_anti_join(big, small, key="h")
    slow = big.join(small.withColumnRenamed("h", "_h"), big.h == F.col("_h"), "left_anti")
    assert _ids(fast) == _ids(slow)


def test_false_positives_do_not_leak(spark):
    # 64-bit filter with k=2 over 50 members: false positives guaranteed;
    # the exact join behind the filter must remove them from candidacy
    # without dropping true negatives
    big = spark.range(500).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("h")
    )
    small = big.filter(F.col("doc_id") < 50).select("h")
    out = dp.bloom_anti_join(big, small, key="h", m_bits=64, k=2)
    assert _ids(out) == list(range(50, 500))


def test_empty_blocklist_passes_everything(spark):
    big = spark.range(100).select(
        F.col("id").alias("doc_id"), F.md5(F.col("id").cast("string")).alias("h")
    )
    small = big.filter(F.col("doc_id") < 0).select("h")
    assert dp.bloom_anti_join(big, small, key="h").count() == 100
