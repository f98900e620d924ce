"""dsir_logratio: DSIR importance weights (datapipe.py).  DuckDB twin is
queries[data_dsir_weights]."""

from pyspark.sql import functions as F

from lightrag_spark.operators import datapipe as dp

SCHEMA = "doc_id long, text string, lang string"


def test_target_like_docs_score_higher(spark):
    # target vocabulary {alpha beta gamma}, raw vocabulary {zeta eta theta};
    # a raw doc written in target vocabulary should score like the target
    rows = (
        [(i, "alpha beta gamma alpha beta", "en") for i in range(8)]
        + [(100 + i, "zeta eta theta zeta eta", "xx") for i in range(8)]
        + [(999, "alpha beta gamma alpha beta", "xx")]  # target-like raw doc
    )
    df = spark.createDataFrame(rows, SCHEMA)
    out = dp.dsir_logratio(df, target=F.col("lang") == "en")
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["avg_logratio"] > 0 > got[100]["avg_logratio"]
    # the impostor scores with the target despite its raw membership
    assert got[999]["avg_logratio"] > 0
    assert got[999]["is_target"] is False
    assert got[0]["n_bigrams"] == 4


def test_short_docs_absent(spark):
    df = spark.createDataFrame(
        [(1, "word", "en"), (2, "two words", "en")], SCHEMA
    )
    out = dp.dsir_logratio(df, target=F.col("lang") == "en").collect()
    assert [r["doc_id"] for r in out] == [2]


def test_partition_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    t = F.col("lang") == "en"
    a = dp.dsir_logratio(docs.repartition(1), target=t)
    b = dp.dsir_logratio(docs.repartition(13), target=t)
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
