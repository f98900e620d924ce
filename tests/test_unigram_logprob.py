"""unigram_logprob: corpus-trained unigram LM scoring (the CCNet
perplexity-bucketing family, external-model-free).  DuckDB twin is
queries[text_unigram_logprob]; these pin the math on hand cases."""

import math

from lightrag_spark.operators import datapipe as dp


def _rows(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_hand_computed_scores(spark):
    # corpus: 6 tokens total; counts: a=3, b=2, z=1
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a b z")], "doc_id long, text string"
    )
    got = _rows(dp.unigram_logprob(docs))
    la, lb, lz = (math.log(c / 6.0) for c in (3, 2, 1))
    assert got[1]["n_tokens"] == 3 and got[2]["n_tokens"] == 3
    assert got[1]["avg_logprob"] == round((2 * la + lb) / 3, 4)
    assert got[2]["avg_logprob"] == round((la + lb + lz) / 3, 4)
    # the doc made of commoner words scores strictly higher
    assert got[1]["avg_logprob"] > got[2]["avg_logprob"]


def test_uniform_corpus_scores_equal(spark):
    docs = spark.createDataFrame(
        [(1, "x y"), (2, "y x")], "doc_id long, text string"
    )
    got = _rows(dp.unigram_logprob(docs))
    assert got[1]["avg_logprob"] == got[2]["avg_logprob"] == round(math.log(0.5), 4)


def test_partition_invariance(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = dp.unigram_logprob(docs.repartition(1))
    b = dp.unigram_logprob(docs.repartition(13))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
