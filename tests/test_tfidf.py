"""tfidf_top_terms (datapipe.py).  DuckDB twin is queries[text_tfidf_terms]."""

import math

from lightrag_spark.operators import datapipe as dp


def test_hand_scores_and_ranks(spark):
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string"
    )
    out = dp.tfidf_top_terms(docs, k=3).collect()
    got = {(r["doc_id"], r["term"]): r for r in out}
    ln2 = round(math.log(2.0), 4)
    # df(a)=2 -> idf 0; df(b)=df(c)=1 -> ln 2
    assert got[(1, "b")]["score"] == ln2 and got[(1, "b")]["rank"] == 1
    assert got[(1, "a")]["score"] == 0.0 and got[(1, "a")]["rank"] == 2
    assert got[(1, "a")]["tf"] == 2 and got[(1, "a")]["df"] == 2
    assert got[(2, "c")]["rank"] == 1 and got[(2, "a")]["rank"] == 2


def test_k_truncates(spark):
    docs = spark.createDataFrame(
        [(1, "q w e r t y"), (2, "z")], "doc_id long, text string"
    )
    out = dp.tfidf_top_terms(docs, k=2)
    counts = {r["doc_id"]: r["cnt"] for r in
              out.groupBy("doc_id").count().withColumnRenamed("count", "cnt").collect()}
    assert counts[1] == 2 and counts[2] == 1
