"""Physical-plan shape assertions for the session-4 operators — the
regression net for the scale guarantees the docstrings claim (no
BroadcastNestedLoop anywhere, WindowGroupLimit on grouped top-k, ordered
takes instead of global sorts, zero exchanges in scalar quantization)."""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def frames(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, f"alpha bravo t{i} charlie delta echo foxtrot golf") for i in range(50)],
        "doc_id long, text string",
    )
    emb = spark.createDataFrame(
        [(i, [float((i * 7 + d) % 13) - 6.0 for d in range(8)]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )
    ev = spark.createDataFrame(
        [(f"t{i % 3}", i % 11) for i in range(200)], "event_type string, user_id long"
    )
    return docs, emb, ev


def test_sq_topk_zero_exchanges(frames):
    from lightrag_spark.operators.sq import sq_topk

    _, emb, _ = frames
    plan = _plan(sq_topk(emb, query_id=0, k=5))
    assert "Exchange" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoop" not in plan


def test_grouped_topk_has_window_group_limit(frames):
    from lightrag_spark.operators import datapipe as dp

    _, _, ev = frames
    plan = _plan(dp.top_event_users(ev, k=3))
    assert "WindowGroupLimit" in plan
    assert "BroadcastNestedLoop" not in plan


def test_bpe_rank_is_ordered_take(frames):
    from lightrag_spark.operators import datapipe as dp

    docs, _, _ = frames
    plan = _plan(dp.bpe_pair_counts(docs, top_n=10))
    assert "TakeOrderedAndProject" in plan


def test_substring_dedup_no_bnl_no_python(frames):
    from lightrag_spark.operators import datapipe as dp

    docs, _, _ = frames
    for df in (dp.dup_ngram_windows(docs, width=4), dp.dup_ngram_spans(docs, width=4)):
        plan = _plan(df)
        assert "BroadcastNestedLoop" not in plan
        assert "EvalPython" not in plan and "InPandas" not in plan


def test_readability_is_pure_scan(frames):
    from lightrag_spark.operators import datapipe as dp

    docs, _, _ = frames
    plan = _plan(dp.readability_scores(docs))
    assert "Exchange" not in plan  # no repartition on raw input
    assert "Join" not in plan


def test_url_canonical_is_pure_expression(spark, frames):
    from pyspark.sql import functions as F

    from lightrag_spark.functions.urlnorm import canonical_url_col

    docs, _, _ = frames
    d = docs.select("doc_id", F.concat(F.lit("http://h"), "doc_id").alias("url"))
    plan = _plan(d.select(canonical_url_col(F.col("url")).alias("c")))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "InPandas" not in plan
