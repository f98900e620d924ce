"""Gleaning budget guard (operate.py:3864-3892, constants.py:38): a chunk
whose gleaning payload (content + first response + prompt overhead) would
exceed max_extract_input_tokens skips the gleaning pass instead of failing."""

from __future__ import annotations

from pyspark.sql import functions as F

from lightrag_spark.constants import GLEANING_PROMPT_OVERHEAD_TOKENS
from lightrag_spark.operators.extraction import extract_records


def _chunks(spark):
    rows = [
        # small chunk: well under budget -> gleaning runs
        ("c-small-chunk-000", "alpha beta gamma delta", "f", 0, 0),
        # big chunk: content alone blows the budget -> gleaning skipped
        ("c-big-chunk-000", "word " * 3000, "f", 1, 0),
    ]
    return spark.createDataFrame(
        rows, "chunk_id string, content string, file_path string, "
        "doc_order long, chunk_order_index int"
    )


def test_oversized_chunk_skips_gleaning(spark):
    budget = GLEANING_PROMPT_OVERHEAD_TOKENS + 500  # small chunk fits, big doesn't
    counter = spark.sparkContext.accumulator(0)
    records = extract_records(
        _chunks(spark),
        max_gleaning=1,
        model_call_counter=counter,
        max_extract_input_tokens=budget,
        tokenizer_kind="whitespace",
    ).cache()
    cache = records.filter(F.col("kind") == "cache")
    passes = {
        r["chunk_id"]: sorted(r2["rec_order"] for r2 in cache.filter(
            F.col("chunk_id") == r["chunk_id"]).collect())
        for r in cache.select("chunk_id").distinct().collect()
    }
    # small chunk cached both passes; big chunk only pass 0
    assert passes["c-small-chunk-000"] == [0, 1]
    assert passes["c-big-chunk-000"] == [0]
    # model called 2x for small + 1x for big
    assert counter.value == 3
    records.unpersist()


def test_guard_disabled_with_zero_budget(spark):
    counter = spark.sparkContext.accumulator(0)
    records = extract_records(
        _chunks(spark),
        max_gleaning=1,
        model_call_counter=counter,
        max_extract_input_tokens=0,  # 0 disables the guard (reference: >0 check)
        tokenizer_kind="whitespace",
    )
    cache = records.filter(F.col("kind") == "cache")
    assert cache.filter(F.col("chunk_id") == "c-big-chunk-000").count() == 2
    assert counter.value == 4
