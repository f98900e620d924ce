"""RAGAS-shaped RAG quality evaluation over a DataFrame of test cases.

Mirrors lightrag/evaluation/eval_rag_quality.py's scoring semantics without
requiring the ragas/LLM stack at runtime:

- four per-case metrics: faithfulness, answer_relevancy, context_recall,
  context_precision (floats in [0,1], NaN when a metric is unavailable —
  reference :495-523; NOTE Arrow maps float-NaN to null on the way into
  Spark, so "unavailable" surfaces as null in the results frame and the
  stats below exclude null and NaN alike);
- ragas_score = round(mean of the non-NaN metrics, 4), 0.0 when every
  metric is NaN (reference :524-545);
- benchmark stats: per-metric NaN-excluding averages + min/max ragas_score
  (reference _calculate_benchmark_stats :772-866).

The metric computation itself is PLUGGABLE: ``metrics_fn(question, answer,
contexts, ground_truth) -> (faithfulness, answer_relevancy, context_recall,
context_precision)``.  In production that closure wraps a RAGAS/LLM client
built lazily per executor (same contract as the extraction/keyword model
hooks); ``lexical_metrics_fn`` is the deterministic offline stand-in so the
harness runs end-to-end in this sandbox.

Scale shape: cases fan out over executors via mapInPandas (one Arrow batch
per partition — the per-case judge call dominates, so batching only
amortizes interpreter overhead); the stats are a single small agg.
"""

from __future__ import annotations

import math
from typing import Callable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

RAGAS_METRICS = [
    "faithfulness",
    "answer_relevancy",
    "context_recall",
    "context_precision",
]

MetricsFn = Callable[[str, str, list, str], Tuple[float, float, float, float]]


def _overlap(a_tokens: set, b_tokens: set) -> float:
    if not a_tokens:
        return float("nan")
    return len(a_tokens & b_tokens) / len(a_tokens)


def _toks(s: str) -> set:
    return {t for t in "".join(c if c.isalnum() else " " for c in (s or "").lower()).split() if len(t) > 1}


def lexical_metrics_fn(question, answer, contexts, ground_truth):
    """Deterministic token-overlap proxies for the four RAGAS metrics.

    NOT the RAGAS definitions — a dependency-free stand-in with the same
    signature, ranges, and NaN contract so the pipeline (fan-out, NaN
    exclusion, stats) is exercised for real; swap in a ragas-backed
    closure for live evaluation.
    """
    ctx = " ".join(contexts or [])
    answer_t, ctx_t, q_t, gt_t = _toks(answer), _toks(ctx), _toks(question), _toks(ground_truth)
    faithfulness = _overlap(answer_t, ctx_t)
    answer_relevancy = _overlap(q_t, answer_t)
    context_recall = _overlap(gt_t, ctx_t) if ground_truth else float("nan")
    context_precision = _overlap(ctx_t, gt_t) if ground_truth else float("nan")
    return faithfulness, answer_relevancy, context_recall, context_precision


def ragas_score(metrics: Tuple[float, float, float, float]) -> float:
    """NaN-excluding mean, rounded to 4 — eval_rag_quality.py:524-530."""
    vals = [m for m in metrics if not (m is None or math.isnan(m))]
    if not vals:
        return 0.0
    return round(sum(vals) / len(vals), 4)


def evaluate_cases(cases: DataFrame, metrics_fn: MetricsFn = lexical_metrics_fn) -> DataFrame:
    """cases: (case_id, question, answer, contexts: array<string>,
    ground_truth) -> + four metric columns + ragas_score."""
    fields = list(cases.schema.fields)
    out_schema = StructType(
        fields
        + [StructField(m, DoubleType()) for m in RAGAS_METRICS]
        + [StructField("ragas_score", DoubleType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for m in zip(
                pdf["question"], pdf["answer"], pdf["contexts"], pdf["ground_truth"]
            ):
                scores = metrics_fn(m[0], m[1], list(m[2]) if m[2] is not None else [], m[3])
                rows.append(tuple(float(s) for s in scores) + (ragas_score(scores),))
            res = pd.DataFrame(
                rows, columns=RAGAS_METRICS + ["ragas_score"], index=pdf.index
            )
            yield pd.concat([pdf, res], axis=1)

    return cases.mapInPandas(run, out_schema)


def benchmark_stats(results: DataFrame) -> DataFrame:
    """Single-row stats frame — _calculate_benchmark_stats :772-866:
    NaN-excluding per-metric averages, min/max ragas_score, case count."""
    def no_nan(c):
        return F.when(F.isnan(F.col(c)), None).otherwise(F.col(c))

    aggs = [F.count("*").alias("total_cases")]
    for m in RAGAS_METRICS + ["ragas_score"]:
        aggs.append(F.round(F.avg(no_nan(m)), 4).alias(f"avg_{m}"))
    aggs.append(F.round(F.min(no_nan("ragas_score")), 4).alias("min_ragas_score"))
    aggs.append(F.round(F.max(no_nan("ragas_score")), 4).alias("max_ragas_score"))
    return results.agg(*aggs)
