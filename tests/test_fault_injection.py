"""Fault-injection matrix for the doc-status state machine (mirrors the
reference's per-doc FAILED transition + retry semantics,
pipeline.py:5575-5632, base.py:888-941, and the stale-extraction purge on
changed chunk options, pipeline.py:5417+).

Matrix:
1. injected model failure -> owning docs FAILED with error_msg, chunks
   snapshot preserved, their records excluded from the graph;
2. re-run with the fault gone -> FAILED docs retried (real model calls),
   everything PROCESSED, graph equals a fresh all-docs build;
3. re-run with CHANGED chunk options -> content-keyed cache misses force
   re-extraction (no stale reuse), result equals a fresh build at the new
   options.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lightrag_spark.plans.kg_build import KGBuildConfig
from lightrag_spark.plans.runner import run_indexing

MARKER = "INJECTED_FAULT_TOKEN"
BAD_DOCS = {"doc-003", "doc-007"}


def _docs(spark, n=12, with_marker=False):
    rows = []
    for i in range(n):
        doc_id = f"doc-{i:03d}"
        text = ("alpha beta gamma delta united_states epsilon " * (3 + i))[:400]
        if with_marker and doc_id in BAD_DOCS:
            text = text[:200] + f" {MARKER} " + text[200:]
        rows.append(
            {
                "doc_id": doc_id,
                "text": text,
                "file_path": f"f{i}",
                "doc_order": i,
                "content_hash": f"h{i}",
            }
        )
    return spark.createDataFrame(rows)


def _graph(spark, out):
    nodes = {
        r["entity_name"]: (r["degree"], r["mention_count"])
        for r in spark.read.parquet(os.path.join(out, "kg_nodes")).collect()
    }
    edges = {
        (r["src"], r["tgt"]): r["weight"]
        for r in spark.read.parquet(os.path.join(out, "kg_edges")).collect()
    }
    return nodes, edges


CFG = dict(
    tokenizer_kind="whitespace",
    chunk_token_size=24,
    chunk_overlap_token_size=4,
    max_gleaning=1,
    merge_salts=4,
    summarize=False,
)


def test_failed_docs_marked_excluded_then_retried(spark, tmp_path):
    out = str(tmp_path / "kg")
    docs_bad = _docs(spark, with_marker=True)

    m1 = run_indexing(
        spark, docs_bad, out, KGBuildConfig(**CFG, model_fail_marker=MARKER)
    )
    assert m1["docs_failed"] == len(BAD_DOCS)

    status = {
        r["doc_id"]: r for r in spark.read.parquet(os.path.join(out, "doc_status")).collect()
    }
    for d in BAD_DOCS:
        assert status[d]["status"] == "FAILED"
        assert MARKER in status[d]["error_msg"]
        # chunk snapshot survives the failure (chunk stage succeeded)
        assert status[d]["chunks_count"] >= 1
        assert len(status[d]["chunks_list"]) == status[d]["chunks_count"]
        assert status[d]["track_id"]
    ok = [d for d in status if d not in BAD_DOCS]
    assert all(status[d]["status"] == "PROCESSED" for d in ok)
    assert all(status[d]["error_msg"] is None for d in ok)

    # failed docs contribute nothing: no node cites their chunks
    nodes = spark.read.parquet(os.path.join(out, "kg_nodes"))
    bad_sources = nodes.select(F.explode("source_ids").alias("c")).filter(
        F.col("c").rlike("^(" + "|".join(BAD_DOCS) + ")-chunk-")
    )
    assert bad_sources.count() == 0

    # ---- retry with the fault gone: docs text is CLEAN now -------------------
    docs_clean = _docs(spark, with_marker=False)
    m2 = run_indexing(spark, docs_clean, out, KGBuildConfig(**CFG))
    assert m2["docs_retried_failed"] == len(BAD_DOCS)
    assert m2["docs_failed"] == 0
    # retried docs required REAL model calls (their failed passes never cached)
    assert m2["stages"]["extraction"]["model_calls"] > 0

    status2 = {
        r["doc_id"]: r["status"]
        for r in spark.read.parquet(os.path.join(out, "doc_status")).collect()
    }
    assert set(status2.values()) == {"PROCESSED"}

    # the recovered graph equals a fresh build of the clean corpus
    fresh = str(tmp_path / "fresh")
    run_indexing(spark, docs_clean, fresh, KGBuildConfig(**CFG))
    assert _graph(spark, out) == _graph(spark, fresh)


def test_changed_chunk_options_purge_stale_cache(spark, tmp_path):
    out = str(tmp_path / "kg")
    docs = _docs(spark)

    m1 = run_indexing(spark, docs, out, KGBuildConfig(**CFG))
    calls_cold = m1["stages"]["extraction"]["model_calls"]
    assert calls_cold > 0

    # warm re-run, same options: zero model calls (cache is system of record)
    m2 = run_indexing(spark, docs, out, KGBuildConfig(**CFG))
    assert m2["stages"]["extraction"]["model_calls"] == 0
    assert m2["chunk_options_changed"] is False

    # re-run with a different window: every chunk's text changes, so the
    # content-keyed cache must miss — stale responses are never reused
    cfg3 = dict(CFG, chunk_token_size=16, chunk_overlap_token_size=2)
    m3 = run_indexing(spark, docs, out, KGBuildConfig(**cfg3))
    assert m3["chunk_options_changed"] is True
    assert m3["stages"]["extraction"]["model_calls"] > 0

    # and the result equals a fresh build at the new options
    fresh = str(tmp_path / "fresh16")
    run_indexing(spark, docs, fresh, KGBuildConfig(**cfg3))
    assert _graph(spark, out) == _graph(spark, fresh)


def test_retry_carries_over_status_metadata(spark, tmp_path):
    """FAILED -> retry transition keeps created_at and track_id from the
    PRIOR status record (reference pipeline.py:5616-5625 carry-over),
    advances updated_at, and increments retry_count; PROCESSED docs that
    are merely re-seen carry their metadata unchanged with retry_count 0."""
    out = str(tmp_path / "kg")
    docs_bad = _docs(spark, with_marker=True)
    run_indexing(
        spark,
        docs_bad,
        out,
        KGBuildConfig(**CFG, model_fail_marker=MARKER, run_ts=1000, track_id="t-first"),
    )
    s1 = {
        r["doc_id"]: r
        for r in spark.read.parquet(os.path.join(out, "doc_status")).collect()
    }
    assert all(r["retry_count"] == 0 for r in s1.values())
    assert all(r["created_at"] == 1000 for r in s1.values())
    assert all(r["track_id"] == "t-first" for r in s1.values())

    # retry with the fault gone, under a DIFFERENT run_ts and track_id
    docs_clean = _docs(spark, with_marker=False)
    run_indexing(
        spark,
        docs_clean,
        out,
        KGBuildConfig(**CFG, run_ts=2000, track_id="t-second"),
    )
    s2 = {
        r["doc_id"]: r
        for r in spark.read.parquet(os.path.join(out, "doc_status")).collect()
    }
    for d, row in s2.items():
        assert row["status"] == "PROCESSED"
        assert row["created_at"] == 1000, d          # carried, not re-stamped
        assert row["track_id"] == "t-first", d       # carried, not re-stamped
        assert row["updated_at"] >= s1[d]["updated_at"], d
        assert row["retry_count"] == (1 if d in BAD_DOCS else 0), d

    # a THIRD run with a new failure on a previously-retried doc keeps
    # counting: FAILED again -> next retry increments to 2
    run_indexing(
        spark,
        docs_bad,
        out,
        KGBuildConfig(**CFG, model_fail_marker=MARKER, run_ts=3000),
    )
    run_indexing(spark, docs_clean, out, KGBuildConfig(**CFG, run_ts=4000))
    s4 = {
        r["doc_id"]: r
        for r in spark.read.parquet(os.path.join(out, "doc_status")).collect()
    }
    for d in BAD_DOCS:
        assert s4[d]["retry_count"] == 2, d
        assert s4[d]["created_at"] == 1000, d
