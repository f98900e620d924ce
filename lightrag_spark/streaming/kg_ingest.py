"""Streaming KG ingest: a continuous crawl feeding a live knowledge graph.

The reference's "new documents" path is poll-driven: ``apipeline_enqueue_
documents`` writes PENDING doc-status rows and ``apipeline_process_enqueue_
documents`` (reference pipeline.py:905-1318) scans for them, extracts, and
merges into the stored graph under an async lock.  The Spark-native face of
that loop is Structured Streaming: ``readStream`` over the pages table, and
per micro-batch the *same* batch operators (sanitize -> chunk -> extract ->
split) feed ``upsert_graph`` against the stored node/edge tables, which are
then committed atomically (write-to-tmp + rename — the local-FS stand-in
for an Iceberg snapshot commit, plans/runner.py:56).  The extraction cache
rows append per batch, so delete/rebuild and resume work identically over a
streamed graph and a batch-built one.

Exactly-once story, piece by piece:

- the stream checkpoint guarantees each page file enters exactly one
  micro-batch (Spark's file-source commit log);
- the graph commit is atomic per batch (readers see the old snapshot or the
  new one, never a half-written directory);
- a crash *between* the cache append and the graph swap re-runs the batch,
  and the idempotent upsert (stored-first payload dedup + content-keyed
  weight idempotence, plans/incremental_merge.py:56) makes the replay a
  no-op on the already-merged rows — same reason re-feeding a document to
  the reference does not inflate edge weights (issue #3367 family).

Graph content is micro-batch-partition-invariant: node/edge sets, weights,
and source-id sets depend only on WHICH pages arrived, not on how the file
source grouped them into batches (payload *list order* follows arrival
order, exactly like the reference's insertion order).
"""

from __future__ import annotations

import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..plans.incremental_merge import upsert_graph
from ..plans.kg_build import KGBuildConfig, build_kg
from ..sources.pages import PAGES_SCHEMA, enqueue_documents

NODES = "kg_nodes"
EDGES = "kg_edges"
CACHE = "llm_cache"


def _committed(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _commit_pair(nodes: DataFrame, edges: DataFrame, graph_dir: str) -> None:
    """Materialize BOTH tables against the old snapshot, then swap BOTH.

    Order matters: the upserted ``edges`` plan still reads the stored
    node/edge parquet lazily, so renaming the nodes directory before the
    edges plan has executed would make the edge write observe the *new*
    node snapshot mid-batch (the refreshByPath hazard).  Writing both tmp
    directories first means every read in either plan sees the pre-batch
    snapshot; the two renames after that are metadata-only.
    """
    tmp_n = os.path.join(graph_dir, NODES) + ".tmp"
    tmp_e = os.path.join(graph_dir, EDGES) + ".tmp"
    nodes.write.mode("overwrite").parquet(tmp_n)
    edges.write.mode("overwrite").parquet(tmp_e)
    for tmp, final in ((tmp_n, os.path.join(graph_dir, NODES)),
                       (tmp_e, os.path.join(graph_dir, EDGES))):
        if os.path.exists(final):
            shutil.rmtree(final)
        os.rename(tmp, final)


def upsert_pages_batch(
    spark: SparkSession,
    pages: DataFrame,
    graph_dir: str,
    cfg: KGBuildConfig | None = None,
) -> dict:
    """One micro-batch body: pages -> docs -> extract -> upsert -> commit.

    Also usable directly as the incremental-batch API (the reference's
    ``ainsert`` on an existing graph) — foreachBatch below just calls it.
    Returns per-batch lineage metrics (the streaming twin of the runner's
    metrics side-table, plans/runner.py:140).
    """
    cfg = cfg or KGBuildConfig()
    docs = enqueue_documents(pages)
    kg = build_kg(docs, cfg)

    # Pin the extraction output before the fan-out: the node and edge
    # writes each walk the full lineage, and without a materialized persist
    # the model stage would run once per consumer (same rationale as
    # kg_build.cache_records, bounded here so a long-running stream does
    # not accumulate persisted RDDs across batches).
    from pyspark.storagelevel import StorageLevel

    mentions = kg.mentions.persist(StorageLevel.MEMORY_AND_DISK)
    triples = kg.triples.persist(StorageLevel.MEMORY_AND_DISK)
    n_mentions = mentions.count()
    n_triples = triples.count()

    nodes_path = os.path.join(graph_dir, NODES)
    edges_path = os.path.join(graph_dir, EDGES)
    try:
        if _committed(nodes_path) and _committed(edges_path):
            stored_n = spark.read.parquet(nodes_path)
            stored_e = spark.read.parquet(edges_path)
            nodes, edges = upsert_graph(stored_n, stored_e, mentions, triples, cfg)
        else:
            # first batch: a fresh build IS the upsert against an empty graph
            nodes, edges = kg.kg_nodes, kg.kg_edges

        os.makedirs(graph_dir, exist_ok=True)
        # cache rows append-only BEFORE the graph swap: a crash in between
        # leaves extra cache rows (keyed by args_hash — harmless, the resume
        # path dedups on content) rather than a graph ahead of its cache.
        kg.llm_cache.write.mode("append").parquet(os.path.join(graph_dir, CACHE))
        _commit_pair(nodes, edges, graph_dir)
    finally:
        mentions.unpersist()
        triples.unpersist()
    return {"mentions": n_mentions, "triples": n_triples}


def stream_kg_ingest(
    spark: SparkSession,
    pages_dir: str,
    graph_dir: str,
    checkpoint_dir: str,
    cfg: KGBuildConfig | None = None,
    trigger_once: bool = True,
    max_files_per_trigger: int | None = None,
    on_batch: Callable[[int, dict], None] | None = None,
):
    """readStream(pages parquet dir) -> live kg_nodes/kg_edges/llm_cache.

    ``trigger_once=True`` drains the current backlog and stops — the
    scheduled-incremental-ingest pattern (run it from cron/Airflow; the
    checkpoint remembers which files are done).  ``trigger_once=False``
    runs a continuous micro-batch stream; ``max_files_per_trigger`` bounds
    batch size so graph-commit latency stays flat as the crawl grows.

    Returns the started StreamingQuery (call ``awaitTermination()``).
    """
    cfg = cfg or KGBuildConfig()

    def body(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        metrics = upsert_pages_batch(spark, batch_df, graph_dir, cfg)
        if on_batch is not None:
            on_batch(batch_id, metrics)

    reader = spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    pages = reader.load(pages_dir)
    writer = (
        pages.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
