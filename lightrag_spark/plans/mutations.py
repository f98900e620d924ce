"""Mutation operators: delete-by-doc (rebuild from cache), entity/relation
edits (SURVEY.md §2.8).

The reference's ``adelete_by_doc_id`` (lightrag.py:5387+) deletes a doc's
chunks and rebuilds every shared entity/edge from the cached extraction
results of the SURVIVING chunks (rebuild_knowledge_from_chunks,
operate.py:1005-1318).  Because our llm_cache table is the system of
record, the distributed restatement is simply: filter chunks, re-parse the
cache for what's left, re-run the merge.  No journal, no anchors — the
rebuild is a pure function of (surviving chunks x cache).

Entity-level admin ops (adelete_by_entity / adelete_by_relation /
aedit_entity rename; utils_graph.py:81-838) are DataFrame filters +
re-keying over the materialized graph tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.extraction import extract_records, split_records
from ..operators.merge import (
    add_unknown_endpoint_nodes,
    merge_entity_nodes,
    merge_relation_edges,
    with_degrees,
)
from ..operators.summary import finalize_descriptions
from .kg_build import KGBuildConfig


def rebuild_kg_from_chunks(
    chunks: DataFrame,
    llm_cache: DataFrame,
    cfg: KGBuildConfig | None = None,
    model_call_counter=None,
) -> tuple[DataFrame, DataFrame]:
    """(surviving chunks, cache) -> (kg_nodes, kg_edges), zero model calls.

    The chunk rows must carry (chunk_id, content, file_path, doc_order,
    chunk_order_index) — the cache join re-parses stored responses.
    """
    cfg = cfg or KGBuildConfig()
    pivoted = llm_cache.groupBy("chunk_id").agg(
        F.max(F.when(F.col("pass_index") == 0, F.col("content"))).alias("cached_resp0"),
        F.max(F.when(F.col("pass_index") == 1, F.col("content"))).alias("cached_resp1"),
    )
    joined = chunks.join(pivoted, "chunk_id", "left")
    records = extract_records(
        joined,
        max_gleaning=cfg.max_gleaning,
        run_ts=cfg.run_ts,
        model_min_len=cfg.model_min_len,
        model_corruption=cfg.model_corruption,
        emit_cache_rows=False,
        model_call_counter=model_call_counter,
    )
    mentions, triples, _ = split_records(records)
    nodes = merge_entity_nodes(
        mentions, salts=cfg.merge_salts, max_fragments=cfg.max_description_fragments
    )
    edges = merge_relation_edges(
        triples, salts=cfg.merge_salts, max_fragments=cfg.max_description_fragments
    )
    if cfg.summarize:
        nodes = finalize_descriptions(nodes, "entity_name", "Entity", cfg.tokenizer_kind)
        edges = edges.withColumn(
            "_pair", F.concat(F.lit("("), "src", F.lit(", "), "tgt", F.lit(")"))
        )
        edges = finalize_descriptions(edges, "_pair", "Relation", cfg.tokenizer_kind).drop("_pair")
    nodes = add_unknown_endpoint_nodes(nodes, edges)
    return with_degrees(nodes, edges)


def delete_documents(
    spark: SparkSession,
    out_dir: str,
    doc_ids: list[str],
    cfg: KGBuildConfig | None = None,
) -> dict:
    """Purge documents from a materialized KG output dir and rebuild the
    graph tables from the surviving chunks' cache — flush-before-commit
    ordering preserved (graph tables first, doc_status last)."""
    import os

    chunks = spark.read.parquet(os.path.join(out_dir, "chunks"))
    cache = spark.read.parquet(os.path.join(out_dir, "llm_cache"))
    surviving = chunks.filter(~F.col("doc_id").isin(doc_ids)).cache()
    n_surviving = surviving.count()

    counter = spark.sparkContext.accumulator(0)
    nodes, edges = rebuild_kg_from_chunks(surviving, cache, cfg, counter)

    edges.write.mode("overwrite").parquet(os.path.join(out_dir, "kg_edges"))
    nodes.write.mode("overwrite").parquet(os.path.join(out_dir, "kg_nodes"))
    surviving.write.mode("overwrite").parquet(os.path.join(out_dir, "chunks.new"))

    # swap chunks dir, then drop deleted docs from doc_status (commit record)
    import shutil

    shutil.rmtree(os.path.join(out_dir, "chunks"))
    os.rename(os.path.join(out_dir, "chunks.new"), os.path.join(out_dir, "chunks"))
    status_path = os.path.join(out_dir, "doc_status")
    if os.path.exists(status_path):
        status = spark.read.parquet(status_path).filter(~F.col("doc_id").isin(doc_ids))
        status.write.mode("overwrite").parquet(status_path + ".new")
        shutil.rmtree(status_path)
        os.rename(status_path + ".new", status_path)

    surviving.unpersist()
    return {
        "deleted_docs": len(doc_ids),
        "surviving_chunks": n_surviving,
        "model_calls": counter.value,
        "nodes": spark.read.parquet(os.path.join(out_dir, "kg_nodes")).count(),
        "edges": spark.read.parquet(os.path.join(out_dir, "kg_edges")).count(),
    }


def delete_entity(nodes: DataFrame, edges: DataFrame, entity_name: str) -> tuple[DataFrame, DataFrame]:
    """Remove a node and its incident edges (utils_graph.py:81-180);
    degrees recomputed."""
    new_edges = edges.filter(
        (F.col("src") != entity_name) & (F.col("tgt") != entity_name)
    )
    new_nodes = nodes.filter(F.col("entity_name") != entity_name)
    return with_degrees(new_nodes.drop("degree"), new_edges.drop("src_degree", "tgt_degree", "rank"))


def delete_relation(nodes: DataFrame, edges: DataFrame, src: str, tgt: str) -> tuple[DataFrame, DataFrame]:
    """Remove one undirected edge (utils_graph.py:181-276)."""
    lo, hi = sorted([src, tgt])
    new_edges = edges.filter(~((F.col("src") == lo) & (F.col("tgt") == hi)))
    return with_degrees(nodes.drop("degree"), new_edges.drop("src_degree", "tgt_degree", "rank"))


def rename_entity(
    nodes: DataFrame, edges: DataFrame, old_name: str, new_name: str
) -> tuple[DataFrame, DataFrame]:
    """Re-key a node and redirect its edges (aedit_entity rename path,
    utils_graph.py:277-838).  If the target name already exists the rename
    is rejected (the reference's full merge-strategies path is a separate
    admin operator)."""
    if nodes.filter(F.col("entity_name") == new_name).limit(1).count() > 0:
        raise ValueError(f"entity {new_name!r} already exists; use a merge operation")
    renamed_nodes = nodes.withColumn(
        "entity_name",
        F.when(F.col("entity_name") == old_name, F.lit(new_name)).otherwise(
            F.col("entity_name")
        ),
    )
    redirected = (
        edges.withColumn(
            "src", F.when(F.col("src") == old_name, F.lit(new_name)).otherwise(F.col("src"))
        )
        .withColumn(
            "tgt", F.when(F.col("tgt") == old_name, F.lit(new_name)).otherwise(F.col("tgt"))
        )
        .withColumn("_lo", F.least("src", "tgt"))
        .withColumn("_hi", F.greatest("src", "tgt"))
        .withColumn("src", F.col("_lo"))
        .withColumn("tgt", F.col("_hi"))
        .drop("_lo", "_hi")
    )
    return with_degrees(
        renamed_nodes.drop("degree"),
        redirected.drop("src_degree", "tgt_degree", "rank"),
    )
