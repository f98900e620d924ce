"""The indexing pipeline: docs -> chunks -> records -> kg_nodes/kg_edges.

Spark restatement of the reference insert path (SURVEY.md §3.1):

    pages --enqueue--> docs --mapInPandas--> chunks --mapInPandas-->
    records(entity|relation|cache) --salted groupBy x2--> kg_nodes, kg_edges

Thread/process boundaries of the reference become exactly two shuffles:
``groupBy(entity_name)`` and ``groupBy(edge pair)`` (plus the small
post-agg joins).  The extraction cache rows make the extraction stage
re-derivable — resume recomputes merges from the cache table rather than
re-calling the model (the reference's delete/rebuild path,
operate.py:1005-1318, works the same way).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..constants import (
    DEFAULT_CHUNK_OVERLAP_TOKEN_SIZE,
    DEFAULT_CHUNK_TOKEN_SIZE,
    DEFAULT_MAX_GLEANING,
    DEFAULT_MERGE_SALTS,
    MAX_DESCRIPTION_FRAGMENTS,
)
from ..operators.chunking import chunk_documents
from ..operators.extraction import extract_records, split_records
from ..operators.merge import (
    add_unknown_endpoint_nodes,
    merge_entity_nodes,
    merge_relation_edges,
    with_degrees,
)
from ..operators.summary import finalize_descriptions


@dataclass
class KGBuildConfig:
    tokenizer_kind: str = "regex"
    chunk_token_size: int = DEFAULT_CHUNK_TOKEN_SIZE
    chunk_overlap_token_size: int = DEFAULT_CHUNK_OVERLAP_TOKEN_SIZE
    max_gleaning: int = DEFAULT_MAX_GLEANING
    merge_salts: int = DEFAULT_MERGE_SALTS
    max_description_fragments: int = MAX_DESCRIPTION_FRAGMENTS
    run_ts: int = 1754006400  # fixed per run for bit-stable reprocessing
    model_min_len: int = 5
    model_corruption: bool = False
    with_source_spans: bool = True
    summarize: bool = True
    # Persist the extraction output before the two merge aggregations fan out
    # of it (nodes + edges + counts would otherwise each recompute the model
    # stage).  On a cluster this is the natural place for the llm_cache /
    # records table write; locally MEMORY_AND_DISK.
    cache_records: bool = False


@dataclass
class KGBuildResult:
    chunks: DataFrame
    mentions: DataFrame
    triples: DataFrame
    llm_cache: DataFrame
    kg_nodes: DataFrame
    kg_edges: DataFrame
    config: KGBuildConfig = field(default_factory=KGBuildConfig)


def build_kg(
    docs: DataFrame,
    cfg: KGBuildConfig | None = None,
    llm_cache: DataFrame | None = None,
    model_call_counter=None,
) -> KGBuildResult:
    """docs(doc_id, text, file_path, doc_order) -> knowledge-graph tables.

    All returned DataFrames are lazy; callers decide what to materialize
    (tests collect, the pipeline writes partitioned parquet/Iceberg).

    ``llm_cache`` (args_hash, chunk_id, pass_index, content, create_time) is
    the prior run's extraction cache: cached responses are re-parsed instead
    of re-calling the model (the resume primitive, SURVEY.md §3.3).
    """
    cfg = cfg or KGBuildConfig()

    chunks = chunk_documents(
        docs,
        tokenizer_kind=cfg.tokenizer_kind,
        chunk_token_size=cfg.chunk_token_size,
        chunk_overlap_token_size=cfg.chunk_overlap_token_size,
        with_source_spans=cfg.with_source_spans,
    )

    extract_input = chunks
    if llm_cache is not None:
        from pyspark.sql import functions as F

        pivoted = llm_cache.groupBy("chunk_id").agg(
            F.max(F.when(F.col("pass_index") == 0, F.col("content"))).alias("cached_resp0"),
            F.max(F.when(F.col("pass_index") == 1, F.col("content"))).alias("cached_resp1"),
        )
        extract_input = chunks.join(pivoted, "chunk_id", "left")

    records = extract_records(
        extract_input,
        max_gleaning=cfg.max_gleaning,
        run_ts=cfg.run_ts,
        model_min_len=cfg.model_min_len,
        model_corruption=cfg.model_corruption,
        model_call_counter=model_call_counter,
    )
    if cfg.cache_records:
        from pyspark.storagelevel import StorageLevel

        records = records.persist(StorageLevel.MEMORY_AND_DISK)
    mentions, triples, cache = split_records(records)

    nodes = merge_entity_nodes(
        mentions, salts=cfg.merge_salts, max_fragments=cfg.max_description_fragments
    )
    edges = merge_relation_edges(
        triples, salts=cfg.merge_salts, max_fragments=cfg.max_description_fragments
    )

    if cfg.summarize:
        from pyspark.sql import functions as F

        nodes = finalize_descriptions(nodes, "entity_name", "Entity", cfg.tokenizer_kind)
        # relation summary identity is "(src, tgt)" (operate.py:2854-2861)
        edges = edges.withColumn(
            "_pair", F.concat(F.lit("("), "src", F.lit(", "), "tgt", F.lit(")"))
        )
        edges = finalize_descriptions(edges, "_pair", "Relation", cfg.tokenizer_kind).drop(
            "_pair"
        )

    nodes = add_unknown_endpoint_nodes(nodes, edges)
    nodes, edges = with_degrees(nodes, edges)
    return KGBuildResult(
        chunks=chunks,
        mentions=mentions,
        triples=triples,
        llm_cache=cache,
        kg_nodes=nodes,
        kg_edges=edges,
        config=cfg,
    )
