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
    DEFAULT_MAX_EXTRACT_INPUT_TOKENS,
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
    # chunking strategy dispatch (reference pipeline.py:4903-4928):
    # token|F (default), recursive|R, semantic|V, paragraph|P
    chunking_strategy: str = "token"
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
    # Partition fan-out for the two mapInPandas stages.  mapInPandas is a
    # narrow transform: whatever partitioning the source has is what the
    # Python workers get — a single-file parquet scan would run the chunker
    # AND the extractor on one core.  None = 2x defaultParallelism.
    parallelism: int | None = None
    # Gleaning budget guard (reference constants.py:38): chunks whose
    # gleaning payload would exceed this token count skip the gleaning pass.
    max_extract_input_tokens: int = DEFAULT_MAX_EXTRACT_INPUT_TOKENS
    # Fault-injection hook: model calls on chunks containing this marker
    # raise; the chunk becomes a kind='error' record and its document rolls
    # up to doc-status FAILED (reference pipeline.py:5575-5632).
    model_fail_marker: str | None = None
    # Batch tag recorded on every doc_status row (reference base.py:925).
    track_id: str | None = None


def materialize_concurrently(dfs) -> None:
    """Materialize several INDEPENDENT cached frames at once (guide §2.6:
    actions are only sequential because driver code calls them
    sequentially).  Each frame's upstream persists must already be
    materialized — concurrent FIRST-touch of a shared unmaterialized cache
    races and recomputes the subtree per job (the documented AQE hazard);
    concurrent first-touch of DISJOINT caches over materialized inputs is
    safe and lets the tail of one job back-fill cores idled by the other.
    """
    from concurrent.futures import ThreadPoolExecutor

    dfs = [df for df in dfs if df is not None]
    if len(dfs) <= 1:
        for df in dfs:
            df.count()
        return
    with ThreadPoolExecutor(max_workers=len(dfs)) as ex:
        for f in [ex.submit(df.count) for df in dfs]:
            f.result()


def checkpoint_concurrently(dfs) -> list:
    """Eagerly localCheckpoint several INDEPENDENT frames at once and
    return the checkpointed frames (same safety contract as
    materialize_concurrently).  localCheckpoint rather than persist: a
    persisted relation keeps its ENTIRE upstream DAG as the cached logical
    plan, and every later query over it re-analyzes that multi-thousand-
    node plan on the driver (measured: 2-4 s of pure planning per
    analytics query against the persisted final KG tables); the checkpoint
    truncates to a LogicalRDD scan."""
    from concurrent.futures import ThreadPoolExecutor

    # REBALANCE before the checkpoint: the checkpoint otherwise stores its
    # parent's partitioning (e.g. 64 near-empty partitions inherited from
    # the shuffle width), and every later stage scanning it pays the full
    # task-launch cost for KB-sized data.  The AQE rebalance sizes stored
    # partitions by BYTES — few at test scale, advisory-sized (~64-256 MB)
    # at corpus scale — so downstream scan parallelism is data-
    # proportional at any size.  No-op when AQE is off.
    dfs = [df.hint("rebalance") for df in dfs]
    if len(dfs) == 1:
        return [dfs[0].localCheckpoint(eager=True)]
    with ThreadPoolExecutor(max_workers=len(dfs)) as ex:
        futs = [ex.submit(lambda d=df: d.localCheckpoint(eager=True)) for df in dfs]
        return [f.result() for f in futs]


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

    import os as _os
    import time as _time

    _dbg = _os.environ.get("SPARK_KG_DEBUG_TIMING") == "1"

    def _tick(label, t0):
        if _dbg:
            print(f"[kg_build] {label}: {_time.time()-t0:.1f}s", flush=True)
        return _time.time()

    _t = _time.time()
    par = cfg.parallelism or docs.sparkSession.sparkContext.defaultParallelism * 2
    # Spread documents across workers for the chunking UDF (narrow transform
    # — inherits input partitioning otherwise), then re-spread chunks for the
    # extraction UDF: long documents explode into many chunks, so without the
    # second repartition one worker would own every chunk of a hot document.
    chunks = chunk_documents(
        docs.repartition(par, "doc_id"),
        tokenizer_kind=cfg.tokenizer_kind,
        chunk_token_size=cfg.chunk_token_size,
        chunk_overlap_token_size=cfg.chunk_overlap_token_size,
        with_source_spans=cfg.with_source_spans,
        strategy=cfg.chunking_strategy,
    )
    chunks = chunks.repartition(par, "chunk_id")
    if cfg.cache_records:
        # Materialize the chunk table once: the extractor below AND every
        # r.chunks consumer (chunk queries, the batched context's chunk
        # join, the delete path's surviving-chunk filter) otherwise each
        # re-run the chunking kernel; the checkpoint also truncates the
        # lineage so consumers plan against a LogicalRDD scan instead of
        # the scan+repartition+Python subtree.  This is the local stand-in
        # for the runner's chunks-table write — the pipeline's natural
        # materialization boundary.  LAZY (eager=False): the records
        # materialization below is the single first-touch and saves the
        # chunk blocks as a side effect — an eager checkpoint here would
        # pay one extra sequential pass over the corpus.
        chunks = chunks.localCheckpoint(eager=False)

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
        model_fail_marker=cfg.model_fail_marker,
        max_extract_input_tokens=cfg.max_extract_input_tokens,
        tokenizer_kind=cfg.tokenizer_kind,
    )
    if cfg.cache_records:
        from pyspark.storagelevel import StorageLevel

        records = records.persist(StorageLevel.MEMORY_AND_DISK)
        # Materialize NOW: the merge stage fans out into several concurrent
        # jobs (AQE builds broadcast sides asynchronously), and concurrent
        # first-touch of an unmaterialized cache races — every async job
        # recomputes the whole extraction subtree (observed 4-5x extraction
        # cost at local[32]).  One count pins the cache before the fan-out.
        _t = _tick("plan", _t)
        records.count()
        _t = _tick("records.count (chunk+extract)", _t)
    mentions, triples, cache = split_records(records)
    if cfg.cache_records:
        # Pin the NARROW splits too: records.description also carries the
        # raw model responses (kind='cache', ~10KB each), and the merges scan
        # their input 4-5x — reading them through the records cache would
        # decompress the fat response column on every pass (measured 10x
        # slowdown of both merges at local[32]).  localCheckpoint rather
        # than persist (lineage truncation — see the finals note below);
        # both read the already-materialized records cache, so concurrent
        # first-touch is safe and the two jobs overlap.
        mentions, triples = checkpoint_concurrently([mentions, triples])
        _t = _tick("mentions+triples checkpoints (concurrent)", _t)

    nodes = merge_entity_nodes(
        mentions, salts=cfg.merge_salts, max_fragments=cfg.max_description_fragments
    )
    edges = merge_relation_edges(
        triples, salts=cfg.merge_salts, max_fragments=cfg.max_description_fragments
    )
    if cfg.cache_records:
        # The merged edge table feeds FOUR downstream consumers (unknown
        # endpoints anti-join, node degree, src/tgt degree joins) — without a
        # materialized pin each consumer re-runs the whole two-phase
        # aggregation (concurrently, via AQE's async broadcast builds).
        # The two merges are independent reads of disjoint materialized
        # checkpoints (mentions / triples): run them as two concurrent
        # jobs so the node merge back-fills the edge merge's straggler
        # tail instead of waiting for it (both dominated by stage latency,
        # not data volume, at bench scale).
        edges, nodes = checkpoint_concurrently([edges, nodes])
        _t = _tick("edges+nodes merges (concurrent checkpoint)", _t)

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
    if cfg.cache_records:
        # Pin the FINAL tables too: every downstream consumer (the bench's
        # sequential kg_nodes/kg_edges counts, the 30+ kg_* analytics
        # queries off the memoized build, the runner's writes) otherwise
        # re-derives the summarize/unknown/degree joins per touch.
        # localCheckpoint, NOT persist: a persist keeps the ENTIRE build
        # DAG as the cached relation's logical plan, and every later query
        # over the cache re-analyzes that multi-thousand-node plan on the
        # driver (measured 2-3x slowdown of the graph-analytics queries
        # from planning time alone); the checkpoint truncates to a
        # LogicalRDD scan.  Both finals read only the materialized merge
        # caches, so concurrent first-touch is safe — and the two jobs
        # overlap their tails.
        nodes, edges = checkpoint_concurrently([nodes, edges])
        _t = _tick("final nodes+edges (concurrent checkpoint)", _t)
    return KGBuildResult(
        chunks=chunks,
        mentions=mentions,
        triples=triples,
        llm_cache=cache,
        kg_nodes=nodes,
        kg_edges=edges,
        config=cfg,
    )
