"""Distributed token-window chunking.

The reference chunks one document at a time on the event loop
(/root/reference/lightrag/chunker/token_size.py, dispatched from
pipeline.py:4817-5025).  Here the whole corpus is chunked in one
``mapInPandas`` pass: Arrow batches of documents stream through a worker
that holds a per-process tokenizer singleton, and each document explodes
into its chunk rows.  No per-row Python, no driver-side loops; the operator
scales with input partitions.

Output schema (FIXTURES.md §2)::

    chunks(chunk_id, doc_id, chunk_order_index, tokens, content,
           char_start, char_end, file_path, doc_order,
           part_id, lineage_id)

``part_id``/``lineage_id`` are per-partition lineage identifiers required
by the north rule (spark_partition_id + a partition-local ordinal).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..constants import DEFAULT_CHUNK_OVERLAP_TOKEN_SIZE, DEFAULT_CHUNK_TOKEN_SIZE
from ..functions.chunking_core import (
    chunk_id_for,
    chunk_text_by_tokens,
    enforce_embedding_token_limit,
)
from ..functions.tokenizer import get_tokenizer

CHUNKS_SCHEMA = StructType(
    [
        StructField("chunk_id", StringType()),
        StructField("doc_id", StringType()),
        StructField("chunk_order_index", IntegerType()),
        StructField("tokens", IntegerType()),
        StructField("content", StringType()),
        StructField("char_start", IntegerType()),
        StructField("char_end", IntegerType()),
        StructField("file_path", StringType()),
        StructField("doc_order", LongType()),
    ]
)


def chunk_documents(
    docs: DataFrame,
    tokenizer_kind: str = "auto",
    chunk_token_size: int = DEFAULT_CHUNK_TOKEN_SIZE,
    chunk_overlap_token_size: int = DEFAULT_CHUNK_OVERLAP_TOKEN_SIZE,
    with_source_spans: bool = True,
    with_lineage: bool = True,
    embedding_token_limit: int | None = None,
    strategy: str = "token",
) -> DataFrame:
    """docs(doc_id, text, file_path, doc_order) -> chunks DataFrame.

    The tokenizer is resolved once per executor process (module-level
    singleton), not per row or per batch.  ``embedding_token_limit``
    enables the post-chunk hard-split guard (pipeline.py:5105-5144);
    re-split windows lose their source spans (the reference drops them
    too — the guard runs after span assignment).

    ``strategy`` mirrors the reference's chunking dispatch
    (pipeline.py:4903-4928): "token"/"F" fixed token windows (default),
    "recursive"/"R" recursive-character, "semantic"/"V" semantic-vector
    (sentence embeddings via the worker-side embedder).  All strategies
    run in the same mapInPandas stage — the dispatch picks the per-doc
    kernel, not the plan shape.
    """
    size = chunk_token_size
    overlap = chunk_overlap_token_size
    kind = tokenizer_kind
    spans = with_source_spans
    emb_limit = embedding_token_limit
    strat = {
        "F": "token", "R": "recursive", "V": "semantic", "P": "paragraph",
    }.get(strategy, strategy)
    if strat not in ("token", "recursive", "semantic", "paragraph"):
        raise ValueError(f"unknown chunking strategy: {strategy!r}")

    def chunk_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tokenizer = get_tokenizer(kind)
        if strat == "recursive":
            from ..functions.recursive_chunking import chunk_text_recursive

            def chunk_one(text):
                return chunk_text_recursive(
                    tokenizer, text, chunk_token_size=size,
                    chunk_overlap_token_size=overlap,
                )
        elif strat == "semantic":
            from ..functions.semantic_chunking import chunk_text_semantic

            def chunk_one(text):
                return chunk_text_semantic(
                    tokenizer, text, chunk_token_size=size,
                    chunk_overlap_token_size=overlap,
                )
        elif strat == "paragraph":
            # P over a text column == the reference's own no-sidecar
            # fallback (paragraph_semantic.py:2200-2224); block-mode P is
            # functions.paragraph_chunking.chunk_blocks_paragraph.
            from ..functions.paragraph_chunking import chunk_text_paragraph

            def chunk_one(text):
                return chunk_text_paragraph(
                    tokenizer, text, chunk_token_size=size,
                    chunk_overlap_token_size=overlap,
                )
        else:

            def chunk_one(text):
                return chunk_text_by_tokens(
                    tokenizer,
                    text,
                    chunk_overlap_token_size=overlap,
                    chunk_token_size=size,
                    with_source_spans=spans,
                )

        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in CHUNKS_SCHEMA.fields}
            for doc_id, text, file_path, doc_order in zip(
                pdf["doc_id"], pdf["text"], pdf["file_path"], pdf["doc_order"]
            ):
                if text is None:
                    continue
                pieces = chunk_one(text)
                if emb_limit is not None:
                    pieces = enforce_embedding_token_limit(
                        pieces, tokenizer, emb_limit, min(overlap, emb_limit - 1)
                    )
                for ch in pieces:
                    order = ch["chunk_order_index"]
                    span = ch.get("_source_span")
                    out["chunk_id"].append(chunk_id_for(doc_id, order))
                    out["doc_id"].append(doc_id)
                    out["chunk_order_index"].append(order)
                    out["tokens"].append(ch["tokens"])
                    out["content"].append(ch["content"])
                    out["char_start"].append(span["start"] if span else None)
                    out["char_end"].append(span["end"] if span else None)
                    out["file_path"].append(file_path)
                    out["doc_order"].append(doc_order)
            yield pd.DataFrame(out)

    chunks = docs.select("doc_id", "text", "file_path", "doc_order").mapInPandas(
        chunk_batches, schema=CHUNKS_SCHEMA
    )
    if with_lineage:
        chunks = chunks.withColumn("part_id", F.spark_partition_id()).withColumn(
            "lineage_id", F.monotonically_increasing_id()
        )
    return chunks


def semantic_breakpoint_table(
    embeddings: DataFrame,
    group_size: int = 50,
    threshold_type: str = "percentile",
) -> DataFrame:
    """The V-chunker's breakpoint core (functions/semantic_chunking.py
    steps 4-6; reference chunker/semantic_vector.py:122-196) run distributed
    over a FIXED embedding sequence, so the math itself is DuckDB-checkable.

    Rows of ``embeddings`` play the role of consecutive sentence-window
    embeddings; every ``group_size`` consecutive vec_ids form one pseudo-
    document.  Per group: distance[i] = 1 - cosine(emb[i], emb[i+1]),
    threshold from the chosen distribution (default percentile-95 with
    numpy-style linear interpolation), a breakpoint wherever the distance
    exceeds it, and each sentence's chunk index = breakpoints before it —
    EXACTLY what semantic_groups_with_spans does between its regex-split
    and span-trim stages (those need Python regex lookbehind and are
    pytest-gated instead; see tests/test_semantic_chunking.py).

    Plan shape: one shuffle on group_id, then applyInPandas over bounded
    groups (group_size rows each) calling the REAL chunker functions —
    the same per-document parallelism the V strategy has inside
    chunk_documents.  Output (group_id, vec_id, sent_idx, dist_next,
    chunk_idx); dist_next is the distance to the NEXT sentence (4dp, null
    for the last sentence of a group).
    """
    from ..functions.semantic_chunking import (
        _cosine_distance,
        semantic_breakpoint_threshold,
    )

    out_schema = (
        "group_id long, vec_id long, sent_idx long, dist_next double, "
        "chunk_idx long"
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        embs = [[float(x) for x in v] for v in pdf["embedding"]]
        n = len(embs)
        distances = [
            _cosine_distance(embs[i], embs[i + 1]) for i in range(n - 1)
        ]
        if distances:
            threshold, arr = semantic_breakpoint_threshold(
                distances, threshold_type
            )
            is_bp = [x > threshold for x in arr]
        else:
            is_bp = []
        chunk_idx, acc = [], 0
        for i in range(n):
            chunk_idx.append(acc)
            if i < n - 1 and is_bp[i]:
                acc += 1
        return pd.DataFrame(
            {
                "group_id": pdf["group_id"],
                "vec_id": pdf["vec_id"],
                "sent_idx": range(n),
                "dist_next": [round(d, 4) for d in distances] + [None],
                "chunk_idx": chunk_idx,
            }
        )

    grouped = embeddings.withColumn(
        "group_id", F.floor(F.col("vec_id") / group_size).cast("long")
    ).select("group_id", "vec_id", "embedding")
    return grouped.groupBy("group_id").applyInPandas(per_group, out_schema)
