"""Embedding stage + vector store materialization.

Replaces the reference's deferred-embedding buffer + NanoVectorDB
(kg/nano_vector_db_impl.py:272-391): embeddings are just an
``array<float>`` column on the entity/relation/chunk tables, produced by
one Arrow-batched pandas UDF (the analogue of embedding_batch_num
batching — Arrow batch size plays that role).

Retrieval = brute-force cosine top-k (small query sets broadcast) — the
scale path for larger query sets is the LSH-bucketed variant in
operators.datapipe.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from ..functions.mock_embed import DEFAULT_DIM, embed_text


def with_embeddings(df: DataFrame, text_col: str, dim: int = DEFAULT_DIM,
                    out_col: str = "embedding") -> DataFrame:
    d = dim

    @F.pandas_udf(ArrayType(FloatType()))
    def embed_udf(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: embed_text(t if t is not None else "", d))

    return df.withColumn(out_col, embed_udf(F.col(text_col)))


def entity_vdb(nodes: DataFrame, dim: int = DEFAULT_DIM) -> DataFrame:
    """ent- rows: content = name + newline + description (operate.py:2574,
    _truncate_vdb_content shape) -> embedding column."""
    content = F.concat_ws("\n", F.col("entity_name"), F.col("description"))
    base = nodes.select(
        F.concat(F.lit("ent-"), F.md5("entity_name")).alias("vdb_id"),
        "entity_name",
        "entity_type",
        content.alias("content"),
    )
    return with_embeddings(base, "content", dim)


def vector_search(
    vdb: DataFrame,
    query_text: str,
    k: int = 40,
    min_sim: float = 0.2,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """Cosine top-k rows of ``vdb`` for a query string — the reference's
    entity-VDB lookup (top_k=40, cosine threshold 0.2; constants.py:52,57)."""
    qv = embed_text(query_text, dim)
    q = F.array(*[F.lit(float(x)) for x in qv])
    dot = F.aggregate(
        F.zip_with(F.col("embedding"), q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # vdb embeddings are unit-norm by construction; query is unit-norm too.
    scored = vdb.withColumn("sim", F.round(dot, 6)).filter(F.col("sim") >= min_sim)
    return scored.orderBy(F.desc("sim"), F.asc("vdb_id")).limit(k)
