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
    _truncate_vdb_content shape) -> embedding column.  Nodes without the
    finalized ``description`` string (summarize off) fall back to the
    joined fragments."""
    desc = (
        F.col("description")
        if "description" in nodes.columns
        else F.array_join("descriptions", "\n")
    )
    content = F.concat_ws("\n", F.col("entity_name"), desc)
    base = nodes.select(
        F.concat(F.lit("ent-"), F.md5("entity_name")).alias("vdb_id"),
        "entity_name",
        "entity_type",
        content.alias("content"),
    )
    return with_embeddings(base, "content", dim)


def relation_vdb(
    edges: DataFrame,
    dim: int = DEFAULT_DIM,
    embedding_token_limit: int | None = None,
    tokenizer_kind: str = "regex",
) -> DataFrame:
    """rel- rows (operate.py:3179-3200): id = rel-md5(src+tgt) over the
    SORTED pair, content = "{keywords}\\t{src}\\n{tgt}\\n{description}"
    clamped by _truncate_vdb_content when an embedding limit is set."""
    kw = F.array_join(F.col("keywords"), ",") if "keywords" in edges.columns else F.lit("")
    desc = F.col("description") if "description" in edges.columns else F.array_join(
        "descriptions", "\n"
    )
    base = edges.select(
        F.concat(F.lit("rel-"), F.md5(F.concat(F.col("src"), F.col("tgt")))).alias("vdb_id"),
        "src",
        "tgt",
        F.col("weight"),
        F.concat(kw, F.lit("\t"), F.col("src"), F.lit("\n"), F.col("tgt"),
                 F.lit("\n"), desc).alias("content"),
    )
    if embedding_token_limit is not None:
        from pyspark.sql.types import StringType

        limit = int(embedding_token_limit)
        kind = tokenizer_kind

        @F.pandas_udf(StringType())
        def clamp(texts: pd.Series) -> pd.Series:
            from ..functions.tokenizer import get_tokenizer, truncate_vdb_content

            tok = get_tokenizer(kind)
            return texts.map(lambda t: truncate_vdb_content(t or "", tok, limit))

        base = base.withColumn("content", clamp(F.col("content")))
    return with_embeddings(base, "content", dim)


def get_edge_data(
    edges: DataFrame,
    query_text: str,
    k: int = 40,
    min_sim: float = 0.2,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """_get_edge_data (operate.py:5849-5905): relation-VDB cosine top-k for
    the query keywords, payload joined back from the edge table, vector-
    search order preserved as ``pos``."""
    hits = vector_search(relation_vdb(edges, dim), query_text, k=k, min_sim=min_sim)
    from pyspark.sql.window import Window

    w = Window.orderBy(F.desc("sim"), F.asc("vdb_id"))
    ranked = hits.withColumn("pos", F.row_number().over(w).cast("long")).select(
        "src", "tgt", "sim", "pos"
    )
    return ranked.join(edges, ["src", "tgt"], "left")


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
