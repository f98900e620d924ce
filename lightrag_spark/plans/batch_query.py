"""Batched KG query — N questions against the graph in ONE Spark job.

The reference answers queries one at a time (operate.py kg_query: one
VDB lookup, one 1-hop expansion per call).  At corpus scale the natural
Spark shape is a BATCH: a questions table joins the node/edge tables
once, and every per-question ranking is a window over the joined frame —
thousands of questions cost one pass over the graph, not thousands.

Two stages, mirroring the single-query path's semantics
(plans/query.py:_perform_kg_search):

- ``batch_entity_seeds`` — the lexical seed retrieval: question tokens
  match entity names; candidates rank per question by (match count desc,
  degree desc, name).  This is the deterministic, oracle-replayable
  analogue of the entity-VDB top-k (the vector variant is
  ``operators.embedding.vector_search``, pytest-gated; shared-token
  feature hashing makes the two rankings strongly correlated by
  construction of the mock embedder).
- ``batch_one_hop`` — per-question 1-hop expansion of the seeds, ranked
  by (endpoint degree sum desc, weight desc, pair), the
  _find_most_related_edges order (operate.py:5690-5750).

Plan shape: questions are SMALL by definition — the exploded
(question, token) frame broadcasts onto the entity table; the only
data-volume work is one scan of nodes and one of edges, both keyed
per-question afterwards (window partitions = questions, bounded
fan-in).  No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def batch_entity_seeds(
    nodes: DataFrame,
    questions: DataFrame,
    k: int = 10,
    question_col: str = "question",
) -> DataFrame:
    """(question, entity_name, degree, pos<=k).

    ``nodes`` needs (entity_name, degree); ``questions`` one string
    column.  A DISTINCT question token that IS an entity name is a hit;
    hits rank by (degree desc, name) per question — the lexical analogue
    of _get_node_data's similarity order (hub entities first).
    """
    toks = questions.select(
        F.col(question_col),
        F.explode(
            F.array_distinct(F.split(F.trim(F.col(question_col)), r"\s+"))
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    hits = nodes.select("entity_name", "degree").join(
        F.broadcast(toks), F.col("entity_name") == F.col("tok")
    )
    w = Window.partitionBy(question_col).orderBy(
        F.desc("degree"), F.asc("entity_name")
    )
    return (
        hits.withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= k)
        .select(question_col, "entity_name", F.col("degree").cast("long").alias("degree"), "pos")
    )


def batch_one_hop(
    seeds: DataFrame,
    edges: DataFrame,
    nodes: DataFrame,
    k: int = 10,
    question_col: str = "question",
) -> DataFrame:
    """(question, src, tgt, weight, degree_sum, pos<=k) — edges incident
    to any seed entity of the question, deduped per (question, pair),
    ranked by (degree_sum desc, weight desc, src, tgt)."""
    deg = nodes.select("entity_name", "degree")
    e = (
        edges.select("src", "tgt", "weight")
        .join(deg.withColumnRenamed("entity_name", "src").withColumnRenamed("degree", "sd"), "src")
        .join(deg.withColumnRenamed("entity_name", "tgt").withColumnRenamed("degree", "td"), "tgt")
        .withColumn("degree_sum", (F.col("sd") + F.col("td")).cast("long"))
    )
    seed_cols = seeds.select(question_col, F.col("entity_name").alias("_seed"))
    # equi-join on an exploded endpoint column — an OR-condition join
    # ((src==seed)|(tgt==seed)) would compile to BroadcastNestedLoopJoin,
    # scanning every edge against every seed; exploding the two endpoints
    # keeps it one scan + one hash join
    incident = (
        e.withColumn("_ep", F.explode(F.array("src", "tgt")))
        .join(F.broadcast(seed_cols), F.col("_ep") == F.col("_seed"))
        .select(question_col, "src", "tgt", "weight", "degree_sum")
        .distinct()
    )
    w = Window.partitionBy(question_col).orderBy(
        F.desc("degree_sum"), F.desc("weight"), F.asc("src"), F.asc("tgt")
    )
    return (
        incident.withColumn("pos", F.row_number().over(w).cast("long"))
        .filter(F.col("pos") <= k)
        .select(question_col, "src", "tgt", "weight", "degree_sum", "pos")
    )
