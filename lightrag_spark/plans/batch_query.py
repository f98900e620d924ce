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


def batch_related_chunks(
    seeds: DataFrame,
    nodes: DataFrame,
    per_entity: int = 5,
    question_col: str = "question",
) -> DataFrame:
    """Per-question WEIGHT chunk pick (operate.py:5690-5790 under
    deterministic order — the same degenerate variant the single-query
    path's related_chunks_dedup_for_entities implements, windowed by
    question): explode each seed entity's source chunk ids in list order,
    a chunk already claimed by an earlier-ranked entity of the SAME
    question is skipped, each entity keeps at most ``per_entity``.

    ``seeds`` carries (question, entity_name, pos); ``nodes`` provides
    source_ids.  Output (question, entity_name, pos, chunk_id, chunk_pos).
    All windows partition by question — bounded fan-in per question, one
    scan of the node table total.
    """
    joined = seeds.select(question_col, "entity_name", "pos").join(
        nodes.select("entity_name", "source_ids"), "entity_name"
    )
    exploded = joined.select(
        question_col,
        "entity_name",
        "pos",
        F.posexplode("source_ids").alias("list_idx", "chunk_id"),
    )
    first = Window.partitionBy(question_col, "chunk_id").orderBy("pos", "list_idx")
    deduped = exploded.withColumn("_rn", F.row_number().over(first)).filter(
        F.col("_rn") == 1
    )
    per_ent = Window.partitionBy(question_col, "pos").orderBy("list_idx")
    return (
        deduped.withColumn("chunk_pos", F.row_number().over(per_ent).cast("long"))
        .filter(F.col("chunk_pos") <= per_entity)
        .select(question_col, "entity_name", "pos", "chunk_id", "chunk_pos")
    )


def _json_escape(col):
    """json.dumps string-body escaping for text without control chars
    (backslash first, then quote) — matches the driver render's
    json.dumps(..., ensure_ascii=False) byte-for-byte on such inputs."""
    return F.replace(
        F.replace(col, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )


def _ws_count(col):
    """Whitespace token count of a string column (0 for blank) — the
    batch twin of the driver's _ws_tokens."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


def _ordered_join(pos_cols: list, line_col, sep: str = "\n"):
    """collect_list is order-nondeterministic; aggregate (pos, line)
    structs, array_sort, project the line, join — the repo's standard
    ordered-string aggregation (codegen window + sort, no Python)."""
    return F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(*[F.col(c).alias(f"k{i}") for i, c in enumerate(pos_cols)], line_col.alias("v")))
            ),
            lambda x: x["v"],
        ),
        sep,
    )


def batch_context(
    seeds: DataFrame,
    relations: DataFrame,
    nodes: DataFrame,
    chunks: DataFrame,
    per_entity: int = 5,
    max_total_tokens: int = 30000,
    overhead_tokens: int = 200,
    question_col: str = "question",
    materialize: bool = True,
) -> DataFrame:
    """Per-question CONTEXT RENDER — the batched face of
    plans/context.build_context_str (_build_context_str,
    operate.py:5272-5450): JSON-lines entity and relation sections, chunks
    greedily admitted under the remaining whitespace-token budget, and a
    ``[n] file_path`` reference list, assembled for N questions in ONE
    pass with string expressions (byte-identical to the driver render on
    control-char-free text — asserted by tests/test_batch_query.py).

    Inputs: ``seeds`` (question, entity_name, degree, pos) from
    batch_entity_seeds; ``relations`` (question, src, tgt, pos) from
    batch_one_hop; ``nodes`` for entity_type + source_ids; ``chunks`` for
    (chunk_id, content, file_path).  Output: (question, context), one row
    per question that produced at least one seed.

    Scale shape: every aggregation partitions by question; the rendered
    strings are top-k-bounded by construction.  No Python runs anywhere —
    the whole render is Catalyst string expressions over windowed frames.
    ``materialize`` (default on) eagerly localCheckpoints the bounded
    inputs and the kept-chunk frame: the render references each in
    several plan branches, and without truncation every branch recomputes
    the whole upstream subtree (measured ~5x stage count on a warm build;
    the frames are k-rows-per-question small by contract, so the
    checkpoint is cheap at any corpus size).
    """
    q = question_col
    if materialize:
        seeds = seeds.localCheckpoint(eager=True)
        relations = relations.localCheckpoint(eager=True)

    ent_lines = seeds.join(
        nodes.select("entity_name", "entity_type"), "entity_name", "left"
    ).select(
        q,
        "pos",
        F.concat(
            F.lit('{"degree": '),
            F.col("degree").cast("long").cast("string"),
            F.lit(', "entity_name": "'),
            _json_escape(F.col("entity_name")),
            F.lit('", "entity_type": "'),
            _json_escape(F.coalesce("entity_type", F.lit(""))),
            F.lit('"}'),
        ).alias("line"),
    )
    ents = ent_lines.groupBy(q).agg(
        _ordered_join(["pos"], F.col("line")).alias("entities_str")
    )

    rel_lines = relations.select(
        q,
        "pos",
        F.concat(
            F.lit('{"src": "'),
            _json_escape(F.col("src")),
            F.lit('", "tgt": "'),
            _json_escape(F.col("tgt")),
            F.lit('"}'),
        ).alias("line"),
    )
    rels = rel_lines.groupBy(q).agg(
        _ordered_join(["pos"], F.col("line")).alias("relations_str")
    )

    # per-question remaining budget after the entity/relation sections
    budget = (
        ents.join(rels, q, "full")
        .select(
            q,
            F.coalesce("entities_str", F.lit("")).alias("entities_str"),
            F.coalesce("relations_str", F.lit("")).alias("relations_str"),
        )
        .withColumn(
            "_avail",
            F.lit(max_total_tokens)
            - _ws_count(F.col("entities_str"))
            - _ws_count(F.col("relations_str"))
            - F.lit(overhead_tokens),
        )
    )

    picked = batch_related_chunks(seeds, nodes, per_entity, q)
    ch = (
        picked.join(chunks.select("chunk_id", "content", "file_path"), "chunk_id")
        .withColumn("file_path", F.coalesce("file_path", F.lit("unknown_source")))
        .withColumn("_cost", _ws_count(F.col("content")))
    )
    cum = Window.partitionBy(q).orderBy("pos", "chunk_pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    kept = (
        ch.withColumn("_cum", F.sum("_cost").over(cum))
        .join(budget.select(q, "_avail"), q)
        .filter(F.col("_cum") <= F.col("_avail"))
    )
    # reference ids in first-KEPT-occurrence order of file_path
    fmin = Window.partitionBy(q, "file_path")
    kept = kept.withColumn(
        "_fmin", F.min(F.struct("pos", "chunk_pos")).over(fmin)
    )
    refrank = Window.partitionBy(q).orderBy("_fmin")
    kept = kept.withColumn("reference_id", F.dense_rank().over(refrank))
    if materialize:
        kept = kept.localCheckpoint(eager=True)

    # one aggregation produces BOTH per-question strings: the chunk lines
    # (pick order) and the distinct reference list (ref-id order) — no
    # second pass over kept
    chunk_line = F.concat(
        F.lit('{"content": "'),
        _json_escape(F.col("content")),
        F.lit('", "reference_id": '),
        F.col("reference_id").cast("string"),
        F.lit("}"),
    )
    ref_line = F.concat(
        F.lit("["),
        F.col("reference_id").cast("string"),
        F.lit("] "),
        F.col("file_path"),
    )
    chs = kept.groupBy(q).agg(
        _ordered_join(["pos", "chunk_pos"], chunk_line).alias("chunks_str"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.array_distinct(
                        F.collect_list(
                            F.struct(F.col("reference_id").alias("k0"), ref_line.alias("v"))
                        )
                    )
                ),
                lambda x: x["v"],
            ),
            "\n",
        ).alias("refs_str"),
    )

    return (
        budget.join(chs, q, "left")
        .select(
            q,
            F.concat(
                F.lit("-----Entities-----\n"),
                F.col("entities_str"),
                F.lit("\n\n-----Relationships-----\n"),
                F.col("relations_str"),
                F.lit("\n\n-----Chunks-----\n"),
                F.coalesce("chunks_str", F.lit("")),
                F.lit("\n\n-----References-----\n"),
                F.coalesce("refs_str", F.lit("")),
                F.lit("\n"),
            ).alias("context"),
        )
    )
