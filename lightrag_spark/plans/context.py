"""Query-side context assembly (SURVEY.md §2.7) — the operators between
retrieval and the LLM prompt.

Reference behavior re-expressed (file:line into /root/reference):
- global-mode relation seeds + entities-from-relations: _get_edge_data +
  _find_most_related_entities_from_relationships (operate.py:5849-5938) —
  relation top-k in similarity order, then the src/tgt entities of those
  relations in first-seen order.
- round-robin interleave-dedup of local vs global results:
  _perform_kg_search's merge (operate.py:4880-4934) — position i takes the
  local item first, then the global item, skipping already-seen keys.
- chunk merge: _merge_all_chunks (operate.py:5164-5268) — 3-way round robin
  over vector/entity/relation chunk lists, first-seen dedup by chunk_id.
- relation->chunk selection: _find_related_text_unit_from_relations
  (operate.py:5941-6140), WEIGHT method degenerate deterministic order —
  explode each relation's source_ids, drop chunks already claimed by the
  entity list, keep first occurrence (earliest relation position wins),
  cap per relation.
- context render: _build_context_str (operate.py:5272-5450) — JSON-lines
  entity/relation sections, chunk section under a dynamic token budget,
  reference list of file paths.

Scale contract: every input here is top-k-bounded BY CONSTRUCTION (seeds
come from orderBy().limit(k) heads, k <= a few hundred), so the unpartitioned
windows that assign interleave positions run over k rows, not the corpus —
the same bounded-input contract the reference's in-memory lists rely on.
The corpus-scale work (degree ranking, VDB top-k) happens upstream in
parallel operators; assembly is intentionally a small-data tail.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def top_relations(edges: DataFrame, k: int = 10) -> DataFrame:
    """Global-mode relation seeds: the SQL-checkable stand-in for the
    relation-VDB similarity order (operate.py:5849-5905) ranks by
    (weight desc, rank desc, src, tgt).  Planned as TakeOrderedAndProject;
    the pos column is derived over the k survivors only."""
    head = (
        edges.select("src", "tgt", "weight", "rank")
        .orderBy(F.desc("weight"), F.desc("rank"), F.asc("src"), F.asc("tgt"))
        .limit(k)
    )
    w = Window.orderBy(F.desc("weight"), F.desc("rank"), F.asc("src"), F.asc("tgt"))
    return head.withColumn("pos", F.row_number().over(w).cast("long"))


def entities_from_relations(seed_rels: DataFrame, nodes: DataFrame) -> DataFrame:
    """The src/tgt entities of the seed relations, in first-seen order
    (src before tgt within a relation, relations in pos order) — mirrors
    _find_most_related_entities_from_relationships (operate.py:5908-5938).
    Output: (entity_name, entity_type, degree, pos)."""
    sides = seed_rels.select(
        F.col("src").alias("entity_name"), "pos", F.lit(0).alias("side")
    ).unionByName(
        seed_rels.select(F.col("tgt").alias("entity_name"), "pos", F.lit(1).alias("side"))
    )
    first = Window.partitionBy("entity_name").orderBy("pos", "side")
    deduped = sides.withColumn("_rn", F.row_number().over(first)).filter(F.col("_rn") == 1)
    order = Window.orderBy("pos", "side", "entity_name")
    ranked = deduped.withColumn("epos", F.row_number().over(order).cast("long")).select(
        "entity_name", "epos"
    )
    return (
        ranked.join(nodes.select("entity_name", "entity_type", "degree"), "entity_name", "left")
        .select(
            "entity_name",
            "entity_type",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.col("epos").alias("pos"),
        )
    )


def interleave_round_robin(
    local: DataFrame,
    global_: DataFrame,
    key_cols: list[str],
    pos_col: str = "pos",
) -> DataFrame:
    """Round-robin merge with first-seen dedup (operate.py:4880-4934):
    iteration i yields local[i] then global[i]; an item whose key was
    already emitted is skipped.  Inputs must carry a 1-based ``pos_col``.
    Output: the union of columns plus ``origin`` ('L'/'G' of the winning
    occurrence) and the final 1-based ``pos``."""
    l = local.withColumn("origin", F.lit("L")).withColumn("_side", F.lit(0))
    g = global_.withColumn("origin", F.lit("G")).withColumn("_side", F.lit(1))
    both = l.unionByName(g, allowMissingColumns=True)
    first = Window.partitionBy(*key_cols).orderBy(F.col(pos_col), F.col("_side"))
    deduped = both.withColumn("_rn", F.row_number().over(first)).filter(F.col("_rn") == 1)
    order = Window.orderBy(F.col(pos_col), F.col("_side"), *key_cols)
    return (
        deduped.withColumn("_fpos", F.row_number().over(order).cast("long"))
        .drop("_rn", "_side", pos_col)
        .withColumnRenamed("_fpos", pos_col)
    )


def related_chunks_for_relations(
    seed_rels: DataFrame,
    claimed_chunks: DataFrame | None = None,
    per_relation: int = 5,
    source_ids_col: str = "source_ids",
) -> DataFrame:
    """Relation -> chunk selection, WEIGHT method under deterministic order
    (operate.py:5941-6140): explode each seed relation's source chunk ids in
    list order; a chunk already claimed by the entity list (``claimed_chunks``
    with column chunk_id) is dropped; of the remainder the earliest relation
    position wins (first-seen dedup); each relation keeps at most
    ``per_relation`` survivors.  Output: (src, tgt, pos, chunk_id, chunk_pos).
    """
    exploded = seed_rels.select(
        "src", "tgt", "pos", F.posexplode(source_ids_col).alias("list_idx", "chunk_id")
    )
    if claimed_chunks is not None:
        exploded = exploded.join(
            claimed_chunks.select("chunk_id"), "chunk_id", "left_anti"
        )
    first = Window.partitionBy("chunk_id").orderBy("pos", "list_idx")
    deduped = exploded.withColumn("_rn", F.row_number().over(first)).filter(
        F.col("_rn") == 1
    )
    per_rel = Window.partitionBy("pos").orderBy("list_idx")
    return (
        deduped.withColumn("chunk_pos", F.row_number().over(per_rel).cast("long"))
        .filter(F.col("chunk_pos") <= per_relation)
        .select("src", "tgt", "pos", "chunk_id", "chunk_pos")
    )


def merge_all_chunks(
    vector_chunks: DataFrame | None,
    entity_chunks: DataFrame | None,
    relation_chunks: DataFrame | None,
) -> DataFrame:
    """3-way round-robin chunk merge with first-seen dedup
    (_merge_all_chunks, operate.py:5210-5258): iteration i yields
    vector[i], entity[i], relation[i], skipping seen chunk_ids.  Each input
    carries (chunk_id, pos); output (chunk_id, origin, pos) where origin is
    V/E/R of the winning occurrence."""
    parts = []
    for df, tag, side in (
        (vector_chunks, "V", 0),
        (entity_chunks, "E", 1),
        (relation_chunks, "R", 2),
    ):
        if df is not None:
            parts.append(
                df.select("chunk_id", "pos")
                .withColumn("origin", F.lit(tag))
                .withColumn("_side", F.lit(side))
            )
    if not parts:
        raise ValueError("merge_all_chunks needs at least one input list")
    both = parts[0]
    for p in parts[1:]:
        both = both.unionByName(p)
    first = Window.partitionBy("chunk_id").orderBy("pos", "_side")
    deduped = both.withColumn("_rn", F.row_number().over(first)).filter(F.col("_rn") == 1)
    order = Window.orderBy("pos", "_side", "chunk_id")
    return (
        deduped.withColumn("_fpos", F.row_number().over(order).cast("long"))
        .select("chunk_id", "origin", F.col("_fpos").alias("pos"))
    )


def _ws_tokens(s: str) -> int:
    return len(s.split()) if s and s.strip() else 0


def generate_reference_list_from_chunks(
    chunks: list[dict],
) -> tuple[list[dict], list[dict]]:
    """Frequency-prioritized reference ids (utils.py:6262-6326): file
    paths rank by (occurrence count desc, first appearance asc); every
    chunk gets a string ``reference_id`` ('' for unknown_source).  NOTE
    the deliberate contrast with build_context_str's first-seen ids —
    the reference uses first-seen inside the KG context render and this
    frequency order at the query result boundary; both are kept."""
    if not chunks:
        return [], []
    counts: dict[str, int] = {}
    for ch in chunks:
        fp = ch.get("file_path", "")
        if fp and fp != "unknown_source":
            counts[fp] = counts.get(fp, 0) + 1
    with_idx = []
    seen: set = set()
    for i, ch in enumerate(chunks):
        fp = ch.get("file_path", "")
        if fp and fp != "unknown_source" and fp not in seen:
            with_idx.append((fp, counts[fp], i))
            seen.add(fp)
    ordered = [fp for fp, _, _ in sorted(with_idx, key=lambda x: (-x[1], x[2]))]
    ref_of = {fp: str(i + 1) for i, fp in enumerate(ordered)}
    updated = []
    for ch in chunks:
        c = dict(ch)
        fp = c.get("file_path", "")
        c["reference_id"] = ref_of.get(fp, "") if fp != "unknown_source" else ""
        updated.append(c)
    reference_list = [
        {"reference_id": str(i + 1), "file_path": fp} for i, fp in enumerate(ordered)
    ]
    return reference_list, updated


def render_chunks_context_text(chunks_with_reference_ids: list[dict]) -> str:
    """The exact chunk-context JSON lines sent to the LLM
    (utils.py:6328-6350): one compact object per chunk, reference_id
    first, optional content_headings passed through."""
    out = []
    for ch in chunks_with_reference_ids:
        entry = {"reference_id": ch["reference_id"], "content": ch["content"]}
        if ch.get("content_headings"):
            entry["content_headings"] = ch["content_headings"]
        out.append(entry)
    return "\n".join(json.dumps(e, ensure_ascii=False) for e in out)


def build_context_str(
    entities: list[dict],
    relations: list[dict],
    chunks: list[dict],
    max_total_tokens: int = 30000,
    overhead_tokens: int = 200,
    kept_out: list | None = None,
) -> tuple[str, list[dict]]:
    """Driver-side final render (_build_context_str, operate.py:5272-5450):
    JSON-lines entity and relation sections, then chunks greedily admitted
    under the remaining token budget (whitespace tokens here — the simple-
    mode tokenizer; the reference counts with its tokenizer), then a
    reference list [n] -> file_path.  Inputs are the COLLECTED top-k-bounded
    assembly outputs — by contract a few hundred rows, never corpus-scale.

    Returns (context_str, reference_list).  When ``kept_out`` is given the
    budget-admitted chunks (each with its reference_id) are appended to it
    — the structured query_data surface reports exactly what the LLM
    context carries."""
    entities_str = "\n".join(json.dumps(e, ensure_ascii=False, sort_keys=True) for e in entities)
    relations_str = "\n".join(json.dumps(r, ensure_ascii=False, sort_keys=True) for r in relations)

    used = _ws_tokens(entities_str) + _ws_tokens(relations_str) + overhead_tokens
    available = max_total_tokens - used

    ref_ids: dict[str, int] = {}
    reference_list: list[dict] = []
    kept: list[dict] = []
    for ch in chunks:
        cost = _ws_tokens(ch.get("content", ""))
        if cost > available:
            break
        available -= cost
        fp = ch.get("file_path", "unknown_source")
        if fp not in ref_ids:
            ref_ids[fp] = len(ref_ids) + 1
            reference_list.append({"reference_id": ref_ids[fp], "file_path": fp})
        kept.append({**ch, "reference_id": ref_ids[fp]})

    chunk_lines = "\n".join(
        json.dumps(
            {"reference_id": c["reference_id"], "content": c.get("content", "")},
            ensure_ascii=False,
            sort_keys=True,
        )
        for c in kept
    )
    if kept_out is not None:
        kept_out.extend(kept)
    ref_lines = "\n".join(f"[{r['reference_id']}] {r['file_path']}" for r in reference_list)
    context = (
        "-----Entities-----\n" + entities_str + "\n\n"
        "-----Relationships-----\n" + relations_str + "\n\n"
        "-----Chunks-----\n" + chunk_lines + "\n\n"
        "-----References-----\n" + ref_lines + "\n"
    )
    return context, reference_list
