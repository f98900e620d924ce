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


def related_chunks_dedup_for_entities(
    seeds_with_pos: DataFrame, nodes: DataFrame, per_entity: int = 5
) -> DataFrame:
    """Entity -> chunk selection with the reference's occurrence dedup
    (operate.py:5690-5790): explode each seed entity's source chunk ids in
    list order, a chunk already claimed by an earlier-ranked entity is
    skipped (first-seen wins), each entity keeps at most ``per_entity``
    survivors.  Input seeds carry (entity_name, pos).  Output
    (entity_name, pos, chunk_id, chunk_pos) — the SQL-checkable form of
    the WEIGHT path's dedup stage."""
    joined = seeds_with_pos.select("entity_name", "pos").join(
        nodes.select("entity_name", "source_ids"), "entity_name"
    )
    exploded = joined.select(
        "entity_name", "pos", F.posexplode("source_ids").alias("list_idx", "chunk_id")
    )
    first = Window.partitionBy("chunk_id").orderBy("pos", "list_idx")
    deduped = exploded.withColumn("_rn", F.row_number().over(first)).filter(
        F.col("_rn") == 1
    )
    per_ent = Window.partitionBy("pos").orderBy("list_idx")
    return (
        deduped.withColumn("chunk_pos", F.row_number().over(per_ent).cast("long"))
        .filter(F.col("chunk_pos") <= per_entity)
        .select("entity_name", "pos", "chunk_id", "chunk_pos")
    )


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
    keep_cols: tuple = (),
) -> DataFrame:
    """naive mode (operate.py:6145-6330): pure vector retrieval over chunk
    embeddings + dynamic token budget.  Embeds chunk content on the fly
    with the mock embedder (production: a stored embedding column).
    ``keep_cols`` threads extra chunk columns (e.g. file_path) through the
    search untouched — vector_search preserves input columns."""
    from ..operators.embedding import vector_search, with_embeddings

    extra = [c for c in keep_cols if c in chunks.columns]
    vdb = with_embeddings(
        chunks.select("chunk_id", "content", *extra), "content"
    ).withColumnRenamed("chunk_id", "vdb_id")
    hits = vector_search(vdb, query_text, k=top_k, min_sim=0.0)
    return truncate_by_token_budget(
        hits.withColumnRenamed("vdb_id", "chunk_id"),
        "content",
        [F.desc("sim"), F.asc("chunk_id")],
        max_total_tokens,
    ).select("chunk_id", "content", "sim", *extra)


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


def pick_chunks_by_vector(
    chunks_vdb: DataFrame,
    candidate_chunk_ids: list,
    query_text: str,
    num_of_chunks: int,
) -> list:
    """pick_by_vector_similarity (utils.py:5271-5400) — rank candidate
    chunks by query cosine and keep the top ``num_of_chunks``.  The
    candidate filter + scoring runs Spark-side (the chunks table can be
    corpus-scale; the candidate set is top-k-bounded)."""
    from ..operators.embedding import vector_search

    if not candidate_chunk_ids or num_of_chunks <= 0:
        return []
    cands = chunks_vdb.filter(F.col("vdb_id").isin(list(candidate_chunk_ids)))
    hits = vector_search(cands, query_text, k=num_of_chunks, min_sim=-1.0)
    return [r["vdb_id"] for r in hits.collect()]


def kg_query_context(
    result,
    query_text: str,
    mode: str = "hybrid",
    top_k: int = 40,
    related_chunk_number: int = 5,
    kg_chunk_pick_method: str = "WEIGHT",
    max_total_tokens: int = 30000,
    keywords_cache: dict | None = None,
    keyword_model_fn=None,
    hl_keywords: list | None = None,
    ll_keywords: list | None = None,
    enable_rerank: bool = False,
    rerank_fn=None,
    min_rerank_score: float = 0.5,
    chunk_top_k: int | None = None,
):
    """The kg_query retrieval driver minus the final LLM answer
    (operate.py:4191-4423): keyword extraction (cached) -> local entity-VDB
    seeds / global relation-VDB seeds -> mode dispatch with round-robin
    interleave-dedup -> 1-hop relations -> chunk selection from BOTH the
    entity and relation lists (occurrence-count sort + WEIGHT
    linear-gradient polling, utils.py:5189-5270, or VECTOR cosine re-rank;
    relation chunks exclude entity-selected ones) + mix mode's naive
    vector chunks -> 3-way round-robin chunk merge (vector/entity/relation)
    -> optional rerank (process_chunks_unified steps 1-3,
    utils.py:5601-5707: rerank -> min_rerank_score filter -> chunk_top_k
    head; ``rerank_fn`` is the pluggable scorer — operators.rerank) ->
    context render with dynamic token budget.

    ``result`` is a KGBuildResult (kg_nodes / kg_edges / chunks).  Returns
    (context_str, reference_list, debug) where debug carries the
    intermediate lists.  Every collect here is top-k-bounded by
    construction — the corpus-scale work (VDB scoring, joins) is Spark-side.
    """
    from ..functions.chunk_pick import (
        build_sorted_chunks,
        pick_by_weighted_polling,
        round_robin_merge_chunk_ids,
    )
    from ..functions.keywords import extract_keywords_only
    from ..operators.embedding import entity_vdb, get_edge_data, vector_search
    from .context import build_context_str, entities_from_relations

    if hl_keywords is not None or ll_keywords is not None:
        hl, ll = list(hl_keywords or []), list(ll_keywords or [])
    else:
        hl, ll = extract_keywords_only(
            query_text, mode=mode, cache=keywords_cache, model_fn=keyword_model_fn
        )
    ll_query = " ".join(ll) if ll else query_text
    hl_query = " ".join(hl) if hl else query_text

    nodes, edges, chunks = result.kg_nodes, result.kg_edges, result.chunks

    local_entities: list[dict] = []
    global_entities: list[dict] = []
    local_relations: list[dict] = []
    global_relations: list[dict] = []

    if mode in ("local", "hybrid", "mix"):
        vdb = entity_vdb(nodes)
        hits = vector_search(vdb, ll_query, k=top_k).collect()
        seeds = [
            {"entity_name": r["entity_name"], "pos": i + 1}
            for i, r in enumerate(hits)
        ]
        local_entities = seeds
        if seeds:
            sdf = nodes.sparkSession.createDataFrame(
                [(s["entity_name"], s["pos"]) for s in seeds],
                "entity_name string, pos long",
            )
            hop = one_hop_edges(sdf, edges).limit(top_k).collect()
            local_relations = [
                {"src": r["src"], "tgt": r["tgt"], "pos": i + 1}
                for i, r in enumerate(hop)
            ]
    if mode in ("global", "hybrid", "mix"):
        rel_hits = get_edge_data(edges, hl_query, k=top_k).orderBy("pos").collect()
        global_relations = [
            {"src": r["src"], "tgt": r["tgt"], "pos": int(r["pos"])} for r in rel_hits
        ]
        if rel_hits:
            rdf = edges.sparkSession.createDataFrame(
                [(r["src"], r["tgt"], int(r["pos"])) for r in rel_hits],
                "src string, tgt string, pos long",
            )
            global_entities = [
                {"entity_name": r["entity_name"], "pos": int(r["pos"])}
                for r in entities_from_relations(rdf, nodes).orderBy("pos").collect()
            ]

    # round-robin interleave-dedup (operate.py:4880-4934), driver-side over
    # the bounded lists (reference shape)
    def interleave(local, global_, key):
        out, seen = [], set()
        for i in range(max(len(local), len(global_))):
            for lst in (local, global_):
                if i < len(lst):
                    k = key(lst[i])
                    if k not in seen:
                        seen.add(k)
                        out.append(lst[i])
        return out

    final_entities = interleave(local_entities, global_entities, lambda e: e["entity_name"])
    final_relations = interleave(
        local_relations, global_relations, lambda r: tuple(sorted((r["src"], r["tgt"])))
    )

    # entity payloads + per-entity chunk lists (source_ids), importance order
    ent_names = [e["entity_name"] for e in final_entities]
    desc_col = (
        F.col("description")
        if "description" in nodes.columns
        else F.array_join("descriptions", "\n")
    )
    opt_node_cols = [c for c in ("file_paths", "created_at") if c in nodes.columns]
    payloads = {
        r["entity_name"]: r
        for r in nodes.filter(F.col("entity_name").isin(ent_names))
        .select(
            "entity_name", "entity_type", "degree",
            desc_col.alias("description"), "source_ids", *opt_node_cols,
        )
        .collect()
    }
    # The chunk VDB backs the VECTOR pick method and mix mode's naive
    # branch; built lazily (one plan, reused by every consumer below).
    _chunk_vdb = None

    def chunk_vdb():
        nonlocal _chunk_vdb
        if _chunk_vdb is None:
            from ..operators.embedding import with_embeddings

            _chunk_vdb = with_embeddings(
                chunks.select(
                    F.col("chunk_id").alias("vdb_id"), "content", "file_path"
                ),
                "content",
            )
        return _chunk_vdb

    # ---- entity chunks (_find_related_text_unit_from_entities,
    # operate.py:5690-5849): occurrence dedup + count sort, then WEIGHT
    # polling or VECTOR cosine pick.  Empty-chunk entities keep their slot
    # in the polling quota gradient (reference keeps them too).
    ent_items = []
    for e in final_entities:
        p = payloads.get(e["entity_name"])
        if p is None:
            continue
        srcs = list(p["source_ids"] or [])
        if srcs:
            ent_items.append({"entity_name": e["entity_name"], "chunks": srcs})
    ent_sorted, _ = build_sorted_chunks(ent_items)
    entity_chunk_ids: list = []
    if ent_sorted:
        if kg_chunk_pick_method == "VECTOR":
            all_ids = [c for it in ent_sorted for c in it["sorted_chunks"]]
            entity_chunk_ids = pick_chunks_by_vector(
                chunk_vdb(), all_ids, query_text,
                int(related_chunk_number * len(ent_sorted) / 2),
            )
        if not entity_chunk_ids:  # WEIGHT, or VECTOR's empty-result fallback
            entity_chunk_ids = pick_by_weighted_polling(
                ent_sorted, related_chunk_number, min_related_chunks=1
            )
        entity_chunk_ids = list(dict.fromkeys(entity_chunk_ids))

    # ---- relation chunks (_find_related_text_unit_from_relations,
    # operate.py:5941-6143): same pipeline over the final relation list,
    # minus chunks the entity stage already selected; relations left empty
    # after dedup are DROPPED before polling (unlike entities).
    rel_pairs = [(r["src"], r["tgt"]) for r in final_relations]
    rel_srcs: dict = {}
    rel_payloads: dict = {}
    if rel_pairs:
        keys = [s + "\x1f" + t for s, t in rel_pairs]
        edge_desc = (
            F.col("description")
            if "description" in edges.columns
            else F.array_join("descriptions", "\n")
        )
        opt_edge_cols = [
            c for c in ("keywords", "weight", "file_paths", "created_at")
            if c in edges.columns
        ]
        for row in (
            edges.filter(F.concat_ws("\x1f", "src", "tgt").isin(keys))
            .select(
                "src", "tgt", "source_ids",
                edge_desc.alias("description"), *opt_edge_cols,
            )
            .collect()
        ):
            rel_srcs[(row["src"], row["tgt"])] = list(row["source_ids"] or [])
            rel_payloads[(row["src"], row["tgt"])] = row
    rel_items = []
    for r in final_relations:
        srcs = rel_srcs.get((r["src"], r["tgt"])) or []
        if srcs:
            rel_items.append({"src": r["src"], "tgt": r["tgt"], "chunks": srcs})
    rel_sorted, _ = build_sorted_chunks(
        rel_items, exclude_chunk_ids=entity_chunk_ids, drop_empty=True
    )
    relation_chunk_ids: list = []
    if rel_sorted:
        if kg_chunk_pick_method == "VECTOR":
            all_ids = [c for it in rel_sorted for c in it["sorted_chunks"]]
            relation_chunk_ids = pick_chunks_by_vector(
                chunk_vdb(), all_ids, query_text,
                int(related_chunk_number * len(rel_sorted) / 2),
            )
        if not relation_chunk_ids:
            relation_chunk_ids = pick_by_weighted_polling(
                rel_sorted, related_chunk_number, min_related_chunks=1
            )
        relation_chunk_ids = list(dict.fromkeys(relation_chunk_ids))

    # ---- vector chunks, mix mode only (_get_vector_context,
    # operate.py:4671-4727): naive cosine retrieval over the chunk VDB,
    # chunk_top_k (or top_k) hits, no truncation — the unified merge and
    # the token budget handle that downstream.
    vector_chunk_ids: list = []
    if mode == "mix":
        hits = vector_search(
            chunk_vdb(), query_text, k=chunk_top_k or top_k, min_sim=0.0
        ).collect()
        vector_chunk_ids = [r["vdb_id"] for r in hits]

    # ---- 3-way round-robin merge, vector first (_merge_all_chunks,
    # operate.py:5210-5258)
    chunk_ids = round_robin_merge_chunk_ids(
        vector_chunk_ids, entity_chunk_ids, relation_chunk_ids
    )

    contents = {
        r["chunk_id"]: r
        for r in chunks.filter(F.col("chunk_id").isin(chunk_ids))
        .select("chunk_id", "content", "file_path")
        .collect()
    }
    chunk_dicts = [
        {
            "chunk_id": cid,
            "content": contents[cid]["content"],
            "file_path": contents[cid]["file_path"] or "unknown_source",
        }
        for cid in chunk_ids
        if cid in contents
    ]
    if enable_rerank and chunk_dicts:
        from ..operators.rerank import apply_rerank, filter_by_min_rerank_score

        chunk_dicts = apply_rerank(
            query_text,
            chunk_dicts,
            rerank_fn,
            top_n=chunk_top_k or len(chunk_dicts),
        )
        chunk_dicts = filter_by_min_rerank_score(chunk_dicts, min_rerank_score)
    if chunk_top_k is not None and chunk_top_k > 0:
        chunk_dicts = chunk_dicts[:chunk_top_k]
    if enable_rerank or chunk_top_k is not None:
        chunk_ids = [c["chunk_id"] for c in chunk_dicts]
    ent_dicts = [
        {
            "entity_name": e["entity_name"],
            "entity_type": payloads[e["entity_name"]]["entity_type"],
            "degree": int(payloads[e["entity_name"]]["degree"]),
        }
        for e in final_entities
        if e["entity_name"] in payloads
    ]
    rel_dicts = [
        {"src": r["src"], "tgt": r["tgt"]} for r in final_relations
    ]
    kept_chunks: list = []
    context, refs = build_context_str(
        ent_dicts, rel_dicts, chunk_dicts, max_total_tokens=max_total_tokens,
        kept_out=kept_chunks,
    )
    debug = {
        "hl_keywords": hl,
        "ll_keywords": ll,
        "entities": ent_dicts,
        "relations": rel_dicts,
        "chunk_ids": chunk_ids,
        "vector_chunk_ids": vector_chunk_ids,
        "entity_chunk_ids": entity_chunk_ids,
        "relation_chunk_ids": relation_chunk_ids,
        # full stored rows in final interleave order — the structured
        # query_data surface (lightrag.py:3701 aquery_data) formats these
        # without a second KG lookup
        "entity_payloads": [
            payloads[e["entity_name"]].asDict()
            for e in final_entities
            if e["entity_name"] in payloads
        ],
        "relation_payloads": [
            rel_payloads[(r["src"], r["tgt"])].asDict()
            for r in final_relations
            if (r["src"], r["tgt"]) in rel_payloads
        ],
        "chunks": chunk_dicts,
        "kept_chunks": kept_chunks,
    }
    return context, refs, debug


# Cache-policy version string, verbatim from the reference
# (operate.py:4157) so cache keys stay comparable across implementations.
ANSWER_CACHE_POLICY_VERSION = "query-answer-cache-v2"


def answer_cache_key(
    query_text: str,
    mode: str,
    response_type: str,
    top_k: int,
    related_chunk_number: int,
    max_entity_tokens: int,
    max_relation_tokens: int,
    max_total_tokens: int,
    hl_keywords_str: str,
    ll_keywords_str: str,
    user_prompt: str,
    model_identity: str = "",
) -> str:
    """md5 over the full query-parameter vector (operate.py:4328-4345):
    any knob that changes the rendered context or prompt changes the key,
    so a cached answer can never be served for a different retrieval
    configuration.

    ``model_identity`` stands in for the reference key's model-identity
    components (serialize_llm_cache_identity + enable_rerank + the
    content-headings flag, operate.py:4328-4345): a shared answer_cache
    must never serve an answer generated by a DIFFERENT response_fn/model
    for the same query parameters.  kg_query derives it from response_fn
    when not given explicitly.  Because this field replaces (rather than
    reproduces) the reference's identity blob, keys here are NOT
    byte-comparable with reference llm_response_cache entries — same
    policy, different serialization.
    """
    from ..functions.hashing import compute_args_hash

    return compute_args_hash(
        ANSWER_CACHE_POLICY_VERSION,
        model_identity or "",
        mode,
        query_text,
        response_type,
        top_k,
        related_chunk_number,
        max_entity_tokens,
        max_relation_tokens,
        max_total_tokens,
        hl_keywords_str,
        ll_keywords_str,
        user_prompt or "",
    )


def _call_with_history(response_fn, query_text, sys_prompt, history):
    """Invoke the model hook, forwarding conversation history when the
    callable accepts it (the reference passes ``history_messages`` straight
    to the LLM adapter — operate.py:4363, lightrag.py:3975)."""
    if history:
        import inspect

        try:
            params = inspect.signature(response_fn).parameters
            if "history_messages" in params or any(
                p.kind == inspect.Parameter.VAR_KEYWORD for p in params.values()
            ):
                return response_fn(
                    query_text, sys_prompt, history_messages=history
                )
        except (TypeError, ValueError):
            pass
    return response_fn(query_text, sys_prompt)


def kg_query(
    result,
    query_text: str,
    *,
    mode: str = "hybrid",
    response_type: str = "Multiple Paragraphs",
    user_prompt: str = "",
    top_k: int = 40,
    related_chunk_number: int = 5,
    kg_chunk_pick_method: str = "WEIGHT",
    max_entity_tokens: int = 6000,
    max_relation_tokens: int = 8000,
    max_total_tokens: int = 30000,
    only_need_context: bool = False,
    only_need_prompt: bool = False,
    response_fn=None,
    model_identity: str | None = None,
    answer_cache: dict | None = None,
    keywords_cache: dict | None = None,
    keyword_model_fn=None,
    enable_rerank: bool = False,
    rerank_fn=None,
    min_rerank_score: float = 0.5,
    chunk_top_k: int | None = None,
    conversation_history: list | None = None,
) -> dict:
    """The COMPLETE kg_query loop (operate.py:4191-4423): keyword extraction
    -> retrieval context (kg_query_context) -> rag_response system prompt
    (verbatim reference template, prompts.py) -> answer cache -> pluggable
    LLM answer -> echo-strip.

    ``response_fn(user_query, system_prompt) -> str`` is the model hook —
    the same pluggable shape as extraction/keywords, so a real endpoint
    closes the loop with zero code changes.  ``answer_cache`` is a mutable
    mapping standing in for the llm_response_cache KV table (args_hash ->
    answer); production swaps in a parquet/Iceberg-backed map.

    Returns a dict: content, context, references, hl/ll keywords, args_hash,
    cache_hit.  Degenerate inputs return the reference's fail_response
    verbatim rather than raising (operate.py:4235-4264).
    """
    from ..functions.keywords import extract_keywords_only
    from ..prompts import PROMPTS, render_rag_response_prompt

    def _result(content, **kw):
        base = {
            "content": content,
            "context": None,
            "references": [],
            "hl_keywords": [],
            "ll_keywords": [],
            "args_hash": None,
            "cache_hit": False,
        }
        base.update(kw)
        return base

    if not query_text:
        return _result(PROMPTS["fail_response"])

    if mode == "bypass":
        # lightrag.py:3955-3990: bypass skips retrieval and keyword
        # extraction entirely — the query goes straight to the model (no
        # answer cache either; the reference calls use_llm_func directly).
        if response_fn is None:
            raise ValueError(
                "bypass mode needs response_fn(user_query, system_prompt) -> str"
            )
        return _result(
            _call_with_history(response_fn, query_text, None, conversation_history)
        )

    hl, ll = extract_keywords_only(
        query_text, mode=mode, cache=keywords_cache, model_fn=keyword_model_fn
    )
    if not hl and not ll:
        # operate.py:4258-4264: short queries fall back to the raw query as
        # the low-level keyword; long keywordless queries fail closed.
        if len(query_text) < 50:
            ll = [query_text]
        else:
            return _result(PROMPTS["fail_response"])
    hl_str = ", ".join(hl)
    ll_str = ", ".join(ll)

    context, refs, debug = kg_query_context(
        result,
        query_text,
        mode=mode,
        top_k=top_k,
        related_chunk_number=related_chunk_number,
        kg_chunk_pick_method=kg_chunk_pick_method,
        max_total_tokens=max_total_tokens,
        hl_keywords=hl,
        ll_keywords=ll,
        enable_rerank=enable_rerank,
        rerank_fn=rerank_fn,
        min_rerank_score=min_rerank_score,
        chunk_top_k=chunk_top_k,
    )
    common = dict(
        context=context, references=refs, hl_keywords=hl, ll_keywords=ll
    )
    if only_need_context and not only_need_prompt:
        return _result(context, **common)

    user_prompt_str = f"\n\n{user_prompt}" if user_prompt else "n/a"
    sys_prompt = render_rag_response_prompt(
        context, response_type=response_type or "Multiple Paragraphs",
        user_prompt=user_prompt_str,
    )
    if only_need_prompt:
        content = "\n\n".join([sys_prompt, "---User Query---", query_text])
        return _result(content, **common)

    # cache keys are scoped to the answering model: an explicit
    # model_identity wins, else the response_fn's self-declared identity,
    # else its qualified name — so two different models sharing one
    # answer_cache can never serve each other's answers.
    ident = model_identity
    if ident is None and response_fn is not None:
        ident = getattr(response_fn, "model_identity", None) or getattr(
            response_fn, "__qualname__", ""
        )
    # the reference's cache identity blob includes enable_rerank
    # (operate.py:4328-4345) — a reranked context must never serve a
    # cached non-reranked answer for the same parameters, and vice versa
    if enable_rerank:
        rr_ident = getattr(rerank_fn, "model_identity", None) or getattr(
            rerank_fn, "__qualname__", "rerank"
        )
        ident = f"{ident or ''}|rerank={rr_ident}|min={min_rerank_score}|ctk={chunk_top_k}"
    args_hash = answer_cache_key(
        query_text, mode, response_type, top_k, related_chunk_number,
        max_entity_tokens, max_relation_tokens, max_total_tokens,
        hl_str, ll_str, user_prompt,
        model_identity=ident or "",
    )
    # the answer cache deliberately excludes conversation_history — with
    # history set the cache is BYPASSED entirely, read and write
    # (operate.py:4156-4190: a history-conditioned answer must never be
    # served for, or poison, the history-free key)
    use_cache = answer_cache is not None and not conversation_history
    if use_cache and args_hash in answer_cache:
        return _result(
            answer_cache[args_hash], args_hash=args_hash, cache_hit=True, **common
        )
    if response_fn is None:
        raise ValueError(
            "kg_query needs response_fn(user_query, system_prompt) -> str "
            "to synthesize an answer (pass only_need_context/only_need_prompt "
            "to stop before the model call)"
        )
    response = _call_with_history(
        response_fn, query_text, sys_prompt, conversation_history
    )
    if isinstance(response, str):
        # echo-strip (operate.py:4404-4414): some providers leak the prompt
        # back; scrub only when the response is longer than the prompt.
        if len(response) > len(sys_prompt):
            response = (
                response.replace(sys_prompt, "")
                .replace("user", "")
                .replace("model", "")
                .replace(query_text, "")
                .replace("<system>", "")
                .replace("</system>", "")
                .strip()
            )
        if use_cache:
            answer_cache[args_hash] = response
    return _result(response, args_hash=args_hash, **common)


def naive_query(
    chunks: DataFrame,
    query_text: str,
    *,
    mode: str = "naive",
    response_type: str = "Multiple Paragraphs",
    user_prompt: str = "",
    top_k: int = 10,
    max_total_tokens: int = 30000,
    only_need_context: bool = False,
    only_need_prompt: bool = False,
    response_fn=None,
    model_identity: str | None = None,
    answer_cache: dict | None = None,
    enable_rerank: bool = False,
    rerank_fn=None,
    min_rerank_score: float = 0.5,
    chunk_top_k: int | None = None,
    conversation_history: list | None = None,
) -> dict | None:
    """The COMPLETE naive_query loop (operate.py:6145-6430): chunk-VDB
    vector retrieval with a DYNAMIC token budget (max_total − rendered
    prompt overhead − query tokens − 200 buffer, operate.py:6250-6265) ->
    optional rerank (process_chunks_unified) -> frequency-prioritized
    reference list (utils.py:6262-6326) -> naive_query_context render ->
    naive_rag_response system prompt -> answer cache -> pluggable LLM ->
    echo-strip.

    Mirrors kg_query's hooks: ``response_fn(user_query, system_prompt) ->
    str``, mutable ``answer_cache`` (args_hash -> answer).  Token counting
    for the overhead subtraction uses the same whitespace tokens as the
    Spark-side budget window (truncate_by_token_budget), keeping the two
    halves of the budget in one unit.

    Returns None when retrieval finds no chunks (reference parity:
    operate.py:6219-6223); the empty query returns fail_response."""
    from ..prompts import (
        PROMPTS,
        render_naive_query_context,
        render_rag_response_prompt,
    )
    from .context import (
        _ws_tokens,
        generate_reference_list_from_chunks,
        render_chunks_context_text,
    )

    def _result(content, **kw):
        base = {
            "content": content,
            "context": None,
            "references": [],
            "chunks": [],
            "args_hash": None,
            "cache_hit": False,
        }
        base.update(kw)
        return base

    if not query_text:
        return _result(PROMPTS["fail_response"])

    user_prompt_str = f"\n\n{user_prompt}" if user_prompt else "n/a"
    rtype = response_type or "Multiple Paragraphs"
    # dynamic budget: render the system prompt with empty content to price
    # its overhead, then hand retrieval only what remains
    pre_prompt = render_rag_response_prompt(
        "", response_type=rtype, user_prompt=user_prompt_str, naive=True
    )
    buffer_tokens = 200  # reference list + safety (operate.py:6260)
    available = max_total_tokens - (
        _ws_tokens(pre_prompt) + _ws_tokens(query_text) + buffer_tokens
    )
    if available <= 0:
        return _result(PROMPTS["fail_response"])

    hits = naive_query_context(
        chunks,
        query_text,
        top_k=top_k,
        max_total_tokens=available,
        keep_cols=("file_path",),
    ).collect()  # top_k-bounded by construction
    if not hits:
        return None

    chunk_dicts = [
        {
            "chunk_id": r["chunk_id"],
            "content": r["content"],
            "file_path": r["file_path"] if "file_path" in r.__fields__ else "",
            "sim": r["sim"],
        }
        for r in hits
    ]
    if enable_rerank and chunk_dicts:
        from ..operators.rerank import apply_rerank, filter_by_min_rerank_score

        chunk_dicts = apply_rerank(
            query_text,
            chunk_dicts,
            rerank_fn,
            top_n=chunk_top_k or len(chunk_dicts),
        )
        chunk_dicts = filter_by_min_rerank_score(chunk_dicts, min_rerank_score)
        if chunk_top_k is not None and chunk_top_k > 0:
            chunk_dicts = chunk_dicts[:chunk_top_k]
        if not chunk_dicts:
            return None

    reference_list, with_refs = generate_reference_list_from_chunks(chunk_dicts)
    text_units_str = render_chunks_context_text(with_refs)
    reference_list_str = "\n".join(
        f"[{r['reference_id']}] {r['file_path']}"
        for r in reference_list
        if r["reference_id"]
    )
    context = render_naive_query_context(text_units_str, reference_list_str)
    common = dict(context=context, references=reference_list, chunks=with_refs)

    if only_need_context and not only_need_prompt:
        return _result(context, **common)

    sys_prompt = render_rag_response_prompt(
        context, response_type=rtype, user_prompt=user_prompt_str, naive=True
    )
    if only_need_prompt:
        content = "\n\n".join([sys_prompt, "---User Query---", query_text])
        return _result(content, **common)

    ident = model_identity
    if ident is None and response_fn is not None:
        ident = getattr(response_fn, "model_identity", None) or getattr(
            response_fn, "__qualname__", ""
        )
    if enable_rerank:
        rr_ident = getattr(rerank_fn, "model_identity", None) or getattr(
            rerank_fn, "__qualname__", "rerank"
        )
        ident = f"{ident or ''}|rerank={rr_ident}|min={min_rerank_score}|ctk={chunk_top_k}"
    args_hash = answer_cache_key(
        query_text, mode, rtype, top_k, 0, 0, 0, max_total_tokens,
        "", "", user_prompt, model_identity=ident or "",
    )
    # history bypasses the cache read AND write (operate.py:4156-4190)
    use_cache = answer_cache is not None and not conversation_history
    if use_cache and args_hash in answer_cache:
        return _result(
            answer_cache[args_hash], args_hash=args_hash, cache_hit=True, **common
        )
    if response_fn is None:
        raise ValueError(
            "naive_query needs response_fn(user_query, system_prompt) -> str "
            "to synthesize an answer (pass only_need_context/only_need_prompt "
            "to stop before the model call)"
        )
    response = _call_with_history(
        response_fn, query_text, sys_prompt, conversation_history
    )
    if isinstance(response, str):
        if len(response) > len(sys_prompt):
            response = (
                response.replace(sys_prompt, "")
                .replace("user", "")
                .replace("model", "")
                .replace(query_text, "")
                .replace("<system>", "")
                .replace("</system>", "")
                .strip()
            )
        if use_cache:
            answer_cache[args_hash] = response
    return _result(response, args_hash=args_hash, **common)
