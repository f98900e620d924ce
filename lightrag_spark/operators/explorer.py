"""Graph explorer — the subgraph/inspection surface behind the reference's
webui and public API (``get_knowledge_graph`` / ``get_graph_labels``,
lightrag.py:1693-1718, kg/networkx_impl.py:398-693).

Semantics ported:

- ``node_label="*"``: the whole graph viewed through a top-``max_nodes``
  -by-degree window, plus the induced edge set (networkx_impl.py:535-551).
- otherwise: **degree-prioritized level-order BFS** from the start node —
  all nodes at depth d are processed before depth d+1, nodes within one
  level are admitted in degree-descending order, and the ``max_nodes``
  budget can cut a level short (networkx_impl.py:552-640).  Neighbors are
  only explored from admitted nodes, so a mid-level cut prunes the deeper
  frontier exactly like the reference's queue does.
- ``is_truncated`` is set ONLY by the node budget (the reference logs the
  depth-limit case but does not flag it — networkx_impl.py:624-637).

Spark mapping: one bounded TakeOrderedAndProject per BFS level (max_depth
is small — default 3 — and every level's admitted set is ≤ max_nodes ≤
1000 by the reference's own ``max_graph_nodes`` cap, so the driver-side
lists here are bounded by contract, same as the query drivers).  The
corpus-scale work — neighbor expansion and the induced-edge filter — stays
in joins against the full edge table.  Determinism: the reference breaks
degree ties by queue insertion order (neighbor iteration order — not
stable across implementations); we tie-break by entity_name ascending and
declare that in tests, comparing sets wherever a tie could span the cut.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DEFAULT_MAX_GRAPH_NODES = 1000  # reference global_config max_graph_nodes


def graph_labels(nodes: DataFrame) -> DataFrame:
    """All node labels, sorted — get_all_labels (networkx_impl.py:398)."""
    return nodes.select("entity_name").orderBy("entity_name")


def entity_info(nodes: DataFrame, entity_name: str) -> dict:
    """get_entity_info (utils_graph.py:2043-2068): the stored node row as
    {entity_name, source_id, graph_data}.  source_id is the reference's
    GRAPH_FIELD_SEP-joined export of the chunk id list; graph_data the full
    stored payload (None when the entity is absent).  One pushed-down
    point-lookup against the node table."""
    from ..constants import GRAPH_FIELD_SEP

    rows = nodes.filter(F.col("entity_name") == entity_name).limit(1).collect()
    if not rows:
        return {"entity_name": entity_name, "source_id": None, "graph_data": None}
    data = rows[0].asDict()
    srcs = data.get("source_ids") or []
    return {
        "entity_name": entity_name,
        "source_id": GRAPH_FIELD_SEP.join(srcs) if srcs else None,
        "graph_data": data,
    }


def relation_info(edges: DataFrame, src_entity: str, tgt_entity: str) -> dict:
    """get_relation_info (utils_graph.py:2070+): the stored undirected edge
    — swapping src/tgt finds the same relation (edges are stored with the
    lexicographically ordered pair, so both orders are probed)."""
    from ..constants import GRAPH_FIELD_SEP

    lo, hi = sorted((src_entity, tgt_entity))
    rows = (
        edges.filter((F.col("src") == lo) & (F.col("tgt") == hi))
        .limit(1)
        .collect()
    )
    if not rows:
        rows = (
            edges.filter((F.col("src") == hi) & (F.col("tgt") == lo))
            .limit(1)
            .collect()
        )
    if not rows:
        return {
            "src_entity": src_entity, "tgt_entity": tgt_entity,
            "source_id": None, "graph_data": None,
        }
    data = rows[0].asDict()
    srcs = data.get("source_ids") or []
    return {
        "src_entity": src_entity,
        "tgt_entity": tgt_entity,
        "source_id": GRAPH_FIELD_SEP.join(srcs) if srcs else None,
        "graph_data": data,
    }


def _adjacency(edges: DataFrame) -> DataFrame:
    """Undirected edge list as directed pairs (a -> b), deduped."""
    fwd = edges.select(F.col("src").alias("a"), F.col("tgt").alias("b"))
    rev = edges.select(F.col("tgt").alias("a"), F.col("src").alias("b"))
    return fwd.union(rev).distinct()


def induced_edges(edges: DataFrame, member_names: list) -> DataFrame:
    """Edges whose BOTH endpoints are in the member set (graph.subgraph).
    The member list is bounded (≤ max_nodes); the filter broadcasts it
    against the corpus-scale edge table — no shuffle."""
    return edges.filter(
        F.col("src").isin(member_names) & F.col("tgt").isin(member_names)
    )


def star_subgraph(
    nodes: DataFrame,
    edges: DataFrame,
    max_nodes: int = DEFAULT_MAX_GRAPH_NODES,
) -> tuple[DataFrame, DataFrame, bool]:
    """``node_label="*"`` — top ``max_nodes`` by degree + induced edges
    (networkx_impl.py:535-551).  Returns (nodes_df, edges_df, truncated).
    The head is a TakeOrderedAndProject (parallel per-partition heaps)."""
    head = (
        nodes.orderBy(F.desc("degree"), F.asc("entity_name"))
        .limit(max_nodes + 1)
        .localCheckpoint(eager=True)  # reused thrice below — cut the sort lineage
    )
    n = head.count()
    truncated = n > max_nodes
    kept = head.orderBy(F.desc("degree"), F.asc("entity_name")).limit(max_nodes)
    names = [r["entity_name"] for r in kept.select("entity_name").collect()]
    return kept, induced_edges(edges, names), truncated


def bfs_subgraph(
    nodes: DataFrame,
    edges: DataFrame,
    node_label: str,
    max_depth: int = 3,
    max_nodes: int = DEFAULT_MAX_GRAPH_NODES,
) -> tuple[DataFrame, DataFrame, bool]:
    """Degree-prioritized BFS subgraph from ``node_label``
    (networkx_impl.py:552-640).  Returns (nodes_df + ``depth`` column,
    induced_edges_df, is_truncated).  Unknown start -> empty frames.

    Each level: neighbors of the admitted frontier (join against the full
    adjacency), minus everything already admitted, ordered by (degree
    desc, entity_name) and cut to the remaining budget.  The budget check
    fetches ``remaining + 1`` rows so overflow is observed without a
    second count action.
    """
    # BFS issues one action per level plus the budget probe — pin the two
    # frames every action re-reads (degree map, adjacency) so a live,
    # yet-unmaterialized KG build is not recomputed per level (persist is
    # the runner's cache_records contract; no-op cheap when the caller
    # already reads from parquet)
    deg = nodes.select(
        "entity_name", F.col("degree").cast("long").alias("degree")
    ).persist()
    spark = nodes.sparkSession

    start = deg.filter(F.col("entity_name") == node_label).limit(1).collect()
    if not start:
        deg.unpersist()
        empty_nodes = nodes.limit(0).withColumn("depth", F.lit(0))
        return empty_nodes, edges.limit(0), False

    adj = _adjacency(edges).persist()
    admitted: dict[str, int] = {node_label: 0}  # name -> depth, ≤ max_nodes
    frontier = [node_label]
    truncated = False

    for depth in range(1, max_depth + 1):
        remaining = max_nodes - len(admitted)
        if remaining <= 0:
            break
        if not frontier:
            break
        level_rows = (
            adj.filter(F.col("a").isin(frontier))
            .select(F.col("b").alias("entity_name"))
            .distinct()
            .filter(~F.col("entity_name").isin(list(admitted)))
            .join(deg, "entity_name", "left")
            .orderBy(F.desc("degree"), F.asc("entity_name"))
            .limit(remaining + 1)
            .collect()
        )
        if len(level_rows) > remaining:
            truncated = True
            level_rows = level_rows[:remaining]
        frontier = [r["entity_name"] for r in level_rows]
        for name in frontier:
            admitted[name] = depth

    if len(admitted) >= max_nodes and not truncated:
        # budget exhausted exactly at a level boundary: the reference still
        # flags truncation when admitted nodes have unvisited neighbors
        # (the queue holds them) — networkx_impl.py:620-630
        leftover = (
            adj.filter(F.col("a").isin(list(admitted)))
            .filter(~F.col("b").isin(list(admitted)))
            .limit(1)
            .count()
        )
        truncated = leftover > 0

    deg.unpersist()
    adj.unpersist()
    depth_df = spark.createDataFrame(
        list(admitted.items()), "entity_name string, depth long"
    )
    sub_nodes = nodes.join(F.broadcast(depth_df), "entity_name")
    return sub_nodes, induced_edges(edges, list(admitted)), truncated


def get_knowledge_graph(
    nodes: DataFrame,
    edges: DataFrame,
    node_label: str,
    max_depth: int = 3,
    max_nodes: int | None = None,
) -> dict:
    """API-parity wrapper (lightrag.py:1697, networkx_impl.py:640-693):
    collect the bounded subgraph into the reference's KnowledgeGraph dict
    shape — nodes as {id, labels, properties}, undirected-normalized edge
    ids, is_truncated."""
    max_nodes = (
        DEFAULT_MAX_GRAPH_NODES
        if max_nodes is None
        else min(max_nodes, DEFAULT_MAX_GRAPH_NODES)
    )
    # the wrapper fully materializes its bounded result over several
    # actions — pin the caller's KG frames for the duration so a live
    # (not-yet-written) build is computed once, not once per action
    nodes = nodes.persist()
    edges = edges.persist()
    if node_label == "*":
        sub_nodes, sub_edges, truncated = star_subgraph(nodes, edges, max_nodes)
    else:
        sub_nodes, sub_edges, truncated = bfs_subgraph(
            nodes, edges, node_label, max_depth, max_nodes
        )

    out_nodes = []
    for r in sub_nodes.collect():
        props = r.asDict()
        out_nodes.append(
            {"id": r["entity_name"], "labels": [r["entity_name"]], "properties": props}
        )
    out_edges = []
    seen = set()
    for r in sub_edges.collect():
        s, t = r["src"], r["tgt"]
        if s > t:
            s, t = t, s
        edge_id = f"{s}-{t}"
        if edge_id in seen:
            continue
        seen.add(edge_id)
        out_edges.append(
            {
                "id": edge_id,
                "type": "DIRECTED",
                "source": s,
                "target": t,
                "properties": r.asDict(),
            }
        )
    nodes.unpersist()
    edges.unpersist()
    return {"nodes": out_nodes, "edges": out_edges, "is_truncated": truncated}
