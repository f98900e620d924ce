"""Stored-state upsert semantics — the reference's reprocess-idempotence
contract (issue #3367 family: test_edge_weight_reprocess,
test_merge_description_dedup in the reference suite).

1. Re-feeding the SAME documents must not change edge weights, source id
   lists, or description lists.
2. Genuinely new documents extend weights/sources and can add entities.
"""

from __future__ import annotations

from lightrag_spark.plans.incremental_merge import upsert_graph
from lightrag_spark.plans.kg_build import KGBuildConfig, build_kg

CFG = KGBuildConfig(
    tokenizer_kind="regex",
    chunk_token_size=48,
    chunk_overlap_token_size=8,
    max_gleaning=0,
    merge_salts=4,
    run_ts=5,
)


def _docs(spark, ids):
    return spark.createDataFrame(
        [
            {
                "doc_id": f"doc-{i:03d}",
                "text": f"alpha{i % 2} shared beta{i} gamma " * 10,
                "file_path": f"f{i}",
                "doc_order": i,
            }
            for i in ids
        ]
    )


def _edge_state(edges):
    return {
        (r["src"], r["tgt"]): (
            r["weight"],
            tuple(r["source_ids"]),
            tuple(r["descriptions"]),
            tuple(r["keywords"]),
        )
        for r in edges.collect()
    }


def test_reprocess_is_idempotent(spark):
    base = build_kg(_docs(spark, range(4)), CFG)
    stored_n, stored_e = base.kg_nodes, base.kg_edges
    before = _edge_state(stored_e)

    again = build_kg(_docs(spark, range(4)), CFG)
    n2, e2 = upsert_graph(stored_n, stored_e, again.mentions, again.triples, CFG)
    after = _edge_state(e2)

    assert set(before) == set(after)
    for k in before:
        w0, src0, d0, kw0 = before[k]
        w1, src1, d1, kw1 = after[k]
        assert w1 == w0, f"weight inflated on reprocess for {k}: {w0} -> {w1}"
        assert src1 == src0
        assert d1 == d0
        assert kw1 == kw0


def test_new_documents_extend(spark):
    base = build_kg(_docs(spark, range(4)), CFG)
    stored_n, stored_e = base.kg_nodes, base.kg_edges
    before = _edge_state(stored_e)
    before_nodes = {r["entity_name"] for r in stored_n.collect()}

    new = build_kg(_docs(spark, range(4, 6)), CFG)
    n2, e2 = upsert_graph(stored_n, stored_e, new.mentions, new.triples, CFG)
    after = _edge_state(e2)
    after_nodes = {r["entity_name"] for r in n2.collect()}

    # brand-new entities from the new docs appear
    assert "beta4" in after_nodes and "beta4" not in before_nodes
    # edges re-mentioned by the new docs gained weight from new chunks...
    grown = [("alpha0", "shared"), ("alpha1", "shared")]
    for k in grown:
        assert after[k][0] > before[k][0], k
        # ...with stored-first payload prefixes preserved
        assert after[k][1][: len(before[k][1])] == before[k][1]
    # edges only the old docs mention stay exactly as stored
    untouched = [k for k in before if k not in grown and not any("4" in e or "5" in e for e in k)]
    stale = [k for k in untouched if "beta" in k[0] or "beta" in k[1]]
    for k in stale:
        if all(f"beta{i}" not in k for i in (4, 5)):
            assert after[k][0] == before[k][0], k
