"""End-to-end: Spark pipeline output == single-threaded oracle output.

Proves the distributed dataflow is exact: salted two-phase aggregation,
carried order keys, gleaning merge, UNKNOWN endpoints, degrees — all must
reproduce the dict-based oracle bit-for-bit (P/R 1.0 + payload equality).
"""

from __future__ import annotations

import random

import pytest

from lightrag_spark.plans.kg_build import KGBuildConfig, build_kg
from pyoracle import oracle_build_kg


def _make_docs(n=24, seed=7):
    rng = random.Random(seed)
    vocab = [
        "united_states", "spark_engine", "market", "energy", "climate",
        "policy", "science", "health", "the", "a", "of", "in", "row", "key",
    ]
    docs = []
    for i in range(n):
        words = []
        for _ in range(rng.randint(30, 400)):
            words.append(vocab[0] if rng.random() < 0.2 else rng.choice(vocab))
        docs.append(
            {
                "doc_id": f"doc-{i:04d}",
                "text": " ".join(words),
                "file_path": f"https://site{i % 5}.example/p{i}",
                "doc_order": i,
            }
        )
    return docs


CFG = dict(
    tokenizer_kind="regex",
    chunk_token_size=64,
    chunk_overlap_token_size=8,
    max_gleaning=1,
    run_ts=123,
    model_min_len=5,
    model_corruption=True,
)


@pytest.fixture(scope="module")
def built(spark):
    docs = _make_docs()
    sdf = spark.createDataFrame(docs)
    cfg = KGBuildConfig(merge_salts=4, **CFG)
    result = build_kg(sdf, cfg)
    nodes = {r["entity_name"]: r.asDict() for r in result.kg_nodes.collect()}
    edges = {(r["src"], r["tgt"]): r.asDict() for r in result.kg_edges.collect()}
    chunks = sorted(
        (r.asDict() for r in result.chunks.collect()),
        key=lambda c: (c["doc_id"], c["chunk_order_index"]),
    )
    expected = oracle_build_kg(docs, **CFG)
    return nodes, edges, chunks, expected


def test_chunks_match_oracle(built):
    _, _, chunks, expected = built
    exp = sorted(expected["chunks"], key=lambda c: (c["doc_id"], c["chunk_order_index"]))
    assert len(chunks) == len(exp)
    for got, want in zip(chunks, exp):
        for k in ("chunk_id", "doc_id", "chunk_order_index", "tokens", "content"):
            assert got[k] == want[k], (k, got["chunk_id"])


def test_node_and_edge_sets_match(built):
    nodes, edges, _, expected = built
    assert set(nodes) == set(expected["kg_nodes"])
    assert set(edges) == set(expected["kg_edges"])


def test_node_payloads_match(built):
    nodes, _, _, expected = built
    for name, want in expected["kg_nodes"].items():
        got = nodes[name]
        assert got["entity_type"] == want["entity_type"], name
        assert got["description"] == want["description"], name
        assert list(got["descriptions"]) == want["descriptions"], name
        assert list(got["source_ids"]) == want["source_ids"], name
        assert list(got["file_paths"]) == want["file_paths"], name
        assert got["mention_count"] == want["mention_count"], name
        assert got["degree"] == want["degree"], name


def test_edge_payloads_match(built):
    _, edges, _, expected = built
    for pair, want in expected["kg_edges"].items():
        got = edges[pair]
        assert got["weight"] == pytest.approx(want["weight"]), pair
        assert list(got["keywords"]) == want["keywords"], pair
        assert got["description"] == want["description"], pair
        assert list(got["source_ids"]) == want["source_ids"], pair
        assert got["relation_count"] == want["relation_count"], pair
        assert got["rank"] == want["rank"], pair


def test_salting_invariance(spark):
    """Changing the salt fan-out must not change any output — the caps make
    two-phase aggregation exact, not approximate."""
    docs = _make_docs(n=10, seed=11)
    sdf = spark.createDataFrame(docs)
    outs = []
    for salts in (1, 7):
        cfg = KGBuildConfig(merge_salts=salts, **CFG)
        r = build_kg(sdf, cfg)
        nodes = {
            row["entity_name"]: (
                row["entity_type"],
                row["description"],
                tuple(row["source_ids"]),
                row["degree"],
            )
            for row in r.kg_nodes.collect()
        }
        edges = {
            (row["src"], row["tgt"]): (row["weight"], tuple(row["keywords"]))
            for row in r.kg_edges.collect()
        }
        outs.append((nodes, edges))
    assert outs[0] == outs[1]


def test_source_id_cap(spark):
    """An entity mentioned in >200 chunks keeps only the first 200 chunk ids
    (KEEP strategy head; utils.py:5790-5822)."""
    docs = [
        {
            "doc_id": f"doc-{i:04d}",
            "text": "anchor filler " * 40,  # 'anchor' + 'filler' in every chunk
            "file_path": f"f{i}",
            "doc_order": i,
        }
        for i in range(210)
    ]
    sdf = spark.createDataFrame(docs)
    cfg = KGBuildConfig(merge_salts=5, tokenizer_kind="regex", chunk_token_size=64,
                        chunk_overlap_token_size=8, max_gleaning=0, run_ts=1,
                        model_min_len=5)
    r = build_kg(sdf, cfg)
    row = r.kg_nodes.filter("entity_name = 'anchor'").collect()[0]
    expected = oracle_build_kg(docs, max_gleaning=0, run_ts=1,
                               chunk_token_size=64, chunk_overlap_token_size=8)
    want = expected["kg_nodes"]["anchor"]
    assert len(row["source_ids"]) == 200
    assert list(row["source_ids"]) == want["source_ids"]
