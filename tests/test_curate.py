"""Corpus-curation pipeline (plans/curate.py): stage composition, drop
semantics, split stability, and plan shape (no cartesian products, cached
docs reuse, broadcast-bounded bench side)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from lightrag_spark.plans.curate import CurateConfig, curate_corpus

BASE = "the quick brown fox jumps over the lazy dog again and again " * 5

ROWS = [
    # canonical-URL duplicate pair: same page modulo tracking params
    ("http://a.com/x?utm_source=1&b=2", "doc one unique content alpha beta gamma " * 6, 0),
    ("http://A.com/x?b=2", "this row is a URL duplicate and never survives", 1),
    # near-dup pair (Jaccard >= 0.5)
    ("http://a.com/y", BASE, 2),
    ("http://a.com/z", BASE + " tiny extra tail here", 3),
    # exact content duplicate of row 0
    ("http://b.com/w", "doc one unique content alpha beta gamma " * 6, 4),
    # benchmark-contaminated
    ("http://c.com/c", "benchmark spark window merge phrase appears in here today " * 4, 5),
    # clean survivor
    ("http://d.com/d", "completely different text about gardening tomatoes in spring sunshine " * 4, 6),
]


@pytest.fixture(scope="module")
def result(spark):
    pages = spark.createDataFrame(ROWS, "url string, text string, page_order long")
    cfg = CurateConfig(bench_phrases=["spark window merge"])
    r = curate_corpus(pages, cfg)
    rows = {row["doc_order"]: row.asDict() for row in r.curated.collect()}
    return r, rows


def test_drop_semantics(result):
    r, rows = result
    survivors = set(rows)
    # URL dup (1) and exact dup (4) and contaminated (5) gone; exactly one
    # member of the near-dup cluster {2,3} survives (its canonical)
    assert 0 in survivors and 6 in survivors
    assert 1 not in survivors and 4 not in survivors and 5 not in survivors
    assert len(survivors & {2, 3}) == 1
    assert all(not row["is_near_dup"] for row in rows.values())
    assert all(not row["is_contaminated"] for row in rows.values())


def test_stage_composition_matches_independent_operators(result, spark):
    """The chained pipeline must emit exactly what running each
    oracle-gated operator independently over its own input would."""
    from lightrag_spark.operators import datapipe as dp
    from lightrag_spark.operators.graphs import duplicate_components
    from lightrag_spark.operators.sampling import hash_split

    r, rows = result
    docs = r.docs
    # near-dup pairs from the standalone operator on the SAME docs frame
    want_pairs = {
        (p["doc_a"], p["doc_b"]) for p in dp.near_duplicate_pairs(docs).collect()
    }
    got_pairs = {(p["doc_a"], p["doc_b"]) for p in r.near_pairs.collect()}
    assert got_pairs == want_pairs and len(want_pairs) == 1

    comp = {
        c["doc_id"]: c["canonical_doc_id"]
        for c in duplicate_components(dp.near_duplicate_pairs(docs)).collect()
    }
    for row in rows.values():
        assert row["canonical_doc_id"] == comp.get(row["doc_id"], row["doc_id"])

    # split assignment is the pure hash function of doc_id
    want_split = {
        s["doc_id"]: s["split"]
        for s in hash_split(docs, {"train": 0.9, "valid": 0.05, "test": 0.05},
                            key_col="doc_id").collect()
    }
    for row in rows.values():
        assert row["split"] == want_split[row["doc_id"]]


def test_keep_contaminated_flags_instead(spark):
    pages = spark.createDataFrame(ROWS, "url string, text string, page_order long")
    cfg = CurateConfig(bench_phrases=["spark window merge"], drop_contaminated=False)
    rows = {r["doc_order"]: r.asDict() for r in curate_corpus(pages, cfg).curated.collect()}
    assert 5 in rows
    assert rows[5]["is_contaminated"] and rows[5]["n_bench_hits"] > 0


def test_plan_shape(result):
    """Scale contract pinned in the physical plan: no cartesian/nested-loop
    join anywhere, the thrice-consumed docs frame reuses its cache instead
    of recomputing the dedup shuffles, and the decontamination side joins
    as a broadcast (query-bounded), never a corpus shuffle."""
    r, _ = result
    plan = r.curated._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "InMemoryTableScan" in plan            # persisted docs reused
    assert "BroadcastMode" in plan or "broadcast" in plan  # bench side


def test_quality_filter_stage(spark):
    """quality_filter=True drops Gopher-failing docs before dedup; the
    long clean docs survive, the short ones vanish."""
    long_good = (
        "the quick brown fox jumps over a lazy dog and then the fox runs "
        "in the field of green grass while a bird sits on the old oak "
        "tree and sings a song about the morning sun that rises over the "
        "hills in the east and warms the cold air of the early day here "
    )
    pages = spark.createDataFrame(
        [
            ("http://a.com/1", long_good, 0),
            ("http://a.com/2", "tiny", 1),
        ],
        "url string, text string, page_order long",
    )
    from lightrag_spark.plans.curate import CurateConfig, curate_corpus

    r = curate_corpus(pages, CurateConfig(quality_filter=True, near_dup=False))
    got = {row["doc_order"] for row in r.curated.collect()}
    assert got == {0}


def test_curate_epoch_incremental(spark, tmp_path):
    """Crawl-epoch curation: epoch 2's exact and near duplicates of
    epoch-1 ACCEPTED docs are dropped via the persisted state; genuinely
    new docs survive and join the state for epoch 3."""
    from lightrag_spark.plans.curate import CurateConfig, curate_epoch

    state = str(tmp_path / "state")
    e1 = spark.createDataFrame(
        [
            ("http://a.com/1", BASE, 0),
            ("http://a.com/2", "fresh first epoch doc about gardening tomatoes", 1),
        ],
        "url string, text string, page_order long",
    )
    cfg = CurateConfig()
    r1 = curate_epoch(spark, e1, state, cfg)
    assert {r["doc_order"] for r in r1.curated.collect()} == {0, 1}

    e2 = spark.createDataFrame(
        [
            ("http://b.com/1", BASE, 10),                       # exact dup of epoch 1
            ("http://b.com/2", BASE + " tiny extra tail", 11),  # near dup of epoch 1
            ("http://b.com/3", "entirely new spark shuffle partition text here", 12),
        ],
        "url string, text string, page_order long",
    )
    r2 = curate_epoch(spark, e2, state, cfg)
    assert {r["doc_order"] for r in r2.curated.collect()} == {12}

    # epoch 3: a dup of the EPOCH-2 survivor is now also caught
    e3 = spark.createDataFrame(
        [("http://c.com/1", "entirely new spark shuffle partition text here", 20),
         ("http://c.com/2", "and one more truly novel document for epoch three", 21)],
        "url string, text string, page_order long",
    )
    r3 = curate_epoch(spark, e3, state, cfg, update_state=False)
    assert {r["doc_order"] for r in r3.curated.collect()} == {21}


def test_exact_only_mode(spark):
    pages = spark.createDataFrame(ROWS, "url string, text string, page_order long")
    cfg = CurateConfig(near_dup=False)
    r = curate_corpus(pages, cfg)
    rows = {row["doc_order"]: row.asDict() for row in r.curated.collect()}
    assert r.near_pairs is None and r.components is None
    # both near-dups survive (no clustering), dups/url-dups still dropped
    assert {2, 3} <= set(rows)
    assert 1 not in rows and 4 not in rows
    assert all(row["component_size"] == 1 for row in rows.values())


def test_curate_epoch_aux_frames_stable_after_state_append(spark, tmp_path):
    """The advisor's refreshByPath hazard: after curate_epoch appends this
    epoch's survivors to the state files, actions on the RETURNED frames
    (curated AND the auxiliary docs frame, whose lineage also crossed the
    anti-join on content_hashes) must still reflect THIS epoch — not a
    recompute against the grown state that anti-joins the survivors away."""
    from lightrag_spark.plans.curate import CurateConfig, curate_epoch

    state = str(tmp_path / "state")
    e1 = spark.createDataFrame(
        [("http://a.com/1", BASE, 0)], "url string, text string, page_order long"
    )
    curate_epoch(spark, e1, state, CurateConfig())
    e2 = spark.createDataFrame(
        [("http://b.com/1", "entirely new spark shuffle partition text here", 10)],
        "url string, text string, page_order long",
    )
    r2 = curate_epoch(spark, e2, state, CurateConfig())
    # both counted AFTER update_state appended the epoch-2 survivor to the
    # state: without lineage truncation these recompute to empty
    assert r2.curated.count() == 1
    assert r2.docs.count() == 1
    assert {row["doc_order"] for row in r2.curated.collect()} == {10}
