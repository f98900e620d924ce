"""Doc-status inspection API (plans/status.py) — the observability surface
of lightrag.py:4227-4291/6239-6260 and the base.py:1355 keyset-page
contract: stable (created_at, doc_id) sweep, consumed-position advance,
cursor-is-termination, no row returned twice, no row skipped."""

from __future__ import annotations

import pytest

from lightrag_spark.plans.status import (
    CURSOR_END,
    CURSOR_START,
    docs_by_ids,
    docs_by_status,
    docs_by_track_id,
    docs_page,
    status_counts,
)


@pytest.fixture(scope="module")
def status_df(spark):
    rows = []
    # three creation epochs, ties inside each epoch -> exercises the
    # compound keyset (created_at, doc_id)
    for i in range(23):
        rows.append(
            (
                f"doc-{i:03d}",
                "PROCESSED" if i % 3 else "FAILED",
                1000 + (i // 5),  # created_at with ties
                2000 + i,
                f"track-{i % 2}",
                i % 4,
            )
        )
    return spark.createDataFrame(
        rows,
        "doc_id string, status string, created_at long, updated_at long,"
        " track_id string, retry_count long",
    )


def test_status_counts(status_df):
    got = {r["status"]: r["cnt"] for r in status_counts(status_df).collect()}
    assert got == {"PROCESSED": 15, "FAILED": 8}


def test_docs_by_status_and_track(status_df):
    failed = docs_by_status(status_df, "FAILED")
    assert failed.count() == 8
    assert all(r["status"] == "FAILED" for r in failed.collect())
    t0 = docs_by_track_id(status_df, "track-0")
    assert t0.count() == 12  # even i


def test_docs_by_ids(status_df):
    got = docs_by_ids(status_df, ["doc-001", "doc-007", "doc-999"])
    assert set(got) == {"doc-001", "doc-007"}  # missing id omitted
    assert got["doc-001"]["status"] == "PROCESSED"
    assert docs_by_ids(status_df, []) == {}
    single = docs_by_ids(status_df, "doc-000")
    assert set(single) == {"doc-000"}


def test_keyset_page_sweep_complete_and_ordered(status_df):
    seen = []
    pos = CURSOR_START
    pages = 0
    while pos != CURSOR_END:
        page, pos = docs_page(status_df, ["PROCESSED", "FAILED"], limit=4, position=pos)
        pages += 1
        seen.extend((r["created_at"], r["doc_id"]) for r in page)
        assert pages < 20  # termination guard
    # every row exactly once, in global keyset order
    assert len(seen) == 23
    assert len(set(seen)) == 23
    assert seen == sorted(seen)


def test_keyset_page_filters_statuses(status_df):
    page, pos = docs_page(status_df, ["FAILED"], limit=100)
    assert pos == CURSOR_END
    assert len(page) == 8
    assert all(r["status"] == "FAILED" for r in page)


def test_page_contract_edges(status_df):
    # exact-fit last page still terminates via the cursor
    page, pos = docs_page(status_df, ["PROCESSED", "FAILED"], limit=23)
    assert len(page) == 23 and pos == CURSOR_END
    # resuming an END cursor is a no-op, not an error
    page2, pos2 = docs_page(status_df, ["PROCESSED"], limit=5, position=CURSOR_END)
    assert page2 == [] and pos2 == CURSOR_END
    with pytest.raises(ValueError):
        docs_page(status_df, ["PROCESSED"], limit=0)


def test_runner_output_roundtrip(spark, tmp_path):
    """The API reads the real runner's doc_status table (schema contract:
    created_at immutable, track_id carried)."""
    from lightrag_spark.plans.kg_build import KGBuildConfig
    from lightrag_spark.plans.runner import run_indexing
    from lightrag_spark.sources.pages import enqueue_documents, synthesize_pages

    out = str(tmp_path / "kgout")
    docs = enqueue_documents(synthesize_pages(spark, 12, seed=3, min_words=30, max_words=120))
    run_indexing(
        spark,
        docs,
        out,
        KGBuildConfig(
            chunk_token_size=64, chunk_overlap_token_size=8, merge_salts=2,
            track_id="t-run",
        ),
    )
    st = spark.read.parquet(out + "/doc_status")
    counts = {r["status"]: r["cnt"] for r in status_counts(st).collect()}
    assert sum(counts.values()) == st.count() > 0
    by_track = docs_by_track_id(st, "t-run")
    assert by_track.count() == st.count()
    swept = []
    pos = CURSOR_START
    while pos != CURSOR_END:
        page, pos = docs_page(st, list(counts), limit=5, position=pos)
        swept.extend(r["doc_id"] for r in page)
    assert sorted(swept) == sorted(r["doc_id"] for r in st.collect())
