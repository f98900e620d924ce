"""Doc-status inspection — the pipeline observability API surface
(lightrag.py:4227-4291 get_docs_by_status / aget_docs_by_ids,
lightrag.py:6239-6260 get_processing_status / aget_docs_by_track_id,
base.py:1355-1420 get_docs_by_statuses_page).

The doc_status table is the runner's commit record (plans/runner.py stage
5: doc_id, status, content_summary, content_length, chunks_count,
chunks_list, error_msg, created_at, updated_at, track_id, retry_count).
These helpers are thin declarative reads over it — every filter compiles
to a pushed-down parquet predicate, and the page sweep is a true KEYSET
sweep (created_at ASC, doc_id ASC) as the reference contract demands: no
OFFSET, the cursor predicate reaches the scan, each page is one bounded
TakeOrderedAndProject.  At 100 TB of doc_status rows a page is still one
bounded job over the pruned row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CURSOR_START = None
CURSOR_END = "END"


def status_counts(status_df: DataFrame) -> DataFrame:
    """get_status_counts (lightrag.py:6239): rows of (status, cnt)."""
    return status_df.groupBy("status").agg(F.count(F.lit(1)).alias("cnt"))


def docs_by_status(status_df: DataFrame, status: str) -> DataFrame:
    """get_docs_by_status: all records in one state (pushed-down filter)."""
    return status_df.filter(F.col("status") == status)


def docs_by_statuses(status_df: DataFrame, statuses: list) -> DataFrame:
    return status_df.filter(F.col("status").isin(list(statuses)))


def docs_by_ids(status_df: DataFrame, doc_ids) -> dict:
    """aget_docs_by_ids (lightrag.py:4237-4291): mapping doc_id -> record
    dict, found ids only.  The id list is caller-bounded; missing ids are
    omitted (the reference logs them)."""
    if isinstance(doc_ids, str):
        doc_ids = [doc_ids]
    if not doc_ids:
        return {}
    rows = status_df.filter(F.col("doc_id").isin(list(doc_ids))).collect()
    return {r["doc_id"]: r.asDict() for r in rows}


def docs_by_track_id(status_df: DataFrame, track_id: str) -> DataFrame:
    """aget_docs_by_track_id (lightrag.py:6247-6260)."""
    return status_df.filter(F.col("track_id") == track_id)


def docs_page(
    status_df: DataFrame,
    statuses: list,
    limit: int,
    position=CURSOR_START,
):
    """get_docs_by_statuses_page (base.py:1355): one page of a stable
    keyset sweep in (created_at ASC, doc_id ASC) order across the given
    statuses.

    ``position`` is ``CURSOR_START``, or the opaque cursor returned by the
    previous page (here: the last consumed ``(created_at, doc_id)``).
    Returns ``(rows, next_position)`` where ``next_position`` is
    ``CURSOR_END`` when the sweep is finished — termination is the cursor,
    never an empty page (the contract's wording).  ``created_at`` is
    written once at record creation and carried over by the runner on
    every retry transition, so the sort key is immutable under the sweep.

    Keyset, not OFFSET: the resume predicate
    ``created_at > c OR (created_at = c AND doc_id > d)`` is a scan-level
    filter — page N+1 never re-reads page N's row groups the way an
    OFFSET sweep would.
    """
    if limit <= 0:
        raise ValueError("limit must be positive")
    if position == CURSOR_END:
        return [], CURSOR_END
    df = docs_by_statuses(status_df, statuses)
    if position is not None:
        c, d = position
        df = df.filter(
            (F.col("created_at") > F.lit(c))
            | ((F.col("created_at") == F.lit(c)) & (F.col("doc_id") > F.lit(d)))
        )
    # limit+1: observe whether anything follows without a second count job
    rows = (
        df.orderBy(F.asc("created_at"), F.asc("doc_id")).limit(limit + 1).collect()
    )
    if len(rows) <= limit:
        return rows, CURSOR_END
    page = rows[:limit]
    last = page[-1]
    return page, (last["created_at"], last["doc_id"])
