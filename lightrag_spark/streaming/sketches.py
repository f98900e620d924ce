"""Streaming HLL: distinct-count sketches over event-time windows.

The register representation is what makes HLL the right streaming
structure: a register row (window, group, bucket, reg) is a MAX — an
idempotent, commutative, mergeable aggregate — so Structured Streaming's
windowed groupBy finalizes registers under a watermark with plain
built-in aggregation (no applyInPandasWithState, no custom state shape).
The estimate is computed batch-side off the finalized register table
with the same fold as the batch operator, so

    streaming registers -> hll_estimate_registers == batch hll_distinct

holds EXACTLY on the same input slice (asserted by
tests/test_streaming_hll.py), which is the streaming twin of the DuckDB
register-replay proof (``queries[text_hll_tokens]``).

Scale shape: the streaming state per (window, group) is at most m=256
register rows regardless of event volume — the whole point of sketching
a 100 TB stream; late data within the watermark updates registers via
max, and the append-mode sink emits each window's registers exactly once
when the watermark passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lightrag_spark.operators.datapipe import (
    HLL_M,
    hll_bucket_rho,
    hll_estimate_registers,
)


def streaming_hll_registers(
    events: DataFrame,
    group: str = "event_type",
    col: str = "user_id",
    ts: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(win_start, win_end, <group>, bucket, reg) — watermarked windowed
    register rows, append-mode safe (registers finalize when the
    watermark passes the window end)."""
    bucket, rho = hll_bucket_rho(F.col(col))
    rows = (
        events.withWatermark(ts, watermark)
        .select(
            F.window(F.col(ts), window).alias("win"),
            F.col(group),
            bucket.alias("bucket"),
            rho.alias("rho"),
        )
    )
    return (
        rows.groupBy("win", group, "bucket")
        .agg(F.max("rho").alias("reg"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            group,
            "bucket",
            "reg",
        )
    )


def hll_estimates(regs: DataFrame, group: str = "event_type", m: int = HLL_M) -> DataFrame:
    """(win_start, win_end, <group>, n_registers, estimate) off a
    register table the streaming query wrote — and, because registers
    merge by max, the same call over UNION of window slices estimates
    coarser windows (re-aggregate bucket max first)."""
    return hll_estimate_registers(regs, ["win_start", "win_end", group], m=m)


def hll_merge_windows(regs: DataFrame, group: str = "event_type", m: int = HLL_M) -> DataFrame:
    """(<group>, n_registers, estimate) — merge ALL windows' registers
    into one all-time sketch per group: the mergeability demo (bucket-max
    across windows, then the same fold)."""
    merged = regs.groupBy(group, "bucket").agg(F.max("reg").alias("reg"))
    return hll_estimate_registers(merged, [group], m=m)
