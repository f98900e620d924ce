"""Streaming HLL registers: availableNow stream -> parquet registers ->
estimates equal the batch sketch exactly; window merge = all-time sketch."""

from __future__ import annotations

import json
import os
import time

from lightrag_spark.operators import datapipe as dp
from lightrag_spark.streaming.sketches import (
    hll_estimates,
    hll_merge_windows,
    streaming_hll_registers,
)

SCHEMA = "event_type string, user_id long, ts timestamp"


def _rows(t0, n, et, base):
    return [
        {
            "event_type": et,
            "user_id": base + (i % 37),
            "ts": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime(t0 + i)),
        }
        for i in range(n)
    ]


def test_streaming_registers_match_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    t0 = 1_700_000_000 - (1_700_000_000 % 3600)  # window-aligned
    rows = _rows(t0, 120, "view", 0) + _rows(t0, 80, "buy", 1000) + _rows(
        t0 + 3600, 60, "view", 500
    )
    with open(os.path.join(src, "b1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    out = str(tmp_path / "regs")

    def _run():
        stream = spark.readStream.schema(SCHEMA).json(src)
        q = (
            streaming_hll_registers(stream, window="1 hour", watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    # hour-2's window only finalizes once the watermark passes its end —
    # a sentinel event two hours later (second run, same checkpoint:
    # registers survive restart) pushes it out; the sentinel's own window
    # stays in state and never reaches the sink.
    with open(os.path.join(src, "b2.json"), "w") as f:
        f.write(json.dumps(_rows(t0 + 3 * 3600, 1, "view", 9999)[0]) + "\n")
    _run()
    regs = spark.read.parquet(out)
    # per-(window, type) estimates == batch hll_distinct on the same slice
    from pyspark.sql import functions as F

    batch_df = spark.createDataFrame(
        [(r["event_type"], r["user_id"], r["ts"]) for r in rows],
        "event_type string, user_id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    first_hour = batch_df.filter(f"ts < to_timestamp({t0 + 3600})")
    batch = {
        r["event_type"]: (r["n_registers"], r["estimate"])
        for r in dp.hll_distinct(first_hour, "event_type", "user_id").collect()
    }
    stream_est = {
        r["event_type"]: (r["n_registers"], r["estimate"])
        for r in hll_estimates(regs).collect()
        if r["win_start"].timestamp() == t0
    }
    assert stream_est == batch
    # merged windows == batch over everything
    merged = {
        r["event_type"]: (r["n_registers"], r["estimate"])
        for r in hll_merge_windows(regs).collect()
    }
    alltime = {
        r["event_type"]: (r["n_registers"], r["estimate"])
        for r in dp.hll_distinct(batch_df, "event_type", "user_id").collect()
    }
    assert merged == alltime
    # sketch accuracy sanity: view has 37 + 37 distinct users across hours
    assert abs(merged["view"][1] - 74) / 74 < 0.25
