"""spark-submit entry point: behavioral analytics over an event stream.

Runs the events suite — gap sessionization, funnel, retention cohorts,
hourly anomalies, hour-of-day seasonality, first-order Markov transition
matrix, CUSUM daily drift monitor, per-user activity Gini, EWMA daily
smoothing, and multi-granularity rollup — over an events parquet (the
driver-testdata schema: event_id, ts, user_id, event_type, value, props),
writing one parquet table per analytic.

    tools/package.sh
    spark-submit --master 'local[8]' --py-files dist/lightrag_spark.zip \\
        jobs/events_analytics.py --events /root/testdata/sf0.1/events.parquet \\
        --out /tmp/evout [--gap-minutes 30] [--funnel view,click,purchase]

Prints ONE JSON metrics line (counts + wall seconds per analytic).
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", required=True, help="events parquet path")
    ap.add_argument("--out", required=True)
    ap.add_argument("--gap-minutes", type=int, default=30)
    ap.add_argument(
        "--funnel",
        default="view,click,purchase",
        help="comma-separated ordered funnel steps (event_type values)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lightrag-spark-events-analytics").getOrCreate()

    from lightrag_spark.operators import datapipe as dp

    events = spark.read.parquet(args.events)
    metrics: dict = {"out": args.out, "n_events": events.count()}

    def run(name, df):
        t0 = time.time()
        df.write.mode("overwrite").parquet(f"{args.out}/{name}")
        n = spark.read.parquet(f"{args.out}/{name}").count()
        metrics[name] = {"rows": n, "sec": round(time.time() - t0, 2)}

    run("sessions", dp.sessionize_events(events, gap_minutes=args.gap_minutes))
    run("funnel", dp.funnel_counts(events, steps=args.funnel.split(",")))
    run("retention", dp.retention_cohorts(events))
    run("anomalies", dp.events_hourly_anomalies(events))
    run("seasonality", dp.hourly_seasonality(events))
    run("markov", dp.markov_transitions(events))
    run("cusum", dp.cusum_daily(events))
    run("gini", dp.activity_gini(events))
    run("ewma", dp.events_ewma(events))
    run("rollup", dp.events_rollup(events))

    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
