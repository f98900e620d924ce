"""spark-submit entry point: streaming KG ingest over a growing pages dir.

The scheduled-incremental shape (run from cron/Airflow — the checkpoint
remembers which page files are already in the graph):

    tools/package.sh     # builds dist/lightrag_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/lightrag_spark.zip \\
        jobs/ingest_stream.py --pages-dir /data/pages --out /data/graph

Each run drains the new backlog (``--continuous`` keeps the micro-batch
stream alive instead) and commits kg_nodes/kg_edges atomically per batch;
``--max-files-per-trigger`` bounds batch size so commit latency stays flat
as the crawl grows.  ``--synth N --epoch K`` synthesizes a deterministic
epoch-K page drop for smoke runs: repeat with increasing --epoch to watch
the graph absorb new crawl epochs through the same checkpoint.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages-dir", required=True, help="parquet dir of pages; streamed")
    ap.add_argument("--out", required=True, help="graph dir: kg_nodes/kg_edges/llm_cache + checkpoint")
    ap.add_argument("--synth", type=int, default=None,
                    help="first synthesize N pages into --pages-dir (epoch-seeded)")
    ap.add_argument("--epoch", type=int, default=0, help="seed offset for --synth drops")
    ap.add_argument("--chunk-size", type=int, default=1200)
    ap.add_argument("--chunk-overlap", type=int, default=100)
    ap.add_argument("--gleaning", type=int, default=1)
    ap.add_argument("--salts", type=int, default=16)
    ap.add_argument("--tokenizer", default="auto")
    ap.add_argument("--continuous", action="store_true",
                    help="keep the micro-batch stream running (default: drain and stop)")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    args = ap.parse_args()

    import os

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lightrag-spark-ingest-stream").getOrCreate()

    from lightrag_spark.plans.kg_build import KGBuildConfig
    from lightrag_spark.sources.pages import synthesize_pages
    from lightrag_spark.streaming.kg_ingest import stream_kg_ingest

    if args.synth:
        drop_dir = os.path.join(args.pages_dir, f"epoch={args.epoch}")
        synthesize_pages(spark, args.synth, seed=42 + args.epoch).write.mode(
            "overwrite"
        ).parquet(drop_dir)

    batches: list[dict] = []
    q = stream_kg_ingest(
        spark,
        args.pages_dir,
        args.out,
        os.path.join(args.out, "_checkpoint"),
        KGBuildConfig(
            tokenizer_kind=args.tokenizer,
            chunk_token_size=args.chunk_size,
            chunk_overlap_token_size=args.chunk_overlap,
            max_gleaning=args.gleaning,
            merge_salts=args.salts,
        ),
        trigger_once=not args.continuous,
        max_files_per_trigger=args.max_files_per_trigger,
        on_batch=lambda bid, m: batches.append({"batch_id": bid, **m}),
    )
    q.awaitTermination()

    nodes = spark.read.parquet(os.path.join(args.out, "kg_nodes")).count()
    edges = spark.read.parquet(os.path.join(args.out, "kg_edges")).count()
    print(json.dumps({
        "batches": batches,
        "kg_nodes": nodes,
        "kg_edges": edges,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
