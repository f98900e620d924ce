"""spark-submit entry point: index a pages corpus into KG tables.

Submission shape per the north rule:

    tools/package.sh     # builds dist/lightrag_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/lightrag_spark.zip \\
        jobs/index_corpus.py --synth 8000 --out /tmp/kgout

On a real cluster the session comes from spark-submit's conf (no master
override here); locally pass --master local[N] to spark-submit.
Re-running with the same --out resumes from the llm_cache checkpoint.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages-dir", help="parquet dir with pages(url, warc_ts, html, text, lang)")
    src.add_argument("--synth", type=int, help="synthesize N deterministic pages instead")
    ap.add_argument("--out", required=True, help="output dir for KG tables + checkpoints")
    ap.add_argument("--chunk-size", type=int, default=1200)
    ap.add_argument("--chunk-overlap", type=int, default=100)
    ap.add_argument("--gleaning", type=int, default=1)
    ap.add_argument("--salts", type=int, default=16)
    ap.add_argument("--tokenizer", default="auto")
    ap.add_argument(
        "--chunking", default="F", choices=["F", "R", "V", "P"],
        help="chunking strategy (reference pipeline.py:4903-4928 dispatch)",
    )
    ap.add_argument("--track-id", default=None, help="batch tag on doc_status rows")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("lightrag-spark-index").getOrCreate()

    from lightrag_spark.plans.kg_build import KGBuildConfig
    from lightrag_spark.plans.runner import run_indexing
    from lightrag_spark.sources.pages import enqueue_documents, synthesize_pages

    from pyspark.sql import functions as F

    if args.synth:
        pages = synthesize_pages(spark, args.synth, seed=42)
    else:
        pages = spark.read.parquet(args.pages_dir)
        # WARC-shaped inputs may carry html without text: derive it
        from lightrag_spark.sources.pages import pages_with_text

        pages = pages_with_text(pages)
        if "page_order" not in pages.columns:
            pages = pages.withColumn("page_order", F.monotonically_increasing_id())
    docs = enqueue_documents(pages)
    cfg = KGBuildConfig(
        tokenizer_kind=args.tokenizer,
        chunking_strategy=args.chunking,
        chunk_token_size=args.chunk_size,
        chunk_overlap_token_size=args.chunk_overlap,
        max_gleaning=args.gleaning,
        merge_salts=args.salts,
        track_id=args.track_id,
    )
    metrics = run_indexing(spark, docs, args.out, cfg)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
