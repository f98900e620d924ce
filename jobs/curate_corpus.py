"""spark-submit entry point: curate a pages corpus into training-ready docs.

The training-data side of the engine (index_corpus.py is the KG side):

    tools/package.sh
    spark-submit --master <cluster> --py-files dist/lightrag_spark.zip \\
        jobs/curate_corpus.py --synth 5000 --out /tmp/curated \\
        --bench-phrase "spark window merge" --bench-phrase "key agg row"

Writes ``curated_docs`` (partitioned by split), ``near_dup_pairs``,
``duplicate_components``, ``contamination`` parquet tables under --out and
prints ONE JSON metrics line.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--pages-dir", help="parquet dir with pages(url, text, ...)")
    src.add_argument("--synth", type=int, help="synthesize N deterministic pages")
    ap.add_argument("--out", required=True)
    ap.add_argument("--bench-phrase", action="append", default=[],
                    help="benchmark phrase for decontamination (repeatable)")
    ap.add_argument("--threshold", type=float, default=None,
                    help="near-dup Jaccard threshold (default operator constant)")
    ap.add_argument("--keep-contaminated", action="store_true",
                    help="flag contaminated docs instead of dropping them")
    ap.add_argument("--quality", action="store_true",
                    help="drop documents failing the Gopher quality thresholds")
    ap.add_argument("--domain-quota", type=int, default=None, metavar="K",
                    help="keep at most K curated docs per url host "
                         "(longest-text-first; salted two-phase top-k)")
    ap.add_argument("--pii", action="store_true",
                    help="redact PII from the curated text (typed placeholders)")
    ap.add_argument("--pack", type=int, default=None, metavar="BLOCK",
                    help="emit the sequence-packing layout at this block size")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("lightrag-spark-curate").getOrCreate()

    from lightrag_spark.plans.curate import CurateConfig, curate_corpus
    from lightrag_spark.sources.pages import synthesize_pages

    if args.synth:
        pages = synthesize_pages(spark, args.synth, seed=42, duplicate_fraction=0.08)
    else:
        pages = spark.read.parquet(args.pages_dir)
        # WARC-shaped inputs may carry html without text: derive it
        from lightrag_spark.sources.pages import pages_with_text

        pages = pages_with_text(pages)
        if "page_order" not in pages.columns:
            pages = pages.withColumn("page_order", F.monotonically_increasing_id())

    cfg = CurateConfig(
        bench_phrases=args.bench_phrase,
        drop_contaminated=not args.keep_contaminated,
        quality_filter=args.quality,
    )
    if args.threshold is not None:
        cfg.neardup_threshold = args.threshold

    t0 = time.time()
    r = curate_corpus(pages, cfg)
    r.curated.write.mode("overwrite").partitionBy("split").parquet(
        f"{args.out}/curated_docs"
    )
    if r.near_pairs is not None:
        r.near_pairs.write.mode("overwrite").parquet(f"{args.out}/near_dup_pairs")
    if r.components is not None:
        r.components.write.mode("overwrite").parquet(
            f"{args.out}/duplicate_components"
        )
    if r.contamination is not None:
        r.contamination.write.mode("overwrite").parquet(f"{args.out}/contamination")
    wall = time.time() - t0

    curated = spark.read.parquet(f"{args.out}/curated_docs")
    split_counts = {
        row["split"]: row["n"]
        for row in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    # per-partition lineage (north-rule metrics shape, as in index_corpus):
    # row counts per output partition of the curated table
    partitions = [
        {"part_id": row["pid"], "rows": row["rows"]}
        for row in curated.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("rows"))
        .orderBy("pid")
        .collect()
    ]
    quota_dropped = None
    if args.domain_quota:
        # anti-SEO-farm cap: at most K survivors per registrable host,
        # longest text first — runs BEFORE pii/pack so those stages only
        # touch rows that will ship
        from lightrag_spark.operators.sampling import domain_quota_sample

        with_host = curated.withColumn(
            "domain",
            F.coalesce(F.parse_url(F.col("file_path"), F.lit("HOST")), F.lit("")),
        )
        capped = domain_quota_sample(
            with_host,
            max_per_key=args.domain_quota,
            key_col="domain",
            order_cols=[F.length("text").desc()],
            id_col="doc_id",
        ).drop("domain_rank")
        capped.write.mode("overwrite").partitionBy("split").parquet(
            f"{args.out}/curated_docs_quota"
        )
        kept = spark.read.parquet(f"{args.out}/curated_docs_quota")
        quota_dropped = sum(split_counts.values()) - kept.count()
        curated = kept
        split_counts = {
            row["split"]: row["n"]
            for row in curated.groupBy("split").agg(F.count("*").alias("n")).collect()
        }

    pii_total = None
    if args.pii:
        # scrub AFTER curation (drop first, rewrite survivors only) — one
        # codegen projection over the curated table, rewritten in place
        from lightrag_spark.operators.pii import redact_pii

        redacted = redact_pii(curated, text_col="text", id_col="doc_id")
        joined = curated.drop("text").join(redacted, "doc_id")
        joined.write.mode("overwrite").partitionBy("split").parquet(
            f"{args.out}/curated_docs_pii"
        )
        scrubbed = spark.read.parquet(f"{args.out}/curated_docs_pii")
        pii_total = scrubbed.agg(F.sum("n_pii")).collect()[0][0]
        curated = scrubbed

    pack_blocks = None
    if args.pack:
        from lightrag_spark.operators.packing import pack_block_stats, pack_sequences

        layout = pack_sequences(curated, block_size=args.pack)
        layout.write.mode("overwrite").parquet(f"{args.out}/pack_layout")
        stats = pack_block_stats(layout, block_size=args.pack)
        stats.write.mode("overwrite").parquet(f"{args.out}/pack_blocks")
        pack_blocks = spark.read.parquet(f"{args.out}/pack_blocks").count()

    n_docs = r.docs.count()
    n_curated = sum(split_counts.values())
    metrics = {
        "docs_after_exact_dedup": n_docs,
        "curated_docs": n_curated,
        "dropped": n_docs - n_curated,
        "near_dup_pairs": r.near_pairs.count() if r.near_pairs is not None else 0,
        "contaminated": (
            r.contamination.count() if r.contamination is not None else 0
        ),
        "splits": split_counts,
        "partitions": partitions,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n_docs / wall, 1) if wall > 0 else None,
    }
    if quota_dropped is not None:
        metrics["domain_quota_dropped"] = quota_dropped
    if pii_total is not None:
        metrics["pii_redactions"] = int(pii_total or 0)
    if pack_blocks is not None:
        metrics["pack_blocks"] = pack_blocks
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
