"""spark-submit entry point: graph analytics over indexed KG tables.

Runs the KG analytics suite — PageRank, triangle counts / clustering,
label-propagation communities, community summaries, and entity linking
(surface + optional graph rewrite) — over the kg_nodes/kg_edges parquet
an index_corpus.py run produced, writing one parquet table per analytic.

    tools/package.sh
    spark-submit --master 'local[8]' --py-files dist/lightrag_spark.zip \\
        jobs/kg_analytics.py --kg /tmp/kgout --out /tmp/kganalytics \\
        [--synth 300]   # no --kg: build a KG from N synthetic pages first

Prints ONE JSON metrics line (counts + wall seconds per analytic).
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--kg", help="dir holding kg_nodes/ and kg_edges/ parquet")
    src.add_argument("--synth", type=int, help="build a KG from N synthetic pages first")
    ap.add_argument("--out", required=True)
    ap.add_argument("--pr-iterations", type=int, default=6)
    ap.add_argument("--lpa-iterations", type=int, default=4)
    ap.add_argument("--link", action="store_true", help="also run entity linking + graph rewrite")
    ap.add_argument("--extended", action="store_true",
                    help="also run modularity, 2-hop neighborhood sizes, personalized PageRank")
    ap.add_argument("--ppr-seeds", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("lightrag-spark-kg-analytics").getOrCreate()

    from lightrag_spark.operators.graphs import (
        label_propagation,
        pagerank_fixedpoint,
        triangle_counts,
    )
    from lightrag_spark.operators.linking import apply_entity_links, link_entities
    from lightrag_spark.operators.summary import finalize_descriptions

    if args.synth:
        from lightrag_spark.plans.kg_build import KGBuildConfig, build_kg
        from lightrag_spark.sources.pages import enqueue_documents, synthesize_pages

        docs = enqueue_documents(synthesize_pages(spark, args.synth, seed=42))
        r = build_kg(
            docs,
            KGBuildConfig(
                tokenizer_kind="regex", chunk_token_size=64,
                chunk_overlap_token_size=8, merge_salts=8,
            ),
        )
        nodes, edges = r.kg_nodes, r.kg_edges
    else:
        nodes = spark.read.parquet(f"{args.kg}/kg_nodes")
        edges = spark.read.parquet(f"{args.kg}/kg_edges")
    e = edges.select("src", "tgt").localCheckpoint(eager=True)
    nodes = nodes.localCheckpoint(eager=True)

    metrics: dict = {"out": args.out}

    def run(name, df):
        t0 = time.time()
        df.write.mode("overwrite").parquet(f"{args.out}/{name}")
        n = spark.read.parquet(f"{args.out}/{name}").count()
        metrics[name] = {"rows": n, "sec": round(time.time() - t0, 2)}

    run("pagerank", pagerank_fixedpoint(e, dst="tgt", iterations=args.pr_iterations))
    run("triangles", triangle_counts(e))
    comms = label_propagation(e, iterations=args.lpa_iterations).localCheckpoint(
        eager=True
    )
    run("communities", comms)
    if args.extended:
        from lightrag_spark.operators.graphs import (
            community_modularity,
            neighborhood_sizes,
            personalized_pagerank,
        )

        run("modularity", community_modularity(e, comms))
        run("neighborhood2", neighborhood_sizes(e))
        run("ppr", personalized_pagerank(e, n_seeds=args.ppr_seeds,
                                         iterations=args.pr_iterations))

    frags = (
        comms.join(
            nodes.select(F.col("entity_name").alias("node"), "description"), "node"
        )
        .groupBy("community")
        .agg(
            F.slice(
                F.array_sort(
                    F.collect_list(F.concat("node", F.lit(": "), "description"))
                ),
                1,
                8,
            ).alias("descriptions"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
    )
    run(
        "community_summaries",
        finalize_descriptions(frags, "community", "Community", "whitespace"),
    )

    if args.link:
        links = link_entities(nodes).localCheckpoint(eager=True)
        run("entity_links", links)
        ln, le = apply_entity_links(nodes, edges, links)
        run("linked_nodes", ln)
        run("linked_edges", le)

    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()
