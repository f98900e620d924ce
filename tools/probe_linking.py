"""Entity-linking scale probe: N synthetic names, planted alias variants.

The driver-testdata KG has a ~21-name universe (closed 30-word vocab), so
the gate proves CORRECTNESS of the linker but says nothing about its
scale law (every stage is distinct-name-bounded, not corpus-bounded —
operators/linking.py docstring).  This probe measures that law directly:

  names  = N md5-derived surfaces (dense trigram space, mutually far)
  plants = every 10th name gains a pluralized variant (J ~ 0.97)

Reports wall time, names/s, links found, and planted-pair recall (the
LSH-catch rate — 4 bands x 2 rows at J~0.97 should catch ~all).

Usage: python tools/probe_linking.py [n_names] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from lightrag_spark.operators.linking import link_entities
    from lightrag_spark.session import get_spark

    spark = get_spark(
        app_name="probe-linking", master=f"local[{cpus}]",
        shuffle_partitions=max(cpus * 2, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.range(n).select(
        F.concat(
            F.lit("ent "), F.md5(F.col("id").cast("string")),
            F.lit(" "), (F.col("id") % 997).cast("string"),
        ).alias("entity_name"),
        (F.col("id") % 50).cast("long").alias("degree"),
        (F.col("id") % 7 + 1).cast("long").alias("mention_count"),
        F.col("id"),
    )
    variants = base.filter(F.col("id") % 10 == 0).select(
        F.concat("entity_name", F.lit("s")).alias("entity_name"),
        F.lit(0).cast("long").alias("degree"),
        F.lit(1).cast("long").alias("mention_count"),
        F.col("id"),
    )
    names = base.unionByName(variants).repartition(max(cpus * 2, 16)).localCheckpoint(eager=True)
    n_names = names.count()
    n_planted = n // 10

    t0 = time.time()
    links = link_entities(names.drop("id"))
    links = links.localCheckpoint(eager=True)
    n_links = links.count()
    wall = time.time() - t0

    # recall: a planted variant is recovered if it maps to its base surface
    recovered = (
        variants.select(F.col("entity_name").alias("v"),
                        F.expr("substring(entity_name, 1, length(entity_name)-1)").alias("b"))
        .join(links.select(F.col("entity_name").alias("v"),
                           F.col("canonical_name").alias("c")), "v")
        .filter(F.col("c") == F.col("b"))
        .count()
    )
    comp_stats = links.agg(
        F.max("component_size").alias("max_comp"),
        F.countDistinct("canonical_name").alias("n_clusters"),
    ).collect()[0]

    print(json.dumps({
        "n_names": n_names,
        "n_planted": n_planted,
        "wall_s": round(wall, 2),
        "names_per_sec": round(n_names / wall),
        "n_link_rows": n_links,
        "planted_recall": round(recovered / max(n_planted, 1), 4),
        "max_component": comp_stats["max_comp"],
        "n_clusters": comp_stats["n_clusters"],
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
