"""Per-query sf1 probe: time each bench query individually (fresh noop write,
shared session) with a per-query wall clock printed as soon as it finishes,
so a pathological query is attributable even if a later one hangs.

Usage: python tools/probe_sf1.py [query ...]   (default: the bench list)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

import make_sf1  # noqa: E402

DEFAULT = [
    "dedup_near_pairs",
    "dedup_simhash",
    "dedup_simhash_near",
    "sim_cosine_topk",
    "sim_ann_topk",
    "sim_knn_label_vote",
    "dedup_embedding_near",
    "text_quality",
    "events_sessions",
    "tpch_q1ish",
    "kg_chunks_semantic",
]


def main():
    names = sys.argv[1:] or DEFAULT
    # SPARK_GRAFT_PROBE_SF=sf10 -> the 100x corpus (tools/make_sf10.py);
    # tpch/lineitem rows are not generated there — skip them in the list.
    if os.environ.get("SPARK_GRAFT_PROBE_SF") == "sf10":
        import make_sf10

        sf_dir = make_sf10.build()
        names = [n for n in names if n not in ("tpch_q1ish",)]
    else:
        sf_dir = make_sf1.build()

    import __spark_entry__ as em
    from lightrag_spark.session import get_spark

    spark = get_spark(app_name="sf1-probe", master="local[32]", shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    em._tune_session(spark)

    qs = em.queries()
    for name in names:
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"{name}: {time.time() - t0:.1f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED after {time.time() - t0:.1f}s: {e}", flush=True)
        spark.catalog.clearCache()
    spark.stop()


if __name__ == "__main__":
    main()
