"""Physical-plan audit for queries() entries: prints, per query, the
counts that matter at scale — shuffle exchanges, WindowGroupLimit
pushdowns, BroadcastNestedLoopJoins (pair-explosion risk unless it's the
1-row scalar-attach pattern), SortMergeJoins, and Python evals (the slow
path).  The PLANS.md audit sections are generated from this.

Usage: python tools/plan_audit.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if args and os.path.isdir(args[0]):
        sf_dir, args = args[0], args[1:]

    import __spark_entry__ as em
    from lightrag_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    for name in args or sorted(qs):
        try:
            df = qs[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 - audit tool, report and move on
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        counts = {
            "exchanges": plan.count("Exchange hashpartitioning")
            + plan.count("Exchange rangepartitioning"),
            "bcast_exch": plan.count("Exchange SinglePartition")
            + plan.count("BroadcastExchange"),
            "wgl": plan.count("WindowGroupLimit"),
            "bnl": plan.count("BroadcastNestedLoopJoin"),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "python": plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas"),
            "sorts": plan.count("Sort ["),
        }
        print(f"{name}: " + " ".join(f"{k}={v}" for k, v in counts.items()))


if __name__ == "__main__":
    main()
