"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted, values
stringified).  Exit code 1 on any mismatch.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize_cell(v):
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_fingerprint(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(normalize_cell(r[i]) for i in order) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode("utf-8", "replace"))
        h.update(b"\n")
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from lightrag_spark.session import get_spark

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    spark = get_spark(app_name="correctness-check", master="local[8]", shuffle_partitions=16)

    qs = entrymod.queries()
    osql = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            failures.append(name)
            print(f"{name:22s} SPARK ERROR: {str(e)[:200]}")
            continue
        t1 = time.time()
        if name not in osql:
            print(f"{name:22s} rows={len(srows):7d}  (no oracle — rows-only) {t1-t0:5.1f}s")
            continue
        try:
            res = con.execute(osql[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"{name:22s} ORACLE SQL ERROR: {e}")
            continue
        ok_cols = sorted(scols) == sorted(dcols)
        ok_rows = len(srows) == len(drows)
        sh = frame_fingerprint([tuple(r) for r in srows], scols)
        dh = frame_fingerprint(drows, dcols)
        ok_hash = sh == dh
        status = "OK " if (ok_cols and ok_rows and ok_hash) else "FAIL"
        if status == "FAIL":
            failures.append(name)
        print(
            f"{name:22s} {status} rows={len(srows)}/{len(drows)} cols={'=' if ok_cols else f'{scols} vs {dcols}'} "
            f"hash={'=' if ok_hash else f'{sh[:8]} vs {dh[:8]}'} {t1-t0:5.1f}s"
        )
        if status == "FAIL" and ok_cols and ok_rows:
            # print a few differing lines for debugging
            order = sorted(range(len(scols)), key=lambda i: scols[i])
            sset = sorted("|".join(normalize_cell(r[i]) for i in order) for r in [tuple(x) for x in srows])
            dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
            dset = sorted("|".join(normalize_cell(r[i]) for i in dorder) for r in drows)
            diff1 = [x for x in sset if x not in set(dset)][:3]
            diff2 = [x for x in dset if x not in set(sset)][:3]
            for d in diff1:
                print(f"    spark-only: {d[:160]}")
            for d in diff2:
                print(f"    duck-only : {d[:160]}")

    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
