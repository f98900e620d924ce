"""Materialize the sf1 TIMING corpus: 10 key-shifted copies of every
/root/testdata/sf0.1 table, written to /tmp/sf1 (parquet, same schemas).

Purpose (BENCH.md): a 10x corpus makes round-over-round regressions visible
above the ~1.5x host variance that sf0.1 timings carry.  This is a timing
corpus only — the DuckDB oracle gate stays at sf0.01; text copies carry a
per-copy suffix token so the dedup operators see near-identical (not
byte-identical) documents, like a real crawled corpus would.

Usage: python tools/make_sf1.py [out_dir]   (idempotent; skips if present)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
COPIES = 10


def build(out_dir: str = "/tmp/sf1", copies: int = COPIES, tables=None) -> str:
    """``copies`` scales the probe corpus (10 = sf1, 100 = sf10);
    ``tables`` restricts generation (the sf10 probe only needs the
    documents/embeddings/events family — 100x lineitem would be >2 GB of
    parquet for queries the probe list does not run)."""
    if os.path.exists(os.path.join(out_dir, "embeddings.parquet")):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in tables or TABLES:
        src = f"'{SRC}/{t}.parquet'"
        selects = []
        for i in range(copies):
            if t == "documents":
                text = "text" if i == 0 else f"text || ' v{i}'"
                selects.append(
                    f"SELECT doc_id + {i}::BIGINT*10000000 AS doc_id, {text} AS text, "
                    f"lang, source, n_chars FROM {src}"
                )
            elif t == "embeddings":
                selects.append(
                    f"SELECT vec_id + {i}::BIGINT*2000 AS vec_id, embedding, label FROM {src}"
                )
            elif t == "events":
                selects.append(
                    f"SELECT event_id + {i}::BIGINT*1000000000 AS event_id, ts, "
                    f"user_id + {i}::BIGINT*10000 AS user_id, event_type, value, props "
                    f"FROM {src}"
                )
            elif t == "lineitem":
                selects.append(
                    f"SELECT l_orderkey + {i}::BIGINT*1000000000 AS l_orderkey, "
                    f"* EXCLUDE (l_orderkey) FROM {src}"
                )
            elif t == "orders":
                selects.append(
                    f"SELECT o_orderkey + {i}::BIGINT*1000000000 AS o_orderkey, "
                    f"* EXCLUDE (o_orderkey) FROM {src}"
                )
            else:
                if i > 0:
                    continue  # small dims: one copy is enough
                selects.append(f"SELECT * FROM {src}")
        union = " UNION ALL ".join(selects)
        con.execute(
            f"COPY ({union}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    print(build(out))
