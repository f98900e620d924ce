"""Driver-contract shape checks (cheap; the value comparison itself is
tools/check_correctness.py, which mirrors the driver's DuckDB gate)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em


def test_every_query_has_oracle_or_is_declared():
    qs = set(em.queries())
    osql = set(em.oracle_sql())
    # every oracle refers to an existing query
    assert osql <= qs
    # all current queries are SQL-checkable
    assert qs == osql


def test_oracle_sql_parses_in_duckdb():
    """DuckDB should at least *bind* every oracle statement against empty
    views (EXPLAIN, no execution)."""
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR, lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[], label INTEGER)")
    con.execute("CREATE TABLE events(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, props VARCHAR)")
    con.execute("""CREATE TABLE lineitem(l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT,
        l_linenumber INTEGER, l_quantity DOUBLE, l_extendedprice DOUBLE, l_discount DOUBLE,
        l_tax DOUBLE, l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)""")
    for name, sql in em.oracle_sql().items():
        con.execute("EXPLAIN " + sql)
