"""Bucketed-table sink: shuffle-free co-located joins for the hot KG keys.

At 100 TB the dominant recurring cost of the KG surfaces is re-shuffling
the same tables on the same keys — mentions x nodes on entity_name for
every context build, edges x degrees on endpoints for every rank.  Spark's
bucketed tables pre-shuffle ONCE at write time: both sides bucketed by the
join key into the same bucket count are read bucket-aligned, and the
SortMergeJoin runs with NO Exchange on either side
(``tests/test_bucketed.py`` asserts exactly that on the physical plan).

Bucket metadata lives in the session catalog: with the default in-memory
catalog it survives the session only — production deployments point
``spark.sql.warehouse.dir`` + a shared metastore (or use Iceberg bucket
transforms, the same declared environment gap as
``plans/incremental_merge.py``: runtime jars absent from this sandbox).

Reference anchor: the reference's storage backends key every entity
lookup by entity name (lightrag/kg/*_impl.py get_by_id surfaces); this is
the Spark-native layout that makes that key the physical layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: tuple = ("entity_name",),
    n_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Write ``df`` as a parquet table bucketed (and bucket-sorted) by
    ``keys`` — the one-time shuffle that all later equi-joins on ``keys``
    skip.  ``n_buckets`` must MATCH across tables meant to co-join."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *keys)
    )
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def save_kg_bucketed(
    nodes: DataFrame,
    mentions: DataFrame,
    prefix: str = "kg",
    n_buckets: int = 32,
) -> tuple[str, str]:
    """Persist the two hot KG tables co-bucketed on entity_name; returns
    the table names.  Joining them afterwards is exchange-free."""
    nt, mt = f"{prefix}_nodes_b", f"{prefix}_mentions_b"
    save_bucketed(nodes, nt, ("entity_name",), n_buckets)
    save_bucketed(mentions, mt, ("entity_name",), n_buckets)
    return nt, mt


def bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
