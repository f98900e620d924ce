"""export_data / export_tables / clear_llm_cache (lightrag.py:6548-6600,
utils.py:4020-4330, lightrag.py:4192-4226): section layout per format,
max_rows guard, distributed table export, cache drop."""

from __future__ import annotations

import csv
import os

import pytest

from lightrag_spark.plans.export import clear_llm_cache, export_data, export_tables


@pytest.fixture(scope="module")
def kg(spark):
    import __spark_entry__ as m

    r = m._build(spark, "/root/testdata/sf0.001")
    nodes = r.kg_nodes.persist()
    edges = r.kg_edges.persist()
    nodes.count(), edges.count()
    return nodes, edges


def test_export_csv_sections(kg, tmp_path):
    nodes, edges = kg
    out = str(tmp_path / "kg.csv")
    stats = export_data(nodes, edges, out, "csv")
    assert stats["entities"] == nodes.count()
    assert stats["relations"] == stats["relationships"] == edges.count()
    text = open(out).read()
    assert "# ENTITIES" in text and "# RELATIONS" in text and "# RELATIONSHIPS" in text
    # entity section parses as csv with the reference's column set
    ent_block = text.split("# ENTITIES\n")[1].split("\n\n")[0]
    rows = list(csv.DictReader(ent_block.splitlines()))
    assert len(rows) == nodes.count()
    assert set(rows[0]) == {"entity_name", "source_id", "graph_data"}
    # relationships carry the vdb payload columns
    rel_block = text.split("# RELATIONSHIPS\n")[1]
    rrows = list(csv.DictReader(rel_block.splitlines()))
    assert set(rrows[0]) == {
        "src_id", "tgt_id", "description", "keywords", "weight", "source_id"
    }


def test_export_md_txt_and_guard(kg, tmp_path):
    nodes, edges = kg
    md = str(tmp_path / "kg.md")
    export_data(nodes, edges, md, "md")
    body = open(md).read()
    assert body.startswith("# LightRAG Data Export")
    assert "## Entities" in body and "| entity_name |" in body

    txt = str(tmp_path / "kg.txt")
    export_data(nodes, edges, txt, "txt")
    assert "ENTITIES" in open(txt).read()

    with pytest.raises(ValueError, match="Unsupported file format"):
        export_data(nodes, edges, str(tmp_path / "x"), "yaml")
    with pytest.raises(ValueError, match="export_tables"):
        export_data(nodes, edges, str(tmp_path / "y.csv"), "csv", max_rows=3)


def test_export_tables_distributed(kg, tmp_path, spark):
    nodes, edges = kg
    out = str(tmp_path / "dist")
    export_tables(nodes, edges, out, "parquet")
    assert spark.read.parquet(out + "/entities").count() == nodes.count()
    assert spark.read.parquet(out + "/relations").count() == edges.count()

    out2 = str(tmp_path / "dist_csv")
    export_tables(nodes, edges, out2, "csv")
    got = spark.read.option("header", True).csv(out2 + "/entities")
    assert got.count() == nodes.count()
    # array columns flattened for csv
    assert dict(got.dtypes)["source_ids"] == "string"


def test_clear_llm_cache(tmp_path, spark, kg):
    nodes, _ = kg
    gd = str(tmp_path / "graph")
    os.makedirs(gd)
    assert clear_llm_cache(gd) is False  # nothing to clear
    nodes.limit(1).write.parquet(gd + "/llm_cache")
    assert clear_llm_cache(gd) is True
    assert not os.path.exists(gd + "/llm_cache")
