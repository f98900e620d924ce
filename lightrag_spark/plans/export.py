"""Export + cache-admin surface — ``export_data`` (lightrag.py:6548-6600,
utils.py:4020-4330) and ``clear_cache`` (lightrag.py:4192-4226).

Two export shapes:

- :func:`export_data` — the reference's single-file export (csv / md /
  txt sections ENTITIES / RELATIONS / RELATIONSHIPS; excel gated on an
  engine being installed).  It COLLECTS the graph, exactly like the
  reference (which loops the whole node set through get_node) — callers
  cap it with ``max_rows``.  The reference's relations loop is O(N²)
  has_edge probing (utils.py:4078-4100); here it is one scan of the edge
  table.
- :func:`export_tables` — the scale path the single-file format can't
  serve: distributed ``df.write`` of the same three views, one directory
  per view, any row count.

``clear_llm_cache`` drops the llm_response_cache table (the reference's
``drop()``), keeping the graph-dir layout consistent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..constants import GRAPH_FIELD_SEP

__all__ = ["export_data", "export_tables", "clear_llm_cache"]


def _entity_rows(nodes: DataFrame) -> list[dict]:
    rows = []
    for r in nodes.orderBy("entity_name").collect():
        d = r.asDict()
        srcs = d.get("source_ids") or []
        rows.append(
            {
                "entity_name": d.get("entity_name", ""),
                "source_id": GRAPH_FIELD_SEP.join(srcs),
                "graph_data": str(d),
            }
        )
    return rows


def _relation_rows(edges: DataFrame) -> list[dict]:
    rows = []
    for r in edges.orderBy("src", "tgt").collect():
        d = r.asDict()
        srcs = d.get("source_ids") or []
        rows.append(
            {
                "src_entity": d.get("src", ""),
                "tgt_entity": d.get("tgt", ""),
                "source_id": GRAPH_FIELD_SEP.join(srcs),
                "graph_data": str(d),
            }
        )
    return rows


def _relationship_rows(edges: DataFrame) -> list[dict]:
    """The relationships_vdb view: the flat payload the vector store keeps
    (utils.py:4104-4135)."""
    rows = []
    for r in edges.orderBy("src", "tgt").collect():
        d = r.asDict()
        kw = d.get("keywords") or []
        rows.append(
            {
                "src_id": d.get("src", ""),
                "tgt_id": d.get("tgt", ""),
                "description": d.get("description", "") or "",
                "keywords": ", ".join(kw) if isinstance(kw, list) else str(kw),
                "weight": d.get("weight", 1.0),
                "source_id": GRAPH_FIELD_SEP.join(d.get("source_ids") or []),
            }
        )
    return rows


def _write_csv(path: str, sections: list[tuple[str, list[dict]]]) -> None:
    import csv

    with open(path, "w", newline="", encoding="utf-8") as f:
        first = True
        for title, data in sections:
            if not data:
                continue
            if not first:
                f.write("\n\n")
            first = False
            f.write(f"# {title}\n")
            writer = csv.DictWriter(f, fieldnames=list(data[0].keys()))
            writer.writeheader()
            writer.writerows(data)


def _write_md(path: str, sections: list[tuple[str, list[dict]]]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("# LightRAG Data Export\n\n")
        for title, data in sections:
            f.write(f"## {title.title()}\n\n")
            if not data:
                f.write(f"*No {title.lower().rstrip('s')} data available*\n\n")
                continue
            keys = list(data[0].keys())
            f.write("| " + " | ".join(keys) + " |\n")
            f.write("| " + " | ".join(["---"] * len(keys)) + " |\n")
            for row in data:
                f.write("| " + " | ".join(str(v) for v in row.values()) + " |\n")
            f.write("\n\n")


def _write_txt(path: str, sections: list[tuple[str, list[dict]]]) -> None:
    with open(path, "w", encoding="utf-8") as f:
        f.write("LIGHTRAG DATA EXPORT\n" + "=" * 80 + "\n\n")
        for title, data in sections:
            f.write(f"{title}\n" + "-" * 80 + "\n")
            if not data:
                f.write("(none)\n\n")
                continue
            keys = list(data[0].keys())
            f.write("\t".join(keys) + "\n")
            for row in data:
                f.write("\t".join(str(v) for v in row.values()) + "\n")
            f.write("\n")


def export_data(
    nodes: DataFrame,
    edges: DataFrame,
    output_path: str,
    file_format: str = "csv",
    max_rows: int | None = None,
) -> dict:
    """Single-file export, reference section layout.  ``max_rows`` guards
    the collect (raises instead of silently flooding the driver) — use
    :func:`export_tables` when the graph exceeds a driver-friendly size."""
    if file_format not in ("csv", "md", "txt", "excel"):
        raise ValueError(f"Unsupported file format: {file_format}")
    if max_rows is not None:
        n = nodes.count() + edges.count()
        if n > max_rows:
            raise ValueError(
                f"graph has {n} rows > max_rows={max_rows}; "
                "use export_tables for distributed export"
            )
    sections = [
        ("ENTITIES", _entity_rows(nodes)),
        ("RELATIONS", _relation_rows(edges)),
        ("RELATIONSHIPS", _relationship_rows(edges)),
    ]
    if file_format == "csv":
        _write_csv(output_path, sections)
    elif file_format == "md":
        _write_md(output_path, sections)
    elif file_format == "txt":
        _write_txt(output_path, sections)
    else:  # excel — engine import-gated (not installed in this sandbox)
        try:
            import pandas as pd

            with pd.ExcelWriter(output_path) as writer:
                for title, data in sections:
                    if data:
                        pd.DataFrame(data).to_excel(
                            writer, sheet_name=title.title(), index=False
                        )
        except ImportError as e:
            raise NotImplementedError(
                "excel export needs an ExcelWriter engine (openpyxl/xlsxwriter)"
            ) from e
    return {
        "path": output_path,
        "entities": len(sections[0][1]),
        "relations": len(sections[1][1]),
        "relationships": len(sections[2][1]),
    }


def export_tables(
    nodes: DataFrame,
    edges: DataFrame,
    out_dir: str,
    file_format: str = "parquet",
) -> dict:
    """Distributed export — the 100-TB path: each view written by the
    cluster (csv views get SEP-joined array columns; parquet keeps the
    native schema)."""
    os.makedirs(out_dir, exist_ok=True)
    ent = nodes
    rel = edges
    if file_format == "csv":
        def flatten(df):
            out = df
            for field in out.schema.fields:
                if str(field.dataType).startswith("ArrayType"):
                    out = out.withColumn(
                        field.name, F.array_join(field.name, GRAPH_FIELD_SEP)
                    )
            return out

        flatten(ent).write.mode("overwrite").option("header", True).csv(
            os.path.join(out_dir, "entities")
        )
        flatten(rel).write.mode("overwrite").option("header", True).csv(
            os.path.join(out_dir, "relations")
        )
    elif file_format == "parquet":
        ent.write.mode("overwrite").parquet(os.path.join(out_dir, "entities"))
        rel.write.mode("overwrite").parquet(os.path.join(out_dir, "relations"))
    else:
        raise ValueError(f"Unsupported file format: {file_format}")
    return {"out_dir": out_dir, "format": file_format}


def clear_llm_cache(graph_dir: str) -> bool:
    """aclear_cache (lightrag.py:4192): drop the llm_response_cache table.
    Returns True when a cache existed and was removed."""
    import shutil

    path = os.path.join(graph_dir, "llm_cache")
    if not os.path.exists(path):
        return False
    shutil.rmtree(path)
    return True
