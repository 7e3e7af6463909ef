"""KGX JSON-Lines sink (kgx/sink/jsonl_sink.py:30-89).

`{base}_nodes.jsonl` / `{base}_edges.jsonl`; nulls are dropped per record by
Spark's json writer (matching the reference's remove_null on write); gzip via
compression option.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_kgx_jsonl(
    nodes: DataFrame | None,
    edges: DataFrame | None,
    base_path: str,
    compression: str | None = None,
) -> None:
    for df, kind in ((nodes, "nodes"), (edges, "edges")):
        if df is None:
            continue
        w = df.write.mode("overwrite")
        if compression:
            w = w.option("compression", compression)
        w.json(f"{base_path}_{kind}.jsonl")
