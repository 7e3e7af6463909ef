"""KGX JSON-Lines source (kgx/source/jsonl_source.py:24-73).

One JSON object per line; node-vs-edge by `*_nodes.jsonl` / `*_edges.jsonl`
filename; gzip transparent (Spark handles .gz natively). Native distributed
`spark.read.json` — JSONL is the splittable fast path the reference's docs
recommend for large KGs (docs/kgx_format.md:432).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession

from kgx_spark.operators.sanitize import sanitize_import
from kgx_spark.operators.validate import validate_edges, validate_nodes
from kgx_spark.schema import EDGE_SCHEMA, NODE_SCHEMA


def read_kgx_jsonl(
    spark: SparkSession, path: str, validate: bool = True, infer_schema: bool = True
) -> tuple[DataFrame | None, DataFrame | None]:
    candidates = (
        sorted(glob.glob(os.path.join(path, "*.jsonl*")))
        if os.path.isdir(path)
        else sorted(glob.glob(path)) or [path]
    )
    node_files = [f for f in candidates if "nodes.jsonl" in os.path.basename(f)]
    edge_files = [f for f in candidates if "edges.jsonl" in os.path.basename(f)]

    nodes = edges = None
    if node_files:
        r = spark.read if infer_schema else spark.read.schema(NODE_SCHEMA)
        nodes = sanitize_import(r.json(node_files))
        if validate:
            nodes, _ = validate_nodes(nodes)
    if edge_files:
        r = spark.read if infer_schema else spark.read.schema(EDGE_SCHEMA)
        edges = sanitize_import(r.json(edge_files))
        if validate:
            edges, _ = validate_edges(edges)
    return nodes, edges
