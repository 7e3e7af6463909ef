"""TRAPI knowledge-graph JSON sink.

Reference: kgx/sink/trapi_sink.py:33-426 — node/edge properties re-nested
into TRAPI shape: categories[], attributes[], sources[].

Spark design: rows → named_struct JSON strings per entity (distributed),
then a driver-side wrap into the single {"knowledge_graph": {nodes, edges}}
document (TRAPI is a monolithic-JSON format; the wrap is O(output) stream
concatenation, the heavy lifting — serialization — is distributed).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _node_entry(nodes: DataFrame) -> DataFrame:
    extra = [
        f.name for f in nodes.schema.fields
        if f.name not in ("id", "name", "category")
    ]
    attrs = F.array(*[
        F.struct(
            F.lit(f"biolink:{c}").alias("attribute_type_id"),
            F.col(c).cast("string").alias("value"),
        )
        for c in extra
    ]) if extra else F.lit(None).cast(
        "array<struct<attribute_type_id:string,value:string>>"
    )
    body = F.to_json(
        F.struct(
            F.col("name"),
            F.col("category").alias("categories"),
            attrs.alias("attributes"),
        )
    )
    return nodes.select(F.col("id").alias("k"), body.alias("v"))


def _edge_entry(edges: DataFrame) -> DataFrame:
    cols = set(edges.columns)
    sources = []
    if "primary_knowledge_source" in cols:
        sources.append(
            F.struct(
                F.col("primary_knowledge_source").alias("resource_id"),
                F.lit("primary_knowledge_source").alias("resource_role"),
            )
        )
    body = F.to_json(
        F.struct(
            F.col("subject"),
            F.col("predicate"),
            F.col("object"),
            *([F.array(*sources).alias("sources")] if sources else []),
        )
    )
    key = F.coalesce(
        F.col("id") if "id" in cols else F.lit(None),
        F.concat_ws("-", "subject", "predicate", "object"),
    )
    return edges.select(key.alias("k"), body.alias("v"))


def write_trapi(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    with open(path, "w") as fh:
        fh.write('{"knowledge_graph": {"nodes": {')
        first = True
        for row in _node_entry(nodes).toLocalIterator():
            fh.write(("" if first else ",") + json.dumps(row["k"]) + ":" + row["v"])
            first = False
        fh.write('}, "edges": {')
        first = True
        for row in _edge_entry(edges).toLocalIterator():
            fh.write(("" if first else ",") + json.dumps(row["k"]) + ":" + row["v"])
            first = False
        fh.write("}}}")


def write_kgx_json(nodes: DataFrame, edges: DataFrame, path: str) -> None:
    """Monolithic KGX JSON {"nodes":[...], "edges":[...]}
    (kgx/sink/json_sink.py:13-101) — same streamed-wrap strategy."""
    with open(path, "w") as fh:
        fh.write('{"nodes": [')
        first = True
        for row in nodes.select(F.to_json(F.struct(*nodes.columns)).alias("v")).toLocalIterator():
            fh.write(("" if first else ",") + row["v"])
            first = False
        fh.write('], "edges": [')
        first = True
        for row in edges.select(F.to_json(F.struct(*edges.columns)).alias("v")).toLocalIterator():
            fh.write(("" if first else ",") + row["v"])
            first = False
        fh.write("]}")
