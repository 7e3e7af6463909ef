"""Continuous KGX ingest via Structured Streaming.

`readStream` over a landing directory of JSONL node/edge drops → the same
sanitize/validate stages as batch → parquet sink with checkpointing. The
transformation functions are shared with the batch path (they're pure
DataFrame→DataFrame), which is the point: one operator inventory, two
execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from kgx_spark.operators.sanitize import sanitize_import
from kgx_spark.schema import EDGE_SCHEMA, NODE_SCHEMA


def stream_kgx_jsonl(
    spark: SparkSession,
    landing_dir: str,
    kind: str = "edges",
    schema: T.StructType | None = None,
) -> DataFrame:
    """→ streaming DataFrame of sanitized records from a landing directory.

    Callers attach their own sink:
    ``df.writeStream.format("parquet").option("path", out)
    .option("checkpointLocation", ckpt).trigger(availableNow=True).start()``
    """
    schema = schema or (EDGE_SCHEMA if kind == "edges" else NODE_SCHEMA)
    raw = spark.readStream.schema(schema).json(landing_dir)
    return sanitize_import(raw)
