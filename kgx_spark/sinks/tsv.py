"""KGX TSV sink.

Reference: kgx/sink/tsv_sink.py:39-238 — writes `{base}_nodes.tsv` /
`{base}_edges.tsv`, deterministic column order (core-first, then sorted,
'_'-internal last — 162-238), '|'-joined lists, optional tar packaging.

Spark writes a directory of part files per table (the distributed analogue
of one file); `single_file=True` coalesces to 1 partition for small outputs
and exact golden-file comparison.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from kgx_spark.operators.sanitize import sanitize_export
from kgx_spark.schema import EDGE_CORE_ORDER, NODE_CORE_ORDER, ordered_columns


def _write(df: DataFrame, path: str, core_order: list[str], fmt: str, single_file: bool) -> None:
    cols = ordered_columns(df.columns, core_order)
    out = sanitize_export(df.select(*cols))
    if single_file:
        out = out.coalesce(1)
    (
        out.write.mode("overwrite")
        .option("header", "true")
        .option("sep", "\t" if fmt == "tsv" else ",")
        .option("emptyValue", "")
        .option("nullValue", "")
        .csv(path)
    )


def write_kgx_tsv(
    nodes: DataFrame | None,
    edges: DataFrame | None,
    base_path: str,
    fmt: str = "tsv",
    single_file: bool = False,
) -> None:
    if nodes is not None:
        _write(nodes, os.path.join(base_path + f"_nodes.{fmt}"), NODE_CORE_ORDER, fmt, single_file)
    if edges is not None:
        _write(edges, os.path.join(base_path + f"_edges.{fmt}"), EDGE_CORE_ORDER, fmt, single_file)
