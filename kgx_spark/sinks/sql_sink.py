"""SQLite sink.

Reference: kgx/sink/sql_sink.py:47-193 — CREATE TABLE (all TEXT columns),
executemany bulk insert, then indexes on nodes(id) and
edges(subject, predicate, object)  (177-193).

Spark design: serialization (array-join, stringify) is distributed
(sanitize_export); the insert itself streams partition-by-partition through
the driver via toLocalIterator — bounded memory, same batching contract as
the reference's executemany. SQLite is single-writer by design, so a
distributed write is impossible by construction; at cluster scale the
equivalent sink is df.write.jdbc / saveAsTable (SURVEY.md §2.2).
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx_spark.operators.sanitize import sanitize_export

BATCH = 10_000  # reference batch size (sql_sink.py executemany chunks)

# The model's denormalized association slots (sql_sink.py:102-106 appends
# them to the edges schema via bmt.get_denormalized_association_slots; the
# reference's _denormalize_edge itself is a declared stub — :195-207 — so
# the columns are created and left empty). Snapshot of the public Biolink
# Model slots annotated ``denormalized: true``.
DENORMALIZED_ASSOCIATION_SLOTS = (
    "subject_category",
    "subject_closure",
    "subject_category_closure",
    "subject_namespace",
    "subject_label",
    "object_category",
    "object_closure",
    "object_category_closure",
    "object_namespace",
    "object_label",
)


def _insert(
    con: sqlite3.Connection, df: DataFrame, table: str, properties=None, extra=()
) -> None:
    if properties is not None:
        # declared-column semantics (sql_sink.py:60-73,117-157): output
        # columns are exactly the ordered declared set, missing values ''
        from kgx_spark.schema import EDGE_CORE_ORDER, NODE_CORE_ORDER

        from .tsv import _select_declared

        order = NODE_CORE_ORDER if table == "nodes" else EDGE_CORE_ORDER
        df = _select_declared(df, properties, order)
    out = sanitize_export(df)
    for c in extra:
        if c not in out.columns:
            out = out.withColumn(c, F.lit(""))
    cols = out.columns
    con.execute(f"DROP TABLE IF EXISTS {table}")
    con.execute(f"CREATE TABLE {table} ({', '.join(c + ' TEXT' for c in cols)})")
    sql = f"INSERT INTO {table} VALUES ({', '.join('?' for _ in cols)})"
    batch: list[tuple] = []
    for row in out.toLocalIterator():
        batch.append(tuple(row))
        if len(batch) >= BATCH:
            con.executemany(sql, batch)
            batch = []
    if batch:
        con.executemany(sql, batch)


def write_sql(
    nodes: DataFrame | None,
    edges: DataFrame | None,
    db_path: str,
    node_properties=None,
    edge_properties=None,
    denormalize: bool = False,
) -> None:
    con = sqlite3.connect(db_path)
    try:
        if nodes is not None:
            _insert(con, nodes, "nodes", properties=node_properties)
            con.execute("CREATE INDEX IF NOT EXISTS nodes_id_idx ON nodes (id)")
        if edges is not None:
            _insert(
                con, edges, "edges", properties=edge_properties,
                extra=DENORMALIZED_ASSOCIATION_SLOTS if denormalize else (),
            )
            con.execute(
                "CREATE INDEX IF NOT EXISTS edges_spo_idx ON edges (subject, predicate, object)"
            )
        con.commit()
    finally:
        con.close()
