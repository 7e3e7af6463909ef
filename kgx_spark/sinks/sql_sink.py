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

from kgx_spark.operators.sanitize import sanitize_export

BATCH = 10_000  # reference batch size (sql_sink.py executemany chunks)


def _insert(con: sqlite3.Connection, df: DataFrame, table: str) -> None:
    out = sanitize_export(df)
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


def write_sql(nodes: DataFrame | None, edges: DataFrame | None, db_path: str) -> None:
    con = sqlite3.connect(db_path)
    try:
        if nodes is not None:
            _insert(con, nodes, "nodes")
            con.execute("CREATE INDEX IF NOT EXISTS nodes_id_idx ON nodes (id)")
        if edges is not None:
            _insert(con, edges, "edges")
            con.execute(
                "CREATE INDEX IF NOT EXISTS edges_spo_idx ON edges (subject, predicate, object)"
            )
        con.commit()
    finally:
        con.close()
