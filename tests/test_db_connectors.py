"""DuckDB source + SQLite sink (reference: duckdb_source.py, sql_sink.py)."""

import sqlite3

import duckdb
import pyspark.sql.functions as F

from kgx_spark.sinks.sql_sink import write_sql
from kgx_spark.sources.duckdb_source import read_duckdb


def _make_duckdb(path):
    con = duckdb.connect(str(path))
    con.execute("CREATE TABLE nodes (id VARCHAR, name VARCHAR, category VARCHAR)")
    con.execute(
        "INSERT INTO nodes VALUES ('HGNC:1','g1','biolink:Gene'),"
        "('HGNC:2','g2','biolink:Gene'),('MONDO:1','d1','biolink:Disease')"
    )
    con.execute("CREATE TABLE edges (subject VARCHAR, predicate VARCHAR, object VARCHAR)")
    con.execute("INSERT INTO edges VALUES ('HGNC:1','biolink:related_to','MONDO:1')")
    con.close()


def test_read_duckdb(spark, tmp_path):
    db = tmp_path / "kg.duckdb"
    _make_duckdb(db)
    nodes, edges = read_duckdb(spark, str(db))
    assert nodes.count() == 3
    assert edges.count() == 1
    # category split into array by sanitize
    assert nodes.where(F.col("id") == "HGNC:1").first()["category"] == ["biolink:Gene"]


def test_read_duckdb_filter_pushdown(spark, tmp_path):
    db = tmp_path / "kg2.duckdb"
    _make_duckdb(db)
    nodes, _ = read_duckdb(spark, str(db), node_filters={"category": {"biolink:Gene"}})
    assert nodes.count() == 2


def test_write_sql(spark, tmp_path):
    nodes = spark.createDataFrame(
        [("HGNC:1", "g1", ["biolink:Gene"])], "id string, name string, category array<string>"
    )
    edges = spark.createDataFrame(
        [("HGNC:1", "biolink:related_to", "MONDO:1")],
        "subject string, predicate string, object string",
    )
    db = tmp_path / "kg.sqlite"
    write_sql(nodes, edges, str(db))
    con = sqlite3.connect(str(db))
    assert con.execute("SELECT count(*) FROM nodes").fetchone()[0] == 1
    assert con.execute("SELECT category FROM nodes").fetchone()[0] == "biolink:Gene"
    assert con.execute("SELECT count(*) FROM edges").fetchone()[0] == 1
    idx = {r[1] for r in con.execute("PRAGMA index_list(edges)").fetchall()}
    assert "edges_spo_idx" in idx
    con.close()
