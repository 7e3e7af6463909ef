"""Sanitize + validate semantics (reference: kgx_utils.py:796-909, source.py:281-366)."""

import pyspark.sql.functions as F

from kgx_spark.operators.sanitize import sanitize_export, sanitize_import
from kgx_spark.operators.validate import validate_edges, validate_nodes


def test_sanitize_import_splits_and_sorts(spark):
    df = spark.createDataFrame(
        [("A:1", "b|a|b", "has\ttab", "true"), ("A:2", None, "has\nnewline", "False")],
        ["id", "category", "description", "negated"],
    )
    out = sanitize_import(df).orderBy("id").collect()
    assert out[0]["category"] == ["a", "b"]  # split + dedupe + sort (kgx_utils.py:871)
    assert out[0]["description"] == "has tab"
    assert out[1]["description"] == "has newline"
    assert out[0]["negated"] is True and out[1]["negated"] is False


def test_sanitize_empty_becomes_null(spark):
    df = spark.createDataFrame([("A:1", ""), ("A:2", " ")], ["id", "name"])
    out = sanitize_import(df).collect()
    assert all(r["name"] is None for r in out)  # is_null: ''/' ' (kgx_utils.py:1045-1064)


def test_sanitize_export_joins_lists(spark):
    df = spark.createDataFrame([("A:1", ["x", "y"], True)], ["id", "category", "negated"])
    row = sanitize_export(df).first()
    assert row["category"] == "x|y"
    assert row["negated"] == "True"


def test_validate_nodes_defaults_category(spark):
    df = spark.createDataFrame(
        [("A:1", None), ("", ["biolink:Gene"]), (None, None)],
        "id string, category array<string>",
    )
    valid, errors = validate_nodes(df)
    rows = valid.collect()
    assert len(rows) == 1
    assert rows[0]["category"] == ["biolink:NamedThing"]  # source.py:305-309
    assert errors.count() == 2


def test_validate_edges_rejects_missing_spo(spark):
    df = spark.createDataFrame(
        [("A:1", "biolink:related_to", "B:1"), ("A:2", None, "B:2"), ("", "p", "B:3")],
        "subject string, predicate string, object string",
    )
    valid, errors = validate_edges(df)
    assert valid.count() == 1
    assert errors.count() == 2
    err = errors.first()
    assert err["error_type"] == "MISSING_EDGE_PROPERTY"
