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


def test_sniff_undeclared_delimiter_columns(spark):
    # the reference splits ANY undeclared string value containing '|' and
    # wraps Biolink-multivalued slot values in lists (kgx_utils.py:884-899)
    from kgx_spark.operators.sanitize import sanitize_import, sniff_list_columns

    df = spark.createDataFrame(
        [
            ("A:1", "NCBITaxon:1|NCBITaxon:2", "scalar one", "ECO:1"),
            ("A:2", "NCBITaxon:3", "scalar two", "ECO:2"),
        ],
        "id string, taxon string, custom_note string, has_evidence string",
    )
    sniffed = sniff_list_columns(df)
    # taxon carries the delimiter → list; custom_note never does → scalar;
    # has_evidence is a Biolink multivalued slot → list even without '|'
    assert sniffed == {"taxon", "has_evidence"}
    out = sanitize_import(df, sniff=True)
    types = dict(out.dtypes)
    assert types["taxon"] == "array<string>"
    assert types["has_evidence"] == "array<string>"
    assert types["custom_note"] == "string"
    rows = {r["id"]: r for r in out.collect()}
    assert rows["A:1"]["taxon"] == ["NCBITaxon:1", "NCBITaxon:2"]
    assert rows["A:2"]["taxon"] == ["NCBITaxon:3"]
    assert rows["A:1"]["has_evidence"] == ["ECO:1"]
    assert rows["A:1"]["custom_note"] == "scalar one"


def test_sniff_never_touches_declared_columns(spark):
    from kgx_spark.operators.sanitize import sniff_list_columns

    # primary_knowledge_source is DECLARED single-valued (column_types) even
    # though a value could contain '|'; name likewise
    df = spark.createDataFrame(
        [("A:1", "weird|name", "infores:a|infores:b")],
        "id string, name string, primary_knowledge_source string",
    )
    assert sniff_list_columns(df) == set()


def test_tsv_read_sniffs_undeclared_list_column(spark, tmp_path):
    from kgx_spark.sources.tsv import read_nodes_tsv

    p = tmp_path / "g_nodes.tsv"
    p.write_text(
        "id\tname\tcategory\ttaxon\n"
        "HGNC:1\tg1\tbiolink:Gene\tNCBITaxon:9606|NCBITaxon:10090\n"
        "HGNC:2\tg2\tbiolink:Gene\tNCBITaxon:9606\n"
    )
    nodes = read_nodes_tsv(spark, str(p))
    rows = {r["id"]: r for r in nodes.collect()}
    assert rows["HGNC:1"]["taxon"] == ["NCBITaxon:10090", "NCBITaxon:9606"]
    assert rows["HGNC:2"]["taxon"] == ["NCBITaxon:9606"]


# --- base-Source validation parity (tests/unit/test_source/test_source.py) -
def test_validate_node_reference_rows(spark):
    """The reference's incorrect/correct node tables: records without a
    usable id are dropped to the error side-output; surviving records
    always carry a category defaulting to biolink:NamedThing."""
    rows = [
        # (id, name, category, survives)
        (None, "Node A", None, False),           # no id
        (None, None, None, False),               # node_id key only
        (None, "Node A", ["biolink:NamedThing"], False),  # no id, category set
        ("", "hgnc:0", ["biolink:NamedThing"], False),    # empty id
        ("hgnc:1234", None, ["biolink:NamedThing"], True),  # no name: warning only
        ("hgnc:5678", "Node A", None, True),     # no category: defaulted
        ("A", "Node A", ["biolink:NamedThing"], True),
        ("A", "Node A", None, True),
    ]
    df = spark.createDataFrame(
        [(i, n, c) for i, n, c, _ in rows],
        "id string, name string, category array<string>",
    )
    valid, errors = validate_nodes(df)
    got = {r["id"]: r for r in valid.collect()}
    assert set(got) == {i for i, _, _, s in rows if s}
    for r in got.values():
        assert r["category"][0] in ("biolink:NamedThing",)
    assert errors.count() == sum(1 for *_, s in rows if not s)


def test_validate_edge_reference_rows(spark):
    """Incorrect edges (missing any of s/p/o) drop with errors; correct
    edges survive with zero errors."""
    df = spark.createDataFrame(
        [
            (None, "biolink:related_to", None),
            ("A", "biolink:related_to", None),
            ("A", None, "B"),
            ("A", "biolink:related_to", "B"),
        ],
        "subject string, predicate string, object string",
    )
    valid, errors = validate_edges(df)
    assert [(r["subject"], r["object"]) for r in valid.collect()] == [("A", "B")]
    assert errors.count() > 0


def test_unsupported_filter_type_rejects_all(spark):
    """test_source.py::test_incorrect_node_filters/_edge_filters — a filter
    value that is neither a collection nor a scalar (the reference's
    else-branch, source.py:72-78) fails every record instead of crashing."""
    from kgx_spark.operators.filters import apply_edge_filters, apply_node_filters

    nodes = spark.createDataFrame(
        [("hgnc:1234", "some node", "don't care!")],
        "id string, name string, some_field string",
    )
    assert apply_node_filters(nodes, {"some_field": {"bad_node_filter": 1}}).count() == 0
    edges = spark.createDataFrame(
        [("A", "biolink:related_to", "B", "don't care here either!")],
        "subject string, predicate string, object string, some_field string",
    )
    assert apply_edge_filters(edges, {"some_field": {"bad_edge_filter": 1}}).count() == 0


def _check_filter_port(filters, record):
    """Verbatim port of the reference's check_node_filter/check_edge_filter
    shared kernel (kgx/source/source.py:42-134, minus the log side-effect):
    AND of per-key terms; collection filter = any-overlap with the record
    value; str filter = equality; missing key or unsupported filter type =
    fail."""
    if not filters:
        return True
    for k, v in filters.items():
        if k in record and record[k] is not None:
            if isinstance(v, (list, set, tuple)):
                if not any(x in record[k] for x in v):
                    return False
            elif isinstance(v, str):
                if record[k] != v:
                    return False
            else:
                return False
        else:
            return False
    return True


def test_filter_differential_vs_reference_kernel(spark):
    """Grid differential: every filter shape the reference supports, over a
    node table mixing list/scalar values, missing keys, and nulls — the
    Spark filter must keep exactly the ids the ported kernel keeps."""
    from kgx_spark.operators.filters import apply_node_filters

    rows = [
        ("n1", ["biolink:Gene"], "alpha", "infores:a"),
        ("n2", ["biolink:Gene", "biolink:Protein"], "beta", "infores:b"),
        ("n3", ["biolink:Disease"], "alpha", None),
        ("n4", None, "gamma", "infores:a"),
        ("n5", [], "alpha", "infores:c"),
        ("n6", ["biolink:Protein"], None, "infores:b"),
    ]
    df = spark.createDataFrame(
        rows, "id string, category array<string>, name string, provided_by string"
    )
    filter_grid = [
        {"category": {"biolink:Gene"}},
        {"category": ["biolink:Gene", "biolink:Disease"]},
        {"name": "alpha"},
        {"category": {"biolink:Gene"}, "name": "alpha"},
        {"provided_by": "infores:a"},
        {"category": {"biolink:Unknown"}},
        {"missing_key": "x"},
        {"name": {"bad": 1}},  # unsupported type
        {},
    ]
    for filters in filter_grid:
        expected = {
            r[0]
            for r in rows
            if _check_filter_port(
                filters, {"id": r[0], "category": r[1], "name": r[2], "provided_by": r[3]}
            )
        }
        got = {r["id"] for r in apply_node_filters(df, filters).collect()}
        assert got == expected, (filters, got, expected)
