"""Summary / meta-KG / validator aggregations (SURVEY.md §2.6)."""

import pyspark.sql.functions as F
import pytest

from kgx_spark.operators.meta_kg import meta_edge_stats, meta_node_stats
from kgx_spark.operators.summary import (
    count_by_category,
    count_by_id_prefix,
    count_by_predicate,
    count_by_spo_category,
    dangling_edges,
    duplicate_nodes,
    summarize_graph,
)
from kgx_spark.operators.validator import (
    error_report,
    validate_edge_records,
    validate_node_records,
)


@pytest.fixture()
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("HGNC:1", ["biolink:Gene"]),
            ("HGNC:2", ["biolink:Gene", "biolink:NamedThing"]),
            ("MONDO:1", ["biolink:Disease"]),
        ],
        "id string, category array<string>",
    )
    edges = spark.createDataFrame(
        [
            ("HGNC:1", "biolink:related_to", "MONDO:1"),
            ("HGNC:2", "biolink:related_to", "MONDO:1"),
            ("HGNC:1", "biolink:interacts_with", "HGNC:2"),
            ("HGNC:1", "biolink:related_to", "GHOST:1"),  # dangling
        ],
        "subject string, predicate string, object string",
    )
    return nodes, edges


def test_count_by_category(spark, graph):
    nodes, _ = graph
    counts = {r["category"]: r["count"] for r in count_by_category(nodes).collect()}
    assert counts == {"biolink:Gene": 2, "biolink:NamedThing": 1, "biolink:Disease": 1}


def test_count_by_id_prefix(spark, graph):
    nodes, _ = graph
    rows = {(r["category"], r["prefix"]): r["count"] for r in count_by_id_prefix(nodes).collect()}
    assert rows[("biolink:Gene", "HGNC")] == 2
    assert rows[("biolink:Disease", "MONDO")] == 1


def test_count_by_predicate(spark, graph):
    _, edges = graph
    counts = {r["predicate"]: r["count"] for r in count_by_predicate(edges).collect()}
    assert counts == {"biolink:related_to": 3, "biolink:interacts_with": 1}


def test_count_by_spo_category(spark, graph):
    nodes, edges = graph
    rows = {
        (r["subject_category"], r["predicate"], r["object_category"]): r["count"]
        for r in count_by_spo_category(edges, nodes).collect()
    }
    assert rows[("biolink:Gene", "biolink:related_to", "biolink:Disease")] == 2
    # multivalued category on HGNC:2 → counted under both categories
    assert rows[("biolink:Gene", "biolink:interacts_with", "biolink:Gene")] == 1
    assert rows[("biolink:Gene", "biolink:interacts_with", "biolink:NamedThing")] == 1
    # dangling edge has no object category → absent
    assert not any(k[2] is None for k in rows)


def test_duplicates_and_dangling(spark, graph):
    nodes, edges = graph
    dup = nodes.unionByName(nodes.limit(1))
    assert duplicate_nodes(dup).count() == 1
    d = dangling_edges(edges, nodes).collect()
    assert len(d) == 1 and d[0]["object"] == "GHOST:1"


def test_summarize_graph_rollup(spark, graph):
    nodes, edges = graph
    s = summarize_graph(nodes, edges)
    assert s["node_stats"]["total_nodes"] == 3
    assert s["edge_stats"]["total_edges"] == 4
    # reference YAML shape: counts nest as {"count": N} (summarize_graph.py)
    assert s["edge_stats"]["count_by_predicates"]["biolink:related_to"] == {"count": 3}
    assert s["edge_stats"]["count_by_predicates"]["unknown"] == {"count": 0}


def test_meta_node_stats(spark, graph):
    nodes, _ = graph
    rows = {r["category"]: r for r in meta_node_stats(nodes).collect()}
    assert rows["biolink:Gene"]["id_prefixes"] == ["HGNC"]
    assert rows["biolink:Gene"]["count"] == 2


def test_meta_edge_stats_excludes_invalid_predicate(spark, graph):
    nodes, edges = graph
    bad = spark.createDataFrame(
        [("HGNC:1", "NOT_A_PREDICATE", "MONDO:1")], "subject string, predicate string, object string"
    )
    rows = meta_edge_stats(edges.unionByName(bad), nodes).collect()
    preds = {r["predicate"] for r in rows}
    assert "NOT_A_PREDICATE" not in preds


def test_validator(spark):
    nodes = spark.createDataFrame(
        [
            ("HGNC:1", ["biolink:Gene"]),           # valid
            ("not a curie", ["biolink:Gene"]),      # invalid id
            ("HGNC:3", ["gene"]),                   # invalid category form
            ("HGNC:4", ["biolink:MadeUpThing"]),    # unknown category → error
        ],
        "id string, category array<string>",
    )
    errs = validate_node_records(nodes)
    by_msg = {r["message"]: r for r in error_report(errs).collect()}
    assert by_msg["Node property 'id' is expected to be of type 'CURIE'"][
        "entities"] == ["not a curie"]
    assert by_msg["Category 'gene' is not in CamelCase form"]["entities"] == ["HGNC:3"]
    unknown = by_msg["Category 'MadeUpThing' is unknown in the current Biolink Model"]
    assert unknown["entities"] == ["HGNC:4"] and unknown["level"] == "ERROR"

    edges = spark.createDataFrame(
        [
            ("HGNC:1", "biolink:related_to", "HGNC:2"),
            ("HGNC:1", "biolink:RelatedTo", "HGNC:2"),  # bad predicate form
        ],
        "subject string, predicate string, object string",
    )
    erep = {r["error_type"] for r in error_report(validate_edge_records(edges)).collect()}
    assert "INVALID_EDGE_PREDICATE" in erep


def test_knowledge_source_accepts_scalar_and_list(spark):
    """The reference's own declarations disagree on knowledge_source
    (column_types: str, drives its sanitizer; is_provenance_property_multivalued:
    True) — so reference-sanitized graphs carry either shape and the type
    battery must flag NEITHER (round-3 ADVICE). Other slots keep strict
    shape checks."""
    from kgx_spark.operators.validator import validate_property_types

    scalar = spark.createDataFrame(
        [("HGNC:1", "biolink:related_to", "HGNC:2", "infores:x")],
        "subject string, predicate string, object string, knowledge_source string",
    )
    listy = spark.createDataFrame(
        [("HGNC:1", "biolink:related_to", "HGNC:2", ["infores:x"])],
        "subject string, predicate string, object string, knowledge_source array<string>",
    )
    assert validate_property_types(scalar, "edge").count() == 0
    assert validate_property_types(listy, "edge").count() == 0
    # strictness preserved elsewhere: scalar primary_knowledge_source ok,
    # array form still errors (declared single-valued everywhere)
    bad = spark.createDataFrame(
        [("HGNC:1", "biolink:related_to", "HGNC:2", ["infores:x"])],
        "subject string, predicate string, object string, primary_knowledge_source array<string>",
    )
    msgs = [r["message"] for r in validate_property_types(bad, "edge").collect()]
    assert any("expected to be of type 'str'" in m for m in msgs)
