"""The reference's graph-operation test vectors, ported verbatim
(tests/unit/test_graph_operations.py:14-400) — same input graphs, same
expected nodes/edges/properties.

Divergence kept: core-property protection raises ValueError here where the
reference raises AttributeError (both refuse; the exception class is an
implementation detail)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgx_spark.operators.graph_ops import (
    fold_predicate,
    remap_edge_property,
    remap_node_identifier,
    remap_node_property,
    remove_singleton_nodes,
    unfold_node_property,
)


def _g1_2(spark):
    """get_graphs1()[1]: the fold/unfold graph."""
    nodes = spark.createDataFrame(
        [
            ("HGNC:12345", "Test Gene", ["biolink:NamedThing"], "NCBIGene:54321", "UniProtKB:54321"),
            ("B", "Node B", ["biolink:NamedThing"], "Z", None),
            ("C", "Node C", ["biolink:NamedThing"], None, None),
        ],
        "id string, name string, category array<string>, alias string, same_as string",
    )
    edges = spark.createDataFrame(
        [
            ("C", "biolink:subclass_of", "B", "rdfs:subClassOf"),
            ("B", "biolink:subclass_of", "A", "rdfs:subClassOf"),
            ("C", "biolink:exact_match", "c", "skos:exactMatch"),
        ],
        "subject string, predicate string, object string, relation string",
    )
    return nodes, edges


def _graphs2(spark):
    """get_graphs2(): [alias graph, xref graph]."""
    g1_nodes = spark.createDataFrame(
        [
            ("HGNC:12345", "Test Gene", ["biolink:NamedThing"], "NCBIGene:54321", "UniProtKB:54321"),
            ("B", "Node B", ["biolink:NamedThing"], "Z", None),
            ("C", "Node C", ["biolink:NamedThing"], None, None),
        ],
        "id string, name string, category array<string>, alias string, same_as string",
    )
    # the reference graph carries publications=[1] (ints) next to
    # pubs=["PMID:..."]; a DataFrame column has ONE type, so the int rides
    # as its string form — the remap semantics under test are unaffected
    g1_edges = spark.createDataFrame(
        [
            ("C", "biolink:subclass_of", "B", ["1"], ["PMID:123456"]),
            ("B", "biolink:subclass_of", "A", None, None),
        ],
        "subject string, predicate string, object string, publications array<string>, pubs array<string>",
    )
    g2_nodes = spark.createDataFrame(
        [
            ("A", ["biolink:Gene"], ["NCBIGene:12345", "HGNC:001033"]),
            ("B", ["biolink:Gene"], ["NCBIGene:56463", "HGNC:012901"]),
            ("C", ["biolink:Gene", "biolink:NamedThing"], ["NCBIGene:08239", "HGNC:103431"]),
            ("D", ["biolink:Gene"], ["HGNC:394233"]),
            ("E", ["biolink:NamedThing"], ["NCBIGene:X", "HGNC:X"]),
            ("F", ["biolink:NamedThing"], ["HGNC:Y"]),
        ],
        "id string, category array<string>, xref array<string>",
    )
    g2_edges = spark.createDataFrame(
        [
            ("B", "biolink:subclass_of", "A"),
            ("B", "biolink:related_to", "A"),
            ("D", "biolink:related_to", "A"),
            ("E", "biolink:related_to", "A"),
            ("E", "biolink:related_to", "F"),
        ],
        "subject string, predicate string, object string",
    )
    return (g1_nodes, g1_edges), (g2_nodes, g2_edges)


def test_fold_predicate_vectors(spark):
    nodes, edges = _g1_2(spark)
    n, e = fold_predicate(nodes, edges, "biolink:exact_match")
    assert e.where((F.col("subject") == "C") & (F.col("object") == "c")).count() == 0
    c = {r["id"]: r.asDict() for r in n.collect()}["C"]
    assert c["biolink:exact_match"] == "c"

    n2, _ = fold_predicate(nodes, edges, "biolink:exact_match", remove_prefix=True)
    c2 = {r["id"]: r.asDict() for r in n2.collect()}["C"]
    assert c2["exact_match"] == "c"


@pytest.mark.parametrize("prefix,expected_pred", [(None, "same_as"), ("biolink", "biolink:same_as")])
def test_unfold_node_property_vectors(spark, prefix, expected_pred):
    nodes, edges = _g1_2(spark)
    n, e = unfold_node_property(nodes, edges, "same_as", prefix=prefix)
    assert "same_as" not in n.columns
    new = e.where(
        (F.col("subject") == "HGNC:12345") & (F.col("object") == "UniProtKB:54321")
    ).collect()
    assert len(new) == 1
    assert new[0]["predicate"] == expected_pred


def test_remove_singleton_nodes_vectors(spark):
    nodes = spark.createDataFrame(
        [(x,) for x in "ABCDXY"], "id string"
    )
    edges = spark.createDataFrame(
        [("A", "B"), ("B", "C"), ("C", "D"), ("B", "D")],
        "subject string, object string",
    )
    out = remove_singleton_nodes(nodes, edges)
    assert {r["id"] for r in out.collect()} == {"A", "B", "C", "D"}


def test_remap_node_identifier_alias_vectors(spark):
    (nodes, edges), _ = _graphs2(spark)
    n, e = remap_node_identifier(nodes, edges, "biolink:NamedThing", alternative_property="alias")
    ids = {r["id"] for r in n.collect()}
    assert {"NCBIGene:54321", "Z", "C"} <= ids
    keys = {(r["subject"], r["object"]) for r in e.collect()}
    assert ("C", "Z") in keys and ("Z", "A") in keys
    assert ("C", "B") not in keys and ("B", "A") not in keys


def test_remap_node_identifier_xref_vectors(spark):
    _, (nodes, edges) = _graphs2(spark)
    n, e = remap_node_identifier(
        nodes, edges, "biolink:Gene", alternative_property="xref", prefix="NCBIGene"
    )
    ids = {r["id"] for r in n.collect()}
    # A/B/C remap to their NCBIGene xrefs; D has no NCBIGene xref, E/F are
    # not biolink:Gene — all three keep their ids
    assert {"NCBIGene:12345", "NCBIGene:56463", "NCBIGene:08239", "D", "E", "F"} == ids
    keys = {(r["subject"], r["object"]) for r in e.collect()}
    assert ("NCBIGene:56463", "NCBIGene:12345") in keys
    assert ("D", "NCBIGene:12345") in keys
    assert ("E", "NCBIGene:12345") in keys
    assert ("E", "F") in keys


def test_remap_node_property_vectors(spark):
    (nodes, _), _ = _graphs2(spark)
    out = remap_node_property(
        nodes, category="biolink:NamedThing", old_property="alias", new_property="same_as"
    )
    r = {x["id"]: x.asDict() for x in out.collect()}
    assert r["HGNC:12345"]["alias"] == "UniProtKB:54321"
    with pytest.raises((ValueError, AttributeError)):
        remap_node_property(
            nodes, category="biolink:NamedThing", old_property="id", new_property="alias"
        )


def test_remap_edge_property_vectors(spark):
    (_, edges), _ = _graphs2(spark)
    out = remap_edge_property(
        edges, edge_predicate="biolink:subclass_of", old_property="publications", new_property="pubs"
    )
    e = [r.asDict() for r in out.where((F.col("subject") == "C") & (F.col("object") == "B")).collect()][0]
    assert e["publications"] == ["PMID:123456"]
    for core in ("subject", "object", "predicate"):
        with pytest.raises((ValueError, AttributeError)):
            remap_edge_property(
                edges, edge_predicate="biolink:subclass_of", old_property=core, new_property="pubs"
            )


# ------------------------------------------------------- summarize_graph
# (tests/unit/test_summarize_graph.py:140-224 vectors)


def test_summarize_graph_vectors(spark):
    from kgx_spark.operators.summary import summarize_graph

    # graph 1: 3 NamedThing nodes, 2 subclass edges
    n1 = spark.createDataFrame(
        [("A", ["biolink:NamedThing"]), ("B", ["biolink:NamedThing"]), ("C", ["biolink:NamedThing"])],
        "id string, category array<string>",
    )
    e1 = spark.createDataFrame(
        [("C", "biolink:subclass_of", "B"), ("B", "biolink:subclass_of", "A")],
        "subject string, predicate string, object string",
    )
    s = summarize_graph(n1, e1)
    assert s["node_stats"]["total_nodes"] == 3
    assert s["node_stats"]["node_categories"] == ["biolink:NamedThing"]
    assert s["node_stats"]["count_by_category"] == {
        "unknown": {"count": 0},
        "biolink:NamedThing": {"count": 3},
    }
    assert s["edge_stats"]["total_edges"] == 2
    assert s["edge_stats"]["count_by_predicates"] == {
        "unknown": {"count": 0},
        "biolink:subclass_of": {"count": 2},
    }
    assert s["edge_stats"]["count_by_spo"] == {
        "biolink:NamedThing-biolink:subclass_of-biolink:NamedThing": {"count": 2}
    }

    # graph 3: two uncategorized nodes and one same_as edge — everything
    # lands in the unknown buckets
    n3 = spark.createDataFrame([("F", None), ("E", None)], "id string, category array<string>")
    e3 = spark.createDataFrame(
        [("F", "biolink:same_as", "E")], "subject string, predicate string, object string"
    )
    s3 = summarize_graph(n3, e3)
    assert s3["node_stats"]["total_nodes"] == 2
    assert s3["node_stats"]["node_categories"] == []
    assert s3["node_stats"]["count_by_category"] == {"unknown": {"count": 2}}
    assert s3["edge_stats"]["count_by_predicates"] == {
        "unknown": {"count": 0},
        "biolink:same_as": {"count": 1},
    }
    assert s3["edge_stats"]["count_by_spo"] == {"unknown-biolink:same_as-unknown": {"count": 1}}
