"""Graph rewrite ops vs reference tests/unit/test_graph_operations.py semantics."""

import pyspark.sql.functions as F
import pytest

from kgx_spark.operators.graph_ops import (
    fold_predicate,
    node_degree,
    remap_edge_property,
    remap_node_identifier,
    remap_node_property,
    remove_singleton_nodes,
    unfold_node_property,
)


@pytest.fixture()
def graph(spark):
    nodes = spark.createDataFrame(
        [
            ("HGNC:1", "gene one", ["biolink:Gene"], ["NCBIGene:101"], "NCBITaxon:9606"),
            ("HGNC:2", "gene two", ["biolink:Gene"], ["NCBIGene:102"], None),
            ("MONDO:1", "disease one", ["biolink:Disease"], None, None),
            ("ORPHAN:1", "orphan", ["biolink:NamedThing"], None, None),
        ],
        "id string, name string, category array<string>, xref array<string>, taxon string",
    )
    edges = spark.createDataFrame(
        [
            ("HGNC:1", "biolink:related_to", "MONDO:1"),
            ("HGNC:2", "biolink:interacts_with", "HGNC:1"),
            ("HGNC:1", "biolink:in_taxon", "NCBITaxon:9606"),
        ],
        "subject string, predicate string, object string",
    )
    return nodes, edges


def test_remap_node_identifier(spark, graph):
    nodes, edges = graph
    n2, e2 = remap_node_identifier(nodes, edges, "biolink:Gene", "xref", prefix="NCBIGene")
    ids = {r["id"] for r in n2.collect()}
    assert "NCBIGene:101" in ids and "NCBIGene:102" in ids and "HGNC:1" not in ids
    e = {(r["subject"], r["object"]) for r in e2.collect()}
    assert ("NCBIGene:101", "MONDO:1") in e
    assert ("NCBIGene:102", "NCBIGene:101") in e


def test_remap_node_property(spark, graph):
    nodes, _ = graph
    out = remap_node_property(nodes, "biolink:Gene", "taxon", "name")
    rows = {r["id"]: r["taxon"] for r in out.collect()}
    assert rows["HGNC:1"] == "gene one"
    assert rows["MONDO:1"] is None  # category not matched → untouched


def test_remap_core_property_protected(spark, graph):
    nodes, edges = graph
    with pytest.raises(ValueError):
        remap_node_property(nodes, "biolink:Gene", "id", "name")
    with pytest.raises(ValueError):
        remap_edge_property(edges, "biolink:related_to", "subject", "object")


def test_fold_predicate(spark, graph):
    nodes, edges = graph
    n2, e2 = fold_predicate(nodes, edges, "biolink:in_taxon", remove_prefix=True)
    assert e2.where(F.col("predicate") == "biolink:in_taxon").count() == 0
    row = n2.where(F.col("id") == "HGNC:1").first()
    assert row["in_taxon"] == "NCBITaxon:9606"


def test_unfold_node_property(spark, graph):
    nodes, edges = graph
    n2, e2 = unfold_node_property(nodes, edges, "taxon", prefix="biolink")
    assert "taxon" not in n2.columns
    new = e2.where(F.col("predicate") == "biolink:taxon").collect()
    assert len(new) == 1
    assert (new[0]["subject"], new[0]["object"]) == ("HGNC:1", "NCBITaxon:9606")


def test_remove_singleton_nodes(spark, graph):
    nodes, edges = graph
    out = remove_singleton_nodes(nodes, edges)
    ids = {r["id"] for r in out.collect()}
    assert "ORPHAN:1" not in ids
    assert len(ids) == 3


def test_node_degree(spark, graph):
    nodes, edges = graph
    deg = {r["id"]: (r["in_degree"], r["out_degree"]) for r in node_degree(nodes, edges).collect()}
    assert deg["HGNC:1"] == (1, 2)
    assert deg["ORPHAN:1"] == (0, 0)
