"""Clique category election (clique_merge.py:388-499 semantics)."""

import pyspark.sql.functions as F

from kgx_spark.operators.clique import clique_merge


def test_clique_category_election(spark):
    nodes = spark.createDataFrame(
        [
            ("HGNC:1", ["biolink:Gene"], ["NCBIGene:1"]),
            ("NCBIGene:1", ["biolink:NamedThing"], None),   # less specific member
            ("ENSEMBL:1", ["biolink:BiologicalEntity"], None),
        ],
        "id string, category array<string>, same_as array<string>",
    )
    edges = spark.createDataFrame(
        [("NCBIGene:1", "biolink:same_as", "ENSEMBL:1")],
        "subject string, predicate string, object string",
    )
    n, _, _ = clique_merge(
        nodes, edges, prefix_priority=["ENSEMBL", "HGNC", "NCBIGene"], update_categories=True
    )
    leader = n.where(F.col("id") == "ENSEMBL:1").first()
    # most specific category among members is biolink:Gene (depth 2)
    assert "biolink:Gene" in leader["category"]


def test_owl_source_gated(spark, tmp_path):
    import pytest

    from kgx_spark.sources.owl_source import read_owl

    try:
        import rdflib  # noqa: F401

        has_rdflib = True
    except ImportError:
        has_rdflib = False
    if not has_rdflib:
        with pytest.raises(NotImplementedError):
            read_owl(spark, str(tmp_path / "x.owl"))
