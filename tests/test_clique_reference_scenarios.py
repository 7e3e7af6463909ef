"""The reference's nine clique_merge scenarios, ported verbatim
(tests/unit/test_clique_merge.py:106-760) against our distributed
clique_merge — same graphs, same prefix-prioritization map, same expected
node/edge sets and leader same_as contents.

The reference passes ``prefix_prioritization_map={"biolink:Gene": [...]}``
(priority selected by the elected clique category) and defaults
``strict=True``; both are mirrored here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgx_spark.operators.clique import clique_merge

PPM = {"biolink:Gene": ["HGNC", "NCBIGene", "ENSEMBL", "OMIM"]}
SAME = {"predicate": "biolink:same_as", "relation": "owl:equivalentClass"}


def _run(spark, node_rows, edge_rows, strict=True):
    nodes = spark.createDataFrame(
        [(i, c, s) for i, c, s in node_rows],
        "id string, category array<string>, same_as array<string>",
    )
    edges = spark.createDataFrame(
        [(s, "biolink:same_as", o, "owl:equivalentClass") for s, o in edge_rows],
        "subject string, predicate string, object string, relation string",
    )
    n, e, _ = clique_merge(
        nodes, edges, prefix_prioritization_map=PPM, strict=strict
    )
    nmap = {r["id"]: r.asDict() for r in n.collect()}
    erows = [(r["subject"], r["object"]) for r in e.collect()]
    return nmap, erows


# the two-clique graph shared by scenarios 1-7: clique A around HGNC:1,
# clique B around NCBIGene:8
EDGES_A = [("ENSEMBL:4", "HGNC:1"), ("NCBIGene:3", "HGNC:1"), ("OMIM:2", "HGNC:1")]
EDGES_B = [("ENSEMBL:6", "NCBIGene:8"), ("HGNC:7", "NCBIGene:8")]


def test_scenario1_all_valid(spark):
    nmap, erows = _run(
        spark,
        [
            ("HGNC:1", ["biolink:Gene"], None),
            ("OMIM:2", ["biolink:Gene"], None),
            ("NCBIGene:3", ["biolink:Gene"], None),
            ("ENSEMBL:4", ["biolink:Gene"], None),
            ("ENSEMBL:6", ["biolink:Gene"], None),
            ("HGNC:7", ["biolink:Gene"], None),
            ("NCBIGene:8", ["biolink:Gene"], None),
        ],
        EDGES_A + EDGES_B,
    )
    assert set(nmap) == {"HGNC:1", "HGNC:7"}
    assert not erows
    assert {"OMIM:2", "NCBIGene:3", "ENSEMBL:4"} <= set(nmap["HGNC:1"]["same_as"])
    assert {"ENSEMBL:6", "NCBIGene:8"} <= set(nmap["HGNC:7"]["same_as"])


def test_scenario2_less_specific_category(spark):
    nmap, erows = _run(
        spark,
        [
            ("HGNC:1", ["biolink:Gene"], None),
            ("OMIM:2", ["biolink:NamedThing"], None),
            ("NCBIGene:3", ["biolink:NamedThing"], None),
            ("ENSEMBL:4", ["biolink:Gene"], None),
            ("ENSEMBL:6", ["biolink:Gene"], None),
            ("HGNC:7", ["biolink:NamedThing"], None),
            ("NCBIGene:8", ["biolink:Gene"], None),
        ],
        EDGES_A + EDGES_B,
    )
    assert set(nmap) == {"HGNC:1", "HGNC:7"}
    assert not erows


def test_scenario3_non_biolink_category(spark):
    nmap, erows = _run(
        spark,
        [
            ("HGNC:1", ["biolink:Gene"], None),
            ("OMIM:2", ["biolink:NamedThing", "Node"], None),
            ("NCBIGene:3", ["biolink:NamedThing"], None),
            ("ENSEMBL:4", ["biolink:Gene"], None),
            ("ENSEMBL:6", ["biolink:Gene"], None),
            ("HGNC:7", ["biolink:NamedThing"], None),
            ("NCBIGene:8", ["biolink:NamedThing", "Node"], None),
        ],
        EDGES_A + EDGES_B,
    )
    # a non-biolink category is annotated, never evicted
    assert set(nmap) == {"HGNC:1", "HGNC:7"}
    assert not erows


CONFLICT_NODES = [
    ("HGNC:1", ["biolink:Gene"], None),
    ("OMIM:2", ["biolink:Gene", "biolink:Disease"], None),
    ("NCBIGene:3", ["biolink:NamedThing"], None),
    ("ENSEMBL:4", ["biolink:Gene"], None),
    ("ENSEMBL:6", ["biolink:Gene"], None),
    ("HGNC:7", ["biolink:NamedThing"], None),
    ("NCBIGene:8", ["biolink:Gene", "biolink:Disease"], None),
]


def test_scenario4_conflicting_categories_strict(spark):
    nmap, erows = _run(spark, CONFLICT_NODES, EDGES_A + EDGES_B, strict=True)
    assert set(nmap) == {"HGNC:1", "HGNC:7", "OMIM:2", "ENSEMBL:6", "NCBIGene:8"}
    assert sorted(erows) == sorted(
        [("OMIM:2", "HGNC:1"), ("ENSEMBL:6", "NCBIGene:8"), ("HGNC:7", "NCBIGene:8")]
    )
    n1 = nmap["HGNC:1"]
    assert "OMIM:2" not in n1["same_as"]
    assert {"NCBIGene:3", "ENSEMBL:4"} <= set(n1["same_as"])
    assert nmap["HGNC:7"]["same_as"] == []


def test_scenario5_conflicting_categories_lenient(spark):
    nmap, erows = _run(spark, CONFLICT_NODES, EDGES_A + EDGES_B, strict=False)
    assert set(nmap) == {"HGNC:1", "HGNC:7"}
    assert not erows
    assert {"OMIM:2", "NCBIGene:3", "ENSEMBL:4"} <= set(nmap["HGNC:1"]["same_as"])
    assert {"ENSEMBL:6", "NCBIGene:8"} <= set(nmap["HGNC:7"]["same_as"])


def test_scenario6_disjoint_participant(spark):
    nmap, erows = _run(
        spark,
        [
            ("HGNC:1", ["biolink:Gene"], None),
            ("OMIM:2", ["biolink:Disease"], None),
            ("NCBIGene:3", ["biolink:NamedThing"], None),
            ("ENSEMBL:4", ["biolink:Gene"], None),
            ("ENSEMBL:6", ["biolink:Gene"], None),
            ("HGNC:7", ["biolink:NamedThing"], None),
            ("NCBIGene:8", ["biolink:Disease"], None),
        ],
        EDGES_A + EDGES_B,
    )
    assert set(nmap) == {"HGNC:1", "HGNC:7", "OMIM:2", "ENSEMBL:6", "NCBIGene:8"}
    assert len(erows) == 3
    n1 = nmap["HGNC:1"]
    assert {"NCBIGene:3", "ENSEMBL:4"} <= set(n1["same_as"])
    assert "OMIM:2" not in n1["same_as"]
    n2 = nmap["HGNC:7"]
    assert "ENSEMBL:6" not in (n2["same_as"] or [])
    assert "NCBIGene:8" not in (n2["same_as"] or [])


def test_scenario7_disjoint_nonbridge(spark):
    nmap, erows = _run(
        spark,
        [
            ("HGNC:1", ["biolink:Gene"], None),
            ("OMIM:2", ["biolink:Disease"], None),
            ("NCBIGene:3", ["biolink:NamedThing"], None),
            ("ENSEMBL:4", ["biolink:Gene"], None),
            ("ENSEMBL:6", ["biolink:Gene"], None),
            ("HGNC:7", ["biolink:Disease"], None),
            ("NCBIGene:8", ["biolink:Gene"], None),
        ],
        EDGES_A + EDGES_B,
    )
    # HGNC:7 (Disease) evicted; ENSEMBL:6 still reaches NCBIGene:8, which
    # wins the ppm election (NCBIGene before ENSEMBL)
    assert set(nmap) == {"HGNC:1", "OMIM:2", "HGNC:7", "NCBIGene:8"}
    assert len(erows) == 2
    assert "ENSEMBL:6" in nmap["NCBIGene:8"]["same_as"]
    assert "OMIM:2" not in nmap["HGNC:1"]["same_as"]


def test_scenario8_sameas_node_and_edge_props(spark):
    nmap, erows = _run(
        spark,
        [
            ("HGNC:1", ["biolink:Gene"], None),
            ("OMIM:2", ["biolink:Gene"], ["HGNC:1"]),
            ("NCBIGene:3", ["biolink:NamedThing"], None),
            ("ENSEMBL:4", ["biolink:Gene"], ["HGNC:1"]),
            ("ENSEMBL:6", ["biolink:Gene"], ["NCBIGene:8"]),
            ("HGNC:7", ["biolink:Gene"], None),
            ("NCBIGene:8", ["biolink:Gene"], None),
        ],
        [("NCBIGene:3", "HGNC:1"), ("ENSEMBL:6", "NCBIGene:8"), ("HGNC:7", "NCBIGene:8")],
    )
    assert set(nmap) == {"HGNC:1", "HGNC:7"}
    assert not erows
    assert {"OMIM:2", "NCBIGene:3", "ENSEMBL:4"} <= set(nmap["HGNC:1"]["same_as"])
    assert {"ENSEMBL:6", "NCBIGene:8"} <= set(nmap["HGNC:7"]["same_as"])


def test_scenario9_invalid_node_in_sameas_chain(spark):
    nmap, erows = _run(
        spark,
        [
            ("HGNC:1", ["biolink:Gene"], None),
            ("OMIM:2", ["biolink:Disease"], ["HGNC:1"]),
            ("NCBIGene:3", ["biolink:NamedThing"], None),
            ("ENSEMBL:4", ["biolink:Gene"], ["HGNC:1"]),
            ("ENSEMBL:6", ["biolink:Gene"], ["NCBIGene:8"]),
            ("HGNC:7", ["biolink:Gene"], None),
            ("NCBIGene:8", ["biolink:Gene"], None),
            ("X:00001", None, None),  # no category: borrows OMIM:2's Disease
        ],
        [
            ("X:00001", "OMIM:2"),
            ("NCBIGene:3", "HGNC:1"),
            ("ENSEMBL:6", "NCBIGene:8"),
            ("HGNC:7", "NCBIGene:8"),
        ],
    )
    assert set(nmap) == {"HGNC:1", "HGNC:7", "OMIM:2", "X:00001"}
    assert erows == [("X:00001", "OMIM:2")]
    n1 = nmap["HGNC:1"]
    assert "OMIM:2" not in n1["same_as"]
    assert {"NCBIGene:3", "ENSEMBL:4"} <= set(n1["same_as"])
    assert {"ENSEMBL:6", "NCBIGene:8"} <= set(nmap["HGNC:7"]["same_as"])
