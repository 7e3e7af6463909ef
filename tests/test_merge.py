"""Merge semantics vs reference tests/unit/test_graph_merge.py:115-156.

The reference fixture: two graphs with overlapping node ids and conflicting
non-core props; expectations (ported, with our documented determinism
normalizations — lists sorted, conflict-promotion '|'-encoded):
- merged node count == distinct ids; merged edge count == distinct (s,p,o);
- provided_by union across graphs;
- conflicting non-core scalar promoted to joined list (preserve=True);
- core properties (name) keep the first graph's value.
"""

import pyspark.sql.functions as F

from kgx_spark.operators.merge import merge_edges, merge_graphs, merge_nodes


def _g1(spark):
    nodes = spark.createDataFrame(
        [
            ("x1", "node x1", ["biolink:NamedThing"], ["Graph 1"], "1"),
            ("x2", "node x2", ["biolink:NamedThing"], ["Graph 1"], None),
        ],
        "id string, name string, category array<string>, provided_by array<string>, p1 string",
    )
    edges = spark.createDataFrame(
        [
            ("x1", "biolink:related_to", "x2", ["Graph 1"], "r1"),
            ("x1", "biolink:related_to", "x3", ["Graph 1"], None),
        ],
        "subject string, predicate string, object string, provided_by array<string>, p1 string",
    )
    return nodes, edges


def _g2(spark):
    nodes = spark.createDataFrame(
        [
            ("x1", "node x1 (updated)", ["biolink:Gene"], ["Graph 2"], "a"),
            ("x3", "node x3", ["biolink:NamedThing"], ["Graph 2"], None),
        ],
        "id string, name string, category array<string>, provided_by array<string>, p1 string",
    )
    edges = spark.createDataFrame(
        [
            ("x1", "biolink:related_to", "x2", ["Graph 2"], "r2"),
        ],
        "subject string, predicate string, object string, provided_by array<string>, p1 string",
    )
    return nodes, edges


def test_merge_nodes_counts_and_union(spark):
    merged = merge_nodes([_g1(spark)[0], _g2(spark)[0]])
    rows = {r["id"]: r for r in merged.collect()}
    assert set(rows) == {"x1", "x2", "x3"}
    x1 = rows["x1"]
    # multivalued union, sorted (prepare_data_dict kgx_utils.py:608-640)
    assert x1["provided_by"] == ["Graph 1", "Graph 2"]
    assert x1["category"] == ["biolink:Gene", "biolink:NamedThing"]
    # core property never modified: first-seen wins (kgx_utils.py:580-585)
    assert x1["name"] == "node x1"
    # conflicting non-core scalar promoted (kgx_utils.py:642-660), '|'-encoded
    assert x1["p1"] == "1|a"
    # non-conflicting scalar stays scalar
    assert rows["x2"]["p1"] is None


def test_merge_nodes_overwrite_mode(spark):
    merged = merge_nodes([_g1(spark)[0], _g2(spark)[0]], preserve=False)
    x1 = {r["id"]: r for r in merged.collect()}["x1"]
    assert x1["p1"] == "a"  # overwrite with the incoming (later) graph's value


def test_merge_edges_dedup_and_provenance(spark):
    merged = merge_edges([_g1(spark)[1], _g2(spark)[1]])
    assert merged.count() == 2  # (x1,rt,x2) deduped, (x1,rt,x3) kept
    e = merged.where(F.col("object") == "x2").first()
    assert e["provided_by"] == ["Graph 1", "Graph 2"]
    assert e["p1"] == "r1|r2"
    assert e["id"] is not None and len(e["id"]) == 64


def test_merge_graphs_end_to_end(spark):
    nodes, edges = merge_graphs([_g1(spark), _g2(spark)])
    assert nodes.count() == 3
    assert edges.count() == 2
