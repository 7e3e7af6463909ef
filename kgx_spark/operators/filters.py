"""Node/edge filters, including the cross-entity category filter.

Reference: kgx/source/source.py
- check_node_filter (AND of per-key filters; set filter = any-overlap,
  string filter = equality): 42-85
- check_edge_filter (+ deferred subject/object_category): 87-134
- seen-node gating of edges: kgx/transformer.py:349-374
- graph-mode apply_node_filters/apply_edge_filters: kgx/utils/kgx_utils.py:705-765

The reference's _seen_nodes set + per-record membership test becomes two
left-semi joins (edges ⋈ passing-nodes on subject, then on object). At scale
the passing-node id set is usually small after a category filter — Spark/AQE
will broadcast it; otherwise it's a shuffled semi-join, still no driver state.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _filter_expr(df: DataFrame, key: str, value: Any) -> Column:
    """One filter term (source.py:54-80): set vs scalar, list-col vs scalar-col.

    Unsupported filter-value types (dict, None, arbitrary objects) reject
    every record, as the reference's else-branch does after logging an
    INVALID_*_PROPERTY error (source.py:72-78, pinned by
    test_source.py::test_incorrect_node_filters). Scalars beyond str are a
    documented superset — the reference's str-only equality branch would
    reject int/float/bool filters that YAML configs can plausibly carry."""
    field = dict((f.name, f.dataType) for f in df.schema.fields).get(key)
    if field is None:
        return F.lit(False)  # missing property ⇒ fail (source.py:81-84)
    col = F.col(key)
    if isinstance(value, (set, frozenset, list, tuple)):
        lit_arr = F.array(*[F.lit(v) for v in value])
        if isinstance(field, T.ArrayType):
            return F.arrays_overlap(col, lit_arr)
        return col.isin(*list(value))
    if not isinstance(value, (str, int, float, bool)):
        return F.lit(False)  # unsupported filter type ⇒ fail (source.py:72-78)
    if isinstance(field, T.ArrayType):
        return F.array_contains(col, value)
    return col == value


def apply_node_filters(nodes: DataFrame, node_filters: Mapping[str, Any]) -> DataFrame:
    """AND of all filters (source.py:42-85)."""
    out = nodes
    for k, v in node_filters.items():
        out = out.where(_filter_expr(out, k, v))
    return out


def apply_edge_filters(
    edges: DataFrame,
    edge_filters: Mapping[str, Any],
    nodes: DataFrame | None = None,
) -> DataFrame:
    """AND of all edge filters; subject_category/object_category resolved via
    semi-joins against the (category-filtered) node catalog
    (source.py:87-134 + transformer.py:349-374)."""
    out = edges
    deferred = {}
    for k, v in edge_filters.items():
        if k in ("subject_category", "object_category"):
            deferred[k] = v
            continue
        out = out.where(_filter_expr(out, k, v))
    for k, v in deferred.items():
        if nodes is None:
            raise ValueError(f"{k} filter requires the node catalog")
        passing = apply_node_filters(nodes, {"category": v}).select("id")
        endpoint = "subject" if k == "subject_category" else "object"
        out = out.join(passing, out[endpoint] == passing["id"], "left_semi")
    return out


def remove_dangling_edges(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Keep only edges whose endpoints exist in the node catalog
    (the reference detects these as 'dangling edges' — summarize_graph.py:579-601)."""
    ids = nodes.select("id")
    out = edges.join(ids, edges["subject"] == ids["id"], "left_semi")
    return out.join(ids, out["object"] == ids["id"], "left_semi")
