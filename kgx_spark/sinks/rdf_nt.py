"""N-Triples RDF sink.

Reference: kgx/sink/rdf_sink.py:55-603 — node properties become literal
triples; edges become either direct triples or reified rdf:Statement stanzas
(reify_all_edges — 214+); property typing via the biolink property-type map.

Spark design: every record explodes into term rows (s, p, o, o_literal)
via `graph_term_rows` — the serialization-independent triple stream —
then NT formats them as text (concat expressions, JVM-side) and
`df.write.text` writes distributed, unlike the reference's sequential
file append. The Jelly sink (sinks/jelly.py) encodes the SAME term rows
with the pure-Python codec instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgx_spark.utils import qcol
from pyspark.sql import types as T

from kgx_spark.functions.curie import expand

_BIOLINK = "https://w3id.org/biolink/vocab/"


def _lit_str(col):
    escaped = F.regexp_replace(col.cast("string"), r'(["\\])', r"\\$1")
    return F.concat(F.lit('"'), escaped, F.lit('"'))


def _node_term_rows(nodes: DataFrame, id_is_iri: bool = False) -> DataFrame:
    """Node properties → term rows (s, p, o, o_literal): s/p full IRIs,
    o a full IRI or the RAW literal lexical form (escaping is a concern of
    the serialization, not the term). ``id_is_iri`` skips the id expansion
    (reified statement nodes arrive pre-expanded)."""
    from kgx_spark.functions.biolink import SLOT_TYPES

    rows = []
    for field in nodes.schema.fields:
        if field.name == "id":
            continue
        pred = F.lit(f"{_BIOLINK}{field.name}")
        # uriorcurie-typed slots (category, xref, same_as, …) serialize as
        # resources, everything else as string literals — the reference
        # resolves this per property via get_type_for_property
        # (kgx_utils.py:509-546) inside rdf_sink's _prepare_object
        is_resource = SLOT_TYPES.get(field.name, ("string", False))[0] == "uriorcurie"
        if isinstance(field.dataType, T.ArrayType):
            base = (
                nodes.where(qcol(field.name).isNotNull())
                .select(F.col("id"), F.explode(qcol(field.name)).alias("v"))
            )
        else:
            base = nodes.where(qcol(field.name).isNotNull()).select(
                F.col("id"), qcol(field.name).alias("v")
            )
        rows.append(
            base.select(
                (F.col("id") if id_is_iri else expand(F.col("id"))).alias("s"),
                pred.alias("p"),
                (expand(F.col("v")) if is_resource else F.col("v").cast("string")).alias("o"),
                F.lit(not is_resource).alias("o_literal"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _stmt_iri(col):
    """Statement-node IRI from an edge id — the reference's uriref rules
    (rdf_sink.py:336-356): urn:* and full IRIs pass through, CURIEs expand,
    anything else lands in the DEFAULT namespace (the biolink vocab — the
    sink's prefix_map[''] entry)."""
    return (
        F.when(col.startswith("urn:"), col)
        .when(col.rlike("^[A-Za-z][A-Za-z0-9+.-]*://"), col)
        .when(col.contains(":"), expand(col))
        .otherwise(F.concat(F.lit(_BIOLINK), col))
    )


def _edge_term_rows(edges: DataFrame, reify: bool) -> DataFrame:
    """Edges → term rows. With ``reify`` the reference's write_edge shape
    (rdf_sink.py:214-266 + reify:555-593) is reproduced: the DIRECT
    (s, p, o) triple is still written (the reference's ecache), plus a
    statement node — the edge's own id via uriref rules, a fresh uuid in
    the reference when absent (deterministic sha urn here, keys.py
    rationale) — carrying rdf:type biolink:Association,
    biolink:subject/predicate/object role triples, and EVERY other edge
    property serialized exactly like node properties."""
    direct = edges.select(
        expand(F.col("subject")).alias("s"),
        expand(F.col("predicate")).alias("p"),
        expand(F.col("object")).alias("o"),
        F.lit(False).alias("o_literal"),
    )
    if not reify:
        return direct
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    if "id" in edges.columns:
        stmt_expr = _stmt_iri(F.col("id"))
    else:
        stmt_expr = F.concat(
            F.lit("urn:uuid:"),
            F.sha2(F.concat_ws("-", "subject", "predicate", "object"), 256),
        )
    tagged = edges.withColumn("_stmt", stmt_expr)
    parts = [direct]
    for role in ("subject", "predicate", "object"):
        parts.append(
            tagged.select(
                F.col("_stmt").alias("s"),
                F.lit(f"{_BIOLINK}{role}").alias("p"),
                expand(F.col(role)).alias("o"),
                F.lit(False).alias("o_literal"),
            )
        )
    parts.append(
        tagged.select(
            F.col("_stmt").alias("s"),
            F.lit(f"{rdf}type").alias("p"),
            F.lit(f"{_BIOLINK}Association").alias("o"),
            F.lit(False).alias("o_literal"),
        )
    )
    # remaining edge properties ride on the statement node exactly like
    # node properties (write_edge's prop loop skips id/association_id/
    # edge_key and overwrites type with Association — rdf_sink.py:238-240,589)
    skip = {"id", "subject", "predicate", "object", "type", "association_id", "edge_key", "_stmt"}
    prop_cols = [c for c in edges.columns if c not in skip]
    if prop_cols:
        stmt_nodes = tagged.select(
            F.col("_stmt").alias("id"), *[qcol(c).alias(c) for c in prop_cols]
        )
        parts.append(_node_term_rows(stmt_nodes, id_is_iri=True))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def graph_term_rows(
    nodes: DataFrame | None, edges: DataFrame | None, reify_all_edges: bool = False
) -> DataFrame:
    """The serialization-independent triple stream shared by the NT and
    Jelly sinks: (s, p, o, o_literal) with full IRIs / '_:' bnodes / raw
    literal lexical forms."""
    parts = []
    if nodes is not None:
        parts.append(_node_term_rows(nodes))
    if edges is not None:
        parts.append(_edge_term_rows(edges, reify_all_edges))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # a null object (e.g. a null array element) has no triple — previously
    # the NT formatter emitted a malformed '<s> <p> .' line for these
    return out.where(F.col("o").isNotNull())


def _format_nt(terms: DataFrame) -> DataFrame:
    s = F.col("s")
    o = F.col("o")
    s_fmt = F.when(s.startswith("_:"), s).otherwise(F.concat(F.lit("<"), s, F.lit(">")))
    o_fmt = (
        F.when(F.col("o_literal"), _lit_str(o))
        .when(o.startswith("_:"), o)
        .otherwise(F.concat(F.lit("<"), o, F.lit(">")))
    )
    p_fmt = F.concat(F.lit("<"), F.col("p"), F.lit(">"))
    return terms.select(F.concat_ws(" ", s_fmt, p_fmt, o_fmt, F.lit(".")).alias("value"))


def write_ntriples(
    nodes: DataFrame | None, edges: DataFrame | None, path: str, reify_all_edges: bool = False
) -> None:
    _format_nt(graph_term_rows(nodes, edges, reify_all_edges)).write.mode(
        "overwrite"
    ).text(path)
