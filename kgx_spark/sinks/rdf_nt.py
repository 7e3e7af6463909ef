"""N-Triples RDF sink.

Reference: kgx/sink/rdf_sink.py:55-603 — node properties become literal
triples; edges become either direct triples or reified rdf:Statement stanzas
(reify_all_edges — 214+); property typing via the biolink property-type map.

Spark design: every record explodes into NT-formatted text rows
(concat expressions, JVM-side) and `df.write.text` — a distributed writer,
unlike the reference's sequential file append. Jelly is out of scope
(driver-side library format).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgx_spark.functions.curie import expand

_BIOLINK = "https://w3id.org/biolink/vocab/"


def _iri(col):
    return F.concat(F.lit("<"), expand(col), F.lit(">"))


def _lit_str(col):
    escaped = F.regexp_replace(col.cast("string"), r'(["\\])', r"\\$1")
    return F.concat(F.lit('"'), escaped, F.lit('"'))


def _node_triples(nodes: DataFrame) -> DataFrame:
    from kgx_spark.functions.biolink import SLOT_TYPES

    rows = []
    for field in nodes.schema.fields:
        if field.name == "id":
            continue
        pred = F.lit(f"<{_BIOLINK}{field.name}>")
        # uriorcurie-typed slots (category, xref, same_as, …) serialize as
        # resources, everything else as string literals — the reference
        # resolves this per property via get_type_for_property
        # (kgx_utils.py:509-546) inside rdf_sink's _prepare_object
        is_resource = SLOT_TYPES.get(field.name, ("string", False))[0] == "uriorcurie"
        fmt = _iri if is_resource else _lit_str
        if isinstance(field.dataType, T.ArrayType):
            val = F.explode(F.col(field.name))
            rows.append(
                nodes.where(F.col(field.name).isNotNull())
                .select(F.col("id"), val.alias("v"))
                .select(F.concat_ws(" ", _iri(F.col("id")), pred, fmt(F.col("v")), F.lit(".")).alias("value"))
            )
        else:
            rows.append(
                nodes.where(F.col(field.name).isNotNull())
                .select(F.concat_ws(" ", _iri(F.col("id")), pred, fmt(F.col(field.name)), F.lit(".")).alias("value"))
            )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def _edge_triples(edges: DataFrame, reify: bool) -> DataFrame:
    direct = edges.select(
        F.concat_ws(" ", _iri(F.col("subject")), _iri(F.col("predicate")), _iri(F.col("object")), F.lit(".")).alias("value")
    )
    if not reify:
        return direct
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    stmt = F.concat(F.lit("_:e"), F.sha2(F.concat_ws("-", "subject", "predicate", "object"), 256))
    parts = []
    for role, col in (("subject", "subject"), ("predicate", "predicate"), ("object", "object")):
        parts.append(
            edges.select(F.concat_ws(" ", stmt, F.lit(f"<{rdf}{role}>"), _iri(F.col(col)), F.lit(".")).alias("value"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.unionByName(
        edges.select(F.concat_ws(" ", stmt, F.lit(f"<{rdf}type>"), F.lit(f"<{rdf}Statement>"), F.lit(".")).alias("value"))
    )


def write_ntriples(
    nodes: DataFrame | None, edges: DataFrame | None, path: str, reify_all_edges: bool = False
) -> None:
    parts = []
    if nodes is not None:
        parts.append(_node_triples(nodes))
    if edges is not None:
        parts.append(_edge_triples(edges, reify_all_edges))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").text(path)
