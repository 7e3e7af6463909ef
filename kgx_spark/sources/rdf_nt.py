"""N-Triples RDF source — distributed line-wise triple parse.

Reference: kgx/source/rdf_source.py:128-355 — a custom streaming NT parser
with per-triple dispatch (node property vs edge vs reified-statement),
CURIE contraction, and dereification of rdf:Statement stanzas.

Spark design (no rdflib on executors):
- `spark.read.text` → one regexp per line extracts (s, p, o, o_is_literal);
  NT is line-delimited so the scan parallelizes perfectly;
- CURIE contraction via the generated longest-prefix-match expression;
- dispatch is a partition of the triples DataFrame by predicate class:
  * property predicates (literal objects or known node-property IRIs)
    → groupBy(subject).pivot-style agg into node columns;
  * rdf:subject/rdf:predicate/rdf:object stanzas → dereified into edges
    (groupBy statement id, first() per role — rdf_source.py:330-355);
  * everything else → plain edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx_spark.functions.curie import contract
from kgx_spark.functions.keys import generate_edge_identifiers
from kgx_spark.operators.validate import validate_edges, validate_nodes

# <s>|_:b <p> <o>|_:b|"literal"(^^<dt>|@lang)? .
# groups: 1 s_iri, 2 s_bnode, 3 p, 4 o_iri, 5 o_bnode, 6 o_literal
_NT_RE = (
    r'^(?:<([^>]+)>|(_:\S+))\s+<([^>]+)>\s+'
    r'(?:<([^>]+)>|(_:\S+)|"((?:[^"\\]|\\.)*)"(?:\^\^<[^>]+>|@[A-Za-z\-]+)?)\s*\.\s*$'
)

# node-property predicate IRIs → KGX property (rdf_source.py:64-90 property map)
_NODE_PROPERTY_IRIS = {
    "http://www.w3.org/2000/01/rdf-schema#label": "name",
    "http://purl.org/dc/elements/1.1/description": "description",
    "http://purl.org/dc/terms/description": "description",
    "https://w3id.org/biolink/vocab/description": "description",
    "https://w3id.org/biolink/vocab/name": "name",
    "https://w3id.org/biolink/vocab/category": "category",
    "https://w3id.org/biolink/vocab/provided_by": "provided_by",
    "https://w3id.org/biolink/vocab/same_as": "same_as",
    "http://www.w3.org/2002/07/owl#sameAs": "same_as",
    "http://www.w3.org/2004/02/skos/core#exactMatch": "same_as",
}
_RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_MULTIVALUED_NODE_PROPS = {"category", "provided_by", "same_as"}


def parse_ntriples(spark: SparkSession, path: str, include_bnodes: bool = False) -> DataFrame:
    """path → triples(subject_iri, predicate_iri, object_iri, object_literal).

    Blank-node subjects/objects (`_:b…`) carry through in the iri columns
    when ``include_bnodes=True`` (the OWL-in-NT reader needs restriction
    stanzas); the default drops them — plain KGX NT has none
    (rdf_source.py:223-328 likewise skips what it can't dispatch).
    """
    lines = spark.read.text(path)
    out = lines.select(
        F.nullif(
            F.coalesce(
                F.nullif(F.regexp_extract("value", _NT_RE, 1), F.lit("")),
                F.regexp_extract("value", _NT_RE, 2),
            ),
            F.lit(""),
        ).alias("subject_iri"),
        F.regexp_extract("value", _NT_RE, 3).alias("predicate_iri"),
        F.nullif(
            F.coalesce(
                F.nullif(F.regexp_extract("value", _NT_RE, 4), F.lit("")),
                F.regexp_extract("value", _NT_RE, 5),
            ),
            F.lit(""),
        ).alias("object_iri"),
        # unescape \" and \\ — the exact inverse of the sink's literal
        # escaping (reference NT parsers likewise unescape on read); other
        # NT escapes (\n, \uXXXX) are never produced by the sink and pass
        # through untouched
        F.nullif(
            F.regexp_replace(
                F.regexp_extract("value", _NT_RE, 6), r'\\(["\\])', r"$1"
            ),
            F.lit(""),
        ).alias("object_literal"),
    ).where(F.col("subject_iri").isNotNull())
    if not include_bnodes:
        out = out.where(
            ~F.col("subject_iri").startswith("_:")
            & (F.col("object_iri").isNull() | ~F.col("object_iri").startswith("_:"))
        )
    return out


def read_ntriples(
    spark: SparkSession, path: str, prefix_map: dict[str, str] | None = None, validate: bool = True
) -> tuple[DataFrame, DataFrame]:
    return shape_triples(parse_ntriples(spark, path), prefix_map, validate)


def shape_triples(
    triples: DataFrame, prefix_map: dict[str, str] | None = None, validate: bool = True
) -> tuple[DataFrame, DataFrame]:
    """triples(subject_iri, predicate_iri, object_iri, object_literal) →
    (nodes, edges): the serialization-independent KGX shaping (property
    dispatch, dereification, CURIE contraction) shared by the NT and Jelly
    sources — both produce the same 4-column triple frame."""
    prop_map = F.create_map(*[F.lit(x) for kv in _NODE_PROPERTY_IRIS.items() for x in kv])
    t = triples.select(
        contract(F.col("subject_iri"), prefix_map).alias("s"),
        F.col("predicate_iri").alias("p_iri"),
        contract(F.coalesce(F.col("object_iri"), F.col("object_literal")), prefix_map).alias("o"),
        F.col("object_literal").isNotNull().alias("o_literal"),
        F.element_at(prop_map, F.col("predicate_iri")).alias("node_prop"),
    ).cache()

    # --- reified rdf:Statement stanzas → edges (rdf_source.py:330-355) ---
    is_role = F.col("p_iri").isin(_RDF + "subject", _RDF + "predicate", _RDF + "object")
    stmt = (
        t.where(is_role | (F.col("p_iri") == _RDF + "type"))
        .groupBy("s")
        .agg(
            F.max(F.when(F.col("p_iri") == _RDF + "subject", F.col("o"))).alias("subject"),
            F.max(F.when(F.col("p_iri") == _RDF + "predicate", F.col("o"))).alias("predicate"),
            F.max(F.when(F.col("p_iri") == _RDF + "object", F.col("o"))).alias("object"),
        )
        .where(F.col("subject").isNotNull() & F.col("predicate").isNotNull() & F.col("object").isNotNull())
        .drop("s")
    )
    stmt_subjects = t.where(is_role).select("s").distinct()

    # --- node properties → one row per subject (pivot by known property) ---
    props = t.where(F.col("node_prop").isNotNull())
    aggs = []
    for prop in sorted(set(_NODE_PROPERTY_IRIS.values())):
        vals = F.collect_set(F.when(F.col("node_prop") == prop, F.col("o")))
        if prop in _MULTIVALUED_NODE_PROPS:
            aggs.append(F.array_sort(vals).alias(prop))
        else:
            aggs.append(F.array_min(vals).alias(prop))
    prop_nodes = props.groupBy(F.col("s").alias("id")).agg(*aggs)

    # --- plain edges: non-property, non-role, non-literal triples ---
    plain = (
        t.where(~F.col("o_literal") & F.col("node_prop").isNull() & ~is_role
                & (F.col("p_iri") != _RDF + "type"))
        .join(stmt_subjects, on="s", how="left_anti")  # skip statement stanza internals
        .select(
            F.col("s").alias("subject"),
            contract(F.col("p_iri"), prefix_map).alias("predicate"),
            F.col("o").alias("object"),
        )
    )
    edges = generate_edge_identifiers(plain.unionByName(stmt))

    # node catalog = every mentioned entity ∪ property subjects
    mentioned = (
        edges.select(F.col("subject").alias("id"))
        .unionByName(edges.select(F.col("object").alias("id")))
        .distinct()
    )
    nodes = mentioned.join(prop_nodes, on="id", how="full_outer")

    if validate:
        nodes, _ = validate_nodes(nodes)
        edges, _ = validate_edges(edges)
    return nodes, edges
