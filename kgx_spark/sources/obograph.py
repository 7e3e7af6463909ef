"""OBO Graph JSON source.

Reference: kgx/source/obograph_source.py:32-374
- nodes: `lbl` → name, `meta.definition.val` → description, synonyms by
  scope, xrefs, `meta.basicPropertyValues` with skos:exactMatch → same_as,
  deprecated flag (126-232)
- edges: `sub/pred/obj` with predicate normalization
  is_a→biolink:subclass_of etc. (253-305)
- category inference from CURIE prefix (307-360)

Spark design: `multiLine` json read of `graphs[]`, explode nodes/edges,
nested-array transforms for meta fields, a when-chain for predicate
normalization and a broadcast-style literal map for prefix→category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx_spark.functions.curie import contract
from kgx_spark.functions.keys import generate_edge_identifiers
from kgx_spark.operators.sanitize import sanitize_import
from kgx_spark.operators.validate import validate_edges, validate_nodes

# predicate normalization (obograph_source.py:262-287)
_PREDICATE_MAP = {
    "is_a": "biolink:subclass_of",
    "subPropertyOf": "biolink:subclass_of",
    "type": "biolink:type",
    "http://purl.obolibrary.org/obo/BFO_0000050": "biolink:part_of",
    "BFO:0000050": "biolink:part_of",
    "http://purl.obolibrary.org/obo/RO_0002202": "biolink:develops_from",
}

# prefix → biolink category (obograph_source.py:330-360 uses the biolink
# model's id_prefixes; a representative broadcastable subset)
_PREFIX_CATEGORY = {
    "GO": "biolink:BiologicalProcessOrActivity",
    "MONDO": "biolink:Disease",
    "HP": "biolink:PhenotypicFeature",
    "CHEBI": "biolink:ChemicalEntity",
    "NCBITaxon": "biolink:OrganismTaxon",
    "UBERON": "biolink:AnatomicalEntity",
    "CL": "biolink:Cell",
}


def _map_expr(col, mapping: dict[str, str], default):
    expr = None
    for k, v in mapping.items():
        cond = col == k
        expr = F.when(cond, v) if expr is None else expr.when(cond, v)
    return default if expr is None else expr.otherwise(default)


def read_obograph(
    spark: SparkSession, path: str, validate: bool = True
) -> tuple[DataFrame, DataFrame]:
    doc = spark.read.option("multiLine", "true").json(path)
    g = doc.select(F.explode("graphs").alias("g"))

    raw_nodes = g.select(F.explode("g.nodes").alias("n")).select("n.*")
    ncols = set(raw_nodes.columns)
    meta = ncols.__contains__("meta")

    curie_id = contract(F.col("id"))
    sel = [
        curie_id.alias("id"),
        (F.col("lbl") if "lbl" in ncols else F.lit(None).cast("string")).alias("name"),
        F.array(_map_expr(F.split_part(curie_id, F.lit(":"), F.lit(1)),
                          _PREFIX_CATEGORY, F.lit("biolink:OntologyClass"))).alias("category"),
    ]
    if meta:
        m = F.col("meta")
        meta_fields = {
            f.name for f in raw_nodes.schema["meta"].dataType.fields  # type: ignore[union-attr]
        }

        def mf(name):
            return m.getField(name) if name in meta_fields else F.lit(None)

        sel += [
            (mf("definition").getField("val") if "definition" in meta_fields else F.lit(None).cast("string")).alias("description"),
            F.transform(mf("synonyms"), lambda s: s.getField("val")).alias("synonym")
            if "synonyms" in meta_fields else F.lit(None).cast("array<string>").alias("synonym"),
            F.transform(mf("xrefs"), lambda x: x.getField("val")).alias("xref")
            if "xrefs" in meta_fields else F.lit(None).cast("array<string>").alias("xref"),
            (
                F.filter(
                    F.transform(
                        mf("basicPropertyValues"),
                        lambda b: F.when(
                            b.getField("pred").contains("exactMatch"), contract(b.getField("val"))
                        ),
                    ),
                    lambda v: v.isNotNull(),
                )
                if "basicPropertyValues" in meta_fields
                else F.lit(None).cast("array<string>")
            ).alias("same_as"),
            (F.coalesce(mf("deprecated").cast("boolean"), F.lit(False))
             if "deprecated" in meta_fields else F.lit(False)).alias("deprecated"),
        ]
    nodes = sanitize_import(raw_nodes.select(*sel))

    raw_edges = g.select(F.explode("g.edges").alias("e")).select("e.*")
    pred = contract(F.col("pred"))
    edges = raw_edges.select(
        contract(F.col("sub")).alias("subject"),
        _map_expr(F.col("pred"), _PREDICATE_MAP, F.concat(F.lit("biolink:"), pred)).alias("predicate"),
        contract(F.col("obj")).alias("object"),
        F.col("pred").alias("relation"),
    )
    edges = generate_edge_identifiers(edges)

    if validate:
        nodes, _ = validate_nodes(nodes)
        edges, _ = validate_edges(edges)
    return nodes, edges
