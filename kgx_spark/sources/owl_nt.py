"""OWL semantics over the distributed N-Triples path (rdflib-free).

Reference: kgx/source/owl_source.py:36-208 loads the whole ontology into
rdflib and walks it: plain ``rdfs:subClassOf`` between named classes becomes
an edge (:110-137); a subClassOf whose object is a BLANK NODE is an OWL
restriction — ``owl:onProperty`` gives the predicate, ``owl:someValuesFrom``
/ ``owl:allValuesFrom`` gives the parent and the OWLSTAR logical
interpretation — and is emitted as a REIFIED edge carrying
``logical_interpretation`` (:117-157); ``owl:equivalentClass`` between named
classes becomes an edge (:158-163).

Spark design: OWL ontologies serialized as N-Triples parse on the existing
distributed line scan (blank nodes included); restriction stanzas are
reassembled with ONE groupBy over the blank-node subjects and joined back to
the subClassOf triples — no driver-side ontology object, no rdflib.
``owl_source.read_owl`` handles RDF/XML inputs (stdlib converter in
sources/rdf_xml.py, rdflib when installed) and feeds this module; this is
the scale path for all OWL ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgx_spark.functions.curie import contract
from kgx_spark.sources.rdf_nt import parse_ntriples

_RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
_OWL = "http://www.w3.org/2002/07/owl#"
_ON_PROPERTY = _OWL + "onProperty"
_SOME_VALUES = _OWL + "someValuesFrom"
_ALL_VALUES = _OWL + "allValuesFrom"
_EQUIV_CLASS = _OWL + "equivalentClass"

# OWLSTAR interpretation CURIEs (owl_source.py:30-34, 122-127)
_ALL_SOME = "OWLSTAR:AllSomeInterpretation"
_ALL_ONLY = "OWLSTAR:AllOnlyInterpretation"


def restriction_table(triples: DataFrame) -> DataFrame:
    """Blank-node restriction stanzas → (bnode, on_property, filler,
    logical_interpretation). One map-side-combinable groupBy over the
    stanza's blank-node subject (owl_source.py:117-134 walks the same three
    predicates per BNode)."""
    r = triples.where(
        F.col("subject_iri").startswith("_:")
        & F.col("predicate_iri").isin(_ON_PROPERTY, _SOME_VALUES, _ALL_VALUES)
    )
    return (
        r.groupBy(F.col("subject_iri").alias("bnode"))
        .agg(
            F.max(F.when(F.col("predicate_iri") == _ON_PROPERTY, F.col("object_iri"))).alias("on_property"),
            F.max(F.when(F.col("predicate_iri") == _SOME_VALUES, F.col("object_iri"))).alias("some_filler"),
            F.max(F.when(F.col("predicate_iri") == _ALL_VALUES, F.col("object_iri"))).alias("all_filler"),
        )
        .select(
            "bnode",
            "on_property",
            F.coalesce("some_filler", "all_filler").alias("filler"),
            F.when(F.col("some_filler").isNotNull(), F.lit(_ALL_SOME))
            .when(F.col("all_filler").isNotNull(), F.lit(_ALL_ONLY))
            .alias("logical_interpretation"),
        )
        .where(F.col("on_property").isNotNull() & F.col("filler").isNotNull())
    )


def unpack_owl_edges(
    triples: DataFrame, prefix_map: dict[str, str] | None = None
) -> DataFrame:
    """→ edges(id, subject, predicate, object, logical_interpretation,
    category) from subClassOf / restriction / equivalentClass triples.

    - named C subClassOf named D → plain ``biolink:subclass_of`` edge
      (owl_source.py:135-137 keeps rdfs:subClassOf; predicate normalization
      to biolink follows obograph_source's is_a mapping);
    - C subClassOf _:restriction → edge (C, onProperty, filler) with
      ``logical_interpretation`` and category ``biolink:Association``
      (owl_source.py:138-156 reifies exactly these; the reference's
      rdf:Statement round-trip dereifies back into one edge — we emit the
      dereified edge directly, with a DETERMINISTIC id replacing the
      reference's uuid4, per SURVEY §7.3 determinism);
    - named A equivalentClass named B → edge (owl_source.py:158-163).
    """
    named_subj = ~F.col("subject_iri").startswith("_:")
    named_obj = ~F.col("object_iri").startswith("_:")

    sub = triples.where((F.col("predicate_iri") == _RDFS_SUBCLASS) & named_subj)
    plain = sub.where(named_obj).select(
        contract(F.col("subject_iri"), prefix_map).alias("subject"),
        F.lit("biolink:subclass_of").alias("predicate"),
        contract(F.col("object_iri"), prefix_map).alias("object"),
        F.lit(None).cast("string").alias("logical_interpretation"),
        F.lit(None).cast("string").alias("category"),
    )

    restricted = (
        sub.where(~named_obj)
        .select("subject_iri", F.col("object_iri").alias("bnode"))
        .join(restriction_table(triples), on="bnode")
        .select(
            contract(F.col("subject_iri"), prefix_map).alias("subject"),
            contract(F.col("on_property"), prefix_map).alias("predicate"),
            contract(F.col("filler"), prefix_map).alias("object"),
            F.col("logical_interpretation"),
            F.lit("biolink:Association").alias("category"),
        )
    )

    equiv = triples.where(
        (F.col("predicate_iri") == _EQUIV_CLASS) & named_subj & named_obj
    ).select(
        contract(F.col("subject_iri"), prefix_map).alias("subject"),
        F.lit("biolink:same_as").alias("predicate"),
        contract(F.col("object_iri"), prefix_map).alias("object"),
        F.lit(None).cast("string").alias("logical_interpretation"),
        F.lit(None).cast("string").alias("category"),
    )

    edges = plain.unionByName(restricted).unionByName(equiv)
    return edges.withColumn(
        "id",
        F.sha2(
            F.concat_ws(
                "-", "subject", "predicate", "object",
                F.coalesce("logical_interpretation", F.lit("")),
            ),
            256,
        ),
    )


def read_owl_nt(
    spark: SparkSession, path: str, prefix_map: dict[str, str] | None = None
) -> tuple[DataFrame, DataFrame]:
    """NT-serialized OWL → (nodes, edges) with restrictions unpacked.

    Node catalog = every named class mentioned by an emitted edge, with
    rdfs:label as ``name`` when present (owl_source.py caches node data the
    same way via its triple() calls).
    """
    triples = parse_ntriples(spark, path, include_bnodes=True)
    edges = unpack_owl_edges(triples, prefix_map)
    labels = (
        triples.where(
            (F.col("predicate_iri") == "http://www.w3.org/2000/01/rdf-schema#label")
            & ~F.col("subject_iri").startswith("_:")
        )
        .groupBy(contract(F.col("subject_iri"), prefix_map).alias("id"))
        .agg(F.min("object_literal").alias("name"))
    )
    mentioned = (
        edges.select(F.col("subject").alias("id"))
        .unionByName(edges.select(F.col("object").alias("id")))
        .distinct()
    )
    nodes = mentioned.join(labels, on="id", how="left").withColumn(
        "category", F.array(F.lit("biolink:NamedThing"))
    )
    return nodes, edges
