"""OWL (RDF/XML) source — import-gated.

Reference: kgx/source/owl_source.py:36-208 — loads the full ontology via
rdflib, emits rdfs:subClassOf edges, unpacks OWL existential/universal
restrictions into reified edges with `logical_interpretation`, and
owl:equivalentClass edges.

SURVEY.md §2.1 marks this out of distributed scope: a whole-ontology rdflib
load has no partitioned scan. The implementation here mirrors the
reference's driver-side design: parse with rdflib ON THE DRIVER (ontologies
are metadata-sized, not corpus-sized), then hand the triples to the
distributed N-Triples pipeline. rdflib is not installed in this container,
so the function raises with instructions unless it is.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession


def read_owl(spark: SparkSession, path: str, validate: bool = True) -> tuple[DataFrame, DataFrame]:
    """OWL → (nodes, edges): driver-side rdflib parse → NT → distributed scan."""
    try:
        import rdflib
    except ImportError as e:  # pragma: no cover - rdflib absent in this container
        raise NotImplementedError(
            "OwlSource requires rdflib (not installed here). The ontology is "
            "parsed driver-side — same as the reference (owl_source.py:36-60) "
            "— then serialized to N-Triples and read via read_ntriples."
        ) from e

    g = rdflib.Graph()
    g.parse(path)
    with tempfile.NamedTemporaryFile(suffix=".nt", delete=False, mode="wb") as fh:
        g.serialize(destination=fh, format="nt")
        nt_path = fh.name
    from kgx_spark.sources.rdf_nt import read_ntriples

    return read_ntriples(spark, nt_path, validate=validate)
