"""Biolink-Model knowledge as broadcastable data (no executor library calls).

Reference: kgx/utils/kgx_utils.py:313-546 calls bmt.Toolkit per record for
category/predicate validity and ancestors. SURVEY.md §7.0 mandates the Spark
build precompute these as small tables and broadcast them.

The closure below is a snapshot of the common Biolink class hierarchy
(sufficient for tests and the synthetic corpus; a deployment regenerates it
from the model YAML with scripts — the shape, not the completeness, is the
design point). Each entry lists ancestors from nearest to `NamedThing`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# class → ancestors (nearest-first, excluding self)
CATEGORY_ANCESTORS: dict[str, list[str]] = {
    "biolink:NamedThing": [],
    "biolink:BiologicalEntity": ["biolink:NamedThing"],
    "biolink:ChemicalEntity": ["biolink:NamedThing"],
    "biolink:SmallMolecule": ["biolink:MolecularEntity", "biolink:ChemicalEntity", "biolink:NamedThing"],
    "biolink:MolecularEntity": ["biolink:ChemicalEntity", "biolink:NamedThing"],
    "biolink:Drug": ["biolink:ChemicalEntity", "biolink:NamedThing"],
    "biolink:Gene": ["biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:Protein": ["biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:SequenceVariant": ["biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:Disease": ["biolink:DiseaseOrPhenotypicFeature", "biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:PhenotypicFeature": ["biolink:DiseaseOrPhenotypicFeature", "biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:DiseaseOrPhenotypicFeature": ["biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:OrganismTaxon": ["biolink:NamedThing"],
    "biolink:Cell": ["biolink:AnatomicalEntity", "biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:AnatomicalEntity": ["biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:BiologicalProcess": ["biolink:BiologicalProcessOrActivity", "biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:MolecularActivity": ["biolink:BiologicalProcessOrActivity", "biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:BiologicalProcessOrActivity": ["biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:Pathway": ["biolink:BiologicalProcessOrActivity", "biolink:BiologicalEntity", "biolink:NamedThing"],
    "biolink:OntologyClass": ["biolink:NamedThing"],
    "biolink:InformationContentEntity": ["biolink:NamedThing"],
}


def ancestors_table(spark: SparkSession) -> DataFrame:
    """(category, ancestor, distance) rows — broadcast side for closures."""
    rows = []
    for cat, ancs in CATEGORY_ANCESTORS.items():
        for d, a in enumerate(ancs, start=1):
            rows.append((cat, a, d))
    return spark.createDataFrame(rows or [("", "", 0)], "category string, ancestor string, distance int")


def specificity_table(spark: SparkSession) -> DataFrame:
    """(category, depth) — depth = ancestor count; higher = more specific.

    Used for clique category election (clique_merge.py:474-499 sorts by
    ancestor count to pick the most specific category).
    """
    rows = [(cat, len(ancs)) for cat, ancs in CATEGORY_ANCESTORS.items()]
    return spark.createDataFrame(rows, "category string, depth int")
