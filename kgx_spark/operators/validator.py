"""Biolink validation battery ('kgx validate').

Reference: kgx/validator.py:26-745
- required node properties (id, category) / edge properties
  (subject, predicate, object, knowledge_level, agent_type): 332-401
- value-shape checks: id is CURIE (560-585), category CamelCase CURIE +
  known class (629-684), predicate snake_case CURIE (686-744)
- errors aggregated [level][error_type][message] → [entities]
  (kgx/error_detection.py:48-174)

Spark design: each rule is a where() producing rows of the shared errors
schema (entity, level, error_type, message); rules union into one errors
DataFrame; the report is a groupBy collect_list. "Known Biolink class" checks
use a broadcast snapshot table (no runtime bmt.Toolkit on executors —
SURVEY.md §7.0).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgx_spark.functions.curie import CURIE_REGEX

# Snapshot of common Biolink classes/predicates for known-ness checks
# (the reference queries bmt.Toolkit per record — validator.py:629-684; we
# broadcast a precomputed set; callers may pass their own full snapshot).
KNOWN_CATEGORIES = frozenset(
    {
        "biolink:NamedThing", "biolink:Gene", "biolink:Protein", "biolink:Disease",
        "biolink:PhenotypicFeature", "biolink:ChemicalEntity", "biolink:Drug",
        "biolink:OrganismTaxon", "biolink:BiologicalProcess", "biolink:MolecularActivity",
        "biolink:AnatomicalEntity", "biolink:Cell", "biolink:Pathway",
        "biolink:SmallMolecule", "biolink:SequenceVariant", "biolink:OntologyClass",
        "biolink:BiologicalProcessOrActivity", "biolink:InformationContentEntity",
    }
)

REQUIRED_NODE_PROPERTIES = ("id", "category")  # validator.py:332-355
REQUIRED_EDGE_PROPERTIES = ("subject", "predicate", "object")  # validator.py:357-401

_ERR_SCHEMA = "entity string, level string, error_type string, message string"


def _emit(df: DataFrame, cond: Column, entity: Column, level: str, error_type: str, message: str) -> DataFrame:
    return df.where(cond).select(
        entity.alias("entity"),
        F.lit(level).alias("level"),
        F.lit(error_type).alias("error_type"),
        F.lit(message).alias("message"),
    )


def validate_node_records(nodes: DataFrame, known_categories: frozenset[str] = KNOWN_CATEGORIES) -> DataFrame:
    """→ errors DataFrame; empty when the graph is valid."""
    spark = nodes.sparkSession
    out = spark.createDataFrame([], _ERR_SCHEMA)
    ent = F.coalesce(F.col("id"), F.lit("<no id>"))

    for prop in REQUIRED_NODE_PROPERTIES:
        if prop not in nodes.columns:
            # whole-column absence: every node errors
            out = out.unionByName(_emit(nodes, F.lit(True), ent, "ERROR",
                                        "MISSING_NODE_PROPERTY", f"Required node property '{prop}' is missing"))
            continue
        missing = F.col(prop).isNull()
        if dict(nodes.dtypes)[prop].startswith("array"):
            missing = missing | (F.size(prop) == 0)
        out = out.unionByName(_emit(nodes, missing, ent, "ERROR",
                                    "MISSING_NODE_PROPERTY", f"Required node property '{prop}' is missing"))

    # id must be a CURIE (validator.py:560-585)
    out = out.unionByName(_emit(nodes, F.col("id").isNotNull() & ~F.col("id").rlike(CURIE_REGEX),
                                ent, "ERROR", "INVALID_NODE_PROPERTY_VALUE", "Node `id` is not a CURIE"))

    if "category" in nodes.columns:
        cats = nodes.select(ent.alias("_ent"), F.explode("category").alias("cat"))
        # CamelCase CURIE shape (validator.py:629-650)
        out = out.unionByName(_emit(cats, ~F.col("cat").rlike(r"^biolink:[A-Z][a-zA-Z]*$"),
                                    F.col("_ent"), "ERROR", "INVALID_CATEGORY",
                                    "Category is not in CamelCase biolink CURIE form"))
        # known-class check (validator.py:652-684)
        known = F.array(*[F.lit(c) for c in sorted(known_categories)])
        out = out.unionByName(_emit(cats, ~F.array_contains(known, F.col("cat")),
                                    F.col("_ent"), "WARNING", "UNKNOWN_CATEGORY",
                                    "Category is not a known biolink class"))
    return out


def validate_edge_records(edges: DataFrame) -> DataFrame:
    spark = edges.sparkSession
    out = spark.createDataFrame([], _ERR_SCHEMA)
    ent = F.concat_ws("-", F.coalesce(F.col("subject"), F.lit("")),
                      F.coalesce(F.col("predicate"), F.lit("")),
                      F.coalesce(F.col("object"), F.lit("")))

    for prop in REQUIRED_EDGE_PROPERTIES:
        if prop not in edges.columns:
            out = out.unionByName(_emit(edges, F.lit(True), ent, "ERROR",
                                        "MISSING_EDGE_PROPERTY", f"Required edge property '{prop}' is missing"))
            continue
        out = out.unionByName(_emit(edges, F.col(prop).isNull(), ent, "ERROR",
                                    "MISSING_EDGE_PROPERTY", f"Required edge property '{prop}' is missing"))

    # subject/object CURIE-ness (validator.py:560-585)
    for prop in ("subject", "object"):
        if prop in edges.columns:
            out = out.unionByName(_emit(edges, F.col(prop).isNotNull() & ~F.col(prop).rlike(CURIE_REGEX),
                                        ent, "ERROR", "INVALID_EDGE_PROPERTY_VALUE",
                                        f"Edge `{prop}` is not a CURIE"))
    # predicate snake_case biolink CURIE (validator.py:686-744)
    if "predicate" in edges.columns:
        out = out.unionByName(_emit(edges, F.col("predicate").isNotNull()
                                    & ~F.col("predicate").rlike(r"^biolink:[a-z][a-z_]*$"),
                                    ent, "ERROR", "INVALID_EDGE_PREDICATE",
                                    "Predicate is not in snake_case biolink CURIE form"))
    return out


def error_report(errors: DataFrame) -> DataFrame:
    """[level][error_type][message] → sorted entity list
    (kgx/error_detection.py:130-174 aggregation shape)."""
    return errors.groupBy("level", "error_type", "message").agg(
        F.array_sort(F.collect_set("entity")).alias("entities"),
        F.count("*").alias("count"),
    )
