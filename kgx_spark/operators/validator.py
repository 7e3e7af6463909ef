"""Biolink validation battery ('kgx validate').

Reference: kgx/validator.py:26-745
- required node properties (id, category) / edge properties
  (subject, predicate, object, knowledge_level, agent_type): 332-401
- property value TYPES per Biolink slot metadata (string/double/uriorcurie,
  multivalued-ness): 402-558
- value-shape checks: id is CURIE + prefix in JSON-LD context (560-585),
  category CamelCase CURIE + known class + non-mixin (629-684), predicate
  snake_case CURIE + known predicate (686-744)
- errors aggregated [level][error_type][message] → [entities]
  (kgx/error_detection.py:48-174)

Spark design: each rule is a where() producing rows of the shared errors
schema (entity, level, error_type, message); rules union into one errors
DataFrame; the report is a groupBy collect_list. All Biolink knowledge
(known classes/predicates/mixins, slot types, context prefixes) comes from
the precomputed model snapshot in kgx_spark.functions.biolink — no runtime
bmt.Toolkit on executors (SURVEY.md §7.0). Type checks that the reference
performs per-value on Python dicts become schema checks (a DataFrame column
has ONE type) plus per-value shape checks for uriorcurie slots.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgx_spark.functions.biolink import (
    KNOWN_CLASSES,
    KNOWN_MIXINS,
    KNOWN_PREDICATES,
    SLOT_TYPES,
    context_prefixes,
)
from kgx_spark.functions.curie import CURIE_REGEX

# Back-compat alias: callers may pass their own snapshot.
KNOWN_CATEGORIES = KNOWN_CLASSES

REQUIRED_NODE_PROPERTIES = ("id", "category")  # validator.py:216-243
# validator.py:246-273 derives these from the model's required association
# slots — in the current Biolink model that is subject/predicate/object plus
# knowledge_level and agent_type (docs/kgx_format.md:81-86)
REQUIRED_EDGE_PROPERTIES = ("subject", "predicate", "object", "knowledge_level", "agent_type")

_ERR_SCHEMA = "entity string, level string, error_type string, message string"

# Slots where the reference's own declarations disagree on multivalued-ness:
# column_types (kgx/utils/kgx_utils.py:50-56, drives its sanitizer) types
# knowledge_source `str`, while is_provenance_property_multivalued (:87-94,
# mirrored in SLOT_TYPES) says list. Reference-sanitized graphs therefore
# legitimately carry EITHER shape — the type battery accepts both instead of
# flagging scalars the reference's own pipeline produces (round-3 ADVICE).
_SCALAR_OR_LIST_SLOTS = frozenset({"knowledge_source"})


def _emit(
    df: DataFrame, cond: Column, entity: Column, level: str, error_type: str, message
) -> DataFrame:
    msg = message if isinstance(message, Column) else F.lit(message)
    return df.where(cond).select(
        entity.alias("entity"),
        F.lit(level).alias("level"),
        F.lit(error_type).alias("error_type"),
        msg.alias("message"),
    )


def _is_uri_or_curie(col: Column) -> Column:
    """uriorcurie shape: CURIE regex or an http(s) URL (the reference accepts
    str CURIEs and validators.url URLs — validator.py:437-441)."""
    return col.rlike(CURIE_REGEX) | col.startswith("http://") | col.startswith("https://")


def validate_property_types(df: DataFrame, kind: str = "node") -> DataFrame:
    """The type battery (validator.py:402-558), Spark-shaped.

    For every column matching a known Biolink slot:
    - multivalued slots must be array columns; single-valued must not be
      (the reference checks isinstance(value, list) per record — here the
      column type decides, and a mismatch errors every non-null row);
    - `double` slots must hold numeric values (non-castable strings error);
    - `uriorcurie` slots must hold CURIE- or URL-shaped values (per element
      for arrays).
    """
    spark = df.sparkSession
    out = spark.createDataFrame([], _ERR_SCHEMA)
    if kind == "node":
        ent = F.coalesce(F.col("id"), F.lit("<no id>"))
        error_type = "INVALID_NODE_PROPERTY_VALUE_TYPE"
    else:
        ent = F.concat_ws(
            "->", F.coalesce(F.col("subject"), F.lit("")), F.coalesce(F.col("object"), F.lit(""))
        )
        error_type = "INVALID_EDGE_PROPERTY_VALUE_TYPE"

    dtypes = dict(df.dtypes)
    for col in df.columns:
        if col not in SLOT_TYPES or col in ("id", "subject", "object"):
            continue
        typeof, multivalued = SLOT_TYPES[col]
        is_array = dtypes[col].startswith("array")
        c = F.col(col)
        if col in _SCALAR_OR_LIST_SLOTS:
            # either shape is valid; fall through to the value checks below
            multivalued = is_array
        if multivalued and not is_array:
            out = out.unionByName(_emit(
                df, c.isNotNull(), ent, "ERROR", error_type,
                f"Multi-valued {kind} property '{col}' is expected to be of type 'list'"))
            continue
        if not multivalued and is_array:
            out = out.unionByName(_emit(
                df, c.isNotNull(), ent, "ERROR", error_type,
                f"Single-valued {kind} property '{col}' is expected to be of type 'str'"))
            continue
        if typeof == "double" and not is_array:
            bad = c.isNotNull() & c.cast("double").isNull()
            out = out.unionByName(_emit(
                df, bad, ent, "ERROR", error_type,
                f"{kind.capitalize()} property '{col}' is expected to be of type 'double'"))
        elif typeof == "uriorcurie":
            if is_array:
                bad = F.exists(c, lambda x: ~_is_uri_or_curie(x))
            else:
                bad = c.isNotNull() & ~_is_uri_or_curie(c)
            out = out.unionByName(_emit(
                df, bad, ent, "ERROR", error_type,
                f"{kind.capitalize()} property '{col}' is expected to be of type 'uri' or 'CURIE'"))
    return out


def validate_node_records(
    nodes: DataFrame,
    known_categories: frozenset[str] = KNOWN_CLASSES,
    check_types: bool = False,
    check_prefixes: bool = False,
) -> DataFrame:
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

    if check_prefixes:
        # CURIE prefix must be registered in the Biolink JSON-LD context
        # (validator.py:573-585) — broadcastable literal set, message carries
        # the offending prefix like the reference's per-node message.
        prefix = F.split_part("id", F.lit(":"), F.lit(1))
        known_prefix = F.array_contains(
            F.array(*[F.lit(p) for p in sorted(context_prefixes())]), prefix
        )
        out = out.unionByName(_emit(
            nodes, F.col("id").isNotNull() & F.col("id").rlike(CURIE_REGEX) & ~known_prefix,
            ent, "ERROR", "INVALID_NODE_PROPERTY_VALUE",
            F.concat(F.lit("Node `id` has a CURIE prefix '"), prefix,
                     F.lit("' that is not represented in Biolink Model JSON-LD context"))))

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
        # mixin-as-category check (validator.py:660-668: categories must not
        # be mixins)
        mixins = F.array(*[F.lit(m) for m in sorted(KNOWN_MIXINS)])
        out = out.unionByName(_emit(cats, F.array_contains(mixins, F.col("cat")),
                                    F.col("_ent"), "ERROR", "INVALID_CATEGORY",
                                    "Category is a mixin, not a class"))
    if check_types:
        out = out.unionByName(validate_property_types(nodes, "node"))
    return out


def validate_edge_records(
    edges: DataFrame,
    known_predicates: frozenset[str] = KNOWN_PREDICATES,
    check_types: bool = False,
) -> DataFrame:
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
        # known-predicate check (validator.py:706-744)
        known = F.array(*[F.lit(p) for p in sorted(known_predicates)])
        out = out.unionByName(_emit(
            edges,
            F.col("predicate").isNotNull()
            & F.col("predicate").rlike(r"^biolink:[a-z][a-z_]*$")
            & ~F.array_contains(known, F.col("predicate")),
            ent, "WARNING", "UNKNOWN_EDGE_PREDICATE",
            "Predicate is not a known biolink predicate"))
    if check_types:
        out = out.unionByName(validate_edge_records_types(edges))
    return out


def validate_edge_records_types(edges: DataFrame) -> DataFrame:
    return validate_property_types(edges, "edge")


def error_report(errors: DataFrame) -> DataFrame:
    """[level][error_type][message] → sorted entity list
    (kgx/error_detection.py:130-174 aggregation shape)."""
    return errors.groupBy("level", "error_type", "message").agg(
        F.array_sort(F.collect_set("entity")).alias("entities"),
        F.count("*").alias("count"),
    )


def report_dict(errors: DataFrame) -> dict:
    """Driver-side nested report: [level][error_type][message] → sorted
    entities — the exact JSON shape the reference's ErrorDetecting.get_errors
    / write_report emits (kgx/error_detection.py:48-174)."""
    out: dict = {}
    for r in error_report(errors).collect():
        out.setdefault(r["level"], {}).setdefault(r["error_type"], {})[r["message"]] = list(r["entities"])
    return out
