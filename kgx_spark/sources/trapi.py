"""TRAPI knowledge-graph JSON source.

Reference: kgx/source/trapi_source.py:28-566
- knowledge_graph.nodes is a map {curie: {name, categories, attributes}};
  `categories` → `category` (63-120)
- knowledge_graph.edges is a map {key: {subject, predicate, object,
  attributes, sources}} (122-200)
- attributes [{attribute_type_id, value}] flatten to properties with the
  `biolink:` prefix stripped (202-320)
- sources [{resource_id, resource_role}] → primary_knowledge_source /
  aggregator_knowledge_source (322-400)

Spark design: multiLine json read; the JSON maps become MapType columns via
from_json-free access (spark.read.json infers maps as structs of fields —
instead we read as text and use from_json with MapType for true map
semantics); explode map entries; attributes re-flattened with map_from_entries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgx_spark.functions.keys import generate_edge_identifiers
from kgx_spark.operators.sanitize import sanitize_import
from kgx_spark.operators.validate import validate_edges, validate_nodes

# attribute values are heterogeneous JSON (scalars OR lists — the reference
# emits both, trapi_sink.py:236-278): VariantType parses either, and the
# flattener below renders lists as '|'-joined strings per the KGX TSV
# convention (kgx/source/tsv_source.py:18)
_ATTR = T.ArrayType(
    T.StructType(
        [
            T.StructField("attribute_type_id", T.StringType()),
            T.StructField("value", T.VariantType()),
            T.StructField("value_type_id", T.StringType()),
        ]
    )
)
_QUAL = T.ArrayType(
    T.StructType(
        [
            T.StructField("qualifier_type_id", T.StringType()),
            T.StructField("qualifier_value", T.StringType()),
        ]
    )
)
_NODE_VAL = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("categories", T.ArrayType(T.StringType())),
        T.StructField("attributes", _ATTR),
    ]
)
_EDGE_VAL = T.StructType(
    [
        T.StructField("subject", T.StringType()),
        T.StructField("predicate", T.StringType()),
        T.StructField("object", T.StringType()),
        T.StructField("attributes", _ATTR),
        T.StructField(
            "sources",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("resource_id", T.StringType()),
                        T.StructField("resource_role", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("qualifiers", _QUAL),
    ]
)
def _kg_doc(body: T.StructType) -> T.StructType:
    """Wrap a knowledge_graph body in BOTH the top-level and the
    ``message.knowledge_graph`` nestings the reference probes
    (trapi_source.py:118-127)."""
    return T.StructType(
        [
            T.StructField("knowledge_graph", body),
            T.StructField(
                "message", T.StructType([T.StructField("knowledge_graph", body)])
            ),
        ]
    )


_KG = _kg_doc(
    T.StructType(
        [
            T.StructField("nodes", T.MapType(T.StringType(), _NODE_VAL)),
            T.StructField("edges", T.MapType(T.StringType(), _EDGE_VAL)),
        ]
    )
)

# Legacy "Reasoner Std API" list shape (the reference's rsa_sample.json
# path, trapi_source.py:131-141 + load_node:405-414 + load_edge:474-488):
# nodes as a LIST with `type` → category, edges with source_id/target_id
# and relation_label, predicate defaulting to biolink:related_to.
_LEGACY_NODE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("type", T.ArrayType(T.StringType())),
        T.StructField("category", T.ArrayType(T.StringType())),
        T.StructField("categories", T.ArrayType(T.StringType())),
        T.StructField("attributes", _ATTR),
    ]
)
_LEGACY_EDGE = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("source_id", T.StringType()),
        T.StructField("target_id", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("object", T.StringType()),
        T.StructField("predicate", T.StringType()),
        # str or list in the wild — VariantType parses either
        T.StructField("relation_label", T.VariantType()),
        T.StructField("attributes", _ATTR),
        T.StructField(
            "sources",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("resource_id", T.StringType()),
                        T.StructField("resource_role", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("qualifiers", _QUAL),
    ]
)
_KG_LEGACY = _kg_doc(
    T.StructType(
        [
            T.StructField("nodes", T.ArrayType(_LEGACY_NODE)),
            T.StructField("edges", T.ArrayType(_LEGACY_EDGE)),
        ]
    )
)


def _attr_value(v: F.Column) -> F.Column:
    """Variant attribute value → string: scalars verbatim, lists '|'-joined
    (the KGX list convention, tsv_source.py:18)."""
    as_arr = F.try_variant_get(v, "$", "array<string>")
    return F.when(as_arr.isNotNull(), F.array_join(as_arr, "|")).otherwise(
        F.try_variant_get(v, "$", "string")
    )


def _attrs_map(col: F.Column) -> F.Column:
    """attributes[] → map<property, value> with biolink: prefix stripped
    (trapi_source.py:202-320)."""
    entries = F.transform(
        col,
        lambda a: F.struct(
            F.regexp_replace(a["attribute_type_id"], "^biolink:", "").alias("key"),
            _attr_value(a["value"]).alias("value"),
        ),
    )
    return F.map_from_entries(F.coalesce(entries, F.array()))


def _qualifiers_map(col: F.Column) -> F.Column:
    """qualifiers[] → map<qualifier_type, value> with biolink: prefix
    stripped (the flattened '*_qualifier' property form the reference's sink
    re-nests — trapi_sink.py:400-426)."""
    entries = F.transform(
        col,
        lambda q: F.struct(
            F.regexp_replace(q["qualifier_type_id"], "^biolink:", "").alias("key"),
            q["qualifier_value"].alias("value"),
        ),
    )
    return F.map_from_entries(F.coalesce(entries, F.array()))


# JSONL record shape (trapi_source.py:305-390 read_nodes_jsonl /
# read_edges_jsonl): one JSON object per line, discriminated by `type` —
# 'knowledge_graph' header rows (biolink_version), 'node' rows, 'edge' rows.
_JSONL_REC = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("categories", T.ArrayType(T.StringType())),
        T.StructField("category", T.ArrayType(T.StringType())),
        T.StructField("attributes", _ATTR),
        T.StructField("subject", T.StringType()),
        T.StructField("predicate", T.StringType()),
        T.StructField("object", T.StringType()),
        T.StructField(
            "sources",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("resource_id", T.StringType()),
                        T.StructField("resource_role", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("qualifiers", _QUAL),
    ]
)


def _shape_edges(edges_struct: DataFrame) -> DataFrame:
    """Shared edge shaping: a column ``e`` of struct(subject, predicate,
    object, attributes, sources, qualifiers) → KGX edge columns
    (trapi_source.py:122-400 semantics)."""
    src = F.col("e.sources")
    primary = F.get(
        F.filter(src, lambda s: s["resource_role"] == "primary_knowledge_source"), 0
    )["resource_id"]
    aggs = F.transform(
        F.filter(src, lambda s: s["resource_role"] == "aggregator_knowledge_source"),
        lambda s: s["resource_id"],
    )
    keep = [c for c in edges_struct.columns if c != "e"]
    return edges_struct.select(
        *keep,
        F.col("e.subject").alias("subject"),
        # load_edge:487-488: a missing/empty predicate defaults
        F.coalesce(F.nullif(F.col("e.predicate"), F.lit("")), F.lit("biolink:related_to")).alias("predicate"),
        F.col("e.object").alias("object"),
        primary.alias("primary_knowledge_source"),
        aggs.alias("aggregator_knowledge_source"),
        _attrs_map(F.col("e.attributes")).alias("attributes"),
        _qualifiers_map(F.col("e.qualifiers")).alias("qualifiers"),
    )


def read_trapi(
    spark: SparkSession, path: str, validate: bool = True, format: str = "json"
) -> tuple[DataFrame, DataFrame]:
    """TRAPI → (nodes, edges). ``format`` dispatches like the reference's
    ``parse(format=...)`` (trapi_source.py:29-67): 'json' reads the
    monolithic {"knowledge_graph": {nodes, edges}} document; 'jsonl' the
    line-per-record variant."""
    if format == "jsonl":
        return read_trapi_jsonl(spark, path, validate=validate)
    raw = spark.read.text(path, wholetext=True).select(
        F.from_json("value", _KG).alias("doc"),
        F.from_json("value", _KG_LEGACY).alias("legacy"),
    )

    def kg(doc: str, field: str) -> F.Column:
        # top-level knowledge_graph wins, message.knowledge_graph second
        # (trapi_source.py:118-127)
        return F.coalesce(
            F.col(f"{doc}.knowledge_graph.{field}"),
            F.col(f"{doc}.message.knowledge_graph.{field}"),
        )

    nodes_map = raw.select(F.explode(kg("doc", "nodes")).alias("id", "n"))
    nodes = nodes_map.select(
        "id",
        F.col("n.name").alias("name"),
        F.col("n.categories").alias("category"),
        _attrs_map(F.col("n.attributes")).alias("attributes"),
    )
    # legacy list-shaped nodes: type → category (load_node:405-414); the
    # reference's id-keyed dict makes repeated ids collapse
    legacy_nodes = (
        raw.select(F.explode(kg("legacy", "nodes")).alias("n"))
        .where(F.col("n.id").isNotNull())
        .select(
            F.col("n.id").alias("id"),
            F.col("n.name").alias("name"),
            F.coalesce(F.col("n.category"), F.col("n.categories"), F.col("n.type")).alias(
                "category"
            ),
            _attrs_map(F.col("n.attributes")).alias("attributes"),
        )
        .dropDuplicates(["id"])
    )
    nodes = nodes.unionByName(legacy_nodes)

    edges_map = raw.select(F.explode(kg("doc", "edges")).alias("key", "e"))
    edges = _shape_edges(edges_map).drop("key")
    # legacy list-shaped edges: source_id/target_id/relation_label with the
    # related_to default (load_edge:474-488)
    rel_label = F.coalesce(
        F.get(F.try_variant_get(F.col("le.relation_label"), "$", "array<string>"), 0),
        F.try_variant_get(F.col("le.relation_label"), "$", "string"),
    )
    legacy_edges = _shape_edges(
        raw.select(F.explode(kg("legacy", "edges")).alias("le")).select(
            F.col("le.id").alias("id"),
            F.struct(
                F.coalesce(F.col("le.subject"), F.col("le.source_id")).alias("subject"),
                F.coalesce(F.col("le.predicate"), rel_label).alias("predicate"),
                F.coalesce(F.col("le.object"), F.col("le.target_id")).alias("object"),
                F.col("le.attributes").alias("attributes"),
                F.col("le.sources").alias("sources"),
                F.col("le.qualifiers").alias("qualifiers"),
            ).alias("e"),
        )
    )
    edges = edges.unionByName(legacy_edges, allowMissingColumns=True)
    edges = generate_edge_identifiers(edges)
    nodes = sanitize_import(nodes)
    if validate:
        nodes, _ = validate_nodes(nodes)
        edges, _ = validate_edges(edges)
    return nodes, edges


def read_trapi_jsonl(
    spark: SparkSession, path: str, validate: bool = True
) -> tuple[DataFrame, DataFrame]:
    """TRAPI JSONL → (nodes, edges) (trapi_source.py:305-390).

    One distributed line-based scan (plain ``spark.read.text`` — unlike the
    monolithic document this format is splittable, so 100 TB of TRAPI JSONL
    parallelizes by file split); records route by their ``type`` field.
    Malformed lines are dropped, as the reference's JSONDecodeError handler
    does (from_json yields null). The header row's biolink_version and
    node/edge records missing ``id`` are skipped exactly like the reference.
    """
    recs = spark.read.text(path).select(F.from_json("value", _JSONL_REC).alias("r"))
    nodes = (
        recs.where((F.col("r.type") == "node") & F.col("r.id").isNotNull())
        .select(
            F.col("r.id").alias("id"),
            F.col("r.name").alias("name"),
            # load_node: TRAPI `categories` wins unless legacy `category`
            # is already present (trapi_source.py:346-386)
            F.coalesce(F.col("r.category"), F.col("r.categories")).alias("category"),
            _attrs_map(F.col("r.attributes")).alias("attributes"),
        )
    )
    edge_recs = recs.where(
        (F.col("r.type") == "edge") & F.col("r.id").isNotNull()
    ).select(
        F.col("r.id").alias("id"),
        F.struct(
            F.col("r.subject").alias("subject"),
            F.col("r.predicate").alias("predicate"),
            F.col("r.object").alias("object"),
            F.col("r.attributes").alias("attributes"),
            F.col("r.sources").alias("sources"),
            F.col("r.qualifiers").alias("qualifiers"),
        ).alias("e"),
    )
    # the record's own id is kept, and id-LESS edge records are skipped by
    # the isNotNull guard above — the same behavior as the reference's
    # `'id' in record` requirement (no deterministic fill happens here)
    edges = generate_edge_identifiers(_shape_edges(edge_recs))
    nodes = sanitize_import(nodes)
    if validate:
        nodes, _ = validate_nodes(nodes)
        edges, _ = validate_edges(edges)
    return nodes, edges
