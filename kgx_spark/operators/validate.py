"""Record validation with error side-outputs.

Reference: kgx/source/source.py
- validate_node (reject empty id, default category): 281-321
- validate_edge (reject missing s/p/o): 323-366

The reference drops invalid records inside the generator and logs; here each
validator returns (valid_df, errors_df) — errors are a first-class DataFrame
(entity, level, error_type, message), mirroring kgx/error_detection.py:48-174.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgx_spark.schema import DEFAULT_NODE_CATEGORY


def _errors(df: DataFrame, cond: Column, entity: Column, error_type: str, message: str) -> DataFrame:
    return df.where(cond).select(
        entity.alias("entity"),
        F.lit("ERROR").alias("level"),
        F.lit(error_type).alias("error_type"),
        F.lit(message).alias("message"),
    )


def validate_nodes(nodes: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid nodes with defaulted category, errors).

    - missing/empty id ⇒ rejected (source.py:286-296) — including a file
      with no id COLUMN at all (the reference's incomplete_nodes.tsv case:
      every record routes to the error side-output, nothing crashes);
    - missing category ⇒ defaulted to [biolink:NamedThing] (source.py:305-309);
    - missing name ⇒ warning only (source.py:298-303) — kept.
    """
    if "id" not in nodes.columns:
        nodes = nodes.withColumn("id", F.lit(None).cast("string"))
    bad_id = F.col("id").isNull() | (F.col("id") == "")
    errors = _errors(
        nodes, bad_id, F.coalesce(F.col("id"), F.lit("")), "MISSING_NODE_PROPERTY",
        "Node does not have a valid `id`",
    )
    valid = nodes.where(~bad_id)
    if "category" in valid.columns:
        cat = F.col("category")
        valid = valid.withColumn(
            "category",
            F.when(cat.isNull() | (F.size(cat) == 0), F.array(F.lit(DEFAULT_NODE_CATEGORY))).otherwise(cat),
        )
    else:
        valid = valid.withColumn("category", F.array(F.lit(DEFAULT_NODE_CATEGORY)))
    return valid, errors


def validate_edges(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(valid edges, errors) — reject missing subject/predicate/object
    (source.py:323-366)."""
    for c in ("subject", "predicate", "object"):
        if c not in edges.columns:  # same no-column guard as validate_nodes
            edges = edges.withColumn(c, F.lit(None).cast("string"))

    def missing(c: str) -> Column:
        return F.col(c).isNull() | (F.col(c) == "")

    ent = F.concat_ws("-", F.coalesce(F.col("subject"), F.lit("")),
                      F.coalesce(F.col("predicate"), F.lit("")),
                      F.coalesce(F.col("object"), F.lit("")))
    errs = None
    for c in ("subject", "predicate", "object"):
        e = _errors(edges, missing(c), ent, "MISSING_EDGE_PROPERTY",
                    f"Edge does not have a valid `{c}`")
        errs = e if errs is None else errs.unionByName(e)
    valid = edges.where(~missing("subject") & ~missing("predicate") & ~missing("object"))
    return valid, errs
