"""KGX-shaped fixture tables derived deterministically from the driver's
generic TPC-H-ish parquet (FIXTURES.md §8): every fixture has a closed-form
definition so the DuckDB oracle in __spark_entry__.oracle_sql can reproduce
it exactly.

Derivations (shared contract with the oracle SQL — keep in sync):
- nodes_a (from part):     id 'P:'||p_partkey, name p_name,
  category [case(p_size%3), 'biolink:NamedThing'], provided_by [infores:part],
  p1 = 'even'/'odd' by p_partkey%2, xref ['X:'||p_partkey]
- nodes_b (same ids, conflicts): name upper(p_name),
  category ['biolink:NamedThing'], provided_by [infores:part-b], p1 'b'
- supplier_nodes:          id 'S:'||s_suppkey, name s_name,
  category [case(s_suppkey%2)], provided_by [infores:supplier]
- edges (from lineitem):   'P:'||l_partkey →predicate(l_linenumber%2)→
  'S:'||l_suppkey, relation 'RO:'||l_linenumber,
  provided_by ['infores:'||lower(l_returnflag)]
- sameas_edges:            Q:k→same_as→P:k and R:k→same_as→Q:k per distinct
  partkey in lineitem (multi-hop chains, closed-form leader P:k)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CAT_BY_SIZE = {0: "biolink:Gene", 1: "biolink:Disease", 2: "biolink:ChemicalEntity"}
CAT_BY_SUPP = {0: "biolink:Gene", 1: "biolink:ChemicalEntity"}


def _part(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/part.parquet")


def part_category() -> F.Column:
    m = F.col("p_size") % 3
    return (
        F.when(m == 0, CAT_BY_SIZE[0]).when(m == 1, CAT_BY_SIZE[1]).otherwise(CAT_BY_SIZE[2])
    )


def nodes_a(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _part(spark, sf_dir).select(
        F.concat(F.lit("P:"), "p_partkey").alias("id"),
        F.col("p_name").alias("name"),
        F.array_sort(F.array(part_category(), F.lit("biolink:NamedThing"))).alias("category"),
        F.array(F.lit("infores:part")).alias("provided_by"),
        F.when(F.col("p_partkey") % 2 == 0, "even").otherwise("odd").alias("p1"),
        F.array(F.concat(F.lit("X:"), "p_partkey")).alias("xref"),
    )


def nodes_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _part(spark, sf_dir).select(
        F.concat(F.lit("P:"), "p_partkey").alias("id"),
        F.upper(F.col("p_name")).alias("name"),
        F.array(F.lit("biolink:NamedThing")).alias("category"),
        F.array(F.lit("infores:part-b")).alias("provided_by"),
        F.lit("b").alias("p1"),
        F.lit(None).cast("array<string>").alias("xref"),
    )


def supplier_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    return supp.select(
        F.concat(F.lit("S:"), "s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.array(
            F.when(F.col("s_suppkey") % 2 == 0, CAT_BY_SUPP[0]).otherwise(CAT_BY_SUPP[1])
        ).alias("category"),
        F.array(F.lit("infores:supplier")).alias("provided_by"),
    )


def edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.select(
        F.concat(F.lit("P:"), "l_partkey").alias("subject"),
        F.when(F.col("l_linenumber") % 2 == 0, "biolink:related_to")
        .otherwise("biolink:interacts_with")
        .alias("predicate"),
        F.concat(F.lit("S:"), "l_suppkey").alias("object"),
        F.concat(F.lit("RO:"), "l_linenumber").alias("relation"),
        F.array(F.concat(F.lit("infores:"), F.lower("l_returnflag"))).alias("provided_by"),
    )


def sameas_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_partkey").distinct()
    q_to_p = keys.select(
        F.concat(F.lit("Q:"), "l_partkey").alias("subject"),
        F.lit("biolink:same_as").alias("predicate"),
        F.concat(F.lit("P:"), "l_partkey").alias("object"),
    )
    r_to_q = keys.select(
        F.concat(F.lit("R:"), "l_partkey").alias("subject"),
        F.lit("biolink:same_as").alias("predicate"),
        F.concat(F.lit("Q:"), "l_partkey").alias("object"),
    )
    return q_to_p.unionByName(r_to_q)


def rotated_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data edges whose subject rotates P:/Q:/R: by l_linenumber%3 — after
    canonicalization every subject must resolve to P:k (closed-form oracle)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pfx = (
        F.when(F.col("l_linenumber") % 3 == 0, "P:")
        .when(F.col("l_linenumber") % 3 == 1, "Q:")
        .otherwise("R:")
    )
    return li.select(
        F.concat(pfx, "l_partkey").alias("subject"),
        F.lit("biolink:related_to").alias("predicate"),
        F.concat(F.lit("S:"), "l_suppkey").alias("object"),
        F.lit(None).cast("array<string>").alias("provided_by"),
    )
