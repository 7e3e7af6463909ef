"""Bucketed materialization: co-located joins avoid the exchange."""

import pyspark.sql.functions as F

from kgx_spark.sinks.parquet import write_bucketed


def test_bucketed_join_has_no_exchange_on_bucketed_side(spark, tmp_path):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored); drop them at the end
    nodes = spark.range(500).select(
        F.concat(F.lit("N:"), "id").alias("id"), F.lit("x").alias("name")
    )
    edges = spark.range(2000).select(
        F.concat(F.lit("N:"), (F.col("id") % 500)).alias("subject"),
        F.lit("biolink:related_to").alias("predicate"),
        F.concat(F.lit("N:"), ((F.col("id") + 7) % 500)).alias("object"),
    )
    write_bucketed(nodes, edges, "kgx_test", buckets=8)
    n = spark.table("kgx_test_nodes")
    e = spark.table("kgx_test_edges")
    joined = e.join(n.withColumnRenamed("id", "subject"), on="subject")
    assert joined.count() == 2000
    # bucketed-on-key sides must not re-shuffle: at most ONE exchange (for
    # the non-aligned side), never two
    plan = joined._sc._jvm.PythonSQLUtils.explainString(joined._jdf.queryExecution(), "simple")
    assert plan.count("Exchange hashpartitioning") <= 1
    spark.sql("DROP TABLE IF EXISTS kgx_test_nodes")
    spark.sql("DROP TABLE IF EXISTS kgx_test_edges")
