"""Stage orchestration utilities: salted partitioning spreads hot keys."""

import pyspark.sql.functions as F

from kgx_spark.pipeline.stages import salted_repartition


def test_salted_repartition_spreads_hot_key(spark):
    # one hub subject dominating the table (the KG hot-key case)
    hub = spark.range(8000).select(F.lit("HUB:1").alias("subject"), F.col("id").alias("payload"))
    tail = spark.range(200).select(
        F.concat(F.lit("T:"), "id").alias("subject"), F.col("id").alias("payload")
    )
    df = hub.unionByName(tail)
    out = salted_repartition(df, "subject", num_partitions=16, salt_buckets=8)
    per_part = (
        out.withColumn("_pid", F.spark_partition_id())
        .where(F.col("subject") == "HUB:1")
        .groupBy("_pid")
        .count()
        .collect()
    )
    # the hub key must land in >1 partition (unsalted hash partitioning puts
    # it in exactly one) and no partition holds more than ~half of it
    assert len(per_part) > 1
    assert max(r["count"] for r in per_part) < 8000
    # determinism: same input → same layout
    out2 = salted_repartition(df, "subject", num_partitions=16, salt_buckets=8)
    a = sorted((r["_pid"], r["count"]) for r in per_part)
    b = sorted(
        (r["_pid"], r["count"])
        for r in out2.withColumn("_pid", F.spark_partition_id())
        .where(F.col("subject") == "HUB:1").groupBy("_pid").count().collect()
    )
    assert a == b
