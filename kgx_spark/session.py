"""SparkSession factory tuned for the kgx_spark engine.

Local-mode defaults mirror what we'd set on a real cluster:
- AQE on (runtime re-plan, skew-join splitting, partition coalescing);
- Arrow on (all Python↔JVM transfer is vectorized);
- UTC session timezone (oracle comparisons against DuckDB are UTC-naive);
- shuffle partitions sized to cores locally (overridden per-job at scale).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgx_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: ~1 shuffle partition per core; a real cluster would
        # size this to data volume (see docs/SCALE.md).
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cpus)
        shuffle_partitions = cpus if n == "*" else max(4, int(n))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # don't let AQE coalesce below core count on small-but-CPU-heavy
        # shuffles (local data is MBs; default 1m floor halved parallelism)
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        # collect_list/collect_set aggregates (the merge kernel) run as
        # ObjectHashAggregate, which falls back to SORT-based aggregation
        # after a default of only 128 keys — the fallback external-sorts
        # every map task's input (measured 3-4× stage slowdowns, variance
        # from spill behavior). KG merges group on (s,p,o) with ~1e6 keys
        # per task and small per-key state; keep them in the hash path.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        # zstd parquet output: measurably smaller stage snapshots / sink
        # files at equal read speed (optimization guide §6); A/B'd at sf0.1
        # local[32] — pipeline walls at parity (11.2-12.6 s both codecs), so
        # the local bench is unaffected while 100-TB snapshot IO shrinks.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # only consulted by multi-JVM masters (local-cluster / standalone);
        # plain local mode runs tasks inside the driver heap above
        .config("spark.executor.memory", os.environ.get("SPARK_GRAFT_EXECUTOR_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # Shuffle/spill directory: a cluster has many local SSDs; this sandbox has
    # one slow virtio disk. SPARK_GRAFT_LOCAL_DIR=/dev/shm moves shuffle files
    # to RAM for benchmarking (the 128 GiB box absorbs our shuffle volumes).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    # JIT code cache headroom (standard practice for codegen-heavy Spark:
    # every whole-stage-codegen query compiles fresh classes, and a
    # long-lived executor serving many queries can exhaust the 240 MB JVM
    # default, silently flipping hot loops to interpreted execution). Our
    # local probes peak at ~38 MB per short job (scripts/
    # probe_triples_stage.py reports per-heap peaks), so this is headroom
    # for production-length sessions, NOT a measured local win — the
    # "stage slow after a prior stage in the same JVM" anomaly investigated
    # in round 6 turned out to track hypervisor steal, not cache pressure
    # (BASELINE.md round-6 scaling notes).
    code_cache = os.environ.get("SPARK_GRAFT_CODE_CACHE", "512m")
    java_opts = f"-XX:ReservedCodeCacheSize={code_cache}"
    builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    builder = builder.config("spark.executor.extraJavaOptions", java_opts)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
