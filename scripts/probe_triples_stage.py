"""Isolate the `triples` stage scaling anomaly.

Phase A (--prepare): run extract once at the given master, leave the
snapshot in a fixed dir (mirrors run_stages' commit exactly).
Phase B (--measure): fresh JVM per call; read the snapshot, run
extract_triples, write the output snapshot, print wall + scan/task counts.

Usage:
  python scripts/probe_triples_stage.py prepare <snapdir> [sf] [repeat] [master]
  python scripts/probe_triples_stage.py measure <snapdir> <master>
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgx_spark.session import get_spark  # noqa: E402


def main() -> None:
    mode, snapdir = sys.argv[1], sys.argv[2]
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm")
    if mode == "prepare":
        sf = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        repeat = int(sys.argv[4]) if len(sys.argv) > 4 else 32
        master = sys.argv[5] if len(sys.argv) > 5 else "local[16]"
        from pyspark.sql import functions as F

        from kgx_spark.pipeline.synth import synth_pages
        from kgx_spark.pipeline.extract import extract_text

        spark = get_spark("prep", master=master, shuffle_partitions=64,
                          extra_conf={"spark.sql.files.maxPartitionBytes": str(32 << 20)})
        pages = synth_pages(spark, sf)
        if repeat > 1:
            pages = (pages.crossJoin(spark.range(repeat).select(F.col("id").alias("_rep")))
                     .withColumn("url", F.concat_ws("#", "url", "_rep")).drop("_rep"))
        target = max(2 * spark.sparkContext.defaultParallelism, 8)
        pages = pages.repartition(target, "url")
        out = extract_text(pages).select("url", "warc_ts", "extracted_text", "lang")
        out.write.mode("overwrite").parquet(snapdir)
        n = spark.read.parquet(snapdir).count()
        print(json.dumps({"prepared": snapdir, "rows": n}))
    else:
        master = sys.argv[3]
        with_extract = len(sys.argv) > 4 and sys.argv[4] == "--with-extract"
        from kgx_spark.pipeline.triples import extract_triples

        cores = int(master[master.find("[") + 1 : master.find("]")])
        extra = {"spark.sql.files.maxPartitionBytes": str(32 << 20)}
        if os.environ.get("PROBE_CODECACHE"):
            extra["spark.driver.extraJavaOptions"] = (
                f"-XX:ReservedCodeCacheSize={os.environ['PROBE_CODECACHE']}"
            )
        spark = get_spark("triples_probe", master=master, shuffle_partitions=4 * cores,
                          extra_conf=extra)
        if with_extract:
            # replay the pipeline's stage sequence in THIS JVM: run extract
            # (pandas-UDF python workers, Arrow transfer) and write its
            # snapshot before timing triples, mimicking run_stages state
            import gc

            from pyspark.sql import functions as F

            from kgx_spark.pipeline.extract import extract_text
            from kgx_spark.pipeline.synth import synth_pages

            pages = synth_pages(spark, "/root/testdata/sf0.1")
            pages = (pages.crossJoin(spark.range(32).select(F.col("id").alias("_rep")))
                     .withColumn("url", F.concat_ws("#", "url", "_rep")).drop("_rep"))
            target = max(2 * spark.sparkContext.defaultParallelism, 8)
            pages = pages.repartition(target, "url")
            ex = extract_text(pages).select("url", "warc_ts", "extracted_text", "lang")
            exdir = snapdir.rstrip("/") + f".ex.{cores}"
            ex.write.mode("overwrite").parquet(exdir)
            gc.collect()
            spark.catalog.clearCache()
            if os.environ.get("PROBE_JVM_GC"):
                spark.sparkContext._jvm.System.gc()
            src = spark.read.parquet(exdir)
        else:
            src = spark.read.parquet(snapdir)
        def cpu_ticks() -> tuple[int, int]:
            with open("/proc/stat") as fh:
                parts = fh.readline().split()
            busy = sum(int(x) for x in parts[1:8]) - int(parts[4])  # non-idle
            steal = int(parts[8]) if len(parts) > 8 else 0
            return busy, steal

        jmf = spark.sparkContext._jvm.java.lang.management.ManagementFactory

        def jit_ms() -> int:
            return jmf.getCompilationMXBean().getTotalCompilationTime()

        def gc_ms() -> int:
            total, it = 0, jmf.getGarbageCollectorMXBeans().iterator()
            while it.hasNext():
                total += it.next().getCollectionTime()
            return total

        t0 = time.monotonic()
        c0, s0 = cpu_ticks()
        j0, g0 = jit_ms(), gc_ms()
        df = extract_triples(src)
        outdir = snapdir.rstrip("/") + f".triples.{cores}"
        df.write.mode("overwrite").parquet(outdir)
        wall = time.monotonic() - t0
        c1, s1 = cpu_ticks()
        tck = os.sysconf("SC_CLK_TCK")
        busy_cores = (c1 - c0) / tck / wall
        steal_cores = (s1 - s0) / tck / wall
        n_splits = spark.read.parquet(snapdir).rdd.getNumPartitions()
        pools = {}
        it = spark.sparkContext._jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans().iterator()
        while it.hasNext():
            p = it.next()
            if "CodeHeap" in p.getName() or "Code Cache" in p.getName():
                u, pk = p.getUsage(), p.getPeakUsage()
                pools[p.getName()] = (
                    f"{u.getUsed() >> 20}/{u.getMax() >> 20}MB peak={pk.getUsed() >> 20}MB"
                )
        print(json.dumps({"master": master, "wall_sec": round(wall, 2),
                          "scan_splits": n_splits,
                          "busy_cores_avg": round(busy_cores, 1),
                          "steal_cores_avg": round(steal_cores, 1),
                          "jit_sec": round((jit_ms() - j0) / 1e3, 1),
                          "gc_sec": round((gc_ms() - g0) / 1e3, 1),
                          "code_heaps": pools}))


if __name__ == "__main__":
    main()
