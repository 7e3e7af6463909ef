"""Isolated probe of the pipeline's `extract` stage at one parallelism.

The round-6 4/8/16/32 scaling sequences (BASELINE.md) show the extract
stage FLAT (~17 s) at every width — the one stage that never scales even
in clean-steal draws. Full-pipeline walls can't separate the three terms
this stage fuses: building the synthetic pages input (joins + agg over
lineitem), the repartition shuffle, and the pandas-UDF extraction itself.
This probe times them apart, looped in one JVM with per-loop steal
readings:

  input   — synth_pages + repeat crossJoin, materialized to tmpfs parquet
            (the production analogue is the pre-existing Iceberg pages
            table: NOT part of extraction cost)
  extract — read that parquet, repartition(2*cores, url), extract_text,
            write the extracted snapshot

Usage: python scripts/probe_extract_stage.py <master> [sf_dir] [repeat] [loops]
Prints one JSON line:
  {"master", "input_walls": [...], "extract_walls": [...], "steals": [...],
   "rows": N}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def steal_cores(prev: tuple[float, int]) -> tuple[float, float, int]:
    now = time.monotonic()
    with open("/proc/stat") as fh:
        s = int(fh.readline().split()[8])
    tck = os.sysconf("SC_CLK_TCK")
    dt = now - prev[0]
    return (s - prev[1]) / tck / dt if dt > 0 else 0.0, now, s


def main() -> None:
    master = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    repeat = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    loops = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    from pyspark.sql import functions as F

    from kgx_spark.pipeline.extract import extract_text
    from kgx_spark.pipeline.synth import synth_pages
    from kgx_spark.session import get_spark

    n = master[master.find("[") + 1 : master.find("]")]
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32")) if n == "*" else int(n)
    base_dir = "/dev/shm" if os.path.isdir("/dev/shm") else None
    work = tempfile.mkdtemp(prefix="kgx_probe_extract_", dir=base_dir)
    spark = get_spark("probe_extract", master=master, shuffle_partitions=4 * cores)
    try:
        input_walls, extract_walls, steals = [], [], []
        pages_path = f"{work}/pages"
        with open("/proc/stat") as fh:
            prev = (time.monotonic(), int(fh.readline().split()[8]))
        for i in range(loops):
            t0 = time.monotonic()
            pages = (
                synth_pages(spark, sf_dir)
                .crossJoin(spark.range(repeat).select(F.col("id").alias("_rep")))
                .withColumn("url", F.concat_ws("#", "url", "_rep"))
                .drop("_rep")
            )
            pages.write.mode("overwrite").parquet(pages_path)
            t1 = time.monotonic()
            input_walls.append(round(t1 - t0, 2))

            src = spark.read.parquet(pages_path)
            target = max(2 * spark.sparkContext.defaultParallelism, 8)
            out = extract_text(src.repartition(target, "url")).select(
                "url", "warc_ts", "extracted_text", "lang"
            )
            out.write.mode("overwrite").parquet(f"{work}/extract")
            t2 = time.monotonic()
            extract_walls.append(round(t2 - t1, 2))
            st, *rest = steal_cores(prev)
            prev = tuple(rest)
            steals.append(round(st, 2))
        rows = spark.read.parquet(f"{work}/extract").count()
        print(json.dumps({
            "master": master,
            "input_walls": input_walls,
            "extract_walls": extract_walls,
            "steals": steals,
            "rows": rows,
        }))
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
