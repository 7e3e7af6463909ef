"""Isolated probe of the pipeline's `edges` merge stage at one parallelism.

The 4→16 scaling sequences (BASELINE.md) keep showing the merge stage as
the widest gap; full-pipeline runs can't separate engine behavior from the
host's steal bursts because the stage sits ~90s into each run. This probe
times JUST that stage — canonical snapshot in, merge_edges + deterministic
ids + sortWithinPartitions + parquet write out — looped in one JVM with
per-loop /proc/stat steal readings, so a regression can be attributed.

Usage: python scripts/probe_edges_stage.py <master> <canonical_parquet> [loops] [shuffle_partitions]
Prints one JSON line: {"master", "walls": [...], "steals": [...], "rows": N}.

The canonical snapshot comes from any prior run_kg_pipeline workdir
(<workdir>/canonical); generate one with scripts/run_pipeline.py.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def cpu_counters() -> list[int]:
    with open("/proc/stat") as fh:
        return list(map(int, fh.readline().split()[1:]))


def main() -> None:
    master = sys.argv[1]
    canonical = sys.argv[2]
    loops = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from kgx_spark.functions.keys import generate_edge_identifiers
    from kgx_spark.operators.merge import merge_edges
    from kgx_spark.session import get_spark

    try:
        n = int(master.split("[")[1].rstrip("]")) if "[" in master else 16
    except ValueError:  # local-cluster[N,C,mem] → N*C total cores
        bits = master.split("[")[1].rstrip("]").split(",")
        n = int(bits[0]) * int(bits[1])
    parts = int(sys.argv[4]) if len(sys.argv) > 4 else n
    spark = get_spark("edges-probe", master=master, shuffle_partitions=parts)
    canon = spark.read.parquet(canonical)
    for c in ("_original_subject", "_original_object"):
        if c in canon.columns:
            canon = canon.drop(c)
    rows = canon.count()  # warm the scan/page cache once before timing

    walls, steals = [], []
    for _ in range(loops):
        out = tempfile.mkdtemp(prefix="kgx_edges_probe_", dir="/dev/shm")
        a = cpu_counters()
        t0 = time.monotonic()
        merged = generate_edge_identifiers(merge_edges([canon]))
        merged.sortWithinPartitions("subject").write.mode("overwrite").parquet(out)
        walls.append(round(time.monotonic() - t0, 2))
        b = cpu_counters()
        d = [y - x for x, y in zip(a, b)]
        steals.append(round(32 * d[7] / max(sum(d), 1), 2))
        shutil.rmtree(out, ignore_errors=True)
    print(json.dumps({"master": master, "parts": parts, "rows": rows, "walls": walls, "steals": steals}))


if __name__ == "__main__":
    main()
