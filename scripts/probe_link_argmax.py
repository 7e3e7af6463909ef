"""Interleaved A/B of the entity_link argmax form (window vs min_by agg).

Runs the repo-under-test's entity_link query in a fresh JVM and prints
wall + rows + the host steal tracer. The driving session alternates this
script between the changed tree and a pre-change worktree (same-hour
control per BASELINE.md discipline).

Usage: python scripts/probe_link_argmax.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cpu_stat() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    return (sum(int(x) for x in parts[1:8]) - int(parts[4]),
            int(parts[8]) if len(parts) > 8 else 0)


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm")
    from kgx_spark.session import get_spark
    import __spark_entry__ as m

    spark = get_spark("linkab", master="local[32]", shuffle_partitions=32)
    walls = []
    for _ in range(runs):
        t0 = time.monotonic()
        b0, s0 = cpu_stat()
        n = m.queries()["entity_link"](spark, sf).count()
        dt = time.monotonic() - t0
        b1, s1 = cpu_stat()
        tck = os.sysconf("SC_CLK_TCK")
        walls.append({"wall": round(dt, 2), "rows": n,
                      "steal_cores": round((s1 - s0) / tck / dt, 2)})
    print(json.dumps({"repo": os.path.dirname(os.path.abspath(__file__)),
                      "runs": walls, "min_wall": min(w["wall"] for w in walls)}))


if __name__ == "__main__":
    main()
