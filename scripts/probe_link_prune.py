"""Same-session interleaved probe: entity_link with vs without the
first-token mention prune (round-4 VERDICT #6).

Runs the full entity-link query (synth pages → extract → mentions →
broadcast dictionary link) alternately with first_tokens pruning OFF and
ON, N rounds each, in ONE Spark session, and prints min/median walls.
Interleaving inside one session removes JVM-start and host-burst drift —
the comparison is valid only within this process's hour (BASELINE.md
protocol).

Usage: python scripts/probe_link_prune.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm")

from kgx_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("probe-link-prune", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))

    from kgx_spark.pipeline.extract import extract_text
    from kgx_spark.pipeline.link import (
        alias_first_tokens,
        detect_mentions,
        link_mentions,
    )
    from kgx_spark.pipeline.synth import synth_alias_dict, synth_pages

    raw_pages = synth_pages(spark, sf_dir)
    n_pages = raw_pages.count()
    alias_dict = synth_alias_dict(spark, sf_dir)
    ft = alias_first_tokens(alias_dict)
    print(f"n_pages={n_pages} first_tokens={len(ft)}", file=sys.stderr)

    def run(first_tokens):
        t0 = time.monotonic()
        linked = link_mentions(
            detect_mentions(extract_text(raw_pages), first_tokens=first_tokens),
            alias_dict,
            n_pages=n_pages,
        )
        cnt = linked.count()
        return time.monotonic() - t0, cnt

    walls = {"off": [], "on": []}
    counts = set()
    # warmup one of each (JIT, broadcast relation build)
    run(None)
    run(ft)
    for _ in range(rounds):
        w, c = run(None)
        walls["off"].append(round(w, 2))
        counts.add(("off", c))
        w, c = run(ft)
        walls["on"].append(round(w, 2))
        counts.add(("on", c))
    out = {
        "sf": sf_dir,
        "cpus": cpus,
        "off": walls["off"],
        "on": walls["on"],
        "off_min": min(walls["off"]),
        "on_min": min(walls["on"]),
        "off_median": statistics.median(walls["off"]),
        "on_median": statistics.median(walls["on"]),
        "counts_match": len({c for _, c in counts}) == 1,
        "rows": sorted({c for _, c in counts}),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
