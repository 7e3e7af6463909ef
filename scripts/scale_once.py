"""One scaling-measurement invocation: run the full KG pipeline once at the
given master, append one JSON line (wall, triples/sec, per-stage walls) to a
results file. The driving session interleaves masters across invocations and
brackets the sequence with scripts/hw_probe.py readings — each invocation is
kept separate so no single command outlives the sandbox's command cap.

Usage: python scripts/scale_once.py <master> <out.jsonl> [sf_dir] [repeat]
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


def main() -> None:
    master = sys.argv[1]
    out_file = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    repeat = int(sys.argv[4]) if len(sys.argv) > 4 else 32

    def cpu_stat() -> tuple[int, int]:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        busy = sum(int(x) for x in parts[1:8]) - int(parts[4])
        steal = int(parts[8]) if len(parts) > 8 else 0
        return busy, steal

    snap_base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    workdir = tempfile.mkdtemp(prefix="kgx_scale1_", dir=snap_base)
    import time

    t0 = time.monotonic()
    b0, s0 = cpu_stat()
    try:
        cmd = [
            sys.executable, str(REPO / "scripts" / "run_pipeline.py"),
            "--sf-dir", sf_dir, "--workdir", workdir,
            "--master", master, "--no-link", "--force",
            "--repeat-input", str(repeat), "--materialize-input",
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, timeout=540)
        line = out.stdout.strip().splitlines()[-1]
        result = json.loads(line)
        metrics_path = Path(workdir) / "metrics.jsonl"
        if metrics_path.exists():
            result["stage_walls"] = {
                m["stage"]: m["wall_sec"]
                for m in (json.loads(ln) for ln in metrics_path.read_text().splitlines() if ln.strip())
            }
        result["master"] = master
        # host-contention tracer over the whole invocation (round-6 finding:
        # hypervisor steal tracks the slow draws; see sustain_probe.py)
        dt = time.monotonic() - t0
        b1, s1 = cpu_stat()
        tck = os.sysconf("SC_CLK_TCK")
        result["host_busy_cores"] = round((b1 - b0) / tck / dt, 1)
        result["host_steal_cores"] = round((s1 - s0) / tck / dt, 2)
        with open(out_file, "a") as fh:
            fh.write(json.dumps(result) + "\n")
        print(json.dumps(result))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
