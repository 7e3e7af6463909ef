"""Pure-CPU / memory-bandwidth host probes for bench bracketing.

This sandbox VM's host steals CPU in bursts (identical Spark stages vary
5s-70s minutes apart) and its hardware profile drifts between days, so
every scaling or perf claim is bracketed by these Spark-free probes
(BASELINE.md "Measurement environment caveats"). Two probes:

- compute: sha256 over a 4 MB buffer, W worker processes hashing for a
  fixed wall window; efficiency(4->16) = (rate16 / rate4) / 4.
- membw: 64 MB bytearray copies per process at 1/4/16 procs (GB/s).

Usage: python scripts/hw_probe.py [seconds_per_point]
Prints one JSON line. No Spark, no repo imports - safe to run any time
EXCEPT concurrently with a benchmark (it IS load).
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import sys
import time


def _hash_worker(stop_at: float, out) -> None:
    buf = b"\xa5" * (4 << 20)
    n = 0
    while time.time() < stop_at:
        hashlib.sha256(buf).digest()
        n += 1
    out.put(n)


def _copy_worker(stop_at: float, out) -> None:
    src = bytearray(64 << 20)
    n = 0
    while time.time() < stop_at:
        bytes(src)  # one 64 MB read + 64 MB write
        n += 1
    out.put(n)


def _run(target, procs: int, secs: float) -> float:
    q: mp.Queue = mp.Queue()
    stop_at = time.time() + secs
    ps = [mp.Process(target=target, args=(stop_at, q)) for _ in range(procs)]
    t0 = time.time()
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / (time.time() - t0)


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
    compute = {p: _run(_hash_worker, p, secs) for p in (4, 16)}
    membw = {p: _run(_copy_worker, p, secs) * (128 << 20) / 1e9 for p in (1, 4, 16)}
    print(json.dumps({
        "compute_hashes_per_sec": {str(p): round(v, 1) for p, v in compute.items()},
        "compute_eff_4_to_16": round(compute[16] / compute[4] / 4, 3),
        "membw_gb_per_sec": {str(p): round(v, 2) for p, v in membw.items()},
        "membw_eff_4_to_16": round(membw[16] / membw[4] / 4, 3),
    }))


if __name__ == "__main__":
    main()
