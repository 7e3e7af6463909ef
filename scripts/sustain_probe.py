"""Sustained-load host probe: is this VM CPU-credit throttled?

Runs W sha256 worker processes flat-out for N seconds and prints the
aggregate hash rate + steal-cores for every 10 s window. A credit-throttled
host shows full speed for the first windows, then a cliff once burst
credits drain — which would explain why short idle-time probes read clean
while any stage that FOLLOWS 30-60 s of sustained all-core load measures
2-5x slow (see BASELINE.md round-6 scaling notes).

Usage: python scripts/sustain_probe.py [workers] [seconds]
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import sys
import time


def _worker(stop_at: float, counter) -> None:
    buf = b"\xa5" * (4 << 20)
    while time.time() < stop_at:
        hashlib.sha256(buf).digest()
        with counter.get_lock():
            counter.value += 1


def _stat() -> tuple[int, int]:
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    busy = sum(int(x) for x in parts[1:8]) - int(parts[4])
    steal = int(parts[8]) if len(parts) > 8 else 0
    return busy, steal


def main() -> None:
    workers = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 150
    counter = mp.Value("l", 0)
    stop_at = time.time() + seconds
    ps = [mp.Process(target=_worker, args=(stop_at, counter)) for _ in range(workers)]
    for p in ps:
        p.start()
    tck = os.sysconf("SC_CLK_TCK")
    last_n, (last_b, last_s), last_t = 0, _stat(), time.time()
    windows = []
    while time.time() < stop_at:
        time.sleep(10)
        n = counter.value
        b, s = _stat()
        t = time.time()
        dt = t - last_t
        windows.append({
            "t": round(t - (stop_at - seconds)),
            "hashes_per_sec": round((n - last_n) / dt, 1),
            "busy_cores": round((b - last_b) / tck / dt, 1),
            "steal_cores": round((s - last_s) / tck / dt, 1),
        })
        print(json.dumps(windows[-1]), flush=True)
        last_n, last_b, last_s, last_t = n, b, s, t
    for p in ps:
        p.join()
    rates = [w["hashes_per_sec"] for w in windows]
    print(json.dumps({"workers": workers, "first_window": rates[0],
                      "min_window": min(rates), "last_window": rates[-1],
                      "decay_ratio": round(min(rates) / rates[0], 3)}))


if __name__ == "__main__":
    main()
