"""Host-ceiling probes backing BENCH/BASELINE.md §3 — no Spark involved.

Two multiprocessing probes at a given process count:

- ``cpu``: integer arithmetic in a tight loop (no memory traffic) — scales
  with cores unless the scheduler is the limit.
- ``mem``: streaming sums over ~256 MB numpy arrays per process — scales
  with attainable MEMORY BANDWIDTH, the resource a single-JVM local[N]
  "cluster" shares across all its executor threads.

Usage: python tools/hostprobe.py [procs ...]   (default: 2 4 8 16 32)
Prints one JSON line per process count.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def _cpu_worker(n: int) -> int:
    x = 1
    for i in range(n):
        x = (x * 1103515245 + 12345) % 2147483648
    return x


def _mem_worker(seconds: float) -> int:
    a = np.arange(32_000_000, dtype=np.float64)  # 256 MB
    t_end = time.time() + seconds
    passes = 0
    while time.time() < t_end:
        a.sum()
        passes += 1
    return passes


def probe(procs: int) -> dict:
    n_ops = 20_000_000
    with mp.Pool(procs) as pool:
        t0 = time.time()
        pool.map(_cpu_worker, [n_ops] * procs)
        cpu_s = time.time() - t0
    cpu_ops = procs * n_ops / cpu_s

    secs = 4.0
    with mp.Pool(procs) as pool:
        passes = pool.map(_mem_worker, [secs] * procs)
    mem_gbps = sum(passes) * 256 / 1024 / secs

    return {
        "procs": procs,
        "cpu_mops_per_s": round(cpu_ops / 1e6, 1),
        "mem_stream_gb_per_s": round(mem_gbps, 2),
    }


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [2, 4, 8, 16, 32]
    for c in counts:
        print(json.dumps(probe(c)))
