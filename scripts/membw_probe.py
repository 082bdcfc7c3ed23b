"""Aggregate memory-bandwidth probe: N isolated OS processes, each
streaming copies over arrays far larger than LLC, for a fixed wall
window. Prints one JSON line {"procs": N, "gbytes_per_sec": total}.

Purpose (BENCH/BASELINE.md): the compute-kernel ceiling
(kernel_scaling_probe.py) has a cache-resident working set, so it
scales ~linearly on a quiet box and cannot explain why a
memory-intensive job stops scaling. This probe measures the resource
that actually saturates: one socket's DRAM bus is shared by all 32
vCPUs, so aggregate GB/s grows far slower than 4x from 8 to 32 procs —
the curve any bandwidth-bound stage is bounded by on a single box, and
exactly the resource a real N->4N cluster multiplies (each added node
brings its own memory buses).

Usage: python membw_probe.py <procs> [seconds]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

import numpy as np

ARRAY_MB = 256  # far beyond any LLC; forces DRAM traffic (matches the
# "256 MB arrays" wording in the BASELINE.md report template)


def _worker(seconds: float, q: mp.Queue) -> None:
    n = ARRAY_MB * 1024 * 1024 // 8
    src = np.ones(n, dtype=np.float64)
    dst = np.empty_like(src)
    # warm both buffers (page faults out of the timed window)
    np.copyto(dst, src)
    t0 = time.perf_counter()
    passes = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, src)
        passes += 1
    elapsed = time.perf_counter() - t0
    # count read + write traffic for each pass
    q.put(2 * passes * src.nbytes / elapsed)


def _measure_once(procs: int, seconds: float) -> float:
    q: mp.Queue = mp.Queue()
    ps = [
        mp.Process(target=_worker, args=(seconds, q)) for _ in range(procs)
    ]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / 1e9


def measure(procs: int, seconds: float = 2.0, repeats: int = 2) -> float:
    """Best-of-``repeats`` short windows: a single window can land on a
    co-tenant burst and report a 10-20x-low number (observed on this
    host); the max across spaced windows is the achievable bandwidth."""
    return max(_measure_once(procs, seconds) for _ in range(repeats))


if __name__ == "__main__":
    procs = int(sys.argv[1])
    seconds = float(sys.argv[2]) if len(sys.argv) > 2 else 4.0
    print(
        json.dumps(
            {"procs": procs, "gbytes_per_sec": round(measure(procs, seconds), 2)}
        )
    )
