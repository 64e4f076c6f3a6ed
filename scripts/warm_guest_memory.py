"""Pre-warm guest memory before benchmarking (sandbox-artifact mitigation).

This sandbox is a snapshot-restored microVM: the FIRST touch of any
guest-physical page is serviced through the VMM at ~30-100 us/page — 50-100x
the cost of a warm fault (measured here: first-touch of 1 GiB = 8-25 s,
retouch = 0.3 s). Un-warmed, benchmark runs measure fault service, not the
pipeline: the identical Spark job swings 5 s .. 92 s run-to-run, and JVM GC
evacuation into cold heap regions turns into multi-minute kernel-time storms
(sys 23-50%, user ~1%).

The warmer touches `total_gb` of anon memory ONCE, holding all of it resident
simultaneously (freeing between chunks lets the guest allocator hand the same
warm physical pages back, leaving the rest cold — measured: a free-as-you-go
warmer left fresh allocations at ~16 s/GiB; the resident warmer gets them to
0.28 s/GiB). Pages stay host-backed after release, so one warm per boot
suffices. A real cluster does not need this — it exists so BENCH.md measures
the engine, not the sandbox.

Usage: python scripts/warm_guest_memory.py [total_gb] [procs]
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

GB = 1 << 30
_RELEASE = "/tmp/.warm_release"


def _avail_gb() -> float:
    for ln in open("/proc/meminfo"):
        if ln.startswith("MemAvailable"):
            return int(ln.split()[1]) / (1024 * 1024)
    return 0.0


def _warm(args: tuple[int, int]) -> int:
    _, n = args
    import numpy as np

    blocks = []
    for _ in range(n):
        a = np.empty(GB, dtype=np.uint8)
        a[::4096] = 1  # touch every 4 KiB page
        blocks.append(a)
    # hold resident until all procs done (bounded: never outlive a dead
    # parent — an orphaned warmer would pin `n` GiB forever)
    deadline = time.time() + 600
    while not os.path.exists(_RELEASE) and time.time() < deadline:
        time.sleep(0.5)
    return n


def warm(total_gb: int | None = None, procs: int = 16) -> float:
    """Touch ~total_gb of distinct guest memory; returns seconds taken."""
    if total_gb is None:
        total_gb = max(8, int(_avail_gb()) - 20)  # leave headroom
    per = max(1, total_gb // procs)
    if os.path.exists(_RELEASE):
        os.remove(_RELEASE)
    t0 = time.time()
    with mp.Pool(procs) as pool:
        res = pool.map_async(_warm, [(i, per) for i in range(procs)])
        target_left = _avail_gb() - procs * per
        while _avail_gb() > target_left + 3 and not res.ready():
            time.sleep(2)
        with open(_RELEASE, "w") as f:
            f.write("go")
        res.get()
    os.remove(_RELEASE)
    return time.time() - t0


if __name__ == "__main__":
    tg = int(sys.argv[1]) if len(sys.argv) > 1 else None
    pr = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    secs = warm(tg, pr)
    print(f"warmed guest memory in {secs:.1f}s")
