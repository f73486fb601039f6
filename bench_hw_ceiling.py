#!/usr/bin/env python
"""Hardware scaling ceiling of this sandbox (context for BENCH/BASELINE.md).

Two microbenchmarks, N processes each:
- cpu: cache-resident pure-python loop (no memory traffic) — measures
  how much CPU the box really grants N runnable processes.
- mem: DRAM-streaming numpy add over a 200 MB array — measures aggregate
  memory bandwidth, the resource Spark shuffle / Arrow transfer /
  posting decode are bound by.

A local[N] "cluster" shares one box's DRAM and GC; efficiency of a
bandwidth-bound stage can never exceed mem_eff(N→4N) here, whereas on a
real cluster each added executor node brings its own DRAM/disk/JVM.
Prints one JSON line with per-level throughputs and N→4N efficiencies.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import time

import numpy as np

LEVELS = (1, 2, 8, 32)


def _cpu(q):
    x = 0
    n = 0
    t0 = time.time()
    while time.time() - t0 < 3.0:
        for _ in range(10000):
            x += 1
        n += 10000
    q.put(n)


def _mem(q):
    a = np.zeros(200_000_000 // 8, dtype=np.float64)
    n = 0
    t0 = time.time()
    while time.time() - t0 < 3.0:
        a += 1.0
        n += 1
    q.put(n * a.nbytes * 2)


def run(target) -> dict[int, float]:
    out = {}
    for procs in LEVELS:
        q = mp.Queue()
        ps = [mp.Process(target=target, args=(q,)) for _ in range(procs)]
        t0 = time.time()
        [p.start() for p in ps]
        # pin to CPUs 0..N-1: the same affinity bench_scaling gives the
        # Spark process tree, so ceiling and engine see identical topology
        try:
            for i, p in enumerate(ps):
                os.sched_setaffinity(p.pid, {i % os.cpu_count()})
        except (AttributeError, OSError):
            pass
        total = sum(q.get() for _ in ps)
        [p.join() for p in ps]
        out[procs] = total / (time.time() - t0)
    return out


def main() -> None:
    cpu = run(_cpu)
    mem = run(_mem)
    res = {
        "cpu_ops_per_sec": {k: round(v / 1e6, 1) for k, v in cpu.items()},
        "mem_gb_per_sec": {k: round(v / 1e9, 1) for k, v in mem.items()},
        "cpu_eff_2_to_8": round(cpu[8] / cpu[2] / 4, 3),
        "cpu_eff_8_to_32": round(cpu[32] / cpu[8] / 4, 3),
        "mem_eff_2_to_8": round(mem[8] / mem[2] / 4, 3),
        "mem_eff_8_to_32": round(mem[32] / mem[8] / 4, 3),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
