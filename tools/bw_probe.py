"""Sandbox memory-bandwidth ceiling probe (round-4 scaling evidence).

The N->4N scaling measurements run every level on ONE 32-core box, so
beyond some core count they measure the box's shared memory subsystem,
not executor scaling.  This probe quantifies that ceiling directly:
each process copies a pre-faulted 100 MB buffer in a loop (pure
streaming DRAM traffic, no allocation, no page faults) and reports
aggregate and per-process bandwidth at increasing concurrency.

Round-4 measurement on the sandbox (32 physical cores, no SMT, 1 NUMA
node, 54 MB shared L3):

    procs   agg GB/s   per-proc GB/s
      1       18.5        18.5
      2       36.3        18.1
      4       76.1        19.0
      8      129.1        16.1
     16      142.9         8.9     <- ceiling ~143 GB/s

Per-core bandwidth is flat to 4-8 streams and HALVES at 16 — matching
the pipeline's observed per-core-second cost (43 us/triple at 4 active
cores, ~110 at 16, ~175 at 32 across single-JVM local[N] AND
multi-executor local-cluster topologies alike).  Control probes
(cache-resident pandas iterrows, arrow->pandas conversion loops) show
<=1.2x inflation at 16 procs, isolating the memory subsystem as the
shared ceiling.  A real cluster's 4N executors bring 4x memory
controllers; one box cannot emulate that at saturation.

Usage: python tools/bw_probe.py [proc counts...]
"""

import json
import multiprocessing as mp
import sys
import time

import numpy as np


def _work(q, barrier):
    a = np.ones(100_000_000, dtype=np.uint8)
    b = np.empty_like(a)
    np.copyto(b, a)  # pre-fault both buffers
    barrier.wait()
    t0 = time.time()
    n = 0
    while time.time() - t0 < 6:
        np.copyto(b, a)
        n += 1
    q.put(n * 0.1 * 2 / (time.time() - t0))  # GB/s read+write


def run(n_procs: int) -> dict:
    q = mp.Queue()
    bar = mp.Barrier(n_procs)
    ps = [mp.Process(target=_work, args=(q, bar)) for _ in range(n_procs)]
    for p in ps:
        p.start()
    res = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return {
        "procs": n_procs,
        "agg_GBps": round(sum(res), 2),
        "per_proc_GBps": round(sum(res) / len(res), 2),
    }


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8, 16, 32]
    for n in counts:
        print(json.dumps(run(n)))
