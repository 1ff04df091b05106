"""No-Ray hardware probe (canonical copy — BASELINE.md quotes its output).

The hypervisor behind this sandbox DRIFTS between sessions (measured
spans from ~4 effective cores to near-linear-to-8). Run this before
interpreting any cross-session timing delta: it measures pure-CPU
numpy-sort throughput at increasing process counts, no Ray involved.

Healthy round-3 host reference points (tasks/s):
  2 procs ~15.8 / 8 procs ~57.5 / 32 procs ~62.8  (near-linear to 8)
Degraded states seen: ~45% of the above across the board; and a round-2
host where 16 procs delivered 6.3 tasks/s total (~4 real cores).
"""
import multiprocessing as mp
import time

import numpy as np


def work(_):
    rng = np.random.default_rng(0)
    for _ in range(3):
        np.sort(rng.random(2_000_000))
    return 1


if __name__ == '__main__':
    for procs in (1, 2, 4, 8, 16, 32):
        with mp.Pool(procs) as p:
            t0 = time.time()
            p.map(work, range(procs * 3))
            dt = time.time() - t0
        print(f'{procs} procs: {procs * 3 / dt:.1f} tasks/s')
