"""Standalone (no Spark) scaling probe of the engine's hot kernel —
seeded hashing + Bloom scatter — across process counts. Establishes
this machine's memory-bandwidth ceiling so the Spark scaling numbers
in BENCH/BASELINE.md can be read against the hardware's own curve.
Usage: python tools/dram_probe.py
"""

import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _warm(_):
    import numpy as np  # noqa

    from fuggetabouspark.hashing import hash_pair  # noqa

    return os.getpid()

def _work(i):
    import numpy as np

    from fuggetabouspark.hashing import hash_pair, indexes_from_pair

    keys = np.random.default_rng(1000 + i).integers(0, 50021, 2_000_000).astype(np.int64)
    m, k = 662_000, 8
    counts = np.zeros(m, dtype=np.int64)
    h1, h2 = hash_pair(keys)
    idx = indexes_from_pair(h1, h2, k, m).ravel()
    counts += np.bincount(idx, minlength=m)
    return 1


if __name__ == "__main__":
    print("cpus visible:", os.cpu_count())
    for n in (1, 2, 4, 8, 16, 32):
        with mp.Pool(n) as p:
            p.map(_warm, range(n * 2))
            tasks = n * 6
            t0 = time.time()
            p.map(_work, range(tasks))
            wall = time.time() - t0
        print(f"procs={n:2d} wall={wall:6.2f}s aggregate={tasks * 2.0 / wall:6.1f} M keys/s")
