"""Host scaling-ceiling probes: what 4->16 process efficiency the BOX
itself allows, independent of any engine code.

Two single-threaded workloads (OMP pinned to 1), run in process pools
of 4 and 16, reporting task throughput at each level:

- compute: the pinned 384x384 matmul loop (same kernel family as
  bench.py's ab_ref calibration)
- memcpy:  64 MiB buffer copies (the shape of exchange/serialize work)

Measured on this host (2026-08-19, quiet window, two alternating
rounds each):
  compute: 3.0 -> 10.0 tasks/s  = 0.83 efficiency ceiling
           (per-task time inflates ~17% with 16 cores busy: all-core
           frequency / shared-cache penalty)
  memcpy:  4.3-5.9 -> 7.2-7.7   = 0.33-0.45 efficiency ceiling
           (DRAM bandwidth saturates near 4 concurrent copy streams)

Reading the per-op scaling table against these: a text-exchange op
(copies every byte 2-3x) blending compute and memcpy lands at a
0.55-0.70 CEILING on one box; pure-kernel ops top out near 0.83. On a
multi-node cluster the 4->16 step adds nodes (each with its own DRAM
and thermal budget), so neither ceiling applies — the single-box
efficiencies here UNDERSTATE multi-node scaling for memory-heavy ops.
"""
import multiprocessing as mp
import os
import time

os.environ["OMP_NUM_THREADS"] = "1"


def compute_task(_):
    import numpy as np
    a = np.random.RandomState(0).rand(384, 384)
    x = a
    t0 = time.perf_counter()
    for _ in range(120):
        x = x @ a
        x /= np.abs(x).max()
    return time.perf_counter() - t0


def memcpy_task(_):
    import numpy as np
    a = np.random.RandomState(1).bytes(64 * 1024 * 1024)
    buf = np.frombuffer(a, dtype=np.uint8)
    t0 = time.perf_counter()
    for _ in range(20):
        buf = buf.copy()
    return time.perf_counter() - t0


def main() -> None:
    for name, fn, per in (("compute", compute_task, 3),
                          ("memcpy", memcpy_task, 2)):
        thr = {}
        for n in (4, 16, 4, 16):
            with mp.Pool(n) as p:
                t0 = time.time()
                p.map(fn, range(n * per))
                wall = time.time() - t0
            thr.setdefault(n, []).append(n * per / wall)
        lo = sum(thr[4]) / len(thr[4])
        hi = sum(thr[16]) / len(thr[16])
        print(f"{name}: {lo:.2f} -> {hi:.2f} tasks/s, "
              f"4->16 efficiency ceiling {hi / lo / 4:.2f}")


if __name__ == "__main__":
    main()
