"""Probe: Hirschberg top split at 2k^3 via the blocked Pallas slab kernels.

Measures (on the real chip):
  1. one blocked slab sweep's rate (forward, capture at i = |A|) on a
     (1024, 2048, 2048) half problem -- vs the XLA twin engine's <1 GCUPS;
  2. the device-combined split point (kernels/slab.py
     split_point_blocked_async): F + G + argmax with only scalars fetched;
  3. a full 2k^3 alignment (score + traceback) end to end through
     api.align, which now routes the top split through these kernels.

Run standalone under timeout; results go to the round notes / BASELINE.md.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def main():
    from trialign.api import align
    from trialign.golden.numpy_model import rescore_alignment
    from trialign.kernels.slab import (
        forward_slab_blocked_async,
        split_point_blocked_async,
    )
    from trialign.config import Scoring

    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "tpu":
        print("TPU probe: 2k^3 interpret-mode would run for hours; exiting",
              flush=True)
        return
    sc = Scoring()
    rng = np.random.default_rng(42)
    n = 2048
    a, b, c = (rng.integers(0, 4, n).astype(np.uint8) for _ in range(3))

    # 1. one forward slab sweep, half problem
    m = n // 2
    t0 = time.perf_counter()
    f_fetch = forward_slab_blocked_async(a[:m], b, c, sc)
    final, slab = f_fetch()
    dt = time.perf_counter() - t0
    cells = m * n * n
    print(f"fwd slab ({m},{n},{n}) cold: {dt:.2f} s  "
          f"{cells/dt/1e9:.2f} GCUPS  final={final.max()}", flush=True)
    t0 = time.perf_counter()
    final, slab = forward_slab_blocked_async(a[:m], b, c, sc)()
    dt = time.perf_counter() - t0
    print(f"fwd slab warm: {dt:.2f} s  {cells/dt/1e9:.2f} GCUPS", flush=True)

    # 2. device-combined split point
    t0 = time.perf_counter()
    sstar, jstar, kstar, score = split_point_blocked_async(a, b, c, m, sc)()
    dt = time.perf_counter() - t0
    print(f"split point 2k^3 (F+G+argmax on device): {dt:.2f} s  "
          f"crossing=({sstar},{jstar},{kstar}) score={score}", flush=True)

    # 3. full 2k^3 alignment
    t0 = time.perf_counter()
    res = align(a, b, c, sc, return_alignment=True)
    dt = time.perf_counter() - t0
    ok = rescore_alignment(res.alignment) == res.score
    print(f"2k^3 FULL alignment (cold): {dt:.1f} s  score={res.score}  "
          f"rescore={'OK' if ok else 'FAIL'}", flush=True)
    assert ok
    t0 = time.perf_counter()
    res = align(a, b, c, sc, return_alignment=True)
    dt = time.perf_counter() - t0
    print(f"2k^3 FULL alignment (warm): {dt:.1f} s", flush=True)


if __name__ == "__main__":
    main()
