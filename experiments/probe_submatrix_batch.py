"""Round-5 probe (VERDICT r4 item 6): measure the submatrix-batch paths.

A/B on the EXACT bench workload with a runtime substitution matrix:
  (a) the new mosaic route (hetero ring carries 3 packed score planes,
      plane_math.hetero_sub_planes; submatrix_geometry canvas), and
  (b) the padded/bucketed fallback (what every submatrix batch rode
      before round 5).
Also watches for the ~55 MB VMEM spill cliff: a canvas rate far below
the equality kernels' ~19-22G slots/s means the submatrix geometry
must shrink.

Run: python experiments/probe_submatrix_batch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from trialign.api import align_batch
    from trialign.config import Scoring
    from trialign.golden import align_planes_numpy

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(77)  # bench_batch_mixed's workload
    trips = [
        tuple(rng.integers(0, 4, int(rng.integers(128, 513))).astype(np.uint8)
              for _ in range(3))
        for _ in range(1024)
    ]
    cells = sum(len(a) * len(b) * len(c) for a, b, c in trips)
    # A non-trivial 4x4 matrix (transition/transversion-flavored).
    sub = ((2, -1, -2, -1), (-1, 2, -1, -2), (-2, -1, 2, -1), (-1, -2, -1, 2))
    scoring = Scoring(submatrix=sub)
    res = align_batch(trips, scoring)  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res = align_batch(trips, scoring)
        best = min(best, time.perf_counter() - t0)
    g = cells / best / 1e9
    print(f"submatrix mixed-1024: {best:.2f} s -> {g:.2f} GCUPS, "
          f"{len(trips)/best:.0f} triplets/s", flush=True)
    for i in rng.choice(1024, size=3, replace=False):
        want = align_planes_numpy(*trips[i], scoring)
        got = res[i].score
        assert got == want, (i, got, want)
    print("parity spot-check OK (3 samples)", flush=True)


if __name__ == "__main__":
    main()
