"""Round-5 probe (VERDICT r4 item 6): measure the submatrix-batch cliff.

A 1024-triplet mixed batch with a runtime substitution matrix cannot
ride the mosaic/hetero canvas (no submatrix wiring in the band-select
ring) and drops to the padded/bucketed path.  This measures that path
end-to-end on the EXACT bench workload so README can state the cliff
as a number (or justify building the hetero submatrix ring).

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
