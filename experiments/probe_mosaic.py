"""TPU probe: mosaic batch on a mixed 128-512 sample."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax

from trialign.kernels.mosaic import align_batch_mosaic
from trialign.golden import align_planes_numpy

N = int(sys.argv[1]) if len(sys.argv) > 1 else 256
rng = np.random.default_rng(77)
trips = [
    tuple(rng.integers(0, 4, int(rng.integers(128, 513))).astype(np.uint8)
          for _ in range(3))
    for _ in range(N)
]
cells = sum(len(a) * len(b) * len(c) for a, b, c in trips)
print(f"{N} triplets, {cells/1e9:.1f}G cells", flush=True)

t0 = time.perf_counter()
scores = align_batch_mosaic(trips)
print(f"first (incl compiles): {time.perf_counter()-t0:.1f}s", flush=True)
best = float("inf")
for _ in range(3):
    t0 = time.perf_counter()
    scores = align_batch_mosaic(trips)
    best = min(best, time.perf_counter() - t0)
print(f"warm: {best:.2f}s -> {cells/best/1e9:.2f} GCUPS end-to-end, "
      f"{N/best:.0f} triplets/s", flush=True)
for i in rng.choice(N, size=6, replace=False):
    w = align_planes_numpy(*trips[i])
    assert scores[i] == w, (i, scores[i], w)
print("parity spot-checks OK", flush=True)
