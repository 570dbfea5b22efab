"""Profile the 4k^3 traceback's 46 s warm: time each Hirschberg piece.

probe_tb4k measured 173 s cold / 46.3 s warm; a naive sum of the level
sweeps (~2x volume at ~17 GCUPS) + direct leaves predicts ~18 s.  This
probe times the individual pieces warm, on the chip, to find the sink:
  1. top split_point (4096^3, m=2048)        -- F+G+argmax on device
  2. free_jk H sweep (2048, 4096, 4096)      -- final vector only
  3. mid split_point 2k-class (m=1024)
  4. direct leaf at a 1k-class problem
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def timed(tag, fn, reps=2):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{tag:44s} {best:7.2f} s", flush=True)
    return best


def main():
    if jax.default_backend() != "tpu":
        print("probe needs the TPU; exiting")
        return
    from trialign.config import Scoring
    from trialign.kernels.slab import (
        split_point_blocked_async,
        forward_slab_blocked_async,
    )
    from trialign.traceback.direct import direct_traceback

    sc = Scoring()
    rng = np.random.default_rng(29)
    n = 4096
    a, b, c = (rng.integers(0, 4, n).astype(np.uint8) for _ in range(3))

    t_top = timed(
        "top split_point 4k^3 (F+G+argmax, m=2048)",
        lambda: split_point_blocked_async(a, b, c, 2048, sc)(),
    )
    t_h = timed(
        "H sweep free_jk (2048,4096,4096) final-only",
        lambda: forward_slab_blocked_async(
            a[2048:], b, c, sc, mode="free_jk", want_slab=False)(),
    )
    # representative mid-level split: roughly cubic 2k-class halves
    b2, c2 = b[:2100], c[:2000]
    a2 = a[:2048]
    t_mid = timed(
        "mid split_point (2048,2100,2000), m=1024",
        lambda: split_point_blocked_async(a2, b2, c2, 1024, sc)(),
    )
    # representative direct leaf (1k-class)
    a3, b3, c3 = a[:1024], b[:1050], c[:1000]
    t_leaf = timed(
        "direct leaf (1024,1050,1000) full traceback",
        lambda: direct_traceback(a3, b3, c3, sc, "free", None, None),
    )
    est = t_top + t_h + 2 * t_mid + 2 * t_h / 2 + 4 * t_leaf
    print(f"\nnaive tree sum (1 top + 1 H + 2 mid + ~2 half-H + 4 leaves)"
          f" ~ {est:.1f} s vs measured 46.3 s")


if __name__ == "__main__":
    main()
