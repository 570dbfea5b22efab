"""Probe: FULL traceback at 8k^3 -- 16x the reference's maximum axis.

8k^3 score sweeps already run (~31 GCUPS, 16.4 s); this drives the full
alignment recovery through api.align: the top Hirschberg split's F+G
sweeps cover 2 x 275G cells on the blocked slab kernels (~30 s at the
measured slab rate), halves recurse through 4k-/2k-class pin splits
(kernels/slab.py pin mode) into 1k-class direct leaves.  Expected warm
~60-90 s; the HBM high-water is the two (7, 8193, 8193) int32 capture
slabs (~1.9 GB each) plus the direct leaves' ~10 GB (serialized by
MEM_BUDGET).

Validation: independent rescore + sequence reproduction.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    if jax.default_backend() != "tpu":
        print("probe needs the TPU; exiting")
        return
    from trialign.api import align
    from trialign.golden.numpy_model import rescore_alignment

    rng = np.random.default_rng(31)
    n = 8000
    a, b, c = (rng.integers(0, 4, n).astype(np.uint8) for _ in range(3))
    t0 = time.perf_counter()
    res = align(a, b, c, return_alignment=True)
    dt = time.perf_counter() - t0
    ok = rescore_alignment(res.alignment) == res.score
    print(f"8k^3 FULL alignment (cold): {dt:.1f} s  score={res.score}  "
          f"rescore={'OK' if ok else 'FAIL'}", flush=True)
    assert ok
    rows = res.alignment
    for seq, row in zip((a, b, c), rows):
        got = [v for v in row if v != -1]
        assert list(map(int, seq)) == got, "sequence not reproduced!"
    print("sequences reproduced", flush=True)
    t0 = time.perf_counter()
    res = align(a, b, c, return_alignment=True)
    print(f"8k^3 FULL alignment (warm): {time.perf_counter() - t0:.1f} s",
          flush=True)


if __name__ == "__main__":
    main()
