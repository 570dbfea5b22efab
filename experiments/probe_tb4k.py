"""Probe: FULL traceback at 4k^3 on the chip.

The reference accelerator maxes out at 512 per axis with traceback
stubbed out entirely (/root/reference/src/PE_1cyc.v:12-14,30;
TriAlign_tb.sv:48-56).  This repo's Hirschberg engine shrinks ALL THREE
axes at each split (hirschberg._solve passes b[:jstar], c[:kstar] to the
left half), so a 4k^3 problem recurses through 2k-class splits into the
direct engine.  Expected warm cost ~ classic Hirschberg 2x volume of
sweeps: 2 * 69G cells at ~17 GCUPS ~ 8 s + split/leaf overhead.

Validation: independent rescore of the alignment + sequence
reproduction, same as the bench traceback stages.
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

    rng = np.random.default_rng(29)
    n = 4096
    a, b, c = (rng.integers(0, 4, n).astype(np.uint8) for _ in range(3))
    t0 = time.perf_counter()
    res = align(a, b, c, return_alignment=True)
    dt = time.perf_counter() - t0
    ok = rescore_alignment(res.alignment) == res.score
    print(f"4k^3 FULL alignment (cold): {dt:.1f} s  score={res.score}  "
          f"rescore={'OK' if ok else 'FAIL'}", flush=True)
    assert ok
    # sequence reproduction
    rows = res.alignment
    for seq, row in zip((a, b, c), rows):
        got = [v for v in row if v != -1]
        assert list(map(int, seq)) == got, "sequence not reproduced!"
    print("sequences reproduced", flush=True)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        res = align(a, b, c, return_alignment=True)
        best = min(best, time.perf_counter() - t0)
    print(f"4k^3 FULL alignment (warm): {best:.1f} s", flush=True)


if __name__ == "__main__":
    main()
