"""Round-4 probe: canvas unb=16 A/B (NEXT 1a, after probe_unb16's +9%
measured win at the (456,384) tall class).

The canvas (328,512) at unb=16 models ~(2*16 + 17 + 2*9 + 5) = 72
resident planes x 168k cells x 4 B ~= 48 MB -- under the ~55 MB VMEM
spill cliff, but closer than the tall classes, so it must be measured,
not assumed.  Runs the canvas subset of the BASELINE mixed workload
through align_batch_mosaic at UNB 8 vs 16, parity-checked.

Run: python experiments/probe_canvas16.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from trialign.config import Scoring
    from trialign.golden import align_planes_numpy
    from trialign.kernels import mosaic as MZ

    print(f"backend={jax.default_backend()}", flush=True)
    if jax.default_backend() != "tpu":
        print("not on TPU; exiting")
        return

    rng = np.random.default_rng(77)
    trips = [
        tuple(rng.integers(0, 4, int(rng.integers(128, 513))).astype(np.uint8)
              for _ in range(3))
        for _ in range(512)
    ]
    canvas = []
    for t in trips:
        rt = MZ._rotate(t, True)
        if len(rt[1]) + 2 <= MZ.HB and len(rt[2]) + 2 <= MZ.WC:
            canvas.append(t)
    print(f"{len(canvas)} canvas problems of 512", flush=True)
    cells = sum(len(a) * len(b) * len(c) for a, b, c in canvas)

    scoring = Scoring()
    saved = MZ.UNB
    results = {}
    try:
        for unb in (8, 16):
            MZ.UNB = unb
            t0 = time.perf_counter()
            scores = MZ.align_batch_mosaic(canvas, scoring)  # compile+warm
            print(f"unb={unb}: cold {time.perf_counter()-t0:.1f} s",
                  flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                scores = MZ.align_batch_mosaic(canvas, scoring)
                best = min(best, time.perf_counter() - t0)
            results[unb] = (best, scores)
            print(f"unb={unb}: {best*1e3:.0f} ms -> "
                  f"{cells/best/1e9:.2f} GCUPS on the canvas subset",
                  flush=True)
    finally:
        MZ.UNB = saved

    assert results[8][1] == results[16][1], "unb variants disagree"
    for i in np.random.default_rng(4).choice(len(canvas), 3, replace=False):
        want = align_planes_numpy(*canvas[i], scoring)
        assert results[16][1][i] == want, (i, results[16][1][i], want)
    a, b = results[8][0], results[16][0]
    print(f"parity OK; verdict: unb=16 is {(a/b-1)*100:+.1f}% vs unb=8 "
          f"({a*1e3:.0f} -> {b*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
