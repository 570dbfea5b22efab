"""Round-3 probe: finer-grained tall classes A/B.

The fill-decomposition model (NEXT.md) says splitting the two tall
hetero classes into five — (392,384) (456,384) (456,320) (520,256)
(520,192), all under the VMEM cliff, identical coverage so the residue
set is unchanged — saves ~144 ms (~9% of tall time, ~4.5% end-to-end) on
the BASELINE mixed-1024 workload by shrinking the per-problem plane
area.  Cost: 3 extra kernel compiles.  This probe measures both class
sets on the real workload's tall subset, parity-checked; flip
mosaic.TALL_SHAPES only if the measured win holds.

Run: python experiments/probe_tall5.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

FIVE = ((392, 384, 8), (456, 384, 8), (456, 320, 8), (520, 256, 8),
        (520, 192, 8))


def main():
    import jax

    from trialign.config import Scoring
    from trialign.golden import align_planes_numpy
    from trialign.kernels import mosaic as MZ

    print(f"backend={jax.default_backend()}", flush=True)
    if jax.default_backend() != "tpu":
        print("not on TPU; exiting (interpret timings are meaningless)")
        return

    rng = np.random.default_rng(77)
    trips = [
        tuple(rng.integers(0, 4, int(rng.integers(128, 513))).astype(np.uint8)
              for _ in range(3))
        for _ in range(1024)
    ]
    # The tall subset only (canvas and residue costs are identical across
    # class sets; isolating tall sharpens the A/B).
    tall = []
    for t in trips:
        rt = MZ._rotate(t, True)
        if len(rt[1]) + 2 > MZ.HB or len(rt[2]) + 2 > MZ.WC:
            if any(len(rt[1]) < h and len(rt[2]) < w - 1
                   for h, w, _ in MZ.TALL_SHAPES):
                tall.append(t)
    print(f"{len(tall)} tall-class problems of 1024", flush=True)
    cells = sum(len(a) * len(b) * len(c) for a, b, c in tall)

    scoring = Scoring()
    saved = MZ.TALL_SHAPES
    results = {}
    try:
        for name, shapes in (("2cls", saved), ("5cls", FIVE)):
            MZ.TALL_SHAPES = shapes
            scores = MZ.align_batch_mosaic(tall, scoring)  # compile + warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                scores = MZ.align_batch_mosaic(tall, scoring)
                best = min(best, time.perf_counter() - t0)
            results[name] = (best, scores)
            print(f"{name}: {best*1e3:.0f} ms -> {cells/best/1e9:.2f} GCUPS "
                  "on the tall subset", flush=True)
    finally:
        MZ.TALL_SHAPES = saved

    assert results["2cls"][1] == results["5cls"][1], "class-set scores differ"
    for i in np.random.default_rng(4).choice(len(tall), 3, replace=False):
        want = align_planes_numpy(*tall[i], scoring)
        assert results["5cls"][1][i] == want, (i, results["5cls"][1][i], want)
    print("parity OK (class sets agree + golden spot-checks)", flush=True)
    a, b = results["2cls"][0], results["5cls"][0]
    print(f"verdict: 5cls is {(a/b-1)*100:+.1f}% vs 2cls "
          f"({a*1e3:.0f} -> {b*1e3:.0f} ms; model said -9% of tall)",
          flush=True)


if __name__ == "__main__":
    main()
