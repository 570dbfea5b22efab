"""Round-3/4 probe: finer-grained tall classes A/B.

The fill-decomposition model (NEXT.md) says finer tall hetero classes
save ~9% of tall time on the BASELINE mixed-1024 workload by shrinking
the per-problem plane area.  Round-4 revision: the first cut used
wc = 320/192 classes, which the hardware rejects (HBM DMA slice minor
dim must be a multiple of 128 — the askew slab slice is wc wide); this
set keeps wc in {256, 384} and varies hb instead, adds a (520, 384)
class that also moves lb>=454, lc in [255, 382) problems from the
expensive residue route into a tall class, and applies the measured
unb=16 win (probe_unb16: +9% at (456,384), compile 60 s vs 253 s)
everywhere the VMEM model stays under the ~55 MB cliff ((520,384)
stays unb=8: 2*unb stack planes would put it at ~54 MB).

Measures 2cls (production), 2cls@unb16, and FIVE on the real
workload's tall subset, parity-checked; flip mosaic.TALL_SHAPES only
if the measured win holds.

Run: python experiments/probe_tall5.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

TWO16 = ((456, 384, 16), (520, 256, 16))
FIVE = ((392, 256, 16), (392, 384, 16), (456, 384, 16), (520, 256, 16),
        (520, 384, 8))


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
        for name, shapes in (("2cls", saved), ("2cls16", TWO16),
                             ("5cls", FIVE)):
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

    for name in ("2cls16", "5cls"):
        assert results["2cls"][1] == results[name][1], \
            f"class-set scores differ: {name}"
    for i in np.random.default_rng(4).choice(len(tall), 3, replace=False):
        want = align_planes_numpy(*tall[i], scoring)
        assert results["5cls"][1][i] == want, (i, results["5cls"][1][i], want)
    print("parity OK (class sets agree + golden spot-checks)", flush=True)
    a = results["2cls"][0]
    for name in ("2cls16", "5cls"):
        b = results[name][0]
        print(f"verdict: {name} is {(a/b-1)*100:+.1f}% vs 2cls "
              f"({a*1e3:.0f} -> {b*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
