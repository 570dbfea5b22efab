"""Round-3 probe: residue routing A/B — per-problem blocked sweeps vs the
dynamic hetero-chain class (kernels/mosaic._route_residue).

The BASELINE mixed-1024 workload (seed 77) leaves 84 near-cubic problems
that fit no TALL_SHAPES class.  The lane-slot model (_route_residue /
experiments/model_skipwaste.py) says chains ~550 ms vs blocked ~680 ms at
measured rates; this probe measures both routes end-to-end on the real
residue subset and spot-checks parity.

Run: python experiments/probe_residue.py
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
        print("not on TPU; exiting (interpret timings are meaningless)")
        return

    rng = np.random.default_rng(77)
    trips = [
        tuple(rng.integers(0, 4, int(rng.integers(128, 513))).astype(np.uint8)
              for _ in range(3))
        for _ in range(1024)
    ]
    residue = []
    for t in trips:
        rt = MZ._rotate(t, True)
        if len(rt[1]) + 2 > MZ.HB or len(rt[2]) + 2 > MZ.WC:
            if not any(len(rt[1]) < h and len(rt[2]) < w - 1
                       for h, w, _ in MZ.TALL_SHAPES):
                residue.append(t)
    print(f"{len(residue)} residue problems of 1024", flush=True)
    cells = sum(len(a) * len(b) * len(c) for a, b, c in residue)

    scoring = Scoring()
    results = {}
    for route in ("blocked", "chain"):
        scores = MZ.align_batch_mosaic(residue, scoring,
                                       residue_route=route)  # compile+warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            scores = MZ.align_batch_mosaic(residue, scoring,
                                           residue_route=route)
            best = min(best, time.perf_counter() - t0)
        results[route] = (best, scores)
        print(f"route={route}: {best*1e3:.0f} ms -> "
              f"{cells/best/1e9:.2f} GCUPS on the residue subset", flush=True)

    assert results["blocked"][1] == results["chain"][1], "route scores differ"
    for i in np.random.default_rng(3).choice(len(residue), 3, replace=False):
        want = align_planes_numpy(*residue[i], scoring)
        assert results["chain"][1][i] == want, (i, results["chain"][1][i], want)
    print("parity OK (routes agree + golden spot-checks)", flush=True)
    blocked_items, grp = MZ._route_residue(
        [(i, MZ._rotate(t, True)) for i, t in enumerate(residue)]
    )
    auto = "chain" if grp is not None else "blocked"
    meas = min(results, key=lambda r: results[r][0])
    print(f"auto route picks {auto}; measured winner {meas} "
          f"({results['blocked'][0]*1e3:.0f} vs {results['chain'][0]*1e3:.0f} ms)",
          flush=True)


if __name__ == "__main__":
    main()
