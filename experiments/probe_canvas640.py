"""Round-4 probe: WIDER/TALLER canvas A/B.

The mixed-batch canvas is lane-limited: the uniform 128-512 workload's
canvas problems have lb, lc in ~130..328, too tall to stack two tiles
vertically, so ~2 tiles x 32 slots is all a 512-lane canvas carries per
dispatch.  Widening to 640 lanes fits ~3 tiles (fewer dispatches, same
per-plane cost model: modeled -25..-40% canvas time); a 392-row canvas
additionally re-stratifies the bands.  The old 4*unb-stack VMEM model
said 640 lanes spills -- but probe_canvas16 measured (328,512,unb=16)
FAST at a working set that model calls over-cliff, so the post-
byte-packing ceiling must be re-measured, not assumed.  A spill is
instantly visible as a ~5x rate collapse.

Run: python experiments/probe_canvas640.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CANDS = (
    # (hb, wc, bands, unb)
    (328, 512, (136, 128, 64), 16),   # production (round-4): baseline
    (328, 640, (136, 128, 64), 8),
    (328, 640, (136, 128, 64), 16),
    (392, 640, (264, 128), 8),
)


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
    # The BASELINE canvas subset (what (328,512) can host) so every
    # candidate runs the SAME problems; bigger canvases may host more,
    # but the A/B needs a fixed workload.
    canvas = []
    for t in trips:
        rt = MZ._rotate(t, True)
        if len(rt[1]) + 2 <= 328 and len(rt[2]) + 2 <= 512:
            canvas.append(t)
    print(f"{len(canvas)} canvas problems of 512", flush=True)
    cells = sum(len(a) * len(b) * len(c) for a, b, c in canvas)

    scoring = Scoring()
    results = {}
    for hb, wc, bands, unb in CANDS:
        g = MZ.CanvasGeometry(hb=hb, wc=wc, bands=bands, nt_max=16,
                              p_cap=32, unb=unb, ch_p_cap=32,
                              tall_shapes=MZ.TALL_SHAPES)
        name = f"({hb},{wc},unb={unb})"
        try:
            t0 = time.perf_counter()
            scores = MZ.align_batch_mosaic(canvas, scoring, geom=g)
            print(f"{name}: cold {time.perf_counter()-t0:.1f} s", flush=True)
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                scores = MZ.align_batch_mosaic(canvas, scoring, geom=g)
                best = min(best, time.perf_counter() - t0)
            results[name] = (best, scores)
            ndisp = len(MZ.pack_mosaic(
                [(i, MZ._rotate(t, True)) for i, t in enumerate(canvas)],
                geom=g))
            print(f"{name}: {best*1e3:.0f} ms -> {cells/best/1e9:.2f} GCUPS "
                  f"({ndisp} dispatches)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    names = list(results)
    base = names[0]
    for n in names[1:]:
        assert results[base][1] == results[n][1], f"scores differ: {n}"
    for i in np.random.default_rng(4).choice(len(canvas), 3, replace=False):
        want = align_planes_numpy(*canvas[i], scoring)
        assert results[base][1][i] == want, (i, results[base][1][i], want)
    print("parity OK (geometries agree + golden spot-checks)", flush=True)
    for n in names[1:]:
        a, b = results[base][0], results[n][0]
        print(f"verdict: {n} is {(a/b-1)*100:+.1f}% vs {base} "
              f"({a*1e3:.0f} -> {b*1e3:.0f} ms)", flush=True)


if __name__ == "__main__":
    main()
