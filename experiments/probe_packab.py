"""A/B the round-4 packer orderings end-to-end on the bench workload.

probe_tiles2 measured multi-tile dispatches at full rate (27.7G slots/s,
B/A = 1.05), yet batch_mixed measured 14.11 GCUPS with the lb-b96 order
(no tw quant) and 12.64 with the lc-b128 + {256,512} tw-quant order --
opposite of the swept-cells model (53.7G/18d vs 47.4G/11d).  This probe
runs BOTH packings through align_batch_mosaic in one process (shared
compiles), min-of-3, plus a per-dispatch timing pass, to attribute the
gap (canvas kernel? host prep? tall/canvas overlap?).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import trialign.kernels.mosaic as M
from trialign.config import Scoring
from trialign.golden import align_planes_numpy


def key_old(it):
    return (-(len(it[1][1]) // 96), -len(it[1][0]), -len(it[1][1]))


def main():
    if jax.default_backend() != "tpu":
        print("probe needs the TPU; exiting")
        return
    scoring = Scoring()
    rng = np.random.default_rng(77)
    trips = [tuple(rng.integers(0, 4, int(rng.integers(128, 513))
                                ).astype(np.uint8) for _ in range(3))
             for _ in range(1024)]
    cells = sum(len(a) * len(b) * len(c) for a, b, c in trips)

    orig_pack = M.pack_mosaic
    configs = {
        "old lb-b96 (no twq)": dict(order_key=key_old, tw_quant=()),
        "new lc-b128 + twq": dict(order_key=None, tw_quant=None),
    }
    results = {}
    for tag, kw in configs.items():
        M.pack_mosaic = lambda problems, npack_cap=None, geom=None, \
            _kw=kw: orig_pack(problems, npack_cap, geom, **_kw)
        scores = M.align_batch_mosaic(trips, scoring)  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            scores = M.align_batch_mosaic(trips, scoring)
            best = min(best, time.perf_counter() - t0)
        for i in (0, 500, 1023):
            assert scores[i] == align_planes_numpy(*trips[i], scoring)
        results[tag] = best
        print(f"{tag:24s} {best:.3f}s  {cells/best/1e9:.2f} GCUPS",
              flush=True)
    M.pack_mosaic = orig_pack
    print(f"\ndelta: {results['new lc-b128 + twq'] - results['old lb-b96 (no twq)']:+.3f}s")

    # Per-dispatch canvas timing for both packings: attribute the gap.
    import jax.numpy as jnp
    import trialign.kernels.chain as CH

    items = []
    for i, t in enumerate(trips):
        rt = M._rotate(t, scoring.s3_mode == "sop")
        if len(rt[1]) + 2 <= M.HB and len(rt[2]) + 2 <= M.WC:
            items.append((i, rt))
    la_cap = max(len(rt[0]) for _, rt in items)
    dims = M.plan_mosaic(la_cap)
    for tag, kw in configs.items():
        disp_all = orig_pack(items, **kw)
        tot_run = tot_prep = 0.0
        print(f"\n--- {tag}: {len(disp_all)} canvas dispatches ---",
              flush=True)
        for di, tiles in enumerate(disp_all):
            t0 = time.perf_counter()
            d = CH.chain_pitch(
                max(len(rt[0]) for t in tiles for _, rt in t.problems),
                M.HB, M.WC)
            pr = M.prep_mosaic(tiles, dims, d)
            a_cols, colmask, bpos, cpos, qcap, edge, layout, cells_, flat = pr
            t1 = time.perf_counter()
            npk = max(len(t.problems) for t in tiles)
            args = (jnp.asarray(a_cols), jnp.asarray(colmask),
                    jnp.asarray(bpos), jnp.asarray(cpos),
                    jnp.asarray(qcap), jnp.asarray(edge),
                    jnp.asarray(layout))
            best_run = float("inf")
            for rep in range(3):
                r0 = time.perf_counter()
                caps = M._mosaic_core(args[0] + jnp.int32(rep), *args[1:],
                                      jnp.int32(d), jnp.int32(npk), dims,
                                      scoring, False)
                jax.device_get(caps[0, 0, 0])
                best_run = min(best_run, time.perf_counter() - r0)
            nprob = sum(len(t.problems) for t in tiles)
            print(f"  disp {di}: tiles={len(tiles)} nprob={nprob} "
                  f"npack={npk} d={d} hostprep={1e3*(t1-t0):.0f}ms "
                  f"run={1e3*best_run:.0f}ms", flush=True)
            tot_run += best_run
            tot_prep += t1 - t0
        print(f"  TOTAL run {tot_run:.3f}s hostprep {tot_prep:.3f}s",
              flush=True)


if __name__ == "__main__":
    main()
