"""Probe: does a 2-tile (side-by-side) canvas dispatch run at the same
slot rate as a 1-tile dispatch?

Round-4 context: the tw-quant packer (model_fill2.py) cut modeled swept
cells 12% by pairing narrow problems into two (328, 256) tiles per
dispatch, but the measured batch_mixed went 14.11 -> 12.64 GCUPS.  The
model assumes the kernel's slot rate is tile-count-independent; this
probe measures that directly: same npack=64, same d, same canvas --
  A: 1 tile (328, 512), 64 problems with lc ~ 500
  C: 1 tile (328, 256), 64 problems with lc ~ 250 (half canvas idle)
  B: 2 tiles (328, 256), 128 problems with lc ~ 250
If rate(B) ~= rate(A): multi-tile is free and the regression is packing
order side effects.  If rate(B) << rate(A): per-tile machinery (band
composites, edge masks) scales with tile count and the model needs a
per-tile cost term.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import trialign.kernels.chain as CH
import trialign.kernels.mosaic as M
from trialign.config import Scoring
from trialign.golden import align_planes_numpy


def make_problems(n, la, lb, lc, rng):
    # distinct (lb, lc) per problem: a tile's capture cells must be
    # unique, so identical sizes can't share a tile
    out = []
    for i in range(n):
        db, dc = i % 16, (i // 16) % 8
        out.append((i, tuple(
            rng.integers(0, 4, l).astype(np.uint8)
            for l in (la - (i % 8), lb - db, lc - dc))))
    return out


def run_case(tag, problems, scoring, dims, expect_tiles):
    disp = M.pack_mosaic(problems)
    assert len(disp) == 1, f"{tag}: packed into {len(disp)} dispatches"
    tiles = disp[0]
    print(f"{tag}: tiles={len(tiles)} (expected {expect_tiles}) "
          f"tw={[t.tw for t in tiles]} "
          f"nprob={sum(len(t.problems) for t in tiles)}")
    d = CH.chain_pitch(max(len(rt[0]) for t in tiles for _, rt in t.problems),
                       M.HB, M.WC)
    a_cols, colmask, bpos, cpos, qcap, edge, layout, cells, flat = (
        M.prep_mosaic(tiles, dims, d))
    npk = max(len(t.problems) for t in tiles)
    args = (jnp.asarray(a_cols), jnp.asarray(colmask), jnp.asarray(bpos),
            jnp.asarray(cpos), jnp.asarray(qcap), jnp.asarray(edge),
            jnp.asarray(layout))
    caps = M._mosaic_core(*args, jnp.int32(d), jnp.int32(npk), dims,
                          scoring, False)
    jax.device_get(caps[0, 0, 0])  # compile + warm
    best = float("inf")
    for rep in range(4):
        t0 = time.perf_counter()
        caps = M._mosaic_core(args[0] + jnp.int32(rep), *args[1:],
                              jnp.int32(d), jnp.int32(npk), dims,
                              scoring, False)
        jax.device_get(caps[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    slots = (npk * d + M.HB + M.WC) * M.HB * M.WC
    print(f"  d={d} npack={npk} run={1e3*best:.0f}ms "
          f"rate={slots/best/1e9:.1f}G slots/s", flush=True)
    return best


def main():
    if jax.default_backend() != "tpu":
        print("probe needs the TPU; exiting")
        return
    scoring = Scoring()
    rng = np.random.default_rng(3)
    dims = M.plan_mosaic(510)

    # parity spot-check through the full batch path first
    trips = [tuple(rng.integers(0, 4, int(rng.integers(128, 400))
                                ).astype(np.uint8) for _ in range(3))
             for _ in range(8)]
    scores = M.align_batch_mosaic(trips, scoring)
    for t, s in zip(trips, scores):
        assert s == align_planes_numpy(*t, scoring), "parity!"
    print("parity spot-check ok (8 problems)")

    a = run_case("A 1x(328,512)", make_problems(64, 510, 320, 500, rng),
                 scoring, dims, 1)
    c = run_case("C 1x(328,256)", make_problems(64, 510, 320, 250, rng),
                 scoring, dims, 1)
    b = run_case("B 2x(328,256)", make_problems(128, 510, 320, 250, rng),
                 scoring, dims, 2)
    print(f"\nrate ratio B/A = {a/b:.2f} (1.0 = multi-tile free); "
          f"C/A = {a/c:.2f}")


if __name__ == "__main__":
    main()
