"""Probe: macro-step (unb) sensitivity of the tall hetero classes.

NEXT.md 1a: the per-macro scratch-state round trip costs ~34/unb
plane-ops, so unb=16 should halve that overhead IF the class working set
stays under the fast-VMEM ceiling (~55 MB; past it Mosaic silently
spills scratch at ~5x runtime cost, which would show here as a cliff).
Run on real TPU; mirrors the production tall-class path of
kernels/mosaic.align_batch_mosaic.
"""
import sys

sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from trialign.config import Scoring
from trialign.golden import align_planes_numpy
from trialign.kernels import chain as CH

rng = np.random.default_rng(23)
P = 32


def make_class(lo_mid, hi_mid, hi_min, n=P):
    # The workload caps every length at 512, so lb (the mid length after
    # rotation) draws from [lo_mid, min(hi_mid, 512)] and la from
    # [min(hi_mid, 512), 512] -- preserving round-2's tall-A distribution
    # (la >= the class's mid bound) for comparability; the class bound
    # hi_mid may exceed 512 (the (520, 256) class), where la pins to 512.
    trips = []
    la_lo = min(hi_mid, 512)
    for _ in range(n):
        lb = int(rng.integers(lo_mid, la_lo + 1))
        la = int(rng.integers(la_lo, 513))
        lc = int(rng.integers(128, hi_min))
        trips.append(tuple(rng.integers(0, 4, s).astype(np.uint8)
                           for s in (la, lb, lc)))
    return sorted(trips, key=lambda t: -len(t[0]))


def probe(name, t_hb, t_wc, t_unb, trips):
    la_cap = max(len(t[0]) for t in trips)
    dims_t = CH.plan_hetero(la_cap, t_hb - 1, t_wc - 2, P, t_hb, t_wc,
                            t_unb, nb=4)
    dd = max(CH.chain_pitch(la_cap, t_hb, t_wc), (t_hb + t_wc - 4) // 3 + 1)
    a_ext, b_all, c_all, qcap, cells = CH.prep_hetero(trips, dims_t, dd)
    args = tuple(jnp.asarray(x)
                 for x in (a_ext, b_all, c_all, qcap))
    ucells = sum(len(a) * len(b) * len(c) for a, b, c in trips)
    slots = P * dd * t_hb * t_wc

    def f(bump):
        return CH._hetero_core(args[0] + bump - bump, args[1], args[2],
                               args[3], jnp.int32(dd), jnp.int32(P),
                               dims_t, Scoring(), False)

    t0 = time.perf_counter()
    caps = jax.device_get(f(jnp.int32(0)))
    csec = time.perf_counter() - t0
    best = 1e9
    for r in range(4):
        t0 = time.perf_counter()
        caps = jax.device_get(f(jnp.int32(r)))
        best = min(best, time.perf_counter() - t0)
    for m in (0, P - 1):
        blk, jl, kl = cells[m]
        got = int(caps[blk, jl, kl])
        want = align_planes_numpy(*trips[m])
        assert got == want, (name, m, got, want)
    print(f"{name} ({t_hb},{t_wc},unb={t_unb}): {best*1e3:.1f} ms  "
          f"{slots/best/1e9:.1f}G plane-slots/s  "
          f"{ucells/best/1e9:.2f} useful GCUPS  (compile {csec:.0f}s) "
          f"parity OK", flush=True)


c1 = make_class(327, 455, 382)
c2 = make_class(327, 519, 254)
# Per-case isolation: a spill/OOM at one (class, unb) must not kill the
# rest of the sweep (the TPU window is scarce).
for name, hb_, wc_, cls in (("tall-1", 456, 384, c1), ("tall-2", 520, 256, c2)):
    for unb in (8, 16):
        try:
            probe(name, hb_, wc_, unb, cls)
        except Exception as e:  # noqa: BLE001
            print(f"{name} unb={unb}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
