"""Probe: hetero-chain throughput on representative mixed-batch classes."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from trialign.config import Scoring
from trialign.kernels import chain as CH
from trialign.golden import align_planes_numpy

rng = np.random.default_rng(11)

def probe(name, lo_a, hi_a, lo_bc, hi_bc, P):
    trips, cells = [], 0
    seen = set()
    while len(trips) < P:
        la = int(rng.integers(lo_a, hi_a + 1))
        lb = int(rng.integers(lo_bc, hi_bc + 1))
        lc = int(rng.integers(lo_bc, hi_bc + 1))
        if (lb, lc) in seen:
            continue
        seen.add((lb, lc))
        trips.append(tuple(rng.integers(0, 4, s).astype(np.uint8) for s in (la, lb, lc)))
        cells += la * lb * lc
    trips.sort(key=lambda t: -len(t[0]))
    la_max = max(len(t[0]) for t in trips)
    lb_max = max(len(t[1]) for t in trips)
    lc_max = max(len(t[2]) for t in trips)
    shape = CH.choose_chain_shape(la_max, lb_max, lc_max, P)
    dims = CH.plan_hetero(la_max, lb_max, lc_max, P, *shape)
    print(f"{name}: shape={shape} d={dims[11]} nb={dims[13]} qqb={dims[5]} "
          f"n_jb={dims[3]} n_kb={dims[4]}", flush=True)
    a_ext, b_all, c_all, qcap, cc = CH.prep_hetero(trips, dims)
    args = tuple(jnp.asarray(x) for x in (a_ext, b_all, c_all, qcap))
    f = lambda: CH._hetero_core(*args, dims, Scoring(), False)
    t0 = time.perf_counter(); caps = jax.device_get(f()); csec = time.perf_counter() - t0
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); caps = jax.device_get(f()); best = min(best, time.perf_counter() - t0)
    # parity spot-check (first + last)
    for m in (0, P - 1):
        blk, jl, kl = cc[m]
        got = int(caps[blk, jl, kl])
        want = align_planes_numpy(*trips[m])
        assert got == want, (m, got, want)
    print(f"{name}: {best*1e3:.1f} ms for {cells/1e6:.0f}M cells -> "
          f"{cells/best/1e9:.2f} GCUPS (compile {csec:.0f}s) parity OK", flush=True)

probe("class-512 (bc 384-512)", 128, 512, 384, 512, 16)
probe("class-256 (bc 128-255)", 128, 255, 128, 255, 32)
probe("class-384 (bc 256-383)", 128, 384, 256, 383, 24)
