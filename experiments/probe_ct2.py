"""Back-to-back compile-time calibration under one service session."""
import sys
sys.path.insert(0, "/root/repo")
import os, time
import numpy as np

import jax
import jax.numpy as jnp

from trialign.config import Scoring
from trialign.kernels import blocked as BK
from trialign.kernels import chain as CH

rng = np.random.default_rng(11)
P = 16
trips = []
seen = set()
while len(trips) < P:
    la = int(rng.integers(256, 385)); lb = int(rng.integers(256, 321)); lc = int(rng.integers(256, 385))
    if (lb, lc) in seen: continue
    seen.add((lb, lc))
    trips.append(tuple(rng.integers(0, 4, s).astype(np.uint8) for s in (la, lb, lc)))

shape = CH.choose_chain_shape(384, 320, 384, P)
dims = CH.plan_hetero(384, 320, 384, P, *shape)
print("shape", shape, "limit", BK._vmem_limit_for(dims), flush=True)
d = CH.chain_pitch(384, dims[0], dims[1])
a_ext, b_all, c_all, qcap, cells = CH.prep_hetero(trips, dims, d)
args = (jnp.asarray(a_ext), jnp.asarray(b_all), jnp.asarray(c_all), jnp.asarray(qcap))

from trialign.golden import align_planes_numpy
for trial in range(2):
    # vary npack to force a fresh trace? same dims -> cached; use two P values
    pp = P if trial == 0 else P - 1
    t0 = time.perf_counter()
    caps = jax.device_get(CH._hetero_core(*args, jnp.int32(d), jnp.int32(pp), dims, Scoring(), False))
    print(f"trial {trial} (npack={pp}): {time.perf_counter()-t0:.0f}s", flush=True)
# parity spot
blk, jl, kl = cells[0]
print("parity:", int(caps[blk, jl, kl]) == align_planes_numpy(*trips[0]), flush=True)
# timed warm run
best=1e9
for _ in range(3):
    t0=time.perf_counter(); caps = jax.device_get(CH._hetero_core(*args, jnp.int32(d), jnp.int32(P), dims, Scoring(), False)); best=min(best,time.perf_counter()-t0)
tot = sum(len(a)*len(b)*len(c) for a,b,c in trips)
print(f"warm: {best*1e3:.0f} ms, {tot/best/1e9:.2f} GCUPS", flush=True)
