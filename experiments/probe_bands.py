"""Isolate the multi-band cost: same (328,512) dispatch, NJB=1 vs NJB=3."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from trialign.config import Scoring
from trialign.kernels import chain as CH
from trialign.golden import align_planes_numpy

mode = sys.argv[1] if len(sys.argv) > 1 else "1band"

rng = np.random.default_rng(11)
P = 16
trips = []
seen = set()
while len(trips) < P:
    la = int(rng.integers(256, 385)); lb = int(rng.integers(256, 321)); lc = int(rng.integers(256, 385))
    if (lb, lc) in seen: continue
    seen.add((lb, lc))
    trips.append(tuple(rng.integers(0, 4, s).astype(np.uint8) for s in (la, lb, lc)))

dims = CH.plan_hetero(384, 320, 384, P, 328, 512, 8)
if mode == "3band":
    dims = dims + ((136, 128, 64),)
d = CH.chain_pitch(384, 328, 512)
a_ext, b_all, c_all, qcap, cells = CH.prep_hetero(trips, dims, d)
args = [jnp.asarray(x) for x in (a_ext, b_all, c_all, qcap)]
kw = {}
if mode == "3band":
    # single-tile content duplicated into all 3 band arrays
    from trialign.kernels.blocked import _build_askew_blocked
    ask1 = _build_askew_blocked(args[0], dims[5], 328, 512, 8)
    kw["askew_override"] = jnp.stack([ask1, ask1, ask1])
f = lambda: CH._hetero_core(*args, jnp.int32(d), jnp.int32(P), dims, Scoring(), False, **kw)
t0 = time.perf_counter(); caps = jax.device_get(f()); print(f"{mode}: compile {time.perf_counter()-t0:.0f}s", flush=True)
best = 1e9
for _ in range(4):
    t0 = time.perf_counter(); caps = jax.device_get(f()); best = min(best, time.perf_counter()-t0)
blk, jl, kl = cells[0]
ok = int(caps[blk, jl, kl]) == align_planes_numpy(*trips[0])
tot = sum(len(a)*len(b)*len(c) for a,b,c in trips)
slots = dims[5]*328*512
print(f"{mode}: warm {best*1e3:.0f} ms, {tot/best/1e9:.2f} GCUPS, "
      f"{(P*d+848)/dims[5]*slots/best/1e9:.1f}G slots/s, parity={ok}", flush=True)
