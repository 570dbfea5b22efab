"""Compile-time vs requested vmem_limit_bytes, same hetero kernel."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from trialign.config import Scoring
from trialign.kernels import blocked as BK
from trialign.kernels import chain as CH

mode = sys.argv[1]  # "tight" | "fat"

if mode == "tight":
    # est + 6%ish
    def tight(dims):
        hb, wc, unb = dims[0], dims[1], dims[10]
        hbp = BK._round_up(hb, 128)
        est = ((16 + 2 * unb) * hb * wc + 2 * (hb + unb) * wc
               + 2 * 8 * unb * (2 * wc + 2 * hbp + hb)) * 4
        nbr = dims[13] + 3
        est += (2 * nbr + 4) * hb * wc * 4
        if est <= 14 * 2**20:
            return None
        return est + est // 6 + 2 * 2**20
    BK._vmem_limit_for = tight

rng = np.random.default_rng(11)
P = 16
trips = []
seen = set()
while len(trips) < P:
    la = int(rng.integers(256, 385))
    lb = int(rng.integers(256, 321))
    lc = int(rng.integers(256, 385))
    if (lb, lc) in seen:
        continue
    seen.add((lb, lc))
    trips.append(tuple(rng.integers(0, 4, s).astype(np.uint8) for s in (la, lb, lc)))

shape = CH.choose_chain_shape(384, 320, 384, P)
dims = CH.plan_hetero(384, 320, 384, P, *shape)
print(f"{mode}: shape={shape} limit={BK._vmem_limit_for(dims)}", flush=True)
d = CH.chain_pitch(384, dims[0], dims[1])
a_ext, b_all, c_all, qcap, cells = CH.prep_hetero(trips, dims, d)
t0 = time.perf_counter()
caps = jax.device_get(CH._hetero_core(
    jnp.asarray(a_ext), jnp.asarray(b_all), jnp.asarray(c_all),
    jnp.asarray(qcap), jnp.int32(d), jnp.int32(P), dims, Scoring(), False))
print(f"{mode}: compile+run {time.perf_counter()-t0:.0f}s", flush=True)
