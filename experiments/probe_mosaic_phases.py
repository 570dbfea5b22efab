"""Instrument mosaic phases: where do the seconds go?"""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

import trialign.kernels.mosaic as M
import trialign.kernels.chain as CH
from trialign.config import Scoring

N = 128
rng = np.random.default_rng(77)
trips = [tuple(rng.integers(0,4,int(rng.integers(128,513))).astype(np.uint8) for _ in range(3)) for _ in range(N)]
scoring = Scoring()

# replicate align_batch_mosaic with timers
sop = True
items, tall = [], []
for i, t in enumerate(trips):
    rt = M._rotate(t, sop)
    (tall if len(rt[1]) + 2 > M.HB or len(rt[2]) + 2 > M.WC else items).append((i, rt))
print(f"canvas={len(items)} tall={len(tall)}", flush=True)

# warm everything once
M.align_batch_mosaic(trips, scoring)

floor_d = CH.chain_pitch(0, M.HB, M.WC)
groups = {}
for it in items:
    la = len(it[1][0])
    key = 0 if la < floor_d else (la - floor_d)//128 + 1
    groups.setdefault(key, []).append(it)
dispatches = []
for key in sorted(groups):
    dispatches.extend(M.pack_mosaic(groups[key]))
la_cap = max(len(rt[0]) for _, rt in items)
dims = M.plan_mosaic(la_cap)

t_all = time.perf_counter()
for di, disp in enumerate(dispatches):
    t0 = time.perf_counter()
    d = CH.chain_pitch(max(len(rt[0]) for t in disp for _, rt in t.problems), M.HB, M.WC)
    pr = M.prep_mosaic(disp, dims, d)
    t1 = time.perf_counter()
    a_cols, colmask, bpos, cpos, qcap, edge, layout, cells, flat = pr
    caps = M._mosaic_core(
        jnp.asarray(a_cols), jnp.asarray(colmask), jnp.asarray(bpos),
        jnp.asarray(cpos), jnp.asarray(qcap), jnp.asarray(edge),
        jnp.asarray(layout), jnp.int32(d),
        jnp.int32(max(len(t.problems) for t in disp)), dims, scoring, False)
    jax.device_get(caps[0, 0, 0])
    t2 = time.perf_counter()
    npk = max(len(t.problems) for t in disp)
    nprob = sum(len(t.problems) for t in disp)
    slots = (npk*d + M.HB + M.WC) * M.HB * M.WC
    print(f"disp {di}: tiles={len(disp)} nprob={nprob} npack={npk} d={d} "
          f"prep={1e3*(t1-t0):.0f}ms run={1e3*(t2-t1):.0f}ms "
          f"({slots/max(t2-t1,1e-9)/1e9:.1f}G slots/s)", flush=True)
print(f"canvas total: {time.perf_counter()-t_all:.2f}s", flush=True)
