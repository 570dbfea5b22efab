"""Probe 3: chained 512^3, single-k-block geometry with raised VMEM limit."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from trialign.config import Scoring
from trialign.kernels import blocked as BK
from trialign.golden import align_planes_numpy

BK.VMEM_LIMIT = 30 * 2**20

rng = np.random.default_rng(5)

def run(n, P, shape):
    b = rng.integers(0, 4, n).astype(np.uint8)
    c = rng.integers(0, 4, n).astype(np.uint8)
    a_list = [rng.integers(0, 4, n).astype(np.uint8) for _ in range(P)]
    dims = BK.plan_dims_packed(n, n, n, P, *shape)
    lens, a_ext, b_arr, c_arr = BK.prep_chain(a_list, b, c, dims)
    args = tuple(jnp.asarray(x) for x in (lens, a_ext, b_arr, c_arr))
    t0 = time.perf_counter()
    out = jax.device_get(BK._blocked_core(*args, dims, Scoring(), False))
    csec = time.perf_counter() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = jax.device_get(BK._blocked_core(*args, dims, Scoring(), False))
        best = min(best, time.perf_counter() - t0)
    ok = (out[0,0] == align_planes_numpy(a_list[0], b, c)) and \
         (out[P-1,0] == align_planes_numpy(a_list[-1], b, c))
    print(f"n={n} P={P} shape={shape}: {best/P*1e3:.2f} ms/al "
          f"({n**3/(best/P)/1e9:.2f} GCUPS) compile={csec:.0f}s parity={'OK' if ok else 'FAIL'}",
          flush=True)

for P, shape in [(16, (264, 640, 8)), (8, (264, 640, 8))]:
    try:
        run(512, P, shape)
    except Exception as e:
        print(f"P={P} shape={shape}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
