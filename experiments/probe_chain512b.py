"""Probe 2: chained 512^3 with VMEM-limit raised -- single-block shapes."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from trialign.config import Scoring
from trialign.kernels import blocked as BK
from trialign.golden import align_planes_numpy

rng = np.random.default_rng(5)
WANT = {}

def run(n, P, shape):
    scoring = Scoring()
    b = rng.integers(0, 4, n).astype(np.uint8)
    c = rng.integers(0, 4, n).astype(np.uint8)
    a_list = [rng.integers(0, 4, n).astype(np.uint8) for _ in range(P)]
    dims = BK.plan_dims_packed(n, n, n, P, *shape)
    lens, a_ext, b_arr, c_arr = BK.prep_chain(a_list, b, c, dims)
    args = tuple(jnp.asarray(x) for x in (lens, a_ext, b_arr, c_arr))
    f = lambda: BK._blocked_core(*args, dims, scoring, False)
    t0 = time.perf_counter()
    out = jax.device_get(f())
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = jax.device_get(f())
        best = min(best, time.perf_counter() - t0)
    per = best / P
    # spot parity on first/last chain element
    w0 = align_planes_numpy(a_list[0], b, c)
    wl = align_planes_numpy(a_list[-1], b, c)
    ok = (out[0,0] == w0) and (out[P-1,0] == wl)
    print(f"n={n} P={P} shape={shape}: {per*1e3:.2f} ms/al "
          f"({n**3/per/1e9:.2f} GCUPS) compile={compile_s:.0f}s parity={'OK' if ok else 'FAIL'}",
          flush=True)

for P, shape in [(16, (136, 384, 16)), (8, (264, 640, 8)), (16, (264, 640, 8)), (16, (520, 640, 8))]:
    try:
        run(512, P, shape)
    except Exception as e:
        print(f"P={P} shape={shape}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
