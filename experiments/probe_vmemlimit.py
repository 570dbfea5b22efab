"""Compile-time sensitivity to Mosaic vmem_limit_bytes (same kernel)."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from trialign.config import Scoring
from trialign.kernels import blocked as BK

limit_mb = int(sys.argv[1])
BK.VMEM_LIMIT = (limit_mb * 2**20) if limit_mb else None

rng = np.random.default_rng(5)
n, P, shape = 512, 8, (136, 384, 16)
b = rng.integers(0, 4, n).astype(np.uint8)
c = rng.integers(0, 4, n).astype(np.uint8)
a_list = [rng.integers(0, 4, n).astype(np.uint8) for _ in range(P)]
dims = BK.plan_dims_packed(n, n, n, P, *shape)
lens, a_ext, b_arr, c_arr = BK.prep_chain(a_list, b, c, dims)
args = tuple(jnp.asarray(x) for x in (lens, a_ext, b_arr, c_arr))
t0 = time.perf_counter()
out = jax.device_get(BK._blocked_core(*args, dims, Scoring(), False))
print(f"limit={limit_mb}MB compile={time.perf_counter()-t0:.0f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = jax.device_get(BK._blocked_core(*args, dims, Scoring(), False))
    best = min(best, time.perf_counter() - t0)
print(f"limit={limit_mb}MB: {best/P*1e3:.2f} ms/al", flush=True)
