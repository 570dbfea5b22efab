import sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
from trialign.config import Scoring
from trialign.kernels import blocked as BK
from trialign.kernels.xla_ref import align_xla

n, P = 2048, 4
rng = np.random.default_rng(5)
b = rng.integers(0,4,n).astype(np.uint8); c = rng.integers(0,4,n).astype(np.uint8)
a_list = [rng.integers(0,4,n).astype(np.uint8) for _ in range(P)]
for shape in ((520, 384, 16),):
    dims = BK.plan_dims_packed(n, n, n, P, *shape)
    lens, a_ext, b_arr, c_arr = BK.prep_chain(a_list, b, c, dims)
    args = tuple(jnp.asarray(x) for x in (lens, a_ext, b_arr, c_arr))
    f = lambda: BK._blocked_core(*args, dims, Scoring(), False)
    out = jax.device_get(f())
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter(); out = jax.device_get(f()); best = min(best, time.perf_counter()-t0)
    ok = int(out[0,0]) == align_xla(a_list[0], b, c)
    print(f"2k chain shape={shape}: {best/P*1e3:.0f} ms/al "
          f"({n**3/(best/P)/1e9:.2f} GCUPS) parity={ok}", flush=True)
