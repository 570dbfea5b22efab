"""Probe: A-axis chained 512^3 alignments -- per-alignment time vs block
shape and chain length P.  Target: < 10.82 ms (reference ASIC, Table III)."""
import sys
sys.path.insert(0, "/root/repo")
import time

import numpy as np
import jax
import jax.numpy as jnp

from trialign.config import Scoring
from trialign.kernels import blocked as BK
from trialign.golden import align_planes_numpy


def run(n, P, shape):
    scoring = Scoring()
    rng = np.random.default_rng(5)
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
    gcups = n**3 / per / 1e9
    print(f"n={n} P={P} shape={shape}: {per*1e3:.2f} ms/alignment "
          f"({gcups:.2f} GCUPS) chain={best*1e3:.1f} ms compile={compile_s:.0f}s",
          flush=True)
    return out[:P, 0]


if __name__ == "__main__":
    n = 512
    print("planner for chain:", BK.choose_block_shape(8 * 513, n, n), flush=True)
    configs = [
        (8, BK.choose_block_shape(8 * 513, n, n)),
        (8, (176, 384, 8)),
        (8, (176, 384, 16)),
        (16, (176, 384, 16)),
        (8, (264, 256, 16)),
        (16, (168, 384, 16)),
    ]
    for P, shape in configs:
        try:
            run(n, P, shape)
        except Exception as e:
            print(f"P={P} shape={shape}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
