"""Round-3 probe: where does the 1k^3 full-traceback time go?

Phases of hirschberg_align at 1k^3 (round-2: ~6 s; target <= 1.5 s):
  level-0: fwd slab (512x1024x1024) + bwd slab + free_jk sweep (async)
  level-1 x2: same at ~half j/k extents
  leaves x~4: direct engine (choice sweep + on-device walk) at <= 192 Mi

This probe times each phase in isolation on the TPU to locate the
bottleneck (XLA slab sweep rate vs direct sweep rate vs walk latency vs
dispatch overhead).  Run: python experiments/probe_traceback.py [n]
"""

import sys
import time

import numpy as np


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.3f}s", flush=True)
    return out, dt


def main(n=1024):
    import jax

    from trialign.config import Scoring
    from trialign.traceback.direct import direct_traceback
    from trialign.traceback.xla_engine import (
        backward_slab_xla_async,
        forward_sweep_xla_async,
    )

    scoring = Scoring()
    rng = np.random.default_rng(7)
    a, b, c = (rng.integers(0, 4, n).astype(np.uint8) for _ in range(3))
    m = n // 2
    print(f"n={n}, backend={jax.default_backend()}", flush=True)

    # Level-0 forward slab (compile + run, then warm run).
    for rep in range(2):
        _, dt = t(
            f"fwd slab {m}x{n}x{n} (rep {rep})",
            lambda: forward_sweep_xla_async(
                a[:m], b, c, scoring, mode="free", v0=None, capture_m=m
            )(),
        )
    for rep in range(2):
        _, dt = t(
            f"bwd slab {m}x{n}x{n} (rep {rep})",
            lambda: backward_slab_xla_async(
                a[m:], b, c, scoring, end_v=np.zeros(7, np.int32)
            )(),
        )

    # Direct engine at 512^3 (the leaf size): sweep + walk.
    aa, bb, cc = (rng.integers(0, 4, 512).astype(np.uint8) for _ in range(3))
    for rep in range(2):
        _, dt = t(f"direct 512^3 (rep {rep})",
                  lambda: direct_traceback(aa, bb, cc, scoring))

    # Full hirschberg at n^3, warm.
    from trialign.traceback.hirschberg import hirschberg_align

    for rep in range(2):
        _, dt = t(f"hirschberg {n}^3 (rep {rep})",
                  lambda: hirschberg_align(a, b, c, scoring))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1024)
