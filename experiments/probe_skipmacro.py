"""Round-3 probe: what does a SKIPPED hetero macro actually cost?

The hetero/mosaic sweep has a static macro count nmac (sized by the
geometry class caps) and a runtime bound nmac_rt; macros past nmac_rt
are wrapped in pl.when(it < nmac_rt).  Round-2 measured ~46 us per
skipped macro -- suspiciously close to a full macro's compute (~60 us at
(328,512) x unb 8), suggesting Mosaic lowers the pl.when body as
PREDICATED vector ops (both paths execute) rather than a scalar-core
branch.

Protocol: one hetero geometry class (fixed dims, fixed static nmac),
dispatches with npack_rt = 32, 16, 8, 1 (same d).  Active macros scale
with npack_rt; skipped = nmac - active.  If skipping were free, wall
time ~ active; if predicated, wall ~ nmac (flat).  Reports us/macro for
active and skipped macros by linear fit.

Run: python experiments/probe_skipmacro.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from trialign.config import Scoring
    from trialign.kernels import chain as CH

    scoring = Scoring()
    print(f"backend={jax.default_backend()}", flush=True)

    # Tall-class geometry: (456, 384, 8), la_cap 455 -> d = 456.
    hb, wc, unb = 456, 384, 8
    la = 455
    npack_cap = 32
    dims = CH.plan_hetero(la, hb - 1, wc - 2, npack_cap, hb, wc, unb, nb=4)
    d = max(CH.chain_pitch(la, hb, wc), (hb + wc - 4) // 3 + 1)
    qqb, nmac = dims[5], dims[5] // unb
    print(f"dims qqb={qqb} nmac={nmac} d={d}", flush=True)

    rng = np.random.default_rng(5)
    results = []
    for npack in (32, 16, 8, 1):
        trips = [
            tuple(rng.integers(0, 4, n).astype(np.uint8)
                  for n in (la, hb - 2, wc - 2 - m))
            for m in range(npack)
        ]
        a_ext, b_all, c_all, qcap, cells = CH.prep_hetero(trips, dims, d)
        args = (jnp.asarray(a_ext), jnp.asarray(b_all), jnp.asarray(c_all),
                jnp.asarray(qcap), jnp.int32(d), jnp.int32(npack))
        jax.device_get(CH._hetero_core(*args, dims, scoring, False))  # warm
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            jax.device_get(CH._hetero_core(*args, dims, scoring, False))
            best = min(best, time.perf_counter() - t0)
        active = min((npack * d + hb + wc - 2 + unb - 1) // unb, nmac)
        print(f"npack={npack}: {best*1e3:.2f} ms  active={active} "
              f"skipped={nmac - active}", flush=True)
        results.append((active, nmac - active, best))

    # Linear fit best = a*active + s*skipped + c
    A = np.array([[r[0], r[1], 1.0] for r in results])
    y = np.array([r[2] for r in results])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    print(f"fit: active {coef[0]*1e6:.1f} us/macro, "
          f"skipped {coef[1]*1e6:.1f} us/macro, const {coef[2]*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
