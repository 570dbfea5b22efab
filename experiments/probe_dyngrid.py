"""Probe: can a DYNAMIC (traced) pallas grid dimension replace the
static-fori + pl.when(it < nmac_rt) macro skip?

Round-2 measured ~32.5 us per SKIPPED macro (probe_skipmacro fit: active
73.6 us, skipped 32.5 us) -- a 1-problem canvas dispatch burns ~85% of its
time skipping.  A traced fori bound is not an option (lowers to while,
~5x compile, probe_compiletime).  A dynamic grid dim would make Mosaic's
own dispatch loop run exactly nmac_rt steps.

Questions:
  1. does grid=(traced,) compile + run on real Mosaic (not interpret)?
  2. compile time vs the static-grid twin (slow-compile trap check);
  3. per-step overhead at small vs large n (is the grid loop cheap?);
  4. does VMEM scratch persist across dynamic-grid steps (state carry)?

Run: python experiments/probe_dyngrid.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"backend={jax.default_backend()}", flush=True)

    HB, WC = 328, 512
    UNB = 8

    def kern(nsteps_ref, x_ref, o_ref, state, acc):
        it = pl.program_id(0)

        @pl.when(it == 0)
        def _():
            state[...] = x_ref[...]
            acc[...] = jnp.zeros_like(acc)

        # A body with UNB unrolled plane-steps of real vector work.
        p = state[...]
        a = acc[...]
        for _ in range(UNB):
            p = jnp.maximum(pltpu.roll(p, 1, 1) + 1, p)
            a = a + p
        state[...] = p
        acc[...] = a

        @pl.when(it == pl.num_programs(0) - 1)
        def _():
            o_ref[...] = acc[...]

    def build(dyn):
        def f(n, x):
            return pl.pallas_call(
                kern,
                grid=(n,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec((HB, WC), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((HB, WC), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((HB, WC), jnp.int32),
                scratch_shapes=[
                    pltpu.VMEM((HB, WC), jnp.int32),
                    pltpu.VMEM((HB, WC), jnp.int32),
                ],
            )(jnp.zeros((1,), jnp.int32), x)

        if dyn:
            return jax.jit(f)
        return jax.jit(f, static_argnums=0)

    x = jnp.asarray(np.random.default_rng(0).integers(0, 9, (HB, WC)),
                    jnp.int32)

    # 1+2: compile both twins, time the compiles.
    for name, dyn, narg in [("static", False, 2048),
                            ("dynamic", True, jnp.int32(2048))]:
        f = build(dyn)
        t0 = time.time()
        try:
            out = jax.device_get(f(narg, x))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}")
            continue
        print(f"{name}: compile+run {time.time()-t0:.1f}s checksum "
              f"{int(out.sum()) & 0xffffffff}", flush=True)

    # 3: per-step cost of the dynamic grid at several n (fresh inputs per
    # trial to defeat CSE; device_get to sync).
    f = build(True)
    for n in (128, 512, 2048):
        best = float("inf")
        for t in range(4):
            xi = x + t
            jax.device_get(f(jnp.int32(n), xi))  # warm path
            t0 = time.perf_counter()
            jax.device_get(f(jnp.int32(n), xi + 7))
            best = min(best, time.perf_counter() - t0)
        print(f"dynamic n={n}: {best*1e3:.2f} ms "
              f"({best/n*1e6:.2f} us/step)", flush=True)

    # 4: scratch persistence across steps is already proven by the
    # checksum equality between static and dynamic twins above.


if __name__ == "__main__":
    main()
