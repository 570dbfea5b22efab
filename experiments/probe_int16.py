"""Probe: do packed int16 add/max compile and run 2x on v5e Mosaic?

Kernel A: int32 planes, W*D max+add chain.
Kernel B: int16 planes, same chain (2 values per 32-bit lane if packed).
Honest timing: device_get sync, distinct inputs.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HB = WC = 256
ITERS = 7680
WIDTH, DEPTH = 7, 8


def make(dtype):
    one = 1.0 if dtype == jnp.bfloat16 else 1

    def kernel(x_ref, out_ref):
        def body(q, carry):
            outs = []
            for w in range(WIDTH):
                v = carry[w]
                for d in range(DEPTH):
                    v = jnp.maximum(v + one, carry[(w + d + 1) % WIDTH])
                outs.append(v)
            return tuple(outs)

        init = tuple(x_ref[:] + one * w for w in range(WIDTH))
        fin = jax.lax.fori_loop(0, ITERS, body, init)
        acc = fin[0]
        for w in range(1, WIDTH):
            acc = jnp.maximum(acc, fin[w])
        out_ref[0, 0] = jnp.sum(acc.astype(jnp.int32))

    return kernel


def run(dtype, name):
    f = pl.pallas_call(
        make(dtype),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    )
    rng = np.random.default_rng(0)
    xs = [
        jnp.asarray(rng.integers(-1000, 1000, size=(HB, WC)), dtype)
        for _ in range(3)
    ]

    @jax.jit
    def tri(x0, x1, x2):
        return f(x0)[0, 0] + f(x1)[0, 0] + f(x2)[0, 0]

    try:
        v = jax.device_get(tri(*xs))
    except Exception as e:
        print(f"{name}: FAILED to compile/run: {str(e)[:200]}")
        return
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        jax.device_get(tri(*xs))
        best = min(best, time.perf_counter() - t0)
    dt = best / 3
    print(f"{name}: {dt/ITERS*1e9:7.1f} ns/iter (out={int(v)})")


run(jnp.int32, "int32")
run(jnp.int16, "int16")
run(jnp.bfloat16, "bf16 ")
