"""Probe: static vs dynamic fori_loop bound; ALU vs carry traffic.

Honest version: random input, q-dependent body, output checked so nothing
can fold away.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HB = WC = 256
QMAX = 768
N7 = 7


def make(kind, dyn):
    def body_fn(q, carry):
        p1, p2, p3 = carry
        if kind == "slim":
            new = tuple(jnp.maximum(p1[t], p2[t]) + q for t in range(N7))
        else:  # full-ish
            news = []
            for t in range(N7):
                g = jnp.maximum(p1[t], p1[(t + 1) % N7])
                g = jnp.maximum(g, p1[(t + 2) % N7])
                g = jnp.maximum(g, p1[(t + 3) % N7])
                h = jnp.maximum(p2[t], p2[(t + 4) % N7]) - 2
                g = jnp.maximum(g - 1, h)
                g = jnp.maximum(g, p3[t] - 3)
                if t in (0, 4, 5):
                    g = pltpu.roll(g, 1, 0)
                if t in (0, 5, 6):
                    g = pltpu.roll(g, 1, 1)
                news.append(jnp.minimum(g + q, 100000))
            new = tuple(news)
        return (new, p1, p2)

    def kernel(lens_ref, x_ref, out_ref):
        z7 = (x_ref[:],) * N7
        hi = lens_ref[0] + 1 if dyn else QMAX + 1
        p, _, _ = jax.lax.fori_loop(1, hi, body_fn, (z7, z7, z7))
        acc = p[0]
        for t in range(1, N7):
            acc = jnp.maximum(acc, p[t])
        out_ref[0, 0] = jnp.sum(acc)

    return kernel


def run(kind, dyn):
    f = pl.pallas_call(
        make(kind, dyn),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-50, 50, size=(HB, WC)), jnp.int32)
    lens = jnp.array([QMAX], jnp.int32)

    @jax.jit
    def chained(lens, x):
        return jnp.stack([f(lens, x + i)[0, 0] for i in range(8)]).sum()

    r = chained(lens, x); r.block_until_ready()
    t0 = time.perf_counter(); r = chained(lens, x); r.block_until_ready()
    dt = (time.perf_counter() - t0) / 8
    print(f"{kind:5s} dyn={dyn}: {dt*1e3:8.3f} ms/sweep  {dt/QMAX*1e6:7.3f} us/iter  out={int(r)}")


for kind in ("slim", "full"):
    for dyn in (False, True):
        run(kind, dyn)
