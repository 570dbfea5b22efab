"""Validate probe: output correctness vs NumPy + timing linearity in ITERS."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HB = WC = 256
VREGS = HB * WC // (8 * 128)
WIDTH, DEPTH = 7, 8


def kernel(lens_ref, x_ref, out_ref):
    def body(q, carry):
        outs = []
        for w in range(WIDTH):
            v = carry[w]
            for d in range(DEPTH):
                v = jnp.maximum(v + 1, carry[(w + d + 1) % WIDTH])
            outs.append(v)
        return tuple(outs)

    init = tuple(x_ref[:] + w for w in range(WIDTH))
    fin = jax.lax.fori_loop(0, lens_ref[0], body, init)
    acc = fin[0]
    for w in range(1, WIDTH):
        acc = jnp.maximum(acc, fin[w])
    out_ref[0, 0] = jnp.sum(acc)


f = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    grid_spec=pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
    ),
)

rng = np.random.default_rng(0)
xn = rng.integers(-(2**20), 2**20, size=(HB, WC)).astype(np.int64)
x = jnp.asarray(xn, jnp.int32)


def numpy_ref(iters):
    carry = [xn + w for w in range(WIDTH)]
    for _ in range(iters):
        outs = []
        for w in range(WIDTH):
            v = carry[w]
            for d in range(DEPTH):
                v = np.maximum(v + 1, carry[(w + d + 1) % WIDTH])
            outs.append(v)
        carry = outs
    acc = carry[0]
    for w in range(1, WIDTH):
        acc = np.maximum(acc, carry[w])
    return np.int32(acc.sum())  # wraparound like int32


for iters in (768, 7680, 76800):
    lens = jnp.array([iters], jnp.int32)
    r = f(lens, x); r.block_until_ready()
    dt = min(
        (lambda t0: (f(lens, x).block_until_ready(), time.perf_counter() - t0)[1])(
            time.perf_counter()
        )
        for _ in range(7)
    )
    want = numpy_ref(iters) if iters <= 768 else None
    ok = "?" if want is None else ("OK" if int(r[0, 0]) == int(want) else f"BAD want {want}")
    vops = 2 * WIDTH * DEPTH * VREGS * iters
    print(f"iters={iters:6d}: {dt*1e3:8.3f} ms  {dt/iters*1e9:8.1f} ns/iter  "
          f"{vops/dt/0.94e9:6.1f} vops/cycle  out={int(r[0,0])} {ok}")
