"""Measure sustained int32 VPU throughput: chains of independent max/add ops
on (256,256) planes inside a fori_loop, minimal carry."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HB = WC = 256
ITERS = 768
VREGS = HB * WC // (8 * 128)


def make(width, depth):
    # per iteration: `width` independent chains, each `depth` dependent ops
    def kernel(lens_ref, x_ref, out_ref):
        def body(q, carry):
            outs = []
            for w in range(width):
                v = carry[w]
                for d in range(depth):
                    v = jnp.maximum(v + 1, carry[(w + d + 1) % width])
                outs.append(v)
            return tuple(outs)

        init = tuple(x_ref[:] + w for w in range(width))
        fin = jax.lax.fori_loop(0, lens_ref[0], body, init)
        acc = fin[0]
        for w in range(1, width):
            acc = jnp.maximum(acc, fin[w])
        out_ref[0, 0] = jnp.sum(acc)

    return kernel


def run(width, depth):
    f = pl.pallas_call(
        make(width, depth),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-(2**20), 2**20, size=(HB, WC)), jnp.int32)
    lens = jnp.array([ITERS], jnp.int32)

    r = f(lens, x); r.block_until_ready()
    t0 = time.perf_counter(); r = f(lens, x); r.block_until_ready()
    dt = time.perf_counter() - t0
    ops = 2 * width * depth  # add+max per chain step
    vops = ops * VREGS * ITERS
    print(f"w={width} d={depth}: {dt*1e3:7.2f} ms  {dt/ITERS*1e6:6.3f} us/iter  "
          f"{vops/dt/1e9:7.2f} Gvregops/s  ({vops/dt/0.94e9:5.2f}/cycle)")


for width, depth in [(7, 4), (7, 8), (14, 4), (3, 16), (21, 2)]:
    run(width, depth)
