"""Probe: int16 carry storage with int32 compute — does halving carry bytes
beat the cast overhead when VMEM-BW bound?"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HB = WC = 256
ITERS = 7680
W, D = 7, 8
MODE = os.environ.get("MODE", "i32")


def kernel(x_ref, out_ref):
    def body(q, carry):
        if MODE == "i16":
            vals = [c.astype(jnp.int32) for c in carry]
        else:
            vals = list(carry)
        outs = []
        for w in range(W):
            v = vals[w]
            for d in range(D):
                v = jnp.maximum(v + 1, vals[(w + d + 1) % W])
            outs.append(v)
        if MODE == "i16":
            outs = [jnp.clip(o, -30000, 30000).astype(jnp.int16) for o in outs]
        return tuple(outs)

    if MODE == "i16":
        init = tuple((x_ref[:] + w).astype(jnp.int16) for w in range(W))
    else:
        init = tuple(x_ref[:] + w for w in range(W))
    fin = jax.lax.fori_loop(0, ITERS, body, init)
    acc = fin[0].astype(jnp.int32)
    for w in range(1, W):
        acc = jnp.maximum(acc, fin[w].astype(jnp.int32))
    out_ref[0, 0] = jnp.sum(acc)


f = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
)
rng = np.random.default_rng(0)
xs = [jnp.asarray(rng.integers(-1000, 1000, size=(HB, WC)), jnp.int32) for _ in range(3)]

@jax.jit
def tri(x0, x1, x2):
    return f(x0)[0, 0] + f(x1)[0, 0] + f(x2)[0, 0]

try:
    v = jax.device_get(tri(*xs))
except Exception as e:
    print(f"MODE={MODE}: FAIL {str(e)[:300]}")
    raise SystemExit
best = 1e9
for _ in range(4):
    t0 = time.perf_counter(); jax.device_get(tri(*xs)); best = min(best, time.perf_counter() - t0)
print(f"MODE={MODE}: {best/3/ITERS*1e9:7.1f} ns/iter (out={int(v)})")
