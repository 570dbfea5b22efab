#!/usr/bin/env python
"""TriAlign-TPU benchmark driver.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "GCUPS", "vs_baseline": N, ...}

The metric is DP cell-updates/s on one chip (1 cell-update = one (i,j,k)
lattice site across all 7 matrices), the reference's headline number
(pic/Result.png).  vs_baseline is the ratio to the reference ASIC's
12.4 GCUPS at 512^3 (BASELINE.md).  Human-readable detail goes to stderr.

Device-side throughput is measured by chaining R kernel invocations inside
one jit, which removes the host-dispatch latency of the remote-TPU tunnel
(tens of ms/call in this environment) exactly as a production pipeline
would batch its dispatches.
"""

import json
import sys
import time

import numpy as np

BASELINE_ASIC_GCUPS = 12.4  # reference ASIC @512^3, pic/Result.png (derived)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_single_stream(n, repeats, scoring):
    """Amortized single-alignment GCUPS at n^3 via the Pallas kernel."""
    import jax
    import jax.numpy as jnp

    from trialign.kernels import wavefront as wf

    rng = np.random.default_rng(42)
    a, b, c = (rng.integers(0, 4, size=n).astype(np.uint8) for _ in range(3))
    lab, hb, wc = wf.bucket_dims(n, n, n)
    lens, a_ext, b_full, c_full = wf.prepare_compact(a, b, c, lab, hb, wc)
    interpret = jax.default_backend() != "tpu"
    args = [jnp.asarray(x) for x in (lens, a_ext, b_full, c_full)]

    @jax.jit
    def chained(lens, a_ext, b_full, c_full):
        outs = [
            wf._run_compact(
                lens, a_ext, b_full, c_full, lab, hb, wc, scoring, interpret
            )
            for _ in range(repeats)
        ]
        return jnp.stack(outs).sum(0)

    r = chained(*args)
    r.block_until_ready()  # compile + warm
    t0 = time.perf_counter()
    r = chained(*args)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / repeats
    gcups = n**3 / dt / 1e9
    return gcups, dt


def bench_batch(n, batch, scoring):
    """End-to-end batched throughput (includes host prep + transfers)."""
    from trialign.dist.batch import align_batch_padded

    rng = np.random.default_rng(7)
    trips = [
        tuple(rng.integers(0, 4, size=n).astype(np.uint8) for _ in range(3))
        for _ in range(batch)
    ]
    align_batch_padded(trips, scoring)  # compile
    t0 = time.perf_counter()
    align_batch_padded(trips, scoring)
    dt = time.perf_counter() - t0
    return batch * n**3 / dt / 1e9, dt


def bench_blocked(n, scoring):
    """Long-triplet sliced sweep (the slicing-method path) at n^3."""
    from trialign.kernels.blocked import align_blocked

    rng = np.random.default_rng(3)
    a, b, c = (rng.integers(0, 4, size=n).astype(np.uint8) for _ in range(3))
    align_blocked(a, b, c, scoring)  # compile
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        align_blocked(a, b, c, scoring)
        best = min(best, time.perf_counter() - t0)
    return n**3 / best / 1e9, best


def parity_check(scoring):
    """Bit-exact score parity of the compiled kernel vs the NumPy oracle on
    the canonical dat triplet -- a bench run with wrong answers is void."""
    from trialign.golden import align_planes_numpy
    from trialign.kernels.wavefront import align_wavefront
    from trialign.io import load_reference_triplet

    a, b, c = load_reference_triplet()
    got = align_wavefront(a, b, c, scoring)
    want = align_planes_numpy(a, b, c, scoring)
    if got != want:
        raise AssertionError(f"parity FAILED on dat triplet: kernel={got} golden={want}")
    return got


def main():
    import jax

    from trialign.config import Scoring

    scoring = Scoring()
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"backend={backend} devices={jax.devices()}")

    score = parity_check(scoring)
    log(f"parity OK on dat 64-triplet (score {score})")

    if on_tpu:
        n, repeats = 255, 20
    else:
        n, repeats = 32, 2  # smoke numbers; CPU interpret mode is slow

    gcups, dt = bench_single_stream(n, repeats, scoring)
    log(f"single-stream {n}^3: {dt*1e3:.2f} ms/alignment -> {gcups:.2f} GCUPS")

    batch_gcups = None
    blocked_gcups = None
    if on_tpu:
        batch_gcups, bdt = bench_batch(255, 16, scoring)
        log(f"batch 16x255^3 end-to-end: {bdt*1e3:.1f} ms -> {batch_gcups:.2f} GCUPS")
        blocked_gcups, bldt = bench_blocked(1024, scoring)
        log(f"blocked 1k^3 (sliced sweep): {bldt*1e3:.1f} ms -> {blocked_gcups:.2f} GCUPS")

    result = {
        "metric": f"single-chip DP cell-updates/s at {n}^3 (7-matrix cells, Pallas wavefront)",
        "value": round(gcups, 3),
        "unit": "GCUPS",
        "vs_baseline": round(gcups / BASELINE_ASIC_GCUPS, 3),
        "parity": "exact",
        "backend": backend,
        "batch_end_to_end_gcups": round(batch_gcups, 3) if batch_gcups else None,
        "blocked_1k_gcups": round(blocked_gcups, 3) if blocked_gcups else None,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
