#!/usr/bin/env python
"""TriAlign-TPU benchmark driver.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "GCUPS", "vs_baseline": N, ...}

The headline metric is DP cell-updates/s on one chip at 1k^3 via the blocked
(sliced) sweep -- BASELINE.md's north-star shape (1 cell-update = one
(i,j,k) lattice site across all 7 matrices, the reference's unit,
pic/Result.png).  vs_baseline is the ratio to the reference ASIC's
12.4 GCUPS at 512^3.  Human-readable detail goes to stderr.

Measurement discipline (learned the hard way on this remote-TPU tunnel):
* every timed sample ends in jax.device_get() -- block_until_ready() does
  not reliably block on the axon platform;
* repeats inside one jit use DIFFERENT inputs, or XLA CSE collapses them;
* take the min over trials (tunnel hiccups add tens of ms of noise).
"""

import json
import sys
import time

import numpy as np

BASELINE_ASIC_GCUPS = 12.4  # reference ASIC @512^3, pic/Result.png (derived)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _time_chained(fn, args, repeats, trials=4):
    """min wall time of fn(*args) / repeats, with a full host sync."""
    import jax

    jax.device_get(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        jax.device_get(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / repeats


def bench_single_stream(n, repeats, scoring):
    """Amortized single-alignment GCUPS at n^3 via the Pallas wavefront
    kernel; `repeats` distinct alignments chained inside one jit."""
    import jax
    import jax.numpy as jnp

    from trialign.kernels import wavefront as wf

    rng = np.random.default_rng(42)
    lab, hb, wc = wf.bucket_dims(n, n, n)
    interpret = jax.default_backend() != "tpu"
    flat = []
    for _ in range(repeats):
        a, b, c = (rng.integers(0, 4, size=n).astype(np.uint8) for _ in range(3))
        flat.extend(jnp.asarray(x) for x in wf.prepare_compact(a, b, c, lab, hb, wc))

    @jax.jit
    def chained(*flat):
        outs = []
        for i in range(repeats):
            lens, ae, bf, cf = flat[4 * i : 4 * i + 4]
            outs.append(
                wf._run_compact(lens, ae, bf, cf, lab, hb, wc, scoring, interpret).max()
            )
        return jnp.stack(outs).sum()

    dt = _time_chained(chained, flat, repeats)
    return n**3 / dt / 1e9, dt


def bench_blocked(n, repeats, scoring):
    """Long-triplet sliced sweep (the slicing-method path) at n^3;
    `repeats` distinct alignments chained inside one jit."""
    import jax
    import jax.numpy as jnp

    from trialign.config import PAD_SYMBOL
    from trialign.kernels import blocked as BK

    rng = np.random.default_rng(3)
    dims = BK.plan_dims(n, n, n, *BK.choose_block_shape(n, n, n))
    hb, wc, lab = dims[0], dims[1], dims[2]
    kdim, jdim = dims[6], dims[7]
    b = rng.integers(0, 4, size=n).astype(np.uint8)
    c = rng.integers(0, 4, size=n).astype(np.uint8)
    b_arr = np.full(jdim + hb + 8, PAD_SYMBOL - 1, np.int32)
    b_arr[1 : n + 1] = b
    c_arr = np.full(kdim + wc + 8, PAD_SYMBOL - 2, np.int32)
    c_arr[1 : n + 1] = c
    lens = jnp.asarray(np.array([n, n, n], np.int32))
    aexts = []
    for _ in range(repeats):
        a = rng.integers(0, 4, size=n).astype(np.uint8)
        a_ext = np.full(lab + 2, PAD_SYMBOL, np.int32)
        a_ext[1 : n + 1] = a
        aexts.append(jnp.asarray(a_ext))

    @jax.jit
    def chained(lens, barr, carr, *aexts):
        outs = [
            BK._blocked_core(lens, ae, barr, carr, dims, scoring, False)[:7].max()
            for ae in aexts
        ]
        return jnp.stack(outs).sum()

    dt = _time_chained(
        chained, (lens, jnp.asarray(b_arr), jnp.asarray(c_arr), *aexts), repeats
    )
    return n**3 / dt / 1e9, dt


def bench_batch(n, batch, scoring):
    """End-to-end batched throughput (includes host prep + transfers)."""
    import jax

    from trialign.dist.batch import align_batch_padded

    rng = np.random.default_rng(7)
    trips = [
        tuple(rng.integers(0, 4, size=n).astype(np.uint8) for _ in range(3))
        for _ in range(batch)
    ]
    align_batch_padded(trips, scoring)  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        align_batch_padded(trips, scoring)  # returns host ints: fully synced
        best = min(best, time.perf_counter() - t0)
    return batch * n**3 / best / 1e9, best


def parity_check(scoring):
    """Bit-exact score parity of the compiled kernels vs the NumPy oracle --
    a bench run with wrong answers is void."""
    from trialign.golden import align_planes_numpy
    from trialign.kernels.blocked import align_blocked
    from trialign.kernels.wavefront import align_wavefront
    from trialign.io import load_reference_triplet

    a, b, c = load_reference_triplet()
    want = align_planes_numpy(a, b, c, scoring)
    got = align_wavefront(a, b, c, scoring)
    if got != want:
        raise AssertionError(f"wavefront parity FAILED: {got} != {want}")
    got_b = align_blocked(a, b, c, scoring)
    if got_b != want:
        raise AssertionError(f"blocked parity FAILED: {got_b} != {want}")
    return want


def main():
    import jax

    from trialign.config import Scoring

    scoring = Scoring()
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"backend={backend} devices={jax.devices()}")

    score = parity_check(scoring)
    log(f"parity OK on dat 64-triplet (score {score}, wavefront + blocked)")

    if on_tpu:
        blocked_gcups, bdt = bench_blocked(1024, 4, scoring)
        log(f"blocked 1k^3: {bdt*1e3:.1f} ms/alignment -> {blocked_gcups:.2f} GCUPS")
        single_gcups, sdt = bench_single_stream(255, 16, scoring)
        log(f"single-stream 255^3: {sdt*1e3:.2f} ms -> {single_gcups:.2f} GCUPS")
        batch_gcups, tdt = bench_batch(255, 16, scoring)
        log(f"batch 16x255^3 end-to-end: {tdt*1e3:.1f} ms -> {batch_gcups:.2f} GCUPS")
        value = blocked_gcups
        metric = "single-chip DP cell-updates/s at 1024^3 (7-matrix cells, blocked Pallas sweep)"
    else:
        single_gcups, sdt = bench_single_stream(32, 2, scoring)
        log(f"single-stream 32^3 (CPU smoke): {sdt*1e3:.2f} ms -> {single_gcups:.3f} GCUPS")
        blocked_gcups = batch_gcups = None
        value = single_gcups
        metric = "CPU-interpret smoke GCUPS at 32^3 (no TPU available)"

    result = {
        "metric": metric,
        "value": round(value, 3),
        "unit": "GCUPS",
        "vs_baseline": round(value / BASELINE_ASIC_GCUPS, 3),
        "parity": "exact",
        "backend": backend,
        "single_stream_255_gcups": round(single_gcups, 3) if single_gcups else None,
        "batch_end_to_end_gcups": round(batch_gcups, 3) if batch_gcups else None,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
