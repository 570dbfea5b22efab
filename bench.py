#!/usr/bin/env python
"""TriAlign-TPU benchmark driver.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "GCUPS", "vs_baseline": N, ...}

The headline metric is DP cell-updates/s on one chip at 1k^3 via the blocked
(sliced) sweep -- BASELINE.md's north-star shape (1 cell-update = one
(i,j,k) lattice site across all 7 matrices, the reference's unit,
pic/Result.png).  vs_baseline is the ratio to the reference ASIC's
12.4 GCUPS at 512^3.  Human-readable detail goes to stderr.

Measurement discipline lives in trialign/benchmarks.py (device_get sync,
distinct chained inputs, min-of-trials).
"""

import json
import sys


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax

    from trialign.benchmarks import (
        BASELINE_ASIC_GCUPS,
        bench_batch,
        bench_blocked,
        bench_single_stream,
        parity_check,
    )
    from trialign.config import Scoring

    scoring = Scoring()
    backend = jax.default_backend()
    on_tpu = backend == "tpu"
    log(f"backend={backend} devices={jax.devices()}")

    score = parity_check(scoring)
    log(
        "parity OK on the reference's dat/A_seq+B_seq+C_seq 64-triplet "
        f"(score {score}, wavefront + blocked) and the alt fixture"
    )

    if on_tpu:
        blocked_gcups, bdt = bench_blocked(1024, 4, scoring)
        log(f"blocked 1k^3: {bdt*1e3:.1f} ms/alignment -> {blocked_gcups:.2f} GCUPS")
        g512, dt512 = bench_blocked(512, 8, scoring)
        log(f"blocked 512^3 (reference headline size): {dt512*1e3:.2f} ms -> {g512:.2f} GCUPS")
        g2k, dt2k = bench_blocked(2048, 2, scoring)
        log(f"blocked 2048^3: {dt2k*1e3:.1f} ms -> {g2k:.2f} GCUPS")
        single_gcups, sdt = bench_single_stream(255, 16, scoring)
        log(f"single-stream 255^3: {sdt*1e3:.2f} ms -> {single_gcups:.2f} GCUPS")
        batch_gcups, tdt = bench_batch(255, 16, scoring)
        log(f"batch 16x255^3 end-to-end: {tdt*1e3:.1f} ms -> {batch_gcups:.2f} GCUPS")
        value = blocked_gcups
        metric = "single-chip DP cell-updates/s at 1024^3 (7-matrix cells, blocked Pallas sweep)"
        extra = {
            "blocked_512_gcups": round(g512, 3),
            "blocked_512_ms": round(dt512 * 1e3, 2),
            "blocked_2048_gcups": round(g2k, 3),
            "single_stream_255_gcups": round(single_gcups, 3),
            "batch_end_to_end_gcups": round(batch_gcups, 3),
            "reference_asic_512_ms": 10.82,
            "reference_software_512_gcups": 0.058,
        }
    else:
        single_gcups, sdt = bench_single_stream(32, 2, scoring)
        log(f"single-stream 32^3 (CPU smoke): {sdt*1e3:.2f} ms -> {single_gcups:.3f} GCUPS")
        value = single_gcups
        metric = "CPU-interpret smoke GCUPS at 32^3 (no TPU available)"
        extra = {}

    result = {
        "metric": metric,
        "value": round(value, 3),
        "unit": "GCUPS",
        "vs_baseline": round(value / BASELINE_ASIC_GCUPS, 3),
        "parity": "exact",
        "backend": backend,
        **extra,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
