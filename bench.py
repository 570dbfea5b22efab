#!/usr/bin/env python
"""TriAlign-TPU benchmark driver.

Prints an incrementally-enriched JSON result line to stdout: a valid
  {"metric": ..., "value": N, "unit": "GCUPS", "vs_baseline": N, ...}
line lands right after the FIRST measured stage and is re-printed with
more fields after every later stage -- the LAST line is the complete
result, but any line is a valid one (round-2 lesson: an all-or-nothing
bench that exceeds the harness budget reports nothing, BENCH_r02.json
rc=124).

Architecture: the parent process (no JAX) orchestrates; every stage runs
in its OWN subprocess (`python bench.py --stage NAME`) with a hard
timeout.  Rationale, all measured on this environment:
* the remote compile service is wildly variable (the same stage compiled
  in 16 s and in 19 min on the same day) -- a bounded stage can be killed
  and the rest of the bench still reports;
* the TPU worker nondeterministically crashes under sustained load and a
  hung device_get is not interruptible in-process;
* the JAX compilation cache does not hit across processes here anyway,
  so per-stage processes lose nothing.

A global wall-clock budget (TRIALIGN_BENCH_BUDGET_S, default 1100 s)
gates stages by worst-case estimate; stages run fastest-first,
highest-value-first.  Stage stderr is teed to bench_err.log.

The headline metric is DP cell-updates/s on one chip at 1k^3 via the
blocked (sliced) sweep -- BASELINE.md's north-star shape (1 cell-update =
one (i,j,k) lattice site across all 7 matrices, the reference's unit,
pic/Result.png).  vs_baseline is the ratio to the reference ASIC's
12.4 GCUPS at 512^3.  Parity for the headline stage is checked against
the independent C++ oracle on the very sequences measured; the fixture
stage re-checks the compiled kernels against the NumPy golden model on
the reference's dat vectors.

Measurement discipline lives in trialign/benchmarks.py (device_get sync,
distinct chained inputs via lax.scan, min-of-trials).
"""

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ERR_LOG = os.path.join(HERE, "bench_err.log")

_err_fh = None


def log(msg):
    global _err_fh
    print(msg, file=sys.stderr, flush=True)
    try:
        if _err_fh is None:
            _err_fh = open(ERR_LOG, "a")
        _err_fh.write(msg if msg.endswith("\n") else msg + "\n")
        _err_fh.flush()
    except OSError:
        pass


# ----------------------------------------------------------------------
# Stage implementations (run inside per-stage subprocesses).
# Each returns a dict of result fields.
# ----------------------------------------------------------------------

def _native_oracle():
    try:
        from trialign.native import score_native

        return score_native
    except Exception:  # noqa: BLE001
        return None


def stage_probe():
    import jax

    return {"backend": jax.default_backend(),
            "devices": str(jax.devices())}


def stage_cpu_smoke():
    import numpy as np

    from trialign import benchmarks as B
    from trialign.config import Scoring
    from trialign.golden import align_planes_numpy
    from trialign.kernels.wavefront import align_wavefront

    scoring = Scoring()
    rng = np.random.default_rng(1)
    a, b, c = (rng.integers(0, 4, 12).astype(np.uint8) for _ in range(3))
    got = align_wavefront(a, b, c, scoring, interpret=True)
    want = align_planes_numpy(a, b, c, scoring)
    if got != want:
        raise AssertionError(f"CPU parity FAILED: {got} != {want}")
    g, dt = B.bench_single_stream(32, 2, scoring)
    log(f"single-stream 32^3 (CPU smoke): {dt*1e3:.2f} ms")
    return {"cpu_smoke_gcups": g, "parity": "exact"}


def stage_blocked_1k():
    """Headline 1k^3 + parity vs the C++ oracle on the measured inputs."""
    from trialign import benchmarks as B
    from trialign.config import Scoring

    g, dt, score0, trip0 = B.bench_blocked(
        1024, 4, Scoring(), return_score0=True
    )
    log(f"blocked 1k^3: {dt*1e3:.1f} ms/alignment -> {g:.2f} GCUPS")
    out = {"blocked_1024_gcups": round(g, 3),
           "blocked_1024_ms": round(dt * 1e3, 1)}
    oracle = _native_oracle()
    if oracle is not None:
        want = oracle(*trip0)
        if score0 != want:
            raise AssertionError(
                f"1k^3 parity vs C++ oracle FAILED: {score0} != {want}"
            )
        out["parity"] = "exact"
        log(f"parity OK at 1k^3 vs independent C++ oracle ({score0})")
    return out


def stage_parity_fixtures():
    from trialign import benchmarks as B
    from trialign.config import Scoring

    score = B.parity_check(Scoring(), include_alt=False)
    log(f"parity OK on the reference dat 64-triplet (score {score}, "
        "wavefront + blocked)")
    return {"parity": "exact", "reference_dat_score": int(score)}


def stage_single_512():
    """The ASIC's own protocol: ONE 512^3 alignment including ramp
    (pic/Result.png Table III: 10.82 ms)."""
    from trialign import benchmarks as B
    from trialign.config import Scoring

    g, dt = B.bench_blocked(512, 8, Scoring())
    log(f"blocked 512^3 single-stream: {dt*1e3:.2f} ms -> {g:.2f} GCUPS "
        "(ASIC: 10.82 ms)")
    return {"blocked_512_single_ms": round(dt * 1e3, 2),
            "blocked_512_single_gcups": round(g, 3)}


def stage_chain_512():
    from trialign import benchmarks as B
    from trialign.config import Scoring

    g, dt = B.bench_blocked_chain(512, 16, Scoring())
    log(f"blocked 512^3 chained x16 (shared-B/C back-to-back): "
        f"{dt*1e3:.2f} ms/alignment -> {g:.2f} GCUPS")
    return {"blocked_512_ms": round(dt * 1e3, 2),
            "blocked_512_gcups": round(g, 3)}


def stage_hetero_512():
    """The honest back-to-back: 16 fully DISTINCT ~512^3 triplets through
    the hetero chain (round-2 VERDICT item 4)."""
    from trialign import benchmarks as B
    from trialign.config import Scoring

    g, dt = B.bench_hetero_chain(512, 16, Scoring(),
                                 parity_oracle=_native_oracle())
    log(f"hetero 512^3 chained x16 (distinct triplets): "
        f"{dt*1e3:.2f} ms/alignment -> {g:.2f} GCUPS")
    return {"hetero_512_ms": round(dt * 1e3, 2),
            "hetero_512_gcups": round(g, 3)}


def stage_batch_mixed():
    from trialign import benchmarks as B
    from trialign.config import Scoring

    g, s, tps = B.bench_batch_mixed(1024, Scoring())
    log(f"batch 1024 triplets len 128-512 end-to-end: {s:.2f} s -> "
        f"{g:.2f} GCUPS aggregate, {tps:.0f} triplets/s (parity "
        "spot-checked)")
    return {"batch_mixed_1024_gcups": round(g, 3),
            "batch_mixed_1024_triplets_per_s": round(tps, 1)}


def stage_blocked_2k():
    from trialign import benchmarks as B
    from trialign.config import Scoring

    g, dt = B.bench_blocked(2048, 2, Scoring())
    log(f"blocked 2048^3: {dt*1e3:.1f} ms -> {g:.2f} GCUPS")
    return {"blocked_2048_gcups": round(g, 3)}


def stage_chain_1k():
    from trialign import benchmarks as B
    from trialign.config import Scoring

    g, dt = B.bench_blocked_chain(1024, 8, Scoring(), (520, 384, 16))
    log(f"blocked 1k^3 chained x8 (back-to-back): {dt*1e3:.1f} "
        f"ms/alignment -> {g:.2f} GCUPS")
    return {"blocked_1024_chained_gcups": round(g, 3),
            "blocked_1024_chained_ms": round(dt * 1e3, 1)}


def stage_traceback_512():
    """Full alignment (score + traceback string) at 512^3 -- the
    capability the reference stubbed out (src/PE_1cyc.v:12-14,30)."""
    import time as _t

    import numpy as np

    from trialign.api import align
    from trialign.golden.numpy_model import rescore_alignment

    rng = np.random.default_rng(13)
    a, b, c = (rng.integers(0, 4, 512).astype(np.uint8) for _ in range(3))
    res = align(a, b, c, return_alignment=True)  # compile + warm
    assert rescore_alignment(res.alignment) == res.score
    best = float("inf")
    for _ in range(3):
        t0 = _t.perf_counter()
        align(a, b, c, return_alignment=True)
        best = min(best, _t.perf_counter() - t0)
    log(f"512^3 FULL alignment (score + traceback, warm): {best:.2f} s "
        "(rescore-validated)")
    return {"traceback_512_s": round(best, 3)}


def stage_traceback_1k():
    import time as _t

    import numpy as np

    from trialign.api import align
    from trialign.golden.numpy_model import rescore_alignment

    rng = np.random.default_rng(13)
    a, b, c = (rng.integers(0, 4, 1024).astype(np.uint8) for _ in range(3))
    res = align(a, b, c, return_alignment=True)  # compile + warm
    assert rescore_alignment(res.alignment) == res.score
    best = float("inf")
    for _ in range(2):
        t0 = _t.perf_counter()
        align(a, b, c, return_alignment=True)
        best = min(best, _t.perf_counter() - t0)
    log(f"1k^3 FULL alignment (score + traceback, warm): {best:.2f} s "
        "(rescore-validated)")
    return {"traceback_1k_s": round(best, 3)}


def stage_traceback_2k():
    """Full alignment at 2k^3: the Hirschberg top split runs on the
    blocked Pallas slab kernels (kernels/slab.py), the halves on the
    direct engine -- the scale the XLA slab engine could not reach."""
    import time as _t

    import numpy as np

    from trialign.api import align
    from trialign.golden.numpy_model import rescore_alignment

    rng = np.random.default_rng(13)
    a, b, c = (rng.integers(0, 4, 2048).astype(np.uint8) for _ in range(3))
    res = align(a, b, c, return_alignment=True)  # compile + warm
    assert rescore_alignment(res.alignment) == res.score
    best = float("inf")
    for _ in range(2):  # min-of-trials per the measurement discipline
        t0 = _t.perf_counter()
        align(a, b, c, return_alignment=True)
        best = min(best, _t.perf_counter() - t0)
    log(f"2k^3 FULL alignment (score + traceback, warm): {best:.2f} s "
        "(rescore-validated)")
    return {"traceback_2k_s": round(best, 3)}


def _traceback_at(n, seed, key, trials=2):
    """Shared body of the >=4k traceback stages: compile+warm once
    (rescore-validated), then min-of-`trials` timed runs."""
    import time as _t

    import numpy as np

    from trialign.api import align
    from trialign.golden.numpy_model import rescore_alignment

    rng = np.random.default_rng(seed)
    a, b, c = (rng.integers(0, 4, n).astype(np.uint8) for _ in range(3))
    res = align(a, b, c, return_alignment=True)  # compile + warm
    assert rescore_alignment(res.alignment) == res.score
    best = float("inf")
    for _ in range(trials):  # min-of-trials per the measurement discipline
        t0 = _t.perf_counter()
        align(a, b, c, return_alignment=True)
        best = min(best, _t.perf_counter() - t0)
    log(f"{n}^3 FULL alignment (score + traceback, warm): {best:.2f} s "
        "(rescore-validated)")
    return {key: round(best, 3)}


def stage_traceback_4k():
    """Full alignment at 4k^3 -- 8x the reference's maximum size, with
    the traceback it never had: Hirschberg splits on the pin-mode Pallas
    slab kernels, leaves on the direct engine (15.1 s warm measured;
    reference stub: src/PE_1cyc.v:12-14,30)."""
    return _traceback_at(4096, 29, "traceback_4k_s")


def stage_traceback_8k():
    """Full alignment at 8k^3 -- 16x the reference's maximum axis
    (51.1 s warm measured in round 4).  One timed run after the warm
    one: at ~51 s each, a second trial buys little and risks the stage
    cap."""
    return _traceback_at(8192, 31, "traceback_8k_s", trials=1)


def stage_roofline():
    from trialign import benchmarks as B
    from trialign.config import Scoring

    live = os.environ.get("TRIALIGN_ROOFLINE_LIVE", "1") == "1"
    rf = B.roofline(Scoring(), measure_live=live)
    log(f"roofline: anchor {rf['vpu_element_ops_per_s']/1e12:.2f} T "
        f"elem-ops/s (live micro {rf['vpu_micro_measured']/1e12:.2f} T) / "
        f"{rf['ops_per_cell']} ops/cell -> ceiling "
        f"{rf['roofline_gcups']} GCUPS")
    return {"roofline_gcups": rf["roofline_gcups"],
            "ops_per_cell": rf["ops_per_cell"]}


def stage_single_stream_255():
    from trialign import benchmarks as B
    from trialign.config import Scoring

    g, dt = B.bench_single_stream(255, 16, Scoring())
    log(f"single-stream 255^3: {dt*1e3:.2f} ms -> {g:.2f} GCUPS")
    return {"single_stream_255_gcups": round(g, 3)}


STAGE_FNS = {
    "probe": stage_probe,
    "cpu_smoke": stage_cpu_smoke,
    "blocked_1k": stage_blocked_1k,
    "parity_fixtures": stage_parity_fixtures,
    "single_512": stage_single_512,
    "chain_512": stage_chain_512,
    "hetero_512": stage_hetero_512,
    "batch_mixed": stage_batch_mixed,
    "blocked_2k": stage_blocked_2k,
    "chain_1k": stage_chain_1k,
    "traceback_512": stage_traceback_512,
    "traceback_1k": stage_traceback_1k,
    "traceback_2k": stage_traceback_2k,
    "traceback_4k": stage_traceback_4k,
    "traceback_8k": stage_traceback_8k,
    "roofline": stage_roofline,
    "single_stream_255": stage_single_stream_255,
}

# (name, worst-case-COLD seconds, hard-cap seconds or None) in execution
# order, highest-value-first: headline+parity, the flagship-scale
# tracebacks, then the three 512^3 protocols (chained / distinct-triplet /
# single), the mixed batch, then breadth.  The axon compile service caches
# server-side, so a stage whose HLO was compiled recently (e.g. by a
# pre-warm run) takes ~1/10 of the cold estimate -- gating is therefore
# OPTIMISTIC (a high-value stage is always attempted while meaningful
# budget remains; a cold compile burning its timeout on a high-value stage
# is a better spend than landing three tail stages).
#
# traceback_4k/8k sit SECOND/THIRD (round-4 lesson: value-ordered-last,
# the 4k stage ran with 143 s of budget left against a ~170 s+ cold
# compile and timed out, so the flagship numbers never reached the driver
# artifact).  Warm via the persistent .jax_cache they run in ~65 s / ~230 s
# including the in-stage rescore validation; the hard caps bound the cold-
# cache downside to ~880 s of the 1100 s budget, and a cold 4k failure
# gates 8k off entirely (same compile chain, strictly bigger).
TPU_STAGES = [
    ("blocked_1k", 400, None),
    ("traceback_4k", 280, 420),
    ("traceback_8k", 330, 460),  # gated: runs only if traceback_4k landed
    ("traceback_1k", 350, None),  # 204 s cold / 2.2 s warm
    ("batch_mixed", 430, None),
    ("chain_512", 400, None),
    ("hetero_512", 420, None),
    ("single_512", 280, None),
    ("traceback_512", 300, None),
    ("roofline", 120, None),
    # traceback_2k's cold compile chain (top-split slab kernels + free_jk
    # restart + direct halves) measured anywhere from 142 s to >519 s
    # depending on the compile service's cache state; with 4k/8k already
    # attempted above it is breadth, not flagship, so it queues behind
    # the cheap stages.
    ("traceback_2k", 400, None),
    ("chain_1k", 420, None),
    ("blocked_2k", 330, None),
    ("parity_fixtures", 450, None),
    ("single_stream_255", 150, None),
]


# ----------------------------------------------------------------------
# Parent orchestration.
# ----------------------------------------------------------------------

class Runner:
    def __init__(self):
        # Default kept well under the driver's observed kill window: r01's
        # all-stage run landed (rc=0) but r02's was killed (rc=124), so the
        # harness limit is somewhere above ~15 min of useful work; 1100 s
        # of self-budget plus the <=75 s gating margin stays clear of it.
        self.budget = float(os.environ.get("TRIALIGN_BENCH_BUDGET_S", "1100"))
        self.t0 = time.time()
        self.fields = {}
        self._last_emitted = None

    def elapsed(self):
        return time.time() - self.t0

    def remaining(self):
        return self.budget - self.elapsed()

    def emit(self):
        # Inlined from trialign.benchmarks.BASELINE_ASIC_GCUPS (asserted
        # equal by tests/test_bench_script.py) -- the parent must never
        # import jax: with the tunnel down, any jax-importing process can
        # hang in axon client init.
        BASELINE_ASIC_GCUPS = 12.4

        f = self.fields
        if "blocked_1024_gcups" in f:
            metric = ("single-chip DP cell-updates/s at 1024^3 "
                      "(7-matrix cells, blocked Pallas sweep)")
            value = f["blocked_1024_gcups"]
        elif "cpu_smoke_gcups" in f:
            metric = "CPU-interpret smoke GCUPS at 32^3 (no TPU available)"
            value = f["cpu_smoke_gcups"]
        else:
            return
        result = {
            "metric": metric,
            "value": round(value, 3),
            "unit": "GCUPS",
            "vs_baseline": round(value / BASELINE_ASIC_GCUPS, 3),
            "parity": f.get("parity", "pending"),
            "backend": f.get("backend", "?"),
        }
        for k, v in f.items():
            if k not in result and k not in ("cpu_smoke_gcups",
                                             "blocked_1024_gcups", "devices"):
                result[k] = v
        if "roofline_gcups" in f and "blocked_1024_gcups" in f:
            result["roofline_fraction"] = round(
                f["blocked_1024_gcups"] / f["roofline_gcups"], 3
            )
        # Dedupe (round-3 ADVICE): the final safety emit after the stage
        # loop re-prints the last stage's line verbatim but for elapsed_s,
        # duplicating the tail the driver captures.  Skip when nothing
        # measurable changed since the last emission.
        key = json.dumps({k: v for k, v in result.items()
                          if k != "elapsed_s"}, sort_keys=True)
        if key == self._last_emitted:
            return
        self._last_emitted = key
        result["elapsed_s"] = round(self.elapsed(), 1)
        print(json.dumps(result), flush=True)

    def _stage_timeout(self, est, cap=None):
        # Bounded by the global budget; generous enough for a cold compile
        # of this stage but not so large one stage eats every later one.
        # An explicit per-stage cap bounds stages whose cold compile can
        # never finish in-budget anyway (traceback_4k/8k: ~25 min cold).
        t = max(60.0, min(self.remaining() - 15.0, max(1.5 * est, est + 180.0)))
        if cap is not None:
            t = min(t, cap)
        return t

    def run_stage(self, name, est, extra_env=None, force=False, cap=None):
        # Optimistic gating: attempt any stage while meaningful budget
        # remains -- on a warm server-side compile cache stages finish in
        # ~1/10 the cold estimate, and stages are value-ordered so burning
        # the remaining budget on this one beats saving it for the tail.
        if not force and self.remaining() < 75.0:
            log(f"[{name}] SKIPPED ({self.remaining():.0f}s left "
                f"of {self.budget:.0f})")
            return None
        timeout = self._stage_timeout(est, cap)
        log(f"[{name}] start (elapsed {self.elapsed():.0f}s, "
            f"timeout {timeout:.0f}s)")
        env = dict(os.environ)
        if extra_env:
            env.update(extra_env)
        if env.get("TRIALIGN_FORCE_CPU") == "1":
            # The axon sitecustomize calls register() at EVERY interpreter
            # start while PALLAS_AXON_POOL_IPS is set -- with the tunnel
            # down that can hang for minutes BEFORE child_main() runs.
            # Unsetting it skips axon registration entirely for the
            # CPU-forced child (measured: import jax 120 s -> 1 s).
            env.pop("PALLAS_AXON_POOL_IPS", None)
        if self.remaining() < 300.0:
            env["TRIALIGN_ROOFLINE_LIVE"] = "0"
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", name],
                capture_output=True, text=True, timeout=timeout, cwd=HERE,
                env=env,
            )
        except subprocess.TimeoutExpired as e:
            for s in (e.stderr or b""), (e.stdout or b""):
                if s:
                    log(s.decode() if isinstance(s, bytes) else s)
            log(f"[{name}] TIMED OUT after {timeout:.0f}s; continuing")
            return None
        if proc.stderr:
            log(proc.stderr.rstrip())
        dt = time.time() - t0
        fields = None
        for line in proc.stdout.splitlines():
            if line.startswith("FIELDS "):
                fields = json.loads(line[len("FIELDS "):])
        if proc.returncode != 0 or fields is None:
            log(f"[{name}] FAILED (rc={proc.returncode}, {dt:.0f}s); "
                "continuing")
            return None
        log(f"[{name}] done in {dt:.0f}s")
        self.fields.update(fields)
        self.emit()
        return fields


def parent_main():
    r = Runner()
    log(f"=== bench session start {time.strftime('%Y-%m-%d %H:%M:%S')} "
        f"(budget {r.budget:.0f}s) ===")
    probe = r.run_stage_raw("probe", 120)
    if probe is None:
        # The axon tunnel sometimes stalls for minutes on client init;
        # one SHORT retry catches a just-recovered worker -- if the first
        # probe burned its full 300s the tunnel is almost surely dead,
        # and every second here delays the guaranteed smoke line.
        log("probe retry (axon init stalled or crashed)")
        probe = r.run_stage_raw("probe", 150, cap=120.0)
    backend = (probe or {}).get("backend", "none")
    r.fields["backend"] = backend
    log(f"backend={backend} devices={(probe or {}).get('devices')} "
        f"budget={r.budget:.0f}s")
    if backend != "tpu":
        # Pin the CPU platform in the child: if the probe failed because
        # axon client init HANGS (vs. being absent), the smoke stage would
        # hang the same way and the bench would emit nothing.
        # force=True: this is the bench's last chance to emit anything --
        # run it even if the probe (re)tries consumed the budget.
        r.fields["note"] = (
            "TPU tunnel unavailable at bench time; hardware-measured "
            "numbers with provenance are in BENCH_NOTES_r04.md and "
            "bench_err.log"
        )
        r.run_stage("cpu_smoke", 150, extra_env={"TRIALIGN_FORCE_CPU": "1"},
                    force=True)
        return
    r.fields["reference_asic_512_ms"] = 10.82
    r.fields["reference_software_512_gcups"] = 0.058
    for name, est, cap in TPU_STAGES:
        if name == "traceback_8k" and "traceback_4k_s" not in r.fields:
            # Same compile chain as 4k but strictly bigger: if 4k died
            # (cold cache), 8k cannot land either -- don't burn its cap.
            log("[traceback_8k] SKIPPED (traceback_4k did not land)")
            continue
        r.run_stage(name, est, cap=cap)
    r.emit()
    log(f"bench complete in {r.elapsed():.0f}s; "
        f"fields: {sorted(r.fields)}")


def _run_stage_raw(self, name, est, cap=None):
    """Like run_stage but returns fields without emitting (probe).
    ``cap`` bounds the timeout below the compile-headroom formula --
    probes don't compile, and a dead tunnel hangs them to the limit
    (measured drill: probe 300s + retry 330s before the smoke line)."""
    timeout = self._stage_timeout(est)
    if cap is not None:
        timeout = min(timeout, cap)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--stage", name],
            capture_output=True, text=True, timeout=timeout, cwd=HERE,
        )
    except subprocess.TimeoutExpired:
        log(f"[{name}] TIMED OUT after {timeout:.0f}s")
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("FIELDS "):
            return json.loads(line[len("FIELDS "):])
    if proc.stderr:
        log(proc.stderr.rstrip())
    return None


Runner.run_stage_raw = _run_stage_raw


def child_main(name):
    if os.environ.get("TRIALIGN_FORCE_CPU") == "1":
        # Must happen before any backend is initialized: the axon
        # sitecustomize force-sets jax_platforms="axon,cpu", and a broken
        # tunnel hangs client init forever; JAX_PLATFORMS alone is not
        # honored once the plugin registers.
        import jax

        jax.config.update("jax_platforms", "cpu")
    else:
        # Persistent CLIENT-side compile cache: the axon compile
        # service's server-side cache evicts within hours, and a fully
        # cold bench burns its whole budget on 5 of 13 stages (measured
        # 2026-08-19).  Cached executables verified to round-trip across
        # processes on this backend (hit: 2.3 s vs 3.7 s tunnel compile
        # for the probe kernel; large kernels skip the compile service
        # entirely).  The cache key includes these config flags, so
        # they must be set IDENTICALLY in every process that shares the
        # directory (the pre-warm run and the driver's run both go
        # through this code path).
        cache_dir = os.path.join(HERE, ".jax_cache")
        os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", cache_dir)
        import jax

        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    fn = STAGE_FNS[name]
    fields = fn()
    print("FIELDS " + json.dumps(fields), flush=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        child_main(sys.argv[2])
    else:
        parent_main()
