"""Hirschberg-style divide-and-conquer alignment recovery.

Restores the capability the reference hardware stubbed out (its traceback
`act` outputs and action memory are commented out, src/PE_1cyc.v:12-14,30):
full three-way alignments in O(n^2) memory instead of an O(n^3) action
cuboid.

Split on the middle A-plane i = m: F[s, j, k] is the best prefix-path score
ending at (m, j, k) in state s (forward sweep, honoring the subproblem's
start mode); G[s, j, k] the best suffix-path score from there to the end
(backward sweep).  max(F + G) over (s, j, k) recovers the optimal crossing,
whose state is pinned into both half problems; recursion bottoms out in a
small cuboid DP with an explicit argmax walk.
"""

from __future__ import annotations

import os
import sys
from typing import List, Optional, Tuple

import numpy as np

from trialign.config import CONSUMES, NUM_MATRICES, OFFSETS, Scoring
from trialign.traceback.engine import NEG, backward_slab, forward_sweep

# Base-case cuboid cell budget (7 matrices x 4B each: ~29 MB at the cap).
BASE_CELLS = 1 << 20

# Above this many cells, slab sweeps run on the accelerator via the jitted
# twin engine (trialign/traceback/xla_engine.py); below, NumPy wins on
# dispatch+compile overhead.  2^21 ~ the crossover measured on the remote
# v5e (dispatch ~5-30 ms vs ~100 ms of NumPy per 2M cells).
XLA_CELLS = 1 << 21

# Between BASE_CELLS and this cap, subproblems go to the device-resident
# direct engine (traceback/direct.py): one choice-capture sweep + one
# on-device walk, instead of recursing -- the recursion's many small
# dispatches are round-trip-bound on the remote-TPU environment.  A 512^3
# problem is a single direct call; at the default cap a 1k^3 problem is
# too (the packed-choice buffer is ~10 GB of the chip's 16 GB HBM).  The
# cell cap is paired with the byte-accurate _direct_fits gate below,
# which models the engine's TOTAL device footprint against the chip's
# reported budget and routes oversize problems to the Hirschberg split
# proactively.  Override with TRIALIGN_DIRECT_CELLS.  Round 4 raised the
# default 1100 Mi -> 1400 Mi: tb-trace caught a (1024, 1059, 1082) node
# (1.18 G cells) paying a ~25 s split because it sat just over the old
# cap while its byte footprint fit the chip fine -- _direct_fits is the
# real gate, the cell cap only screens out problems whose footprint
# could never fit.
DIRECT_CELLS = int(os.environ.get("TRIALIGN_DIRECT_CELLS",
                                  1400 * 2**20))

# Below this many cells the packed-choice buffer is ~2.5 GB -- a failure
# to allocate it is a real bug, not an HBM-capacity miss, so the OOM
# fallback in _solve re-raises instead of splitting.
_DIRECT_SAFE_CELLS = 192 * 2**20

# Fraction of the device budget the direct engine may plan to use; the
# rest absorbs allocator fragmentation and resident arrays the footprint
# model cannot see (callers' sequences, other layers' buffers).
_DIRECT_FIT_FRACTION = 0.90


def _direct_fits(la: int, lb: int, lc: int) -> bool:
    """Proactive byte gate: route to the split when the direct engine's
    modeled TOTAL footprint would not fit the device (round-3 VERDICT:
    the cell-count cap alone let a 18.7 GB program onto a 15.75 GB chip
    and the reactive OOM catch never fired)."""
    from trialign.traceback.direct import (
        device_memory_budget,
        direct_memory_bytes,
    )

    return direct_memory_bytes(la, lb, lc) <= (
        _DIRECT_FIT_FRACTION * device_memory_budget()
    )


# Accelerator OOMs surface in several dialects, none guaranteed to carry
# the literal RESOURCE_EXHAUSTED code: XLA compile-time HBM exhaustion
# says "Ran out of memory in memory space hbm" / "Used 18.68G of 15.75G
# hbm" wrapped in an INTERNAL error, and the remote-TPU tunnel can
# re-wrap that as "INTERNAL: HTTP 500" with the detail appended.  Match
# broadly: anything that names memory exhaustion counts (the safe-size
# floor above still keeps small-problem failures fatal).
_OOM_MARKERS = (
    "RESOURCE_EXHAUSTED",
    "Ran out of memory",
    "ran out of memory",
    "Out of memory",
    "out of memory",
    "memory space hbm",
    "of memory in memory space",
    # The allocator dialect "Allocation of <N> bytes exceeds the limit";
    # keyed on the full phrase, not bare "exceeds the limit", which also
    # appears in non-memory errors (shape/recursion limits).
    "bytes exceeds the limit",
)


def _is_oom(e: BaseException) -> bool:
    text = str(e)
    if any(m in text for m in _OOM_MARKERS):
        return True
    # "Used <X>G of <Y>G hbm" -- the compile-time HBM report.
    import re

    return re.search(r"Used [\d.]+[GMK]i?B? of [\d.]+[GMK]i?B? hbm", text) is not None

# Above this many cells, slab sweeps run on the blocked Pallas slab
# kernels (kernels/slab.py: planes in VMEM, faces in HBM) instead of the
# XLA twin engine, which is HBM-bound at well under 1 GCUPS.  Only the
# splits ABOVE the direct-engine cap ever sweep at this size (2k^3+).
# Since round 4 this covers pin-mode nodes too (v0 seeds the kernel's
# origin); they dominate 4k^3+ recursions.  Override with
# TRIALIGN_SLAB_PALLAS_CELLS; TRIALIGN_SLAB_FORCE=1 routes every
# eligible sweep (tests).
SLAB_PALLAS_CELLS = int(
    os.environ.get("TRIALIGN_SLAB_PALLAS_CELLS", 256 * 2**20)
)

Column = Tuple[int, int, int]


def _use_pallas_slab(la: int, lb: int, lc: int, scoring) -> bool:
    if os.environ.get("TRIALIGN_SLAB_FORCE") == "1":
        return True
    if min(la, lb, lc) < 1:
        return False
    if (la + 1) * (lb + 1) * (lc + 1) < SLAB_PALLAS_CELLS:
        return False
    import jax

    return jax.default_backend() == "tpu"


def _fwd_slab_async(a, b, c, scoring, mode, v0, capture_m):
    """forward_sweep dispatch: compiled engine for big slabs.  Returns a
    zero-arg fetch function so a node's sweeps can all be in flight before
    any result is pulled back (saves one tunnel round trip per sweep)."""
    if (
        mode in ("free", "free_jk")
        and v0 is None
        and (capture_m is None or capture_m == len(a))
        and _use_pallas_slab(len(a), len(b), len(c), scoring)
    ):
        from trialign.kernels.slab import forward_slab_blocked_async

        return forward_slab_blocked_async(
            a, b, c, scoring, mode=mode, want_slab=capture_m is not None
        )
    if (len(a) + 1) * (len(b) + 1) * (len(c) + 1) >= XLA_CELLS:
        from trialign.traceback.xla_engine import forward_sweep_xla_async

        return forward_sweep_xla_async(
            a, b, c, scoring, mode=mode, v0=v0, capture_m=capture_m
        )
    final, slab, _ = forward_sweep(
        a, b, c, scoring, mode=mode, v0=v0, capture_m=capture_m
    )
    return lambda: (final, slab)


def _bwd_slab_async(a_suffix, b, c, scoring, end_v):
    if _use_pallas_slab(len(a_suffix), len(b), len(c), scoring):
        from trialign.kernels.slab import backward_slab_blocked_async

        return backward_slab_blocked_async(
            a_suffix, b, c, scoring, end_v=end_v
        )
    if (len(a_suffix) + 1) * (len(b) + 1) * (len(c) + 1) >= XLA_CELLS:
        from trialign.traceback.xla_engine import backward_slab_xla_async

        return backward_slab_xla_async(a_suffix, b, c, scoring, end_v=end_v)
    slab = backward_slab(a_suffix, b, c, scoring, end_v=end_v)
    return lambda: slab


def _sub_at(scoring: Scoring, t: int, a, b, c, i: int, j: int, k: int) -> int:
    ca, cb, cc = CONSUMES[t]
    if ca and cb and cc:
        return int(scoring.triple_score(a[i - 1], b[j - 1], c[k - 1]))
    if ca and cb:
        return int(scoring.pair_score(a[i - 1], b[j - 1]))
    if cb and cc:
        return int(scoring.pair_score(b[j - 1], c[k - 1]))
    if ca and cc:
        return int(scoring.pair_score(a[i - 1], c[k - 1]))
    return 0


def _walk(
    d: np.ndarray,
    a,
    b,
    c,
    scoring: Scoring,
    mode: str,
    end_state: Optional[int],
) -> Tuple[int, List[Column]]:
    """Argmax walk over a full cuboid; returns (score, columns oldest-first)."""
    w = scoring.weight_matrix().astype(np.int64)
    la, lb, lc = len(a), len(b), len(c)
    i, j, k = la, lb, lc
    if end_state is None:
        t = int(np.argmax(d[:, i, j, k]))
    else:
        t = end_state
    score = int(d[t, i, j, k])
    cols: List[Column] = []

    freeish = mode != "pin"
    while (i, j, k) != (0, 0, 0):
        if freeish and (i == 0 or j == 0 or k == 0):
            break
        di, dj, dk = OFFSETS[t]
        val = int(d[t, i, j, k])
        target = val - _sub_at(scoring, t, a, b, c, i, j, k)
        pi, pj, pk = i - di, j - dj, k - dk
        pred = d[:, pi, pj, pk].astype(np.int64) + w[t]
        hits = np.flatnonzero(pred == target)
        assert hits.size, (i, j, k, t, val, target, d[:, pi, pj, pk], w[t])
        s = int(hits[0])
        cols.append(
            (
                int(a[i - 1]) if di else -1,
                int(b[j - 1]) if dj else -1,
                int(c[k - 1]) if dk else -1,
            )
        )
        i, j, k = pi, pj, pk
        if freeish and (i == 0 or j == 0 or k == 0):
            break
        t = s

    if freeish:
        # Emit the unscored leading context (free borders).
        while i > 0 or j > 0 or k > 0:
            cols.append(
                (
                    int(a[i - 1]) if i > 0 else -1,
                    int(b[j - 1]) if j > 0 else -1,
                    int(c[k - 1]) if k > 0 else -1,
                )
            )
            i, j, k = max(i - 1, 0), max(j - 1, 0), max(k - 1, 0)

    cols.reverse()
    return score, cols


def _solve(
    a,
    b,
    c,
    scoring: Scoring,
    mode: str,
    s0: Optional[int],
    end_state: Optional[int],
) -> Tuple[int, List[Column]]:
    if os.environ.get("TRIALIGN_TB_TRACE") == "1":
        # Per-node wall-clock attribution (set TRIALIGN_TB_TRACE=1):
        # prints mode/shape/route and seconds on exit.  Observability
        # for the recursion the reference lacks entirely (its traceback
        # was stubbed out, /root/reference/src/PE_1cyc.v:12-14,30).
        import time as _t

        t0 = _t.perf_counter()
        route = ["?"]
        try:
            return _solve_traced(a, b, c, scoring, mode, s0, end_state,
                                 route)
        finally:
            print(
                f"[tb-trace] ({len(a)},{len(b)},{len(c)}) mode={mode} "
                f"route={route[0]} {_t.perf_counter() - t0:.2f}s",
                file=sys.stderr, flush=True,
            )
    return _solve_traced(a, b, c, scoring, mode, s0, end_state, None)


def _solve_traced(
    a, b, c, scoring, mode, s0, end_state, route
) -> Tuple[int, List[Column]]:
    la, lb, lc = len(a), len(b), len(c)
    cells = (la + 1) * (lb + 1) * (lc + 1)

    freeish = mode != "pin"
    if la <= 1 or cells <= BASE_CELLS:
        v0 = None
        if mode == "pin":
            v0 = np.full(NUM_MATRICES, NEG, dtype=np.int32)
            v0[s0] = 0
        _, _, cuboid = forward_sweep(
            a, b, c, scoring, mode=mode, v0=v0, return_cuboid=True
        )
        if route is not None:
            route[0] = "walk"
        return _walk(cuboid, a, b, c, scoring, mode, end_state)

    if cells <= DIRECT_CELLS and _direct_fits(la, lb, lc):
        # Device-resident direct engine: choice-capture sweep + on-device
        # walk, two dispatches total (no recursion below this point).  At
        # the top of the cap the packed-choice buffer approaches the
        # chip's HBM (1k^3 ~ 10 GB of 16): _direct_fits models the total
        # footprint and routes oversize problems straight to the split;
        # the catch below is a backstop for model misses.
        from trialign.traceback.direct import direct_traceback

        v0 = None
        if mode == "pin":
            v0 = np.full(NUM_MATRICES, NEG, dtype=np.int32)
            v0[s0] = 0
        try:
            if route is not None:
                route[0] = "direct"
            return direct_traceback(a, b, c, scoring, mode, v0, end_state)
        except Exception as e:  # noqa: BLE001
            if cells <= _DIRECT_SAFE_CELLS or not _is_oom(e):
                raise
            # Buffer did not fit: recurse (each half's buffer is half
            # the size; the classic cap always fits).

    m = la // 2
    v0 = None
    if mode == "pin":
        v0 = np.full(NUM_MATRICES, NEG, dtype=np.int32)
        v0[s0] = 0
    end_v = np.zeros(NUM_MATRICES, dtype=np.int32)
    if end_state is not None:
        end_v[:] = NEG
        end_v[end_state] = 0
    # Dispatch every sweep this node needs before fetching any result.
    if _use_pallas_slab(la, lb, lc, scoring):
        # Blocked Pallas sweeps with the F + G argmax fused on device:
        # only the crossing's coordinates cross the host link (at 2k^3
        # the two slabs are ~118 MB each -- a multi-second tunnel
        # fetch).  Pin-mode nodes (v0 set) ride the same kernels with
        # the origin seeded from v0: round 4's tb-trace showed the old
        # XLA fallback spending ~55 s per 2k-class pin node of a 4k^3
        # traceback.
        from trialign.kernels.slab import split_point_blocked_async
        from trialign.traceback.direct import MEM_BUDGET

        # Reserve this node's device footprint before dispatching: the
        # F/G capture slabs (~1.15x the assembled slab each, padding),
        # the combine's assembled F/G planes, and the free_jk restart
        # sweep's capture buffer.  Without it, the recursion's up-to-2^d
        # concurrent depth-d nodes plus one ~10 GB direct leaf (which
        # MEM_BUDGET already serializes) overcommitted HBM at 8192^3
        # (bench traceback_8k: RESOURCE_EXHAUSTED on an input
        # device_put at depth 3).  Released before recursing, so a
        # child's acquire never waits on its own ancestor.
        slab_b = NUM_MATRICES * (lb + 1) * (lc + 1) * 4
        node_bytes = int((5.5 if freeish else 4.4) * slab_b) + (256 << 20)
        MEM_BUDGET.acquire(node_bytes)
        h_val = None
        try:
            sp_fetch = split_point_blocked_async(
                a, b, c, m, scoring, mode=mode, end_v=end_v, v0=v0
            )
            h_fetch = (
                _fwd_slab_async(a[m:], b, c, scoring, "free_jk", None, None)
                if freeish
                else None
            )
            sstar, jstar, kstar, score = sp_fetch()
            if freeish:
                h_final, _ = h_fetch()
                h_val = (int(h_final[end_state]) if end_state is not None
                         else int(h_final.max()))
        finally:
            MEM_BUDGET.release(node_bytes)
    else:
        f_fetch = _fwd_slab_async(a[:m], b, c, scoring, mode, v0, m)
        g_fetch = _bwd_slab_async(a[m:], b, c, scoring, end_v)
        h_fetch = (
            _fwd_slab_async(a[m:], b, c, scoring, "free_jk", None, None)
            if freeish
            else None
        )
        _, f_slab = f_fetch()
        g_slab = g_fetch()

        total = f_slab.astype(np.int64) + g_slab.astype(np.int64)
        flat = int(np.argmax(total))
        sstar, jstar, kstar = np.unravel_index(flat, total.shape)
        sstar, jstar, kstar = int(sstar), int(jstar), int(kstar)
        score = int(total[sstar, jstar, kstar])

        h_val = None
        if freeish:
            h_final, _ = h_fetch()
            h_val = (int(h_final[end_state]) if end_state is not None
                     else int(h_final.max()))

    # Free j/k borders admit paths that start at i0 > m on a border face
    # and never cross the i = m slab by real DP steps.  Those live
    # entirely in the right half, whose own i=0 face is NOT a border
    # (it is the interior plane i=m of this problem) -- hence free_jk.
    if h_val is not None and h_val > score:
        r_score, r_cols = _solve(a[m:], b, c, scoring, "free_jk", None, end_state)
        prefix = [(int(a[i]), -1, -1) for i in range(m)]
        if route is not None:
            route[0] = "restart-right"
        return r_score, prefix + r_cols

    # The two half problems are independent: solve them CONCURRENTLY so
    # their device dispatches and host<->device round trips overlap (the
    # chip serializes compute, but on the remote-TPU environment a large
    # share of wall time is tunnel latency and host prep; round-2 VERDICT
    # item 5).  Depth is bounded by the recursion (~3 levels at 1k^3), so
    # the thread count stays small; JAX dispatch is thread-safe.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        fut_l = ex.submit(
            _solve, a[:m], b[:jstar], c[:kstar], scoring, mode, s0, sstar
        )
        fut_r = ex.submit(
            _solve, a[m:], b[jstar:], c[kstar:], scoring, "pin", sstar,
            end_state,
        )
        left_score, left_cols = fut_l.result()
        right_score, right_cols = fut_r.result()
    assert left_score + right_score == score, (left_score, right_score, score)
    if route is not None:
        route[0] = "split"
    return score, left_cols + right_cols


def hirschberg_align(
    a, b, c, scoring: Scoring = Scoring()
) -> Tuple[int, List[List[int]]]:
    """Optimal score plus one optimal alignment (3 rows of codes, -1 = gap).

    Semantics match the golden model's traceback: zero-border free start,
    max-over-states end at (|A|, |B|, |C|).
    """
    a = np.asarray(a)
    b = np.asarray(b)
    c = np.asarray(c)
    if min(len(a), len(b), len(c)) == 0:
        # Final cell sits on a zero border: score 0, all-context alignment.
        cols = []
        i, j, k = len(a), len(b), len(c)
        while i or j or k:
            cols.append(
                (
                    int(a[i - 1]) if i else -1,
                    int(b[j - 1]) if j else -1,
                    int(c[k - 1]) if k else -1,
                )
            )
            i, j, k = max(i - 1, 0), max(j - 1, 0), max(k - 1, 0)
        cols.reverse()
        rows = [list(r) for r in zip(*cols)] if cols else [[], [], []]
        return 0, rows

    score, cols = _solve(a, b, c, scoring, "free", None, None)
    rows = [list(r) for r in zip(*cols)]
    return score, rows


# Action codes: the consuming-matrix index of each alignment column, the
# framework's analogue of the reference's traceback action trace
# (dat/Pattern1.dat fed its never-committed software model; that file's
# encoding is undocumented, so we define ours explicitly: the canonical
# matrix index 0..6 of config.MATRIX_NAMES).
def alignment_actions(rows: List[List[int]]) -> List[int]:
    """Map alignment columns to matrix indices (0=M .. 6=Ixz).

    The consume pattern of a column (which sequences place a symbol, which
    gap) identifies the DP matrix that produced it (config.CONSUMES)."""
    consume_to_t = {tuple(cv): t for t, cv in enumerate(CONSUMES)}
    acts = []
    for col in zip(*rows):
        pattern = tuple(int(v != -1) for v in col)
        if pattern == (0, 0, 0):
            raise ValueError("alignment column with all gaps")
        acts.append(consume_to_t[pattern])
    return acts
