"""Pallas TPU wavefront kernel: full DP cuboid with planes resident in VMEM.

This is the TPU-native re-design of the reference's PE array + control FSM
(reference: src/TriAlign_1cyc.v:116-125, 276-347): instead of an 8x8 grid of
PEs sweeping one anti-diagonal plane per clock, a single kernel sweeps planes
q = i+j+k of the cuboid with the whole (|B|+1, |C|+1) plane as a VPU-resident
vector, carrying the three predecessor planes as loop values (the software
analogue of the PE's diagonal delay registers, src/PE_1cyc.v:80-109).

Capacity: |B|, |C| <= 255 (plane <= 256x256 int32 x 7 matrices x 4 planes
fits VMEM); |A| is bounded only by the skewed symbol buffer (~thousands).
Longer sequences go to the blocked kernel (trialign.kernels.blocked), the
analogue of the reference's memory-efficient slicing method.

The per-plane update is shared math (trialign.kernels.plane_math); symbols
arrive via a host-precomputed skewed array ASKEW[q, k] = A[q-k], the
equivalent of the testbench's per-cycle symbol service mux
(reference: src/TriAlign_tb.sv:150-169).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trialign.config import NUM_MATRICES, PAD_SYMBOL, Scoring
from trialign.kernels.plane_math import (
    fused_plane_update_m7,
    submatrix_pair,
    submatrix_tables,
    transition_groups,
)

# Largest runtime substitution matrix the Pallas kernels accept: the
# select-chain tables cost 2*nsym+1 resident planes of VMEM (wavefront:
# 4.25 MB at nsym=8 on a 256x256 plane) and 2*nsym extra vector ops per
# step; bigger alphabets route to the XLA backend (api._pick_backend).
SUBMATRIX_NSYM_CAP = 8

# Sublane / lane granularity for int32 planes.
SUBLANE = 8
LANE = 128

# q-loop unroll factor.  Amortizes per-iteration loop overhead, shares one
# aligned symbol-window load across the unrolled steps, and turns the
# window's sublane residue into a compile-time slice offset (qq is always a
# multiple of UNROLL).  Must divide every bucket's qq: lab, hb, wc are all
# multiples of 8.
UNROLL = 8


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def bucket_dims(la: int, lb: int, lc: int) -> Tuple[int, int, int]:
    """Pad dims to compile-friendly buckets: HB (j) to multiples of 16
    (the int16 sublane tile), WC (k) to multiples of 128, A-length to
    multiples of 64."""
    hb = _round_up(max(lb + 1, 16), 16)
    # Coarser HB buckets to limit recompiles.
    for cand in (16, 32, 64, 96, 128, 192, 256):
        if hb <= cand:
            hb = cand
            break
    wc = _round_up(max(lc + 1, LANE), LANE)
    lab = _round_up(max(la, 64), 64)
    if hb > 256 or wc > 256 or lab > 4096:
        raise ValueError(
            f"wavefront kernel supports |B|,|C| <= 255 and |A| <= 4096 "
            f"(VMEM-resident symbol skew); got {la}/{lb}/{lc}. "
            "Use the blocked backend."
        )
    return lab, hb, wc


def score_dtype(scoring: Scoring, qmax: int):
    """Narrowest plane dtype that provably cannot overflow.

    Valid-cell magnitudes are bounded by qmax * (max substitution bonus +
    max gap charge); masked/garbage cells never exceed the running max (a
    max-plus combine with non-positive weights is non-expansive).

    int16 is measured NOT to help on v5e: packed int16 compares don't
    compile, bf16 chains run slower than int32, and int16-storage with
    int32-compute loses to pure int32 (see experiments/README.md) -- so
    this returns int32 until a hardware/toolchain where narrow wins.
    """
    if scoring.submatrix is not None:
        pairmax = max(max(abs(v) for v in row) for row in scoring.submatrix)
        pairmax = max(pairmax, 1)
    else:
        pairmax = max(abs(scoring.match), abs(scoring.mismatch))
    step = 3 * pairmax + 2 * (
        abs(scoring.gap_open) + abs(scoring.gap_extend)
    )
    if not ENABLE_INT16:
        return np.int32
    return np.int16 if (qmax + 2) * step < 30000 else np.int32


# v5e Mosaic rejects packed-int16 vector compares ("Target does not support
# this comparison"); keep the narrow path off until a supported formulation
# lands (see kernels/int16 notes).
ENABLE_INT16 = False


def _make_kernel(lab: int, hb: int, wc: int, scoring: Scoring,
                 score_bits: int = 0):
    w = scoring.weight_matrix()
    groups = transition_groups(w)
    sop = scoring.s3_mode == "sop"
    qq = lab + hb + wc  # max sweep length for this bucket
    dtype = score_dtype(scoring, qq)
    match = dtype(scoring.match)
    mismatch = dtype(scoring.mismatch)

    def kernel(lens_ref, askew_ref, bp_ref, cp_ref, zeros_ref, out_ref):
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        la = lens_ref[0]
        lb = lens_ref[1]
        lc = lens_ref[2]
        qmax = la + lb + lc

        # All plane-wide values (index grids, symbol planes, masks) use the
        # score dtype so every i1 mask is born in that dtype's native tile
        # layout -- Mosaic cannot relayout an (8,128) mask from an int32
        # compare onto (16,128)-tiled int16 selects.
        jdt = jnp.dtype(dtype)
        # (hardware iota is 32-bit only; narrow afterwards)
        j_grid = jax.lax.broadcasted_iota(jnp.int32, (hb, wc), 0).astype(jdt)
        k_grid = jax.lax.broadcasted_iota(jnp.int32, (hb, wc), 1).astype(jdt)
        jk = j_grid + k_grid
        edge = (j_grid >= 1) & (k_grid >= 1)

        bp = bp_ref[:]  # (hb, wc): B symbol broadcast along k
        cp = cp_ref[:]  # (hb, wc): C symbol broadcast along j
        if scoring.submatrix is None:
            s_bc = jnp.where(bp == cp, match, mismatch)
        else:
            # Runtime substitution matrix on the production kernel: static
            # per-symbol select-plane tables built once per call (pads and
            # border sentinels fall through to the clamped floor), then an
            # nsym-select chain per step (plane_math.submatrix_tables).
            sub_sb, sub_sc, s_bc, sub_floor = submatrix_tables(
                bp, cp, scoring.submatrix, dtype, jnp.where
            )

        # Everything below is strictly 2-D (hb, wc) vector math: Mosaic's
        # vector layout pass is happiest with rank-2 natively-tiled ops, so
        # the 7 matrices travel as a tuple of planes, not a stacked rank-3
        # array.  The carry holds planes q-1, q-2, q-3 for all 7 matrices.
        #
        # The zero init MUST come from a memory load: a jnp.zeros splat gets
        # a replicated vector layout, and Mosaic (this libtpu) cannot
        # relayout concrete loop-body yields back to a replicated carry
        # ("Invalid relayout ... replicated in destination").
        zero = zeros_ref[:]

        def roll1(x, axis):
            # Mosaic's rotate is 32-bit only on this libtpu; bounce the 8
            # per-step rolls through int32 (wrapped-in values land in the
            # masked row 0 / col 0, so exactness is unaffected).
            if x.dtype == jnp.int16:
                return pltpu.roll(x.astype(jnp.int32), 1, axis).astype(jnp.int16)
            return pltpu.roll(x, 1, axis)

        # Final-cell mask: the 7 matrix values at (la, lb, lc) live in plane
        # qmax at position (lb, lc); captured in-body when the sweep passes
        # qmax (mask-and-reduce avoids dynamic sublane/lane slicing).
        cellmask = (j_grid == lb.astype(jdt)) & (k_grid == lc.astype(jdt))

        def step(q, win, u, p1, p2, m7p2, m7p3):
            """One plane update.  q = UNROLL*it + u + 1; win is the shared
            (hb+8, wc) window of the skewed symbol array for this iteration,
            and the step's symbol plane is the static row slice at offset
            UNROLL-1-u (qq is a multiple of UNROLL, so the residue of
            qq - q modulo the sublane tile is a compile-time constant)."""
            ap = win[UNROLL - 1 - u : UNROLL - 1 - u + hb, :]
            if scoring.submatrix is not None:
                s_ab = submatrix_pair(ap, sub_sb, sub_floor, jnp.where)
                s_ac = submatrix_pair(ap, sub_sc, sub_floor, jnp.where)
            else:
                s_ab = jnp.where(ap == bp, match, mismatch)
                s_ac = jnp.where(ap == cp, match, mismatch)
            if sop:
                s3 = s_ab + s_ac + s_bc
            else:
                s3 = jnp.where(
                    ap == bp,
                    jnp.where(bp == cp, dtype(3 * scoring.match),
                              dtype((scoring.match + scoring.mismatch) * 2)),
                    dtype(3 * scoring.mismatch),
                )
            subs = (s3, 0, 0, 0, s_ab, s_bc, s_ac)

            # Masking: i >= 1 keeps not-yet-reached cells at zero (they are
            # the i=0 border face future planes read); j,k >= 1 are the
            # other two zero faces (reference: src/TriAlign_1cyc.v:157-181).
            # No i <= la term: cells past the A end are never predecessors
            # of valid cells (predecessor i is i or i-1) and the max-plus
            # combine with non-positive weights keeps them bounded.
            valid = (jk <= (q - 1).astype(jdt)) & edge
            cands, m7p1 = fused_plane_update_m7(
                p1, p2, m7p3, subs, groups, jnp.maximum, roll1
            )
            if score_bits:
                # RTL bit-parity mode: every stored value wraps to a
                # signed score_bits-wide register (the hardware's
                # unsaturated SCORE_BITS=12 registers, reference:
                # src/TriAlign_1cyc.v:6; PARITY.md quirk 3).  Wrap BEFORE
                # the border mask, matching the golden emulation; the
                # carried max7 then derives from wrapped stored planes,
                # exactly the RTL's combinational MAX7 over its wrapped
                # registers.  Power-of-two mod via bitwise AND (two's
                # complement makes it exact for negatives).
                half = dtype(1 << (score_bits - 1))
                lowmask = dtype((1 << score_bits) - 1)
                cands = tuple(((c + half) & lowmask) - half for c in cands)
            new = tuple(jnp.where(valid, cand, zero) for cand in cands)

            # Capture the answer as the sweep passes plane qmax.  (The loop
            # runs to the static bucket bound qq; planes past qmax never
            # feed valid cells, so overrunning is harmless.)
            @pl.when(q == qmax)
            def _():
                for t in range(NUM_MATRICES):
                    out_ref[t, 0] = jnp.sum(
                        jnp.where(cellmask, new[t], zero).astype(jnp.int32)
                    )

            return new, m7p1

        def body(it, carry):
            p1, p2, m7p2, m7p3 = carry
            # All UNROLL steps of this iteration read the same 8-aligned
            # symbol window: base = qq - UNROLL*it - UNROLL.
            base = pl.multiple_of(qq - UNROLL * it - UNROLL, UNROLL)
            win = askew_ref[pl.ds(base, hb + 8), :]
            for u in range(UNROLL):
                q = UNROLL * it + u + 1
                new, m7p1 = step(q, win, u, p1, p2, m7p2, m7p3)
                p1, p2, m7p2, m7p3 = new, p1, m7p1, m7p2
            return (p1, p2, m7p2, m7p3)

        zeros7 = (zero,) * NUM_MATRICES
        jax.lax.fori_loop(
            0, qq // UNROLL, body, (zeros7, zeros7, zero, zero)
        )

    return kernel, qq, dtype


def shear_rows(w, rows, pad_value):
    """T[k, r] = w[k, k + r] over a (ncols, M) row-major array.

    The pad-flatten-reshape shear: element (k, r) of the reshape is
    flat[k*(M+1) + r] = w[k, k + r] whenever k + r < M, which callers
    guarantee by sizing M >= ncols + rows - 1 (they use M = rows + ncols).
    The trailing ncols pad elements only make the reshape size-legal;
    no consumed index ever reaches them.
    """
    ncols, M = w.shape
    flat = jnp.concatenate(
        [w.reshape(-1), jnp.full((ncols,), pad_value, w.dtype)]
    )
    return flat.reshape(ncols, M + 1)[:, :rows]


def build_askew(a_ext, qq, rows, cols, pad_value: int = PAD_SYMBOL):
    """Gather-free skewed symbol array: ASKREV[r, k] = A[qq - r - k].

    A Hankel matrix of the reversed symbol vector -- an XLA gather here
    costs ~2 ms per alignment on TPU, so it is built by shearing a
    (cols, rows + cols) staging array (shear_rows) and transposing.
    Shearing on the cols side keeps the materialized intermediate at
    cols x (rows + cols): at chain/mosaic geometry rows reaches ~17k,
    where the previous rows-side shear staged a ~1.3 GB intermediate per
    call; this stays ~35 MB.
    """
    L = qq + 1
    pad = jnp.full((max(0, L - a_ext.shape[0]),), pad_value, a_ext.dtype)
    ae = jnp.concatenate([a_ext, pad])[:L]
    v = jnp.flip(ae, 0)  # v[m] = A[qq - m]
    M = rows + cols
    vp = jnp.concatenate(
        [v, jnp.full((max(0, M - L),), pad_value, v.dtype)]
    )[:M]
    # T[k, r] = vp[k + r] -> transpose is H[r, k] = vp[r + k].
    return shear_rows(jnp.broadcast_to(vp, (cols, M)), rows, pad_value).T


def _build_planes(a_ext, b_full, c_full, lab, hb, wc):
    """Device-side construction of the kernel's fat inputs from compact
    sequences (host->device traffic is just the three sequences; the skewed
    symbol array is redundant data best built on-chip).

    a_ext: (lab+2,) int32, a_ext[i] = A_i for 1<=i<=la, PAD elsewhere.
    b_full: (hb,) int32 with sentinel at 0; c_full: (wc,) int32 likewise.
    """
    qq = lab + hb + wc
    askew = build_askew(a_ext, qq, qq + hb + 8, wc)
    bp = jnp.broadcast_to(b_full[:, None], (hb, wc))
    cp = jnp.broadcast_to(c_full[None, :], (hb, wc))
    return askew, bp, cp


@functools.partial(
    jax.jit,
    static_argnames=("lab", "hb", "wc", "scoring", "interpret", "score_bits"),
)
def _run_compact(lens, a_ext, b_full, c_full, lab, hb, wc, scoring, interpret,
                 score_bits=0):
    """Compact-input entry: device-side prep fused with the kernel call."""
    askew, bp, cp = _build_planes(a_ext, b_full, c_full, lab, hb, wc)
    return _run(lens, askew, bp, cp, lab, hb, wc, scoring, interpret,
                score_bits)


@functools.partial(
    jax.jit,
    static_argnames=("lab", "hb", "wc", "scoring", "interpret", "score_bits"),
)
def _run(lens, askew, bp, cp, lab, hb, wc, scoring, interpret, score_bits=0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel, qq, dtype = _make_kernel(lab, hb, wc, scoring, score_bits)
    # Symbol planes travel in the score dtype so every in-kernel compare
    # produces masks in that dtype's native tile layout.
    askew = askew.astype(dtype)
    bp = bp.astype(dtype)
    cp = cp.astype(dtype)
    flops_per_cell = 120
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((SUBLANE, 1), jnp.int32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # askew
                pl.BlockSpec(memory_space=pltpu.VMEM),  # bp
                pl.BlockSpec(memory_space=pltpu.VMEM),  # cp
                pl.BlockSpec(memory_space=pltpu.VMEM),  # zeros (layout anchor)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_cell * lab * hb * wc,
            bytes_accessed=(qq * wc + hb + wc) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(lens, askew, bp, cp, jnp.zeros((hb, wc), dtype))


def prepare_compact(a, b, c, lab, hb, wc):
    """Host-side compact arrays: three small int32 vectors + lengths."""
    la, lb, lc = len(a), len(b), len(c)
    a_ext = np.full(lab + 2, PAD_SYMBOL, dtype=np.int32)
    a_ext[1 : la + 1] = np.asarray(a, dtype=np.int32)
    b_full = np.full(hb, PAD_SYMBOL - 1, dtype=np.int32)
    b_full[1 : lb + 1] = np.asarray(b, dtype=np.int32)
    c_full = np.full(wc, PAD_SYMBOL - 2, dtype=np.int32)
    c_full[1 : lc + 1] = np.asarray(c, dtype=np.int32)
    lens = np.array([la, lb, lc], dtype=np.int32)
    return lens, a_ext, b_full, c_full


def align_wavefront(
    a, b, c, scoring: Scoring = Scoring(), interpret: bool | None = None,
    score_bits: int = 0,
) -> int:
    """Optimal 3-sequence alignment score via the single-block Pallas kernel.

    ``score_bits`` nonzero selects RTL bit-parity mode: stored values wrap
    as signed score_bits-wide registers (src/TriAlign_1cyc.v:6).

    Runtime ``scoring.submatrix`` is supported up to SUBMATRIX_NSYM_CAP
    symbols (select-chain tables; see plane_math.submatrix_tables)."""
    if scoring.submatrix is not None and \
            len(scoring.submatrix) > SUBMATRIX_NSYM_CAP:
        raise ValueError(
            f"submatrix alphabets beyond {SUBMATRIX_NSYM_CAP} symbols: "
            "use the 'golden'/'xla' backends"
        )
    a = np.asarray(a)
    b = np.asarray(b)
    c = np.asarray(c)
    la, lb, lc = len(a), len(b), len(c)
    if min(la, lb, lc) == 0:
        return 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lab, hb, wc = bucket_dims(la, lb, lc)
    lens, a_ext, b_full, c_full = prepare_compact(a, b, c, lab, hb, wc)
    out = _run_compact(
        jnp.asarray(lens),
        jnp.asarray(a_ext),
        jnp.asarray(b_full),
        jnp.asarray(c_full),
        lab,
        hb,
        wc,
        scoring,
        interpret,
        score_bits,
    )
    return int(jax.device_get(out)[:NUM_MATRICES, 0].max())
