"""Blocked wavefront sweep: the memory-efficient slicing method, HBM edition.

The reference bounds sequence length by SRAM, not PE count: the DP cuboid is
cut into |A| x n x n pillars processed block-by-block, exchanging boundary
faces through on-chip SRAMs (reference: pic/Memory.png,
src/TriAlign_1cyc.v:127-140, 288-340).  Here each pillar is a sweep whose
working planes live in VMEM, and the boundary faces live in HBM in *skewed*
layout -- face row s = q - tb (bottom-row face of the block above) /
s = q - tc (right-column face of the block to the left) -- so the faces a
sweep step needs are contiguous slab rows.  Row indices are slab-local:
a row-face slab is only ever read/written by blocks of one block-column kb,
so the global k offset cancels.

Design notes:
* The q-loop runs in macro-steps of `unb` planes (8/16/24, planner-chosen
  per problem).  Per macro-step: one read DMA per face brings unb face rows
  into a double-buffered VMEM ring; the column face is transposed once per
  macro (not per plane); the symbol window is DMA'd from HBM once and each
  unrolled step takes a static row slice (qqb is a multiple of unb so the
  sublane residue is compile-time); face writes stage into scratch and ship
  as one DMA per face per macro.  The first unb face rows are a guard band
  so ramp-up writes (q <= tb) land unconditionally without branches.
* Single-chip alignments run the ENTIRE block grid inside one pallas_call
  (grid=(n_blocks,), sequential on the core): the HBM face slabs are
  touched only by kernel DMAs, never copied between blocks.  The per-call
  variant (make_block_call) remains for the multi-chip halo mode, whose
  travelling column slab must surface to XLA for ppermute.

Block geometry (hb, wc, unb) is chosen per problem by choose_block_shape's
measured cost model; tall pillars keep the wavefront ramp overhead at
(lab + tb + tc) / lab instead of the cube sweep's 3x.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trialign.config import NUM_MATRICES, PAD_SYMBOL, Scoring
from trialign.kernels.plane_math import (
    fused_plane_update_m7,
    hetero_sub_ok,
    submatrix_pair,
    submatrix_tables,
    transition_groups,
)

DEF_HB = 256  # default plane rows (j): halo + Tb cells
DEF_WC = 256  # default plane cols (k): halo + Tc cells
# Default q-loop macro-step (planes per unrolled iteration; multiple of 8).
# Larger macro-steps amortize per-macro overhead (DMA waits, transposes)
# but cost ~2 extra live planes of VMEM per unrolled step, shrinking the
# feasible block-shape set -- so the planner picks 8/16/24 per problem.
DEF_UNB = 8

# Mosaic's default scoped-VMEM ceiling (16 MB) is far below v5e's physical
# VMEM: shapes beyond it compile and run fine with vmem_limit_bytes raised
# (probed: a (264, 640) plane set at ~26 MB works).  But an EXPLICIT limit
# slows XLA's compile 4-6x, so it is requested only when the geometry
# actually needs it (see _vmem_limit_for).
VMEM_DEFAULT_CAP = 16 * 2**20


def _live_planes_for(scoring):
    """Resident (hb, wc) state planes of the score sweep: 16 carried
    (7 p1 + 7 p2 + 2 max7) plus the 2*nsym+1 select-chain substitution
    tables when a runtime submatrix is active."""
    if scoring.submatrix is None:
        return 16
    return 16 + 2 * len(scoring.submatrix) + 1


def _vmem_limit_for(dims, live_planes=16, stack_per_step=None,
                    ring_planes=1):
    """vmem_limit_bytes for a geometry: None when the default 16 MB cap
    suffices (fast compiles), else the estimated requirement plus margin.

    ``live_planes``: resident (hb, wc) state planes -- 16 for the score
    sweep (7 p1 + 7 p2 + 2 max7 carries); the slab-capture kernels
    (kernels/slab.py) carry more.  ``stack_per_step``: Mosaic stack
    temporaries per unrolled macro step -- ~2 for single-body sweeps;
    the slab-capture step (capture selects, per-matrix masks, face
    stores) measures ~3.5 (kernels/slab.py passes it explicitly).
    The round-5 ramp/steady SPLIT score sweep (11-tuple dims) also pays
    a FIXED ~20-25 planes: the two compiled loop bodies duplicate the
    carried planes on Mosaic's stack (AOT OOM solves: +19.7 planes at
    (152,384,16), +24.8 at (176,384,8) over the 2.0/step model) --
    modeled as +28 with margin when ``stack_per_step`` is None.

    Keep requests honest AND under physical VMEM: a limit beyond what the
    chip has makes Mosaic silently SPILL scratch to HBM (S(1) buffers),
    costing ~5x at runtime -- the planner must shrink shapes instead."""
    hb, wc, unb = dims[0], dims[1], dims[10]
    split_fixed = 0
    if stack_per_step is None:
        stack_per_step = 2.0
        if len(dims) <= 11:
            split_fixed = 28
    hbp = _round_up(hb, 128)
    if len(dims) > 13:
        # hetero mode: no carried planes (state scratch replaces them),
        # but the bigger step body costs ~4 Mosaic stack temporaries per
        # unrolled step (measured: 80.5 MB actual at (520,512,NB6)):
        # 4*unb stack + 17 state + B/C rings + 5 input planes + windows.
        nbr = dims[13] + 3
        # Submatrix hetero mode (ring_planes=3) triples the resident ring
        # and widens the step body (3 band-selected planes live at once).
        est = (((3 + ring_planes) * unb + 17 + (1 + ring_planes) * nbr + 5)
               * hb * wc
               + 2 * (hb + len(dims[14]) * unb if len(dims) > 14 else hb + unb) * wc
               + 2 * 8 * unb * (2 * wc + 2 * hbp + hb)) * 4
    else:
        est = int(((live_planes + stack_per_step * unb + split_fixed)
                   * hb * wc
                   + 2 * (hb + unb) * wc
                   + 2 * 8 * unb * (2 * wc + 2 * hbp + hb)) * 4)
    if est <= VMEM_DEFAULT_CAP - 2 * 2**20:
        return None
    return min(est + est // 5 + 4 * 2**20, 108 * 2**20)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def choose_block_shape(la: int, lb: int, lc: int,
                       vmem_budget: int = 13 * 2**20,
                       live_planes: int = 16,
                       stack_per_step: Optional[float] = None
                       ) -> Tuple[int, int, int]:
    """Pick (hb, wc, unb) minimizing total plane-work under the VMEM budget.

    The sweep is ALU-bound, so total vector work is the cost model; padding
    waste from ceil(lb/tb) is what this avoids (e.g. 1024/255 -> 5 block
    rows where 1024/263 -> 4).  The macro-step unb trades per-macro
    overhead (the fixed term) against ~2 live planes of VMEM per unrolled
    step.  ``live_planes``: resident state planes (16 for the score sweep;
    the slab-capture kernels carry more)."""
    best = None
    lab = _round_up(max(la, 16), 16)
    # Measured per-plane cost model on v5e: fixed overhead ~20k cell-
    # equivalents at unb=8 (halved at 16), plus per-cell work whose
    # efficiency depends on the lane width (narrow planes pay relatively
    # more roll/loop overhead).
    EFF = {128: 2.00, 256: 1.08, 384: 1.00, 512: 1.00}
    for unb in (8, 16, 24):
        fixed = 20000 * 8 // unb
        for hb in range(128, 513, 8):
            for wc in (128, 256, 384, 512):
                tb, tc = hb - 1, wc - 1
                hbp = _round_up(hb, 128)
                n_jb = max(1, -(-lb // tb))
                n_kb = max(1, -(-lc // tc))
                qqb = _round_up(lab + tb + tc, unb)
                # Live plane count measured on v5e: 16 carried + Mosaic
                # stack temporaries (~2 per unrolled step, plus a FIXED
                # ~28 planes for the round-5 ramp/steady-SPLIT score
                # sweep's duplicated carries -- see _vmem_limit_for;
                # single-body chain/slab callers pass 2.0 to keep their
                # planner choices unchanged); plus the DMA rings (the
                # symbol skew streams from HBM).
                stack = (stack_per_step * unb if stack_per_step is not None
                         else 2.0 * unb + 28)
                vmem = ((live_planes + stack) * hb * wc
                        + 2 * (hb + unb) * wc
                        + 2 * 8 * unb * (2 * wc + 2 * hbp + hb)) * 4
                if vmem > vmem_budget:
                    continue
                work = n_jb * n_kb * qqb * (hb * wc * EFF[wc] + fixed)
                if best is None or work < best[0]:
                    best = (work, hb, wc, unb)
    if best is None:
        return (DEF_HB, DEF_WC, DEF_UNB)
    return (best[1], best[2], best[3])


def plan_dims(la: int, lb: int, lc: int, hb: int = DEF_HB, wc: int = DEF_WC,
              unb: int = DEF_UNB) -> Tuple:
    """Static geometry for a blocked alignment, as a hashable tuple:
    (hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb).

    sr1/sr2 are FACE-ROW counts (flat slab rows = 8 * sr); rows are
    slab-local (indexed by sweep step q plus the guard band of unb rows).
    ``unb`` is the macro-step (planes per unrolled loop iteration)."""
    tb, tc = hb - 1, wc - 1
    lab = _round_up(max(la, 16), 16)
    n_jb = max(1, -(-lb // tb))
    n_kb = max(1, -(-lc // tc))
    qqb = _round_up(lab + tb + tc, unb)  # planes per block sweep (padded)
    kdim = _round_up(n_kb * tc + wc + 1, 128)  # B/C symbol array extents
    jdim = _round_up(n_jb * tb + hb + 1, 8)
    sr1 = qqb + 2 * unb + 2  # row-face rows: q + guard
    sr2 = qqb + 2 * unb + 2  # col-face rows: q + guard
    return (hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb)


def plan_dims_packed(la: int, lb: int, lc: int, npack: int,
                     hb: int = DEF_HB, wc: int = DEF_WC,
                     unb: int = DEF_UNB) -> Tuple:
    """plan_dims for an A-axis chain of ``npack`` problems of equal shape
    (la, lb, lc), stacked at pitch d = la + 1 along the A axis inside ONE
    sweep.  The chain amortizes the wavefront ramp (tb + tc planes) and all
    per-dispatch overhead over npack alignments -- the software analogue of
    keeping the reference's PE array busy back-to-back instead of its
    one-triplet-at-a-time host FSM (reference: src/TriAlign_tb.sv:313-333).

    Returns the 11-tuple plan_dims geometry extended with (d, npack)."""
    d = la + 1  # slot m's zero i-border sits at i = m*d: 100% i-fill
    tb, tc = hb - 1, wc - 1
    lab = _round_up(max(npack * d, 16), 16)
    n_jb = max(1, -(-lb // tb))
    n_kb = max(1, -(-lc // tc))
    qqb = _round_up(lab + tb + tc, unb)
    kdim = _round_up(n_kb * tc + wc + 1, 128)
    jdim = _round_up(n_jb * tb + hb + 1, 8)
    sr1 = qqb + 2 * unb + 2
    sr2 = qqb + 2 * unb + 2
    return (hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb, d, npack)


def _block_sweep(
    dims,
    scoring,
    scalars,
    askew_ref,
    bp,
    cp,
    zero,
    srf_in,
    cf_in,
    srf_out,
    cf_out,
    out_ref,
    rb_r,
    rb_c,
    st_r,
    st_c,
    st_ct,
    ak_buf,
    rd_sem,
    wr_sem,
    ak_sem,
    hetero=None,
    score_bits=0,
):
    """One block pillar's full q-sweep (shared by the per-call and fused-grid
    kernels).  ``scalars`` = (jb, kb, qstar, jlstar, klstar) traced int32;
    ``bp``/``cp``/``zero`` are (hb, wc) plane VALUES.

    ``hetero`` (heterogeneous A-axis chains: every slot has its own B and C)
    is (bct, qcap, ..., bc_ring, ring_sem): HBM tables of per-slot packed
    B/C planes, the per-cell capture-step table, and the VMEM ring buffers
    the active slots' planes rotate through.  A cell at step q belongs to
    slot m = (q - jk - 1) div CHD, which partitions the plane into <= NB
    contiguous jk-bands; the per-step symbol planes are band-selects over
    the ring.  Capture goes to a carried plane (cap) written to out_ref at
    the end: out is then a (1, hb, wc) cap plane, not the (nout, 1) score
    column."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, UNB = dims[:11]
    # A-axis chain packing (plan_dims_packed): npack problems at i-pitch
    # CHD; 0/1 = off (the single-problem layout, zero extra per-step cost).
    CHD, NPACK = (dims[11], dims[12]) if len(dims) > 11 else (0, 1)
    NB = dims[13] if len(dims) > 13 else 0  # hetero band count
    NBR = NB + 3  # ring slots: NB active + in-flight DMA + retire margin
    # Askew j-bands (2D tile packing): rows [off_b, off_b + BANDS[b]) read
    # their symbols from their own Hankel array, so vertically stacked
    # tiles can carry DIFFERENT A chains.  Default: one band = whole plane.
    BANDS = dims[14] if len(dims) > 14 else (hb,)
    NJB_B = len(BANDS)
    BOFF = tuple(int(np.sum(BANDS[:i])) for i in range(NJB_B))
    # Face traffic exists only where a neighbor block will read it: with a
    # single block row (column), the row (column) faces carry nothing but
    # the zero border, so their DMAs, staging stores, and halo installs
    # are skipped entirely -- a large win for single-block chain shapes.
    NEED_ROW = n_jb > 1
    NEED_COL = n_kb > 1
    SOFF = UNB  # face-row guard band (absorbs ramp-up writes)
    FROWS = 8 * UNB  # flat slab rows per macro batch
    tb, tc = hb - 1, wc - 1
    hbp = _round_up(hb, 128)  # cf slab minor dim (HBM DMA: 128-aligned)
    w = scoring.weight_matrix()
    groups = transition_groups(w)
    match = np.int32(scoring.match)
    mismatch = np.int32(scoring.mismatch)
    sop = scoring.s3_mode == "sop"
    nmac = qqb // UNB
    jb, kb, qstar, jlstar, klstar = scalars

    jl = jax.lax.broadcasted_iota(jnp.int32, (hb, wc), 0)
    kl = jax.lax.broadcasted_iota(jnp.int32, (hb, wc), 1)
    jk = jl + kl
    if hetero is None:
        edge = (jl >= 1) & (kl >= 1)
        if scoring.submatrix is None:
            s_bc = jnp.where(bp == cp, match, mismatch)
        else:
            # Runtime substitution matrix (select-chain tables, built once
            # per block sweep; pads/sentinels fall through to the clamped
            # floor -- plane_math.submatrix_tables).  Works in chain mode
            # too (CHD > 0): the tables depend only on the shared B/C
            # planes.  Costs 2*nsym+1 resident planes; the planner budgets
            # them via live_planes (choose_block_shape).
            sub_sb, sub_sc, s_bc, sub_floor = submatrix_tables(
                bp, cp, scoring.submatrix, jnp.int32, jnp.where
            )
    else:
        # Runtime submatrix in hetero mode: the ring carries THREE packed
        # planes per slot (plane_math.hetero_sub_planes) -- S(B,C) direct
        # plus byte-packed per-A-symbol tables extracted by one per-lane
        # variable shift -- so per-step cost stays ~+8 ops over the
        # equality scheme instead of an nsym^2 select chain.
        subm = scoring.submatrix is not None
        if subm:
            assert hetero_sub_ok(scoring.submatrix), \
                "hetero submatrix needs nsym <= 4 and byte-range entries"
            nsym_h = np.int32(len(scoring.submatrix))
            floor_h = np.int32(
                min(min(min(r) for r in scoring.submatrix), -1)
            )
        # Runtime chain parameters: the slot pitch d_rt and slot count
        # npack_rt are SMEM scalars (one compiled kernel serves a whole
        # geometry class); jkmod = jk mod d_rt arrives as an input plane
        # (vector rem by a runtime scalar is not a Mosaic-friendly op).
        # bct is the BYTE-PACKED per-(block, slot) symbol table
        # (B | C << 8): one ring plane, one DMA and one select chain carry
        # both sequences (NEXT 1a: halves the band-select loads/selects
        # for +2 unpack ops per step).
        (bct, qcap_ref, jkmod_ref, edge_ref, d_rt, npack_rt,
         bc_ring, ring_sem, state) = hetero
        qcap = qcap_ref[0]
        jkmod = jkmod_ref[0]
        # Tile-border mask as runtime CONTENT (int32 0/1): 2D tile
        # layouts (j/k tile borders are zero faces) without recompiling.
        edge = edge_ref[0] != 0
        CHD_E = d_rt
        NPACK_E = npack_rt
    cellmask = (jl == jlstar) & (kl == klstar)
    if hetero is None and CHD > 0:
        # Chain mask precompute: cell (jl, kl) at step q holds global
        # i = q - jl - kl (consistent across blocks: the face skew shifts
        # q by exactly the block offset).  Slot borders are i = m*CHD;
        # i mod CHD = (q mod CHD) - (jk mod CHD) without double wrap since
        # both operands are in [0, CHD).
        jkmod = jax.lax.rem(jk, jnp.int32(CHD))
        CHD_E = jnp.int32(CHD)

    # Round-5 op cut: fold the edge mask INTO the jk plane once per
    # sweep, so the per-step reach-and-edge test is ONE compare
    # (jkv <= q-1) instead of the 2-3 op chain (reach compare, & edge,
    # and in chain mode the tmod subtract becomes a plane-vs-scalar
    # compare against the precomputed jkmod plane).  Cells outside the
    # RESIDUAL edge -- the part the halo installs do not overwrite
    # anyway -- get jk pushed past any q (never reached).  This is the
    # software form of the PE array's free parallel border muxes
    # (reference: src/PE_1cyc.v:164-218 EN_i first-column cases).
    BIGJK = jnp.int32(1 << 30)
    if hetero is not None:
        jkv = jnp.where(edge, jk, BIGJK)
    else:
        resid = None
        if not NEED_ROW:
            resid = jl >= 1
        if not NEED_COL:
            resid = (kl >= 1) if resid is None else (resid & (kl >= 1))
        jkv = jk if resid is None else jnp.where(resid, jk, BIGJK)

    def rd_row_dma(it, slot):
        # face rows q + SOFF for q in [UNB*it+1, UNB*(it+1)] -> FROWS flat rows.
        fr = 8 * (UNB * it + 1 + SOFF)
        return pltpu.make_async_copy(
            srf_in.at[kb, pl.ds(fr, FROWS)], rb_r.at[slot], rd_sem.at[0, slot]
        )

    def rd_col_dma(it, slot):
        fr = 8 * (UNB * it + 1 + SOFF)
        return pltpu.make_async_copy(
            cf_in.at[jb, pl.ds(fr, FROWS)], rb_c.at[slot], rd_sem.at[1, slot]
        )

    def wr_row_dma(it, slot):
        # face rows q - tb + SOFF; macros whose rows all precede the face
        # clamp into the guard band (rows < SOFF are never read).
        fr = 8 * jnp.maximum(UNB * it + 1 - tb + SOFF, 0)
        return pltpu.make_async_copy(
            st_r.at[slot], srf_out.at[kb, pl.ds(fr, FROWS)], wr_sem.at[0, slot]
        )

    def wr_col_dma(it, slot):
        fr = 8 * jnp.maximum(UNB * it + 1 - tc + SOFF, 0)
        return pltpu.make_async_copy(
            st_ct.at[slot], cf_out.at[jb, pl.ds(fr, FROWS)], wr_sem.at[1, slot]
        )

    def ak_dma(it, slot):
        # Symbol window for macro it: rows [qqb - UNB*(it+1), +hb+UNB).
        # The askew array lives in HBM so |A| is bounded by HBM, not VMEM.
        base = pl.multiple_of(qqb - UNB * it - UNB, 8)
        if hetero is None or NJB_B == 1:
            src = askew_ref if hetero is None else askew_ref.at[0]
            sem = ak_sem.at[slot] if hetero is None else ak_sem.at[slot, 0]
            return [
                pltpu.make_async_copy(
                    src.at[pl.ds(base, hb + UNB)], ak_buf.at[slot], sem
                )
            ]
        # One DMA per j-band into its own row range of the window buffer:
        # band b's rows live at window rows [BOFF[b], BOFF[b]+bh+UNB)...
        # overlapping guard rows are per-band, so the buffer holds bands
        # stacked at BOFF[b] + b*UNB.
        return [
            pltpu.make_async_copy(
                askew_ref.at[b, pl.ds(base + BOFF[b], BANDS[b] + UNB)],
                ak_buf.at[slot, pl.ds(BOFF[b] + b * UNB, BANDS[b] + UNB)],
                ak_sem.at[slot, b],
            )
            for b in range(NJB_B)
        ]

    if hetero is not None:
        def ring_dma(s):
            """Load slot s's packed B|C plane into ring position s mod NBR.

            The table is per (block, slot): blk = jb * n_kb + kb (jb/kb
            are the block-index scalars in hetero mode)."""
            pos = jax.lax.rem(s, jnp.int32(NBR))
            return (
                pltpu.make_async_copy(
                    bct.at[jb * n_kb + kb, s], bc_ring.at[pos],
                    ring_sem.at[0, pos]
                ),
            )

    # Warm up the read pipeline.
    if NEED_ROW:
        rd_row_dma(0, 0).start()
    if NEED_COL:
        rd_col_dma(0, 0).start()
    for d_ in ak_dma(0, 0):
        d_.start()
    if hetero is not None:
        # Start slots 0 and 1 (slot s loads one pitch ahead of first use);
        # wait slot 0 here -- slot 1's wait happens at the q = d swap,
        # matching every later slot's start-at-(s-1)*d / wait-at-s*d
        # schedule (each DMA must be waited exactly once).
        for d_ in ring_dma(jnp.int32(0)):
            d_.start()

        @pl.when(npack_rt >= 2)
        def _():
            for d_ in ring_dma(jnp.int32(1)):
                d_.start()

        for d_ in ring_dma(jnp.int32(0)):
            d_.wait()

    def roll1(x, axis):
        return pltpu.roll(x, 1, axis)

    if hetero is not None:
        # Runtime sweep bound: the chain needs npack*d + tb + tc planes
        # (last capture one step after the last final cell); macros beyond
        # that are dead work.  The fori bound itself stays STATIC -- a
        # traced bound turns the loop into a while and blows Mosaic's
        # compile time ~5x (measured 402s vs 92s at (328,512)) -- so the
        # macro body instead SKIPS itself past nmac_rt via lax.cond.
        # The prefetch guard below MUST use the same bound or the final
        # macro would start DMAs nobody waits for.
        nmac_rt = jnp.minimum(
            jax.lax.div(npack_rt * d_rt + tb + tc + UNB - 1, jnp.int32(UNB)),
            nmac,
        )
    else:
        nmac_rt = nmac

    def macro(it, carry, steady=False):
        if hetero is not None:
            p1, p2, m7p2, m7p3, cap = carry
        else:
            p1, p2, m7p2, m7p3 = carry
        slot = jax.lax.rem(it, 2)

        if hetero is not None:
            # At most one chain-slot swap per macro (d > UNB, planner-
            # enforced): at q = t*d, finish slot t's DMA (started one
            # pitch earlier) and start slot t+1's.  Bands never select a
            # slot before q = s*d + 3, so the wait at q = t*d is early
            # enough.
            qlo = UNB * it + 1
            t_ = jax.lax.div(qlo + CHD_E - 1, CHD_E)
            t_q = t_ * CHD_E

            @pl.when((t_ >= 1) & (t_q >= qlo) & (t_q <= UNB * it + UNB))
            def _():
                @pl.when(t_ <= NPACK_E - 1)
                def _():
                    for d_ in ring_dma(t_):
                        d_.wait()

                @pl.when(t_ + 1 <= NPACK_E - 1)
                def _():
                    for d_ in ring_dma(t_ + 1):
                        d_.start()

        # Finish the writes that used this slot two macros ago before
        # restaging into it.
        if NEED_ROW or NEED_COL:
            @pl.when(it >= 2)
            def _():
                if NEED_ROW:
                    wr_row_dma(it - 2, slot).wait()
                if NEED_COL:
                    wr_col_dma(it - 2, slot).wait()

        if NEED_ROW:
            rd_row_dma(it, slot).wait()
        if NEED_COL:
            rd_col_dma(it, slot).wait()
        for d_ in ak_dma(it, slot):
            d_.wait()

        @pl.when(it + 1 < nmac_rt)
        def _():
            nslot = jax.lax.rem(it + 1, 2)
            if NEED_ROW:
                rd_row_dma(it + 1, nslot).start()
            if NEED_COL:
                rd_col_dma(it + 1, nslot).start()
            for d_ in ak_dma(it + 1, nslot):
                d_.start()

        rowbuf = rb_r[slot] if NEED_ROW else None  # (frows, wc): rows 8u+t
        # Column face arrives matrix-major (frows, hb); one transpose per
        # macro gives (hb, frows) with per-step static lane slices.
        colbuf = jnp.swapaxes(rb_c[slot], 0, 1) if NEED_COL else None

        # Shared aligned symbol window for the UNB steps (DMA'd from HBM).
        win = ak_buf[slot]

        for u in range(UNB):
            q = UNB * it + u + 1
            if NJB_B == 1:
                ap = win[UNB - 1 - u : UNB - 1 - u + hb, :]
            else:
                ap = jnp.concatenate(
                    [
                        win[
                            BOFF[b] + b * UNB + UNB - 1 - u :
                            BOFF[b] + b * UNB + UNB - 1 - u + BANDS[b],
                            :,
                        ]
                        for b in range(NJB_B)
                    ],
                    axis=0,
                )
            if hetero is not None:
                # Band-select the symbol planes: cell slot
                # m = (q - jk - 1) div CHD spans bands m0..m0+NB-1; band
                # b's cells satisfy jk < q - (m0+b)*CHD.  One packed
                # select chain carries B and C together; unpack once.
                m0 = jax.lax.div(
                    jnp.maximum(q - (hb + wc - 2) - 1, 0), CHD_E
                )
                bcsel = bc_ring[jax.lax.rem(m0, jnp.int32(NBR))]
                for b_ in range(1, NB):
                    mb = m0 + b_
                    in_band = jk < q - mb * CHD_E
                    pos = jax.lax.rem(mb, jnp.int32(NBR))
                    if subm:
                        in_band = in_band[None]
                    bcsel = jnp.where(in_band, bc_ring[pos], bcsel)
                if subm:
                    # bcsel is the slot's (3, hb, wc) packed score entry:
                    # [0] = S(B,C) read directly; [1]/[2] = biased per-A-
                    # symbol bytes, one variable shift + mask + unbias.
                    s_bc_q = bcsel[0]
                    apv = ap < nsym_h
                    sh = (ap & 3) << 3
                    s_ab = jnp.where(
                        apv,
                        (jax.lax.shift_right_logical(bcsel[1], sh) & 0xFF)
                        - 128,
                        floor_h,
                    )
                    s_ac = jnp.where(
                        apv,
                        (jax.lax.shift_right_logical(bcsel[2], sh) & 0xFF)
                        - 128,
                        floor_h,
                    )
                else:
                    bq = jax.lax.bitwise_and(bcsel, jnp.int32(0xFF))
                    cq = jax.lax.shift_right_logical(bcsel, 8)
                    s_bc_q = jnp.where(bq == cq, match, mismatch)
            else:
                bq, cq, s_bc_q = bp, cp, s_bc
            if hetero is not None and subm:
                pass  # the three pair scores came off the packed ring
            elif hetero is None and scoring.submatrix is not None:
                s_ab = submatrix_pair(ap, sub_sb, sub_floor, jnp.where)
                s_ac = submatrix_pair(ap, sub_sc, sub_floor, jnp.where)
            else:
                s_ab = jnp.where(ap == bq, match, mismatch)
                s_ac = jnp.where(ap == cq, match, mismatch)
            if sop:
                s3 = s_ab + s_ac + s_bc_q
            else:
                s3 = jnp.where(
                    ap == bq,
                    jnp.where(
                        bq == cq,
                        np.int32(3 * scoring.match),
                        np.int32((scoring.match + scoring.mismatch) * 2),
                    ),
                    np.int32(3 * scoring.mismatch),
                )
            subs = (s3, 0, 0, 0, s_ab, s_bc_q, s_ac)

            cands, m7p1 = fused_plane_update_m7(
                p1, p2, m7p3, subs, groups, jnp.maximum, roll1
            )
            if score_bits:
                # RTL bit-parity mode: every stored value wraps to a
                # signed score_bits-wide register (the hardware's
                # unsaturated SCORE_BITS=12, reference:
                # src/TriAlign_1cyc.v:6; PARITY.md quirk 3).  Wrap BEFORE
                # the border mask, matching the golden emulation and the
                # wavefront kernel; staged faces and the carried max7
                # then derive from wrapped stored planes, exactly the
                # RTL's MAX7 over its wrapped registers.
                half = jnp.int32(1 << (score_bits - 1))
                lowmask = jnp.int32((1 << score_bits) - 1)
                cands = tuple(((c + half) & lowmask) - half for c in cands)
            # Not-yet-reached cells (i < 1) must stay 0 -- they are
            # the zero borders future planes read.  In chain mode, slot
            # borders i = m*CHD are additional zero faces.  In the
            # STEADY phase (every q of this macro has q-1 >= tb+tc) all
            # cells are reached, so the reach compare drops -- and in
            # non-chain mode the whole mask does (the border selects
            # below cover the edge cells the installs don't).
            if hetero is not None or CHD > 0:
                # Chain slot borders recur through the whole sweep, so
                # there is no steady phase here -- just the cheaper
                # folded form (3 plane-ops, was 5).
                qm = jax.lax.rem(q, CHD_E)
                valid = (jkv <= q - 1) & (jkmod != qm)
            else:
                valid = None if steady else (jkv <= q - 1)
            new = []
            for t in range(NUM_MATRICES):
                cand = cands[t]
                if valid is not None:
                    cand = jnp.where(valid, cand, zero)
                elif not (NEED_ROW or NEED_COL):
                    # steady single-block: the static zero border
                    cand = jnp.where(edge, cand, zero)
                elif not NEED_ROW:
                    # jl==0 is the global zero border (no row face);
                    # zero it BEFORE the column install so the staged
                    # corner [0,0] carries ccol[0], exactly as the
                    # masked path did.
                    cand = jnp.where(jl == 0, zero, cand)
                elif not NEED_COL:
                    cand = jnp.where(kl == 0, zero, cand)
                # Halo install: column 0 from the col face, then row 0
                # from the row face (row wins at [0,0], where the staged
                # face carries the diagonal-corner value).  Single-block
                # dimensions keep the masked zero border instead.
                if NEED_COL:
                    ccol = jnp.broadcast_to(
                        colbuf[0:hb, 8 * u + t : 8 * u + t + 1], (hb, wc)
                    )
                    cand = jnp.where(kl == 0, ccol, cand)
                if NEED_ROW:
                    crow = jnp.broadcast_to(
                        rowbuf[8 * u + t : 8 * u + t + 1, :], (hb, wc)
                    )
                    cand = jnp.where(jl == 0, crow, cand)
                new.append(cand)

                # Stage faces: bottom row (jl=tb) incl. the kl=0 corner;
                # right column (kl=tc) incl. the jl=0 halo.
                if NEED_ROW:
                    st_r[slot, 8 * u + t, :] = cand[tb, :]
                if NEED_COL:
                    st_c[slot, :, 8 * u + t] = cand[:, tc]

            if hetero is not None:
                # Per-cell capture: qcap[cell] holds the plane index of the
                # cell's slot-final value; m7p1 at step q is max7(plane
                # q-1).  The packer guarantees distinct final cells per
                # block, so one capture plane suffices.
                cap = jnp.where(qcap == q - 1, m7p1, cap)
            elif CHD > 0:
                # Chain capture: slot m's final cell lives in plane
                # qstar + m*CHD; one step later m7p1 (the carried 7-way
                # max of the just-finished plane) holds its score at
                # (jlstar, klstar).  qstar is -1 in non-target blocks.
                rel = q - 1 - qstar
                hit = (
                    (qstar >= 0)
                    & (rel >= 0)
                    & (rel < NPACK * CHD)
                    & (jax.lax.rem(rel, jnp.int32(CHD)) == 0)
                )

                @pl.when(hit)
                def _():
                    m = jax.lax.div(rel, jnp.int32(CHD))
                    out_ref[m, 0] = jnp.sum(jnp.where(cellmask, m7p1, 0))

            else:
                # Final-cell capture for the block containing (lb, lc).
                @pl.when(q == qstar)
                def _():
                    for t in range(NUM_MATRICES):
                        out_ref[t, 0] = jnp.sum(jnp.where(cellmask, new[t], 0))

            # m7p1 (= max7 of the already-final plane q-1, from the raw
            # group maxes) becomes max7(q-2) for the next step's carry.
            p1, p2, m7p2, m7p3 = tuple(new), p1, m7p1, m7p2

        if NEED_COL:
            st_ct[slot, :, 0:hb] = jnp.swapaxes(st_c[slot], 0, 1)
            wr_col_dma(it, slot).start()
        if NEED_ROW:
            wr_row_dma(it, slot).start()
        if hetero is not None:
            return (p1, p2, m7p2, m7p3, cap)
        return (p1, p2, m7p2, m7p3)

    zeros7 = (zero,) * NUM_MATRICES
    if hetero is not None:
        # Sweep state lives in scratch so the whole macro body can be a
        # runtime-skipped pl.when block (see nmac_rt note above).
        for idx in range(17):
            state[idx] = zero

        def hmacro(it, _):
            @pl.when(it < nmac_rt)
            def _():
                p1 = tuple(state[i] for i in range(7))
                p2 = tuple(state[7 + i] for i in range(7))
                np1, np2, nm7p2, nm7p3, ncap = macro(
                    it, (p1, p2, state[14], state[15], state[16])
                )
                for i in range(7):
                    state[i] = np1[i]
                    state[7 + i] = np2[i]
                state[14] = nm7p2
                state[15] = nm7p3
                state[16] = ncap

            return 0

        jax.lax.fori_loop(0, nmac, hmacro, 0)
        out_ref[0] = state[16]
    elif CHD > 0:
        # Chain mode: slot borders recur through the whole sweep, so the
        # steady body would equal the ramp body -- one loop, no split.
        jax.lax.fori_loop(0, nmac, macro, (zeros7, zeros7, zero, zero))
    else:
        # Ramp/steady split: macros at it >= m_ramp have q-1 >= tb+tc on
        # every unrolled step, so their bodies compile WITHOUT the reach
        # mask and the 7 masked border selects (the halo installs / the
        # static zero borders cover the edge cells).  The split point is
        # static; all DMA scheduling uses absolute `it`, so two
        # consecutive fori ranges behave exactly like one.
        m_ramp = min(nmac, -(-(tb + tc) // UNB))
        carry = jax.lax.fori_loop(0, m_ramp, macro,
                                  (zeros7, zeros7, zero, zero))
        if m_ramp < nmac:
            jax.lax.fori_loop(m_ramp, nmac,
                              lambda it, c: macro(it, c, steady=True),
                              carry)

    # Drain outstanding writes so the HBM faces are complete before the
    # next block (same kernel next grid step, or next pallas_call) reads.
    for back in (2, 1):
        it_last = nmac - back
        if it_last >= 0:
            slot = it_last % 2
            if NEED_ROW:
                wr_row_dma(it_last, slot).wait()
            if NEED_COL:
                wr_col_dma(it_last, slot).wait()


def _scratch_shapes(hb, wc, unb):
    from jax.experimental.pallas import tpu as pltpu

    hbp = _round_up(hb, 128)
    frows = 8 * unb
    return [
        pltpu.VMEM((2, frows, wc), jnp.int32),  # rb_r
        pltpu.VMEM((2, frows, hbp), jnp.int32),  # rb_c
        pltpu.VMEM((2, frows, wc), jnp.int32),  # st_r
        pltpu.VMEM((2, hb, frows), jnp.int32),  # st_c
        pltpu.VMEM((2, frows, hbp), jnp.int32),  # st_ct
        pltpu.VMEM((2, hb + unb, wc), jnp.int32),  # ak_buf
        pltpu.SemaphoreType.DMA((2, 2)),  # rd_sem
        pltpu.SemaphoreType.DMA((2, 2)),  # wr_sem
        pltpu.SemaphoreType.DMA((2,)),  # ak_sem
    ]


def _make_block_kernel(dims: Tuple, scoring: Scoring, score_bits: int = 0):
    """Per-call kernel: one block per pallas_call (multi-chip halo mode)."""

    def kernel(scal_ref, askew_ref, bp_ref, cp_ref, zeros_ref, srf_in, cf_in,
               srf_out, cf_out, out_ref, *scratch):
        scalars = tuple(scal_ref[i] for i in (3, 4, 5, 6, 7))
        _block_sweep(
            dims, scoring, scalars, askew_ref, bp_ref[:], cp_ref[:],
            zeros_ref[:], srf_in, cf_in, srf_out, cf_out, out_ref, *scratch,
            score_bits=score_bits,
        )

    return kernel


def make_block_call(dims: Tuple, n_srf_slabs: int, n_cf_slabs: int, scoring: Scoring, interpret: bool, score_bits: int = 0):
    """Build the per-block pallas_call with the given face-slab counts.

    Used by the multi-chip halo mode (local row slabs, one travelling
    column slab that surfaces to XLA for ppermute) and checkpoint/resume."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    nout = max(8, dims[12]) if len(dims) > 11 else 8
    kernel = _make_block_kernel(dims, scoring, score_bits)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # askew (DMA'd per macro)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # zeros
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf (aliased)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # out
        ),
        scratch_shapes=_scratch_shapes(hb, wc, unb),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_srf_slabs, 8 * sr1, wc), jnp.int32),
            jax.ShapeDtypeStruct((n_cf_slabs, 8 * sr2, _round_up(hb, 128)), jnp.int32),
            jax.ShapeDtypeStruct((nout, 1), jnp.int32),
        ),
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Raised only for geometries beyond the default 16 MB scoped
            # cap: big single-k-block shapes (better j/k fill) need it,
            # while an explicit limit slows compiles for everyone else.
            vmem_limit_bytes=_vmem_limit_for(dims, _live_planes_for(scoring)),
        ),
    )


def _make_grid_kernel(dims: Tuple, scoring: Scoring, score_bits: int = 0):
    """Fused kernel: the whole block grid as grid=(n_blocks,); face slabs
    stay in HBM across blocks (no inter-call copies, no dispatch)."""

    def kernel(scal_ref, askew_ref, bp_ref, cp_ref, zeros_ref, srf_in, cf_in,
               srf_out, cf_out, out_ref, *scratch):
        # scal_ref: (1, 1, 8) SMEM row for this block (via index_map).
        scalars = tuple(scal_ref[0, 0, i] for i in (3, 4, 5, 6, 7))
        _block_sweep(
            dims, scoring, scalars, askew_ref, bp_ref[0], cp_ref[0],
            zeros_ref[:], srf_in, cf_in, srf_out, cf_out, out_ref, *scratch,
            score_bits=score_bits,
        )

    return kernel


def make_grid_call(dims: Tuple, scoring: Scoring, interpret: bool,
                   score_bits: int = 0):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    nout = max(8, dims[12]) if len(dims) > 11 else 8
    kernel = _make_grid_kernel(dims, scoring, score_bits)
    n_blocks = n_jb * n_kb

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # askew (DMA'd per macro)
            pl.BlockSpec((1, hb, wc), lambda i: (i // n_kb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, wc), lambda i: (i % n_kb, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf (aliased)
            pl.BlockSpec((nout, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_kb, 8 * sr1, wc), jnp.int32),
            jax.ShapeDtypeStruct((n_jb, 8 * sr2, _round_up(hb, 128)), jnp.int32),
            jax.ShapeDtypeStruct((nout, 1), jnp.int32),
        ),
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        scratch_shapes=_scratch_shapes(hb, wc, unb),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            # Raised only for geometries beyond the default 16 MB scoped
            # cap: big single-k-block shapes (better j/k fill) need it,
            # while an explicit limit slows compiles for everyone else.
            vmem_limit_bytes=_vmem_limit_for(dims, _live_planes_for(scoring)),
        ),
    )


def _hetero_scratch_shapes(hb, wc, unb, nbr, njb_bands=1, ring_planes=1):
    from jax.experimental.pallas import tpu as pltpu

    base = _scratch_shapes(hb, wc, unb)
    # Multi-band symbol windows: one row range + DMA semaphore per band.
    base[5] = pltpu.VMEM((2, hb + njb_bands * unb, wc), jnp.int32)
    base[8] = pltpu.SemaphoreType.DMA((2, njb_bands))
    # Submatrix mode: 3 packed score planes per slot (hetero_sub_planes)
    # instead of the 1 packed symbol plane.
    ring_shape = ((nbr, hb, wc) if ring_planes == 1
                  else (nbr, ring_planes, hb, wc))
    return base + [
        pltpu.VMEM(ring_shape, jnp.int32),  # bc_ring (packed B | C<<8)
        pltpu.SemaphoreType.DMA((1, nbr)),  # ring_sem
        # Sweep state (7 p1 + 7 p2 + m7p2 + m7p3 + cap): scratch, not loop
        # carries, so the macro body can runtime-skip itself wholesale via
        # pl.when -- value carries would force lax.cond (3x compile) or a
        # dynamic loop bound (5x compile).
        pltpu.VMEM((17, hb, wc), jnp.int32),  # state
    ]


def make_hetero_grid_call(dims: Tuple, scoring: Scoring, interpret: bool):
    """Fused grid pallas_call for heterogeneous chains (per-slot B/C planes
    band-selected from HBM tables; per-cell capture plane per block)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    nbr = dims[13] + 3
    njb_bands = len(dims[14]) if len(dims) > 14 else 1
    ring_planes = 3 if scoring.submatrix is not None else 1
    n_blocks = n_jb * n_kb

    def kernel(scal_ref, askew_ref, qcap_ref, jkmod_ref, edge_ref,
               zeros_ref, srf_in, cf_in, bct, srf_out, cf_out,
               out_ref, *scratch):
        scalars = tuple(scal_ref[0, 0, i] for i in (3, 4, 5, 6, 7))
        d_rt = scal_ref[0, 0, 0]
        npack_rt = scal_ref[0, 0, 5]
        base, ring = scratch[:9], scratch[9:]
        hetero = (bct, qcap_ref, jkmod_ref, edge_ref, d_rt, npack_rt,
                  ring[0], ring[1], ring[2])
        _block_sweep(
            dims, scoring, scalars, askew_ref, zeros_ref[:], zeros_ref[:],
            zeros_ref[:], srf_in, cf_in, srf_out, cf_out, out_ref,
            *base, hetero=hetero,
        )

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, 8), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # askew
            pl.BlockSpec((1, hb, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),  # qcap
            pl.BlockSpec((1, hb, wc), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),  # jkmod
            pl.BlockSpec((1, hb, wc), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),  # edge
            pl.BlockSpec((hb, wc), lambda i: (0, 0), memory_space=pltpu.VMEM),  # zeros
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf
            pl.BlockSpec(memory_space=pltpu.HBM),  # bct (packed B|C<<8)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf (aliased)
            pl.BlockSpec((1, hb, wc), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_kb, 8 * sr1, wc), jnp.int32),
            jax.ShapeDtypeStruct((n_jb, 8 * sr2, _round_up(hb, 128)), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, hb, wc), jnp.int32),
        ),
        input_output_aliases={6: 0, 7: 1},
        interpret=interpret,
        scratch_shapes=_hetero_scratch_shapes(hb, wc, unb, nbr, njb_bands,
                                              ring_planes),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit_for(
                dims, _live_planes_for(scoring), ring_planes=ring_planes
            ),
        ),
    )


def make_hetero_block_call(dims: Tuple, scoring: Scoring, interpret: bool):
    """Per-call hetero kernel (one block per pallas_call) for the interpret
    scan fallback, which cannot thread grid-step io-aliasing."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    nbr = dims[13] + 3
    njb_bands = len(dims[14]) if len(dims) > 14 else 1
    ring_planes = 3 if scoring.submatrix is not None else 1

    def kernel(scal_ref, askew_ref, qcap_ref, jkmod_ref, edge_ref,
               zeros_ref, srf_in, cf_in, bct, srf_out, cf_out,
               out_ref, *scratch):
        scalars = tuple(scal_ref[i] for i in (3, 4, 5, 6, 7))
        d_rt = scal_ref[0]
        npack_rt = scal_ref[5]
        base, ring = scratch[:9], scratch[9:]
        hetero = (bct, qcap_ref, jkmod_ref, edge_ref, d_rt, npack_rt,
                  ring[0], ring[1], ring[2])
        _block_sweep(
            dims, scoring, scalars, askew_ref, zeros_ref[:], zeros_ref[:],
            zeros_ref[:], srf_in, cf_in, srf_out, cf_out, out_ref,
            *base, hetero=hetero,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # askew
            pl.BlockSpec(memory_space=pltpu.VMEM),  # qcap (1, hb, wc)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # jkmod (1, hb, wc)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # edge (1, hb, wc)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # zeros
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf
            pl.BlockSpec(memory_space=pltpu.HBM),  # bct (packed B|C<<8)
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf (aliased)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cap (1, hb, wc)
        ),
        scratch_shapes=_hetero_scratch_shapes(hb, wc, unb, nbr, njb_bands,
                                              ring_planes),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_kb, 8 * sr1, wc), jnp.int32),
            jax.ShapeDtypeStruct((n_jb, 8 * sr2, _round_up(hb, 128)), jnp.int32),
            jax.ShapeDtypeStruct((1, hb, wc), jnp.int32),
        ),
        input_output_aliases={6: 0, 7: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_vmem_limit_for(
                dims, _live_planes_for(scoring), ring_planes=ring_planes
            ),
        ),
    )


def _build_askew_blocked(a_ext, qqb, hb, wc, unb=DEF_UNB):
    """ASKREV[r, k] = A[(qqb - r) - k] over a (qqb+hb+unb, wc) grid."""
    from trialign.kernels.wavefront import build_askew

    return build_askew(a_ext, qqb, qqb + hb + unb, wc)


@functools.partial(
    jax.jit, static_argnames=("dims", "scoring", "interpret", "score_bits")
)
def _blocked_core_scan(lens, a_ext, b_arr, c_arr, dims, scoring, interpret,
                       score_bits=0):
    """Per-call fallback: one pallas_call per block, scanned.  Used in
    interpret mode, where the fused grid's input/output aliasing is not
    threaded across grid steps (each step would see the original input
    snapshot instead of earlier blocks' face writes)."""
    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    tb, tc = hb - 1, wc - 1
    la, lb, lc = lens[0], lens[1], lens[2]
    askew = _build_askew_blocked(a_ext, qqb, hb, wc, unb)
    zeros = jnp.zeros((hb, wc), jnp.int32)
    block_call = make_block_call(dims, n_kb, n_jb, scoring, interpret,
                                 score_bits)

    jbstar = (lb - 1) // tb
    kbstar = (lc - 1) // tc
    jlstar = lb - jbstar * tb
    klstar = lc - kbstar * tc
    target_idx = jbstar * n_kb + kbstar

    srf0 = jnp.zeros((n_kb, 8 * sr1, wc), jnp.int32)
    cf0 = jnp.zeros((n_jb, 8 * sr2, _round_up(hb, 128)), jnp.int32)
    nout = max(8, dims[12]) if len(dims) > 11 else 8
    res0 = jnp.zeros((nout, 1), jnp.int32)

    def scan_body(carry, idx):
        srf, cf, res = carry
        jb = idx // n_kb
        kb = idx % n_kb
        is_t = idx == target_idx
        scal = jnp.stack(
            [
                la,
                jb * tb,
                kb * tc,
                jb,
                kb,
                jnp.where(is_t, la + jlstar + klstar, jnp.int32(-1)),
                jnp.where(is_t, jlstar, -1),
                jnp.where(is_t, klstar, -1),
            ]
        ).astype(jnp.int32)
        bp = jnp.broadcast_to(
            jax.lax.dynamic_slice(b_arr, (jb * tb,), (hb,))[:, None], (hb, wc)
        )
        cp = jnp.broadcast_to(
            jax.lax.dynamic_slice(c_arr, (kb * tc,), (wc,))[None, :], (hb, wc)
        )
        srf, cf, out = block_call(scal, askew, bp, cp, zeros, srf, cf)
        res = jnp.where(is_t, out, res)
        return (srf, cf, res), None

    (_, _, res), _ = jax.lax.scan(
        scan_body, (srf0, cf0, res0), jnp.arange(n_jb * n_kb, dtype=jnp.int32)
    )
    return res


def _blocked_core_impl(lens, a_ext, b_arr, c_arr, dims, scoring, interpret,
                       score_bits=0):
    if interpret:
        return _blocked_core_scan(lens, a_ext, b_arr, c_arr, dims, scoring,
                                  interpret, score_bits)
    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    tb, tc = hb - 1, wc - 1
    la, lb, lc = lens[0], lens[1], lens[2]
    n_blocks = n_jb * n_kb
    askew = _build_askew_blocked(a_ext, qqb, hb, wc, unb)
    zeros = jnp.zeros((hb, wc), jnp.int32)

    # Target block containing the global final cell (lb, lc).
    jbstar = (lb - 1) // tb
    kbstar = (lc - 1) // tc
    jlstar = lb - jbstar * tb
    klstar = lc - kbstar * tc
    target_idx = jbstar * n_kb + kbstar

    # Per-block scalar table: (n_blocks, 8) rows of
    # (la, j0, k0, jb, kb, qstar, jlstar, klstar).
    idx = jnp.arange(n_blocks, dtype=jnp.int32)
    jbs = idx // n_kb
    kbs = idx % n_kb
    is_t = idx == target_idx
    scal_tab = jnp.stack(
        [
            jnp.full((n_blocks,), la, jnp.int32),
            jbs * tb,
            kbs * tc,
            jbs,
            kbs,
            jnp.where(is_t, la + jlstar + klstar, -1),
            jnp.where(is_t, jlstar, -1),
            jnp.where(is_t, klstar, -1),
        ],
        axis=1,
    ).astype(jnp.int32)[:, None, :]

    # Per-block-row B planes and per-block-column C planes, pipelined into
    # the kernel by index_map.
    j0s = jnp.arange(n_jb, dtype=jnp.int32) * tb
    k0s = jnp.arange(n_kb, dtype=jnp.int32) * tc
    bwin = b_arr[j0s[:, None] + jnp.arange(hb, dtype=jnp.int32)[None, :]]
    cwin = c_arr[k0s[:, None] + jnp.arange(wc, dtype=jnp.int32)[None, :]]
    bptab = jnp.broadcast_to(bwin[:, :, None], (n_jb, hb, wc))
    cptab = jnp.broadcast_to(cwin[:, None, :], (n_kb, hb, wc))

    srf0 = jnp.zeros((n_kb, 8 * sr1, wc), jnp.int32)
    cf0 = jnp.zeros((n_jb, 8 * sr2, _round_up(hb, 128)), jnp.int32)

    grid_call = make_grid_call(dims, scoring, interpret, score_bits)
    _, _, res = grid_call(scal_tab, askew, bptab, cptab, zeros, srf0, cf0)
    return res


_blocked_core = jax.jit(
    _blocked_core_impl,
    static_argnames=("dims", "scoring", "interpret", "score_bits"),
)


def prep_blocked(a, b, c, dims):
    """Host arrays for one blocked problem under ``dims`` (which may be
    planned at padded length caps; runtime ``lens`` stay exact)."""
    la, lb, lc = len(a), len(b), len(c)
    _, _, lab, _, _, _, kdim, jdim, _, _, _ = dims[:11]
    a_ext = np.full(lab + 2, PAD_SYMBOL, dtype=np.int32)
    a_ext[1 : la + 1] = a
    b_arr = np.full(jdim + dims[0] + 8, PAD_SYMBOL - 1, dtype=np.int32)
    b_arr[1 : lb + 1] = b
    c_arr = np.full(kdim + dims[1] + 8, PAD_SYMBOL - 2, dtype=np.int32)
    c_arr[1 : lc + 1] = c
    lens = np.array([la, lb, lc], dtype=np.int32)
    return lens, a_ext, b_arr, c_arr


def align_blocked(
    a,
    b,
    c,
    scoring: Scoring = Scoring(),
    interpret: Optional[bool] = None,
    block_shape: Optional[Tuple[int, int]] = None,
    score_bits: int = 0,
) -> int:
    """Optimal 3-sequence alignment score via the blocked (sliced) sweep.

    Handles |B|, |C| beyond the single-block kernel's 255 limit; |A| is
    bounded by the skewed symbol buffer (~8k with int32 planes).
    ``score_bits`` nonzero selects RTL bit-parity mode (stored scores wrap
    as signed score_bits-wide registers, src/TriAlign_1cyc.v:6) -- the
    regime where wraparound actually occurs (scores past 2^11 need
    sequences longer than the single-block kernel's 255 cap)."""
    return int(
        jax.device_get(align_blocked_async(a, b, c, scoring, interpret,
                                           block_shape,
                                           score_bits=score_bits))
    )


def align_blocked_async(
    a,
    b,
    c,
    scoring: Scoring = Scoring(),
    interpret: Optional[bool] = None,
    block_shape: Optional[Tuple[int, int]] = None,
    plan_lens: Optional[Tuple[int, int, int]] = None,
    score_bits: int = 0,
):
    """Like :func:`align_blocked` but returns the score as a 0-d DEVICE
    array without syncing: callers batching many residual problems queue
    every dispatch and drain with one ``device_get`` wave at the end
    (each synchronous call pays a full tunnel round-trip, tens of ms on
    the remote axon link).

    ``plan_lens`` = (la_cap, lb_cap, lc_cap) >= the actual lengths plans
    the STATIC geometry at the caps while the runtime length scalars stay
    exact, so a heterogeneous batch shares ONE compiled kernel (a mixed
    1024-triplet batch otherwise needs ~22 distinct compiles for its
    blocked residue); the padded sweep planes are masked dead cells.

    Runtime ``scoring.submatrix`` is supported (select-chain tables,
    plane_math.submatrix_tables); the planner budgets the 2*nsym+1 extra
    resident planes so the working set stays under the VMEM spill cliff."""
    a, b, c = np.asarray(a), np.asarray(b), np.asarray(c)
    la, lb, lc = len(a), len(b), len(c)
    if min(la, lb, lc) == 0:
        return jnp.int32(0)
    pla, plb, plc = plan_lens if plan_lens else (la, lb, lc)
    assert pla >= la and plb >= lb and plc >= lc, (plan_lens, (la, lb, lc))
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    live = _live_planes_for(scoring)
    if block_shape:
        hb, wc = block_shape[0], block_shape[1]
        unb = block_shape[2] if len(block_shape) > 2 else DEF_UNB
    else:
        hb, wc, unb = choose_block_shape(pla, plb, plc, live_planes=live)
    dims = plan_dims(pla, plb, plc, hb, wc, unb)
    lens, a_ext, b_arr, c_arr = prep_blocked(a, b, c, dims)

    res = _blocked_core(
        jnp.asarray(lens),
        jnp.asarray(a_ext),
        jnp.asarray(b_arr),
        jnp.asarray(c_arr),
        dims,
        scoring,
        interpret,
        score_bits,
    )
    return res[:NUM_MATRICES, 0].max()


def prep_chain(a_list, b, c, dims):
    """Host arrays for an A-axis chain: the concatenated A' vector (slot m's
    symbols at global i = m*d+1 .. m*d+la, slot borders at i = m*d) plus the
    shared B/C arrays."""
    hb, wc = dims[0], dims[1]
    lab, kdim, jdim = dims[2], dims[6], dims[7]
    d, npack = dims[11], dims[12]
    la = d - 1
    a_ext = np.full(lab + 2, PAD_SYMBOL, dtype=np.int32)
    for m, a in enumerate(a_list):
        a_ext[m * d + 1 : m * d + 1 + la] = a
    b_arr = np.full(jdim + hb + 8, PAD_SYMBOL - 1, dtype=np.int32)
    b_arr[1 : len(b) + 1] = b
    c_arr = np.full(kdim + wc + 8, PAD_SYMBOL - 2, dtype=np.int32)
    c_arr[1 : len(c) + 1] = c
    lens = np.array([la, len(b), len(c)], dtype=np.int32)
    return lens, a_ext, b_arr, c_arr


def align_blocked_chain(
    a_list,
    b,
    c,
    scoring: Scoring = Scoring(),
    interpret: Optional[bool] = None,
    block_shape: Optional[Tuple[int, int]] = None,
    score_bits: int = 0,
):
    """Score a chain of equal-length A sequences against shared B, C in ONE
    fused sweep: the problems stack along the A axis at pitch |A|+1, so the
    wavefront ramp (tb + tc planes) and every per-dispatch cost amortize
    over the whole chain.  Returns one exact score per A.

    This is the back-to-back throughput mode the reference could not do:
    its host FSM re-started the array per triplet
    (reference: src/TriAlign_tb.sv:313-333).

    ``score_bits`` nonzero selects RTL bit-parity mode on the chain path
    too (round-4 VERDICT weak 5): stored values wrap as signed
    score_bits-wide registers; the chain capture reads the carried max7
    of the wrapped stored planes, exactly the RTL's MAX7 over its wrapped
    registers (src/TriAlign_1cyc.v:6,139-145)."""
    a_list = [np.asarray(a) for a in a_list]
    b = np.asarray(b)
    c = np.asarray(c)
    if not a_list:
        return []
    la = len(a_list[0])
    if any(len(a) != la for a in a_list):
        raise ValueError("align_blocked_chain requires equal-length A's")
    lb, lc = len(b), len(c)
    if min(la, lb, lc) == 0:
        return [0] * len(a_list)
    npack = len(a_list)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_shape:
        hb, wc = block_shape[0], block_shape[1]
        unb = block_shape[2] if len(block_shape) > 2 else DEF_UNB
    else:
        # Chain kernels have a single (unsplit) loop body: stack ~2.
        hb, wc, unb = choose_block_shape(npack * (la + 1), lb, lc,
                                         stack_per_step=2.0)
    dims = plan_dims_packed(la, lb, lc, npack, hb, wc, unb)
    lens, a_ext, b_arr, c_arr = prep_chain(a_list, b, c, dims)
    res = _blocked_core(
        jnp.asarray(lens),
        jnp.asarray(a_ext),
        jnp.asarray(b_arr),
        jnp.asarray(c_arr),
        dims,
        scoring,
        interpret,
        score_bits,
    )
    return [int(s) for s in jax.device_get(res)[:npack, 0]]
