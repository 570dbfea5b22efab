"""Blocked Pallas slab sweeps for alignment recovery at scale.

Above the direct engine's cell cap (traceback/hirschberg.py DIRECT_CELLS,
~1k^3) the Hirschberg top split needs three full-cuboid sweeps: a forward
sweep capturing the 7-state i = m plane, a backward sweep producing the
matching suffix slab, and a free_jk guard sweep for paths that never cross
the split plane.  The compiled XLA twins (traceback/xla_engine.py) run
those at well under 1 GCUPS -- every scan step round-trips ~30 full
(|B|, |C|) planes through HBM.  These kernels run the identical math inside
the blocked Pallas pipeline of kernels/blocked.py (working planes in VMEM,
boundary faces in skewed HBM slabs, double-buffered DMA macro-steps),
capturing the i = |A| plane into a per-block HBM buffer as the sweep
passes it.  This restores traceback at 2k^3+ -- the capability the
reference hardware stubbed out entirely (its traceback `act` outputs and
action memory are commented out, reference: src/PE_1cyc.v:12-14,30).

Semantics are elementwise twins of trialign/traceback/engine.py on every
captured cell:

* variant "fwd", mode "free": the hardware's zero borders (the production
  blocked sweep), plus capture of the plane i = |A| -- the F slab of a
  split at m = |A| of the prefix problem.
* variant "fwd", mode "free_jk": j=0 / k=0 faces free (zero), i=0 face
  walled (NEG) -- the guard sweep of the right half (only the (7,) final
  vector is consumed).
* variant "bwd": the backward sweep over reversed inputs -- each *source*
  state u carries its own plane shift and substitution and the weight
  matrix transposes (see engine.backward_slab).  Capture at reversed
  i = |A| is the G slab.

Cells at i > |A| are not masked here (the engine walls them): no such cell
ever feeds a cell at i <= |A| (i never decreases along predecessors), and
capture reads exactly i = |A|, so every captured value still matches the
engine bit for bit.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trialign.config import CONSUMES, NUM_MATRICES, Scoring
from trialign.kernels.blocked import (
    DEF_UNB,
    _build_askew_blocked,
    _round_up,
    _scratch_shapes,
    _vmem_limit_for,
    choose_block_shape,
    plan_dims,
    prep_blocked,
)
from trialign.kernels.plane_math import (
    fused_plane_update_m7,
    submatrix_pair,
    submatrix_tables,
    target_update,
    transition_groups,
)
from trialign.traceback.engine import NEG

# Resident (hb, wc) state planes, for the VMEM planner: the forward sweep
# carries 16 (7 p1 + 7 p2 + 2 max7) like kernels/blocked.py; the backward
# needs only 12 (7 p1 + the 4 rows of p2 read at delta 2 or aged into p3 +
# p3's M row); both add 7 capture-scratch planes.
FWD_LIVE_PLANES = 16 + NUM_MATRICES
BWD_LIVE_PLANES = 12 + NUM_MATRICES


def _slab_sweep(
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
    cap_out,
    rb_r,
    rb_c,
    st_r,
    st_c,
    st_ct,
    ak_buf,
    rd_sem,
    wr_sem,
    ak_sem,
    cap_scr,
    cap_sem,
    *,
    variant,
    mode,
    blk,
):
    """One block pillar's q-sweep with i = |A| plane capture.

    Mirrors kernels/blocked.py:_block_sweep's DMA pipeline (double-buffered
    face reads/writes in skewed HBM slabs, per-macro symbol windows) for a
    simpler step set: no chains, no hetero rings -- instead a per-variant
    step body and 7 capture planes in scratch, DMA'd to ``cap_out[blk]``
    when the block finishes.

    ``scalars`` = (la, jb, kb, qstar, jlstar, klstar, ev[0..6], srfs, cfs)
    traced int32: la doubles as the capture plane index; ev is the backward
    sweep's terminal state vector (engine.backward_slab end_v).  srfs/cfs
    are the SLAB indices of this block's row/column face (globally kb/jb;
    the halo-sharded mode passes device-local indices -- its srf slabs
    cover only the stripe's block columns and its column face is a single
    travelling slab, exactly like kernels/blocked.py's make_block_call
    under dist/halo.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, UNB = dims[:11]
    NEED_ROW = n_jb > 1
    NEED_COL = n_kb > 1
    SOFF = UNB
    FROWS = 8 * UNB
    tb, tc = hb - 1, wc - 1
    hbp = _round_up(hb, 128)
    w = scoring.weight_matrix()
    fwd = variant == "fwd"
    free = fwd and mode == "free"
    pin = fwd and mode == "pin"
    groups = (
        transition_groups(w)
        if fwd
        else transition_groups(np.ascontiguousarray(w.T))
    )
    match = np.int32(scoring.match)
    mismatch = np.int32(scoring.mismatch)
    sop = scoring.s3_mode == "sop"
    nmac = qqb // UNB
    la_s, jb, kb, qstar, jlstar, klstar = scalars[:6]
    ev = scalars[6:13]
    srfs, cfs = scalars[13], scalars[14]
    NEGi = jnp.int32(NEG)

    jl = jax.lax.broadcasted_iota(jnp.int32, (hb, wc), 0)
    kl = jax.lax.broadcasted_iota(jnp.int32, (hb, wc), 1)
    jk = jl + kl
    edge = (jl >= 1) & (kl >= 1)
    if scoring.submatrix is None:
        s_bc = jnp.where(bp == cp, match, mismatch)
    else:
        # Runtime submatrix: same select-chain tables as the score sweep
        # (plane_math.submatrix_tables; engine._subs uses pair_score, so
        # elementwise parity carries over to both variants -- the backward
        # step consumes the SAME s_ab/s_bc/s_ac planes, only keyed by
        # source state).
        sub_sb, sub_sc, s_bc, sub_floor = submatrix_tables(
            bp, cp, scoring.submatrix, jnp.int32, jnp.where
        )
    cellmask = (jl == jlstar) & (kl == klstar)
    negp = zero + NEGi

    def rd_row_dma(it, slot):
        fr = 8 * (UNB * it + 1 + SOFF)
        return pltpu.make_async_copy(
            srf_in.at[srfs, pl.ds(fr, FROWS)], rb_r.at[slot],
            rd_sem.at[0, slot]
        )

    def rd_col_dma(it, slot):
        fr = 8 * (UNB * it + 1 + SOFF)
        return pltpu.make_async_copy(
            cf_in.at[cfs, pl.ds(fr, FROWS)], rb_c.at[slot],
            rd_sem.at[1, slot]
        )

    def wr_row_dma(it, slot):
        fr = 8 * jnp.maximum(UNB * it + 1 - tb + SOFF, 0)
        return pltpu.make_async_copy(
            st_r.at[slot], srf_out.at[srfs, pl.ds(fr, FROWS)],
            wr_sem.at[0, slot]
        )

    def wr_col_dma(it, slot):
        fr = 8 * jnp.maximum(UNB * it + 1 - tc + SOFF, 0)
        return pltpu.make_async_copy(
            st_ct.at[slot], cf_out.at[cfs, pl.ds(fr, FROWS)],
            wr_sem.at[1, slot]
        )

    def ak_dma(it, slot):
        base = pl.multiple_of(qqb - UNB * it - UNB, 8)
        return pltpu.make_async_copy(
            askew_ref.at[pl.ds(base, hb + UNB)], ak_buf.at[slot],
            ak_sem.at[slot],
        )

    if NEED_ROW:
        rd_row_dma(0, 0).start()
    if NEED_COL:
        rd_col_dma(0, 0).start()
    ak_dma(0, 0).start()

    def roll1(x, axis):
        return pltpu.roll(x, 1, axis)

    def sh_neg(x, dj, dk):
        """Shift by (dj, dk) bringing NEG in at the rolled-over lines --
        the backward step's per-source shift (engine._shift_fill)."""
        y = x
        if dj:
            y = roll1(y, 0)
        if dk:
            y = roll1(y, 1)
        if dj and dk:
            m = (jl == 0) | (kl == 0)
        elif dj:
            m = jl == 0
        elif dk:
            m = kl == 0
        else:
            return y
        return jnp.where(m, NEGi, y)

    def macro(it, carry):
        slot = jax.lax.rem(it, 2)

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
        ak_dma(it, slot).wait()

        @pl.when(it + 1 < nmac)
        def _():
            nslot = jax.lax.rem(it + 1, 2)
            if NEED_ROW:
                rd_row_dma(it + 1, nslot).start()
            if NEED_COL:
                rd_col_dma(it + 1, nslot).start()
            ak_dma(it + 1, nslot).start()

        rowbuf = rb_r[slot] if NEED_ROW else None
        colbuf = jnp.swapaxes(rb_c[slot], 0, 1) if NEED_COL else None
        win = ak_buf[slot]

        for u in range(UNB):
            q = UNB * it + u + 1
            ap = win[UNB - 1 - u : UNB - 1 - u + hb, :]
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
                    jnp.where(
                        bp == cp,
                        np.int32(3 * scoring.match),
                        np.int32((scoring.match + scoring.mismatch) * 2),
                    ),
                    np.int32(3 * scoring.mismatch),
                )

            if fwd:
                p1, p2, m7p2, m7p3 = carry
                subs = (s3, 0, 0, 0, s_ab, s_bc, s_ac)
                cands, m7p1 = fused_plane_update_m7(
                    p1, p2, m7p3, subs, groups, jnp.maximum, roll1
                )
                valid = (jk <= q - 1) & edge
                if pin:
                    # Engine pin parity (engine.forward_sweep else
                    # branch): face cells ARE computed -- matrix t is a
                    # wall only where it would consume a symbol that
                    # does not exist (i < ca, global j < cb, k < cc).
                    # Rolled-in wrap garbage at jl==0 / kl==0 lands only
                    # in matrices these masks NEG out (dj=1 targets need
                    # gj >= 1, dk=1 targets gk >= 1).
                    ii = q - jk
                    gj = jb * tb + jl
                    gk = kb * tc + kl
                    valid_t = [
                        (ii >= ca) & (gj >= cb) & (gk >= cc)
                        for (ca, cb, cc) in CONSUMES
                    ]
            else:
                p1, p2m, p2xy, p2yz, p2xz, p3m = carry
                # E_u = shift_u(plane q - delta_u, row u) + subs_u; the
                # source state u keys both (engine.backward_slab).
                e = [
                    sh_neg(p3m, 1, 1) + s3,  # M (delta 3)
                    p1[1],  # Ix (delta 1, no shift, no subs)
                    sh_neg(p1[2], 1, 0),  # Iy
                    sh_neg(p1[3], 0, 1),  # Iz
                    sh_neg(p2xy, 1, 0) + s_ab,  # Ixy (delta 2)
                    sh_neg(p2yz, 1, 1) + s_bc,  # Iyz
                    sh_neg(p2xz, 0, 1) + s_ac,  # Ixz
                ]
                # new_t = max_u(E_u + W[u, t]): grouped by W's columns.
                cands = [
                    target_update(e, groups[t], jnp.maximum)
                    for t in range(NUM_MATRICES)
                ]
                valid = jk <= q

            new = []
            for t in range(NUM_MATRICES):
                cand = cands[t]
                if free:
                    cand = jnp.where(valid, cand, zero)
                elif pin:
                    cand = jnp.where(
                        valid_t[t], jnp.maximum(cand, NEGi), negp
                    )
                else:
                    # NEG walls drift by +-subs per step without the
                    # engine's clamp; clamp before masking for elementwise
                    # parity (engine.forward_sweep/backward_slab).
                    cand = jnp.where(valid, jnp.maximum(cand, NEGi), negp)
                if NEED_COL:
                    ccol = jnp.broadcast_to(
                        colbuf[0:hb, 8 * u + t : 8 * u + t + 1], (hb, wc)
                    )
                    inst = kl == 0
                    if not fwd or pin:
                        # Backward and pin-forward: global k=0 cells are
                        # real DP cells (di=dk=0 states travel along
                        # faces); install only interior-block halos.
                        inst = inst & (kb > 0)
                    cand = jnp.where(inst, ccol, cand)
                if NEED_ROW:
                    crow = jnp.broadcast_to(
                        rowbuf[8 * u + t : 8 * u + t + 1, :], (hb, wc)
                    )
                    inst = jl == 0
                    if not fwd or pin:
                        inst = inst & (jb > 0)
                    cand = jnp.where(inst, crow, cand)
                if fwd and not free and not pin:
                    # free_jk: global j=0 / k=0 faces are free (zero).
                    # With faces present the zero arrives via the halo
                    # install (the edge blocks' slabs are zero-filled);
                    # single-block dimensions set it directly.  Pin mode
                    # needs no install at all: its face cells are real
                    # DP values already masked per-matrix above.
                    if not NEED_ROW:
                        cand = jnp.where(jl == 0, zero, cand)
                    if not NEED_COL:
                        cand = jnp.where(kl == 0, zero, cand)
                new.append(cand)

                if NEED_ROW:
                    st_r[slot, 8 * u + t, :] = cand[tb, :]
                if NEED_COL:
                    st_c[slot, :, 8 * u + t] = cand[:, tc]

            # Capture the plane i = la: cell (jl, kl) holds global
            # i = q - jl - kl, so the hit diagonal jk == q - la crosses
            # the block only while la <= q <= la + tb + tc.
            @pl.when((q >= la_s) & (q <= la_s + tb + tc))
            def _():
                hitm = jk == q - la_s
                for t in range(NUM_MATRICES):
                    cap_scr[t] = jnp.where(hitm, new[t], cap_scr[t])

            if fwd:
                @pl.when(q == qstar)
                def _():
                    for t in range(NUM_MATRICES):
                        out_ref[t, 0] = jnp.sum(
                            jnp.where(cellmask, new[t], 0)
                        )
                carry = (tuple(new), p1, m7p1, m7p2)
            else:
                carry = (tuple(new), p1[0], p1[4], p1[5], p1[6], p2m)

        if NEED_COL:
            st_ct[slot, :, 0:hb] = jnp.swapaxes(st_c[slot], 0, 1)
            wr_col_dma(it, slot).start()
        if NEED_ROW:
            wr_row_dma(it, slot).start()
        return carry

    if fwd:
        if free:
            pz = zero
            init = ((pz,) * NUM_MATRICES, (pz,) * NUM_MATRICES, pz, pz)
        elif pin:
            # Pin-mode plane-0 init: the global origin (0, 0, 0) carries
            # the start-state vector v0 (passed through the ev scalars,
            # like the bwd variant's terminal vector); every other init
            # cell is a NEG wall.  Only block (0, 0)'s (0, 0) cell is the
            # true origin.
            origin = (jl == 0) & (kl == 0) & (jb == 0) & (kb == 0)
            pt = tuple(
                jnp.where(origin, ev[t], negp) for t in range(NUM_MATRICES)
            )
            m7 = ev[0]
            for t in range(1, NUM_MATRICES):
                m7 = jnp.maximum(m7, ev[t])
            m7p = jnp.where(origin, m7, negp)
            init = (pt, pt, m7p, m7p)
        else:
            # free_jk plane-0 init: the only init cell a valid cell ever
            # reads is (0, 0) (plane 0's M predecessor of the first
            # interior cell); it holds global (0, j0, k0) = 0 iff that
            # sits on a free face, else the i=0 wall.
            pz = jnp.where(
                (jl == 0) & (kl == 0) & ((jb == 0) | (kb == 0)), 0, negp
            )
            init = ((pz,) * NUM_MATRICES, (pz,) * NUM_MATRICES, pz, pz)
    else:
        # Plane 0 carries the terminal vector at the reversed origin of
        # block (0, 0); everything else is walled.
        origin = (jl == 0) & (kl == 0) & (jb == 0) & (kb == 0)
        p1_0 = tuple(
            jnp.where(origin, ev[t], negp) for t in range(NUM_MATRICES)
        )
        init = (p1_0, negp, negp, negp, negp, negp)

    jax.lax.fori_loop(0, nmac, macro, init)

    cdma = pltpu.make_async_copy(cap_scr, cap_out.at[blk], cap_sem)
    cdma.start()
    cdma.wait()

    for back in (2, 1):
        it_last = nmac - back
        if it_last >= 0:
            slot = it_last % 2
            if NEED_ROW:
                wr_row_dma(it_last, slot).wait()
            if NEED_COL:
                wr_col_dma(it_last, slot).wait()


def _slab_scratch_shapes(hb, wc, unb):
    from jax.experimental.pallas import tpu as pltpu

    return _scratch_shapes(hb, wc, unb) + [
        pltpu.VMEM((NUM_MATRICES, hb, wc), jnp.int32),  # cap_scr
        pltpu.SemaphoreType.DMA,  # cap_sem
    ]


def _live_planes(variant, scoring=Scoring()):
    base = FWD_LIVE_PLANES if variant == "fwd" else BWD_LIVE_PLANES
    if scoring.submatrix is not None:
        base += 2 * len(scoring.submatrix) + 1  # select-chain tables
    return base


def _slab_vmem_limit(dims, live):
    """vmem_limit_bytes for the slab-capture kernels: the shared policy
    (blocked._vmem_limit_for) with the slab step body's measured ~3.5
    Mosaic stack temporaries per unrolled step (capture hitm selects,
    per-matrix masks, face stores).  Measured 2026-08-19: the 8k^3
    split's F sweep at (136, 384, unb=16) modeled ~12.4 MB at the score
    sweep's 2/step but hit a 16.53 MB actual stack, overflowing the
    default 16 MB cap at compile time."""
    return _vmem_limit_for(dims, live, stack_per_step=3.5)


def make_slab_grid_call(dims: Tuple, scoring: Scoring, variant: str,
                        mode: str, interpret: bool):
    """Fused grid pallas_call: whole block grid in one dispatch, face slabs
    io-aliased in HBM across blocks (kernels/blocked.py:make_grid_call)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    n_blocks = n_jb * n_kb

    def kernel(scal_ref, askew_ref, bp_ref, cp_ref, zeros_ref, srf_in,
               cf_in, srf_out, cf_out, out_ref, cap_out, *scratch):
        scalars = tuple(scal_ref[0, 0, i] for i in range(15))
        _slab_sweep(
            dims, scoring, scalars, askew_ref, bp_ref[0], cp_ref[0],
            zeros_ref[:], srf_in, cf_in, srf_out, cf_out, out_ref, cap_out,
            *scratch, variant=variant, mode=mode, blk=pl.program_id(0),
        )

    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # askew (DMA'd per macro)
            pl.BlockSpec((1, hb, wc), lambda i: (i // n_kb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hb, wc), lambda i: (i % n_kb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hb, wc), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf (aliased)
            pl.BlockSpec((8, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),  # final vector
            pl.BlockSpec(memory_space=pltpu.HBM),  # capture planes
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_kb, 8 * sr1, wc), jnp.int32),
            jax.ShapeDtypeStruct((n_jb, 8 * sr2, _round_up(hb, 128)),
                                 jnp.int32),
            jax.ShapeDtypeStruct((8, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, NUM_MATRICES, hb, wc),
                                 jnp.int32),
        ),
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        scratch_shapes=_slab_scratch_shapes(hb, wc, unb),
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_slab_vmem_limit(dims, _live_planes(variant, scoring)),
        ),
    )


def make_slab_block_call(dims: Tuple, scoring: Scoring, variant: str,
                         mode: str, interpret: bool,
                         n_srf: Optional[int] = None,
                         n_cf: Optional[int] = None):
    """Per-call kernel (one block per pallas_call) for the interpret scan
    fallback (which cannot thread grid-step io-aliasing) and for the
    halo-sharded traceback (dist/halo.py sharded split), whose srf covers
    only the device-local stripe (``n_srf`` slabs) and whose column face
    is a single travelling slab (``n_cf=1``) surfaced to XLA for
    ppermute."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    n_srf = n_kb if n_srf is None else n_srf
    n_cf = n_jb if n_cf is None else n_cf

    def kernel(scal_ref, askew_ref, bp_ref, cp_ref, zeros_ref, srf_in,
               cf_in, srf_out, cf_out, out_ref, cap_out, *scratch):
        scalars = tuple(scal_ref[i] for i in range(15))
        _slab_sweep(
            dims, scoring, scalars, askew_ref, bp_ref[:], cp_ref[:],
            zeros_ref[:], srf_in, cf_in, srf_out, cf_out, out_ref, cap_out,
            *scratch, variant=variant, mode=mode, blk=0,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # askew
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cp
            pl.BlockSpec(memory_space=pltpu.VMEM),  # zeros
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),  # srf (aliased)
            pl.BlockSpec(memory_space=pltpu.HBM),  # cf (aliased)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # final vector
            pl.BlockSpec(memory_space=pltpu.HBM),  # capture planes
        ),
        scratch_shapes=_slab_scratch_shapes(hb, wc, unb),
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_srf, 8 * sr1, wc), jnp.int32),
            jax.ShapeDtypeStruct((n_cf, 8 * sr2, _round_up(hb, 128)),
                                 jnp.int32),
            jax.ShapeDtypeStruct((8, 1), jnp.int32),
            jax.ShapeDtypeStruct((1, NUM_MATRICES, hb, wc), jnp.int32),
        ),
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            vmem_limit_bytes=_slab_vmem_limit(dims, _live_planes(variant, scoring)),
        ),
    )


def _scal_table(lens, ev, dims):
    """(n_blocks, 16) int32 rows (la, jb, kb, qstar, jlstar, klstar,
    ev[0..6], srf_slab, cf_slab, pad); the final-vector target block is
    the one containing the global final cell (lb, lc).  Slab indices
    default to the global layout (srf per block column kb, cf per block
    row jb); the halo-sharded path builds its own rows with device-local
    indices."""
    hb, wc, lab, n_jb, n_kb = dims[:5]
    tb, tc = hb - 1, wc - 1
    la, lb, lc = lens[0], lens[1], lens[2]
    n_blocks = n_jb * n_kb

    jbstar = (lb - 1) // tb
    kbstar = (lc - 1) // tc
    jlstar = lb - jbstar * tb
    klstar = lc - kbstar * tc
    target_idx = jbstar * n_kb + kbstar

    idx = jnp.arange(n_blocks, dtype=jnp.int32)
    jbs = idx // n_kb
    kbs = idx % n_kb
    is_t = idx == target_idx
    cols = [
        jnp.full((n_blocks,), la, jnp.int32),
        jbs,
        kbs,
        jnp.where(is_t, la + jlstar + klstar, -1),
        jnp.where(is_t, jlstar, -1),
        jnp.where(is_t, klstar, -1),
    ]
    cols += [jnp.full((n_blocks,), ev[t], jnp.int32)
             for t in range(NUM_MATRICES)]
    cols += [kbs, jbs]  # srf_slab, cf_slab: global layout defaults
    cols += [jnp.zeros((n_blocks,), jnp.int32)]
    return jnp.stack(cols, axis=1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("dims", "scoring", "variant", "mode",
                              "interpret")
)
def _slab_core(lens, ev, a_ext, b_arr, c_arr, dims, scoring, variant, mode,
               interpret):
    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    tb, tc = hb - 1, wc - 1
    n_blocks = n_jb * n_kb
    askew = _build_askew_blocked(a_ext, qqb, hb, wc, unb)
    zeros = jnp.zeros((hb, wc), jnp.int32)
    # Edge blocks read their j=0 / k=0 halos from these prefilled slabs:
    # free faces are zero, pin-mode and backward faces are NEG walls.
    fill = jnp.int32(0 if (variant == "fwd" and mode != "pin") else NEG)
    srf0 = jnp.full((n_kb, 8 * sr1, wc), fill, jnp.int32)
    cf0 = jnp.full((n_jb, 8 * sr2, _round_up(hb, 128)), fill, jnp.int32)
    scal = _scal_table(lens, ev, dims)

    j0s = jnp.arange(n_jb, dtype=jnp.int32) * tb
    k0s = jnp.arange(n_kb, dtype=jnp.int32) * tc
    bwin = b_arr[j0s[:, None] + jnp.arange(hb, dtype=jnp.int32)[None, :]]
    cwin = c_arr[k0s[:, None] + jnp.arange(wc, dtype=jnp.int32)[None, :]]
    bptab = jnp.broadcast_to(bwin[:, :, None], (n_jb, hb, wc))
    cptab = jnp.broadcast_to(cwin[:, None, :], (n_kb, hb, wc))

    if not interpret:
        grid_call = make_slab_grid_call(dims, scoring, variant, mode,
                                        interpret)
        _, _, res, cap = grid_call(
            scal[:, None, :], askew, bptab, cptab, zeros, srf0, cf0
        )
        return res, cap

    # Interpret fallback: one pallas_call per block, scanned with faces
    # threaded explicitly (grid-step io-aliasing is not emulated).
    block_call = make_slab_block_call(dims, scoring, variant, mode,
                                      interpret)

    def scan_body(carry, idx):
        srf, cf, res = carry
        jb = idx // n_kb
        kb = idx % n_kb
        bp = jnp.broadcast_to(
            jax.lax.dynamic_slice(b_arr, (jb * tb,), (hb,))[:, None],
            (hb, wc),
        )
        cp = jnp.broadcast_to(
            jax.lax.dynamic_slice(c_arr, (kb * tc,), (wc,))[None, :],
            (hb, wc),
        )
        srf, cf, out, cap = block_call(scal[idx], askew, bp, cp, zeros,
                                       srf, cf)
        is_t = scal[idx, 3] >= 0
        res = jnp.where(is_t, out, res)
        return (srf, cf, res), cap[0]

    res0 = jnp.zeros((8, 1), jnp.int32)
    (_, _, res), caps = jax.lax.scan(
        scan_body, (srf0, cf0, res0),
        jnp.arange(n_blocks, dtype=jnp.int32),
    )
    return res, caps


def _assemble(cap: np.ndarray, dims, lb: int, lc: int) -> np.ndarray:
    """Stitch per-block capture planes into the (7, lb+1, lc+1) slab
    (interior blocks' jl=0 / kl=0 rows are halo duplicates; padding
    columns beyond lb/lc are dropped)."""
    hb, wc, lab, n_jb, n_kb = dims[:5]
    tb, tc = hb - 1, wc - 1
    slab = np.empty((NUM_MATRICES, lb + 1, lc + 1), np.int32)
    for jb in range(n_jb):
        j0 = jb * tb
        jl0 = 0 if jb == 0 else 1
        jhi = min(tb, lb - j0)
        if jhi < jl0:
            continue
        for kb in range(n_kb):
            k0 = kb * tc
            kl0 = 0 if kb == 0 else 1
            khi = min(tc, lc - k0)
            if khi < kl0:
                continue
            blk = jb * n_kb + kb
            slab[:, j0 + jl0 : j0 + jhi + 1, k0 + kl0 : k0 + khi + 1] = (
                cap[blk, :, jl0 : jhi + 1, kl0 : khi + 1]
            )
    return slab


def _assemble_jnp(cap, dims, lb: int, lc: int, flip: bool):
    """Traced twin of :func:`_assemble` (device-side stitching)."""
    hb, wc, lab, n_jb, n_kb = dims[:5]
    tb, tc = hb - 1, wc - 1
    rows = []
    for jb in range(n_jb):
        j0 = jb * tb
        jl0 = 0 if jb == 0 else 1
        jhi = min(tb, lb - j0)
        if jhi < jl0:
            continue
        cols = []
        for kb in range(n_kb):
            k0 = kb * tc
            kl0 = 0 if kb == 0 else 1
            khi = min(tc, lc - k0)
            if khi < kl0:
                continue
            blk = jb * n_kb + kb
            cols.append(cap[blk, :, jl0 : jhi + 1, kl0 : khi + 1])
        rows.append(jnp.concatenate(cols, axis=2))
    slab = jnp.concatenate(rows, axis=1)
    if flip:
        slab = slab[:, ::-1, ::-1]
    return slab


@functools.partial(
    jax.jit, static_argnames=("fdims", "gdims", "lb", "lc")
)
def _combine_caps(fcap, gcap, fdims, gdims, lb, lc):
    """total = F + G on device; returns (argmax flat index, its value).
    Only two scalars ever cross the host link -- at 2k^3 the two slabs are
    ~118 MB each, a multi-second fetch on the remote tunnel."""
    f = _assemble_jnp(fcap, fdims, lb, lc, False)
    g = _assemble_jnp(gcap, gdims, lb, lc, True)
    total = f + g
    flat = jnp.argmax(total)
    return flat, total.reshape(-1)[flat]


def split_point_blocked_async(
    a,
    b,
    c,
    m: int,
    scoring: Scoring = Scoring(),
    mode: str = "free",
    end_v: Optional[np.ndarray] = None,
    interpret: Optional[bool] = None,
    v0: Optional[np.ndarray] = None,
):
    """The Hirschberg split at i = m, entirely on device: dispatch the
    forward slab of (a[:m], b, c), the backward slab of (a[m:], b, c), and
    their elementwise sum's argmax; returns a zero-arg fetch producing
    (sstar, jstar, kstar, score) -- the optimal crossing of plane i = m
    (traceback/hirschberg.py:_solve).

    ``mode`` "free" / "free_jk" / "pin"; pin requires ``v0``, the
    start-state vector seeding the origin (all faces NEG walls) -- the
    recursion's interior nodes, which round-3's engine left on the slow
    XLA path (measured ~55 s of a 4k^3 traceback's 56 s warm in the
    2k-class pin nodes alone)."""
    a = np.asarray(a, dtype=np.int32)
    b = np.asarray(b, dtype=np.int32)
    c = np.asarray(c, dtype=np.int32)
    la, lb, lc = len(a), len(b), len(c)
    assert 1 <= m < la, (m, la)
    assert (mode == "pin") == (v0 is not None), (mode, v0)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    fdims = _plan(m, lb, lc, _live_planes('fwd', scoring), None)
    flens, fa, fb, fc = prep_blocked(a[:m], b, c, fdims)
    ev0 = (np.asarray(v0, np.int32) if v0 is not None
           else np.zeros(NUM_MATRICES, np.int32))
    _, fcap = _slab_core(
        jnp.asarray(flens), jnp.asarray(ev0), jnp.asarray(fa),
        jnp.asarray(fb), jnp.asarray(fc), fdims, scoring, "fwd", mode,
        interpret,
    )

    ra = a[m:][::-1].copy()
    gdims = _plan(la - m, lb, lc, _live_planes('bwd', scoring), None)
    glens, ga, gb, gc = prep_blocked(ra, b[::-1].copy(), c[::-1].copy(),
                                     gdims)
    ev = (end_v if end_v is not None
          else np.zeros(NUM_MATRICES)).astype(np.int32)
    _, gcap = _slab_core(
        jnp.asarray(glens), jnp.asarray(ev), jnp.asarray(ga),
        jnp.asarray(gb), jnp.asarray(gc), gdims, scoring, "bwd", "free",
        interpret,
    )

    flat, val = _combine_caps(fcap, gcap, fdims, gdims, lb, lc)

    def fetch():
        fl = int(jax.device_get(flat))
        score = int(jax.device_get(val))
        sstar, jstar, kstar = np.unravel_index(
            fl, (NUM_MATRICES, lb + 1, lc + 1)
        )
        return int(sstar), int(jstar), int(kstar), score

    return fetch


def _plan(la, lb, lc, live, block_shape):
    if block_shape:
        hb, wc = block_shape[0], block_shape[1]
        unb = block_shape[2] if len(block_shape) > 2 else DEF_UNB
    else:
        # stack_per_step=2.0 keeps the slab planner's round-4 shape
        # choices (their actual ~3.5 stack is covered by the explicit
        # _slab_vmem_limit request, and the 4k/8k traceback geometries
        # are cache-warmed at those shapes).
        hb, wc, unb = choose_block_shape(la, lb, lc, live_planes=live,
                                         stack_per_step=2.0)
    return plan_dims(la, lb, lc, hb, wc, unb)


def forward_slab_blocked_async(
    a,
    b,
    c,
    scoring: Scoring = Scoring(),
    mode: str = "free",
    want_slab: bool = True,
    block_shape: Optional[Tuple[int, ...]] = None,
    interpret: Optional[bool] = None,
):
    """Dispatch a blocked forward sweep; returns a zero-arg fetch function
    producing (final (7,), slab (7, lb+1, lc+1) at i = |A| or None).

    Same contract as traceback.xla_engine.forward_sweep_xla_async with
    capture_m = |A| (the only capture the Hirschberg split uses: its F slab
    is the prefix problem's final i-plane).  Modes "free" / "free_jk"."""
    assert mode in ("free", "free_jk")
    a = np.asarray(a, dtype=np.int32)
    b = np.asarray(b, dtype=np.int32)
    c = np.asarray(c, dtype=np.int32)
    la, lb, lc = len(a), len(b), len(c)
    assert min(la, lb, lc) >= 1, (la, lb, lc)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dims = _plan(la, lb, lc, _live_planes('fwd', scoring), block_shape)
    lens, a_ext, b_arr, c_arr = prep_blocked(a, b, c, dims)
    ev = np.zeros(NUM_MATRICES, np.int32)
    res, cap = _slab_core(
        jnp.asarray(lens), jnp.asarray(ev), jnp.asarray(a_ext),
        jnp.asarray(b_arr), jnp.asarray(c_arr), dims, scoring, "fwd", mode,
        interpret,
    )

    def fetch():
        final = np.asarray(jax.device_get(res))[:NUM_MATRICES, 0]
        if not want_slab:
            return final, None
        slab = _assemble(np.asarray(jax.device_get(cap)), dims, lb, lc)
        return final, slab

    return fetch


def backward_slab_blocked_async(
    a_suffix,
    b,
    c,
    scoring: Scoring = Scoring(),
    end_v: Optional[np.ndarray] = None,
    block_shape: Optional[Tuple[int, ...]] = None,
    interpret: Optional[bool] = None,
):
    """Dispatch a blocked backward sweep; returns a zero-arg fetch function
    producing G (7, |B|+1, |C|+1): the best suffix-path score from
    (m, j, k) in each state to the final cell (engine.backward_slab)."""
    ra = np.asarray(a_suffix, dtype=np.int32)[::-1]
    rb = np.asarray(b, dtype=np.int32)[::-1]
    rc = np.asarray(c, dtype=np.int32)[::-1]
    la, lb, lc = len(ra), len(rb), len(rc)
    assert min(la, lb, lc) >= 1, (la, lb, lc)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dims = _plan(la, lb, lc, _live_planes('bwd', scoring), block_shape)
    lens, a_ext, b_arr, c_arr = prep_blocked(ra, rb, rc, dims)
    ev = (end_v if end_v is not None
          else np.zeros(NUM_MATRICES)).astype(np.int32)
    _, cap = _slab_core(
        jnp.asarray(lens), jnp.asarray(ev), jnp.asarray(a_ext),
        jnp.asarray(b_arr), jnp.asarray(c_arr), dims, scoring, "bwd",
        "free", interpret,
    )

    def fetch():
        slab = _assemble(np.asarray(jax.device_get(cap)), dims, lb, lc)
        return slab[:, ::-1, ::-1].copy()

    return fetch
