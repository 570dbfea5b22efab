"""Blocked wavefront sweep: the memory-efficient slicing method, HBM edition.

The reference bounds sequence length by SRAM, not PE count: the DP cuboid is
cut into |A| x n x n pillars processed block-by-block, exchanging boundary
faces through on-chip SRAMs (reference: pic/Memory.png,
src/TriAlign_1cyc.v:127-140, 288-340).  Here each pillar is a Pallas kernel
invocation whose working planes live in VMEM, and the boundary faces live in
HBM in *skewed* layout -- face row s = q - tb + k0 (bottom-row face) /
s = q - tc + j0 (right-column face) -- so the faces a sweep step needs are
contiguous rows.

v2 design: the q-loop runs in macro-steps of UNB=8 planes.  Per macro-step:
one read DMA per face brings 8 face rows (a (64, wc) flat slice) into a
double-buffered VMEM ring; the column face is transposed once per macro
(not per plane); the symbol window is loaded once and each unrolled step
takes a static row slice (qqb is a multiple of UNB so the sublane residue
is compile-time); face writes stage into (64, wc)/(hb, 64) scratch and ship
as one DMA per face per macro.  Face-row index 0..SOFF-1 is a guard band so
ramp-up writes (q <= tb - k0) can land unconditionally without branches.

Default block: (hb, wc) = (256, 256) -> Tb = Tc = 255 cells plus halo row
0 / column 0; tall pillars keep the wavefront ramp overhead at
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
    fused_plane_update,
    transition_groups,
)

DEF_HB = 256  # default plane rows (j): halo + Tb cells
DEF_WC = 256  # default plane cols (k): halo + Tc cells
UNB = 8  # q-loop macro-step (planes per iteration); sublane tile
SOFF = 8  # face-row guard band (absorbs ramp-up writes)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def plan_dims(la: int, lb: int, lc: int, hb: int = DEF_HB, wc: int = DEF_WC) -> Tuple:
    """Static geometry for a blocked alignment, as a hashable tuple:
    (hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2).

    sr1/sr2 are FACE-ROW counts (flat slab rows = 8 * sr)."""
    tb, tc = hb - 1, wc - 1
    lab = _round_up(max(la, 16), 16)
    n_jb = max(1, -(-lb // tb))
    n_kb = max(1, -(-lc // tc))
    qqb = _round_up(lab + tb + tc, UNB)  # planes per block sweep (padded)
    kdim = _round_up(n_kb * tc + wc + 1, 128)  # B/C symbol array extents
    jdim = _round_up(n_jb * tb + hb + 1, 8)
    sr1 = qqb + (n_kb - 1) * tc + SOFF + UNB + 2  # row-face rows: q + k0 + SOFF
    sr2 = qqb + (n_jb - 1) * tb + SOFF + UNB + 2  # col-face rows: q + j0 + SOFF
    return (hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2)


def _make_block_kernel(dims: Tuple, scoring: Scoring):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2 = dims
    tb, tc = hb - 1, wc - 1
    w = scoring.weight_matrix()
    groups = transition_groups(w)
    match = np.int32(scoring.match)
    mismatch = np.int32(scoring.mismatch)
    sop = scoring.s3_mode == "sop"
    nmac = qqb // UNB

    def kernel(
        scal_ref,  # (8,): la, j0, k0, jb, kb, qstar, jlstar, klstar
        askew_ref,  # (qqb+hb+8, wc) VMEM
        bp_ref,  # (hb, wc) VMEM: B[j0+jl]
        cp_ref,  # (hb, wc) VMEM: C[k0+kl]
        zeros_ref,  # (hb, wc) VMEM layout anchor
        srf_in,  # (n_kb, 8*sr1, wc) HBM flat slabs (aliased with srf_out)
        cf_in,  # (n_jb, 8*sr2, hb) HBM flat slabs (aliased with cf_out)
        srf_out,
        cf_out,
        out_ref,  # (8, 1) SMEM
        rb_r,  # (2, 64, wc) VMEM: read ring, row face (8 face rows/macro)
        rb_c,  # (2, 64, hb) VMEM: read ring, col face (matrix-major)
        st_r,  # (2, 64, wc) VMEM: write staging, row face
        st_c,  # (2, hb, 64) VMEM: write staging, col face (pre-transpose)
        st_ct,  # (2, 64, hb) VMEM: col face transposed for DMA
        rd_sem,  # DMA sems (2, 2): [face, slot]
        wr_sem,  # DMA sems (2, 2)
    ):
        j0 = scal_ref[1]
        k0 = scal_ref[2]
        jb = scal_ref[3]
        kb = scal_ref[4]
        qstar = scal_ref[5]
        jlstar = scal_ref[6]
        klstar = scal_ref[7]

        jl = jax.lax.broadcasted_iota(jnp.int32, (hb, wc), 0)
        kl = jax.lax.broadcasted_iota(jnp.int32, (hb, wc), 1)
        jk = jl + kl
        edge = (jl >= 1) & (kl >= 1)
        bp = bp_ref[:]
        cp = cp_ref[:]
        s_bc = jnp.where(bp == cp, match, mismatch)
        zero = zeros_ref[:]
        cellmask = (jl == jlstar) & (kl == klstar)

        def rd_row_dma(it, slot):
            # face rows q+k0+SOFF for q in [8it+1, 8it+8] -> 64 flat rows.
            fr = 8 * (UNB * it + 1 + k0 + SOFF)
            return pltpu.make_async_copy(
                srf_in.at[kb, pl.ds(fr, 64)], rb_r.at[slot], rd_sem.at[0, slot]
            )

        def rd_col_dma(it, slot):
            fr = 8 * (UNB * it + 1 + j0 + SOFF)
            return pltpu.make_async_copy(
                cf_in.at[jb, pl.ds(fr, 64)], rb_c.at[slot], rd_sem.at[1, slot]
            )

        def wr_row_dma(it, slot):
            # face rows q - tb + k0 + SOFF; macros whose rows are all in the
            # guard band clamp to 0 (guard rows are never read).
            fr = 8 * jnp.maximum(UNB * it + 1 - tb + k0 + SOFF, 0)
            return pltpu.make_async_copy(
                st_r.at[slot], srf_out.at[kb, pl.ds(fr, 64)], wr_sem.at[0, slot]
            )

        def wr_col_dma(it, slot):
            fr = 8 * jnp.maximum(UNB * it + 1 - tc + j0 + SOFF, 0)
            return pltpu.make_async_copy(
                st_ct.at[slot], cf_out.at[jb, pl.ds(fr, 64)], wr_sem.at[1, slot]
            )

        # Warm up the read pipeline.
        rd_row_dma(0, 0).start()
        rd_col_dma(0, 0).start()

        def roll1(x, axis):
            return pltpu.roll(x, 1, axis)

        def macro(it, carry):
            p1, p2, p3 = carry
            slot = jax.lax.rem(it, 2)

            # Finish the writes that used this slot two macros ago before
            # restaging into it.
            @pl.when(it >= 2)
            def _():
                wr_row_dma(it - 2, slot).wait()
                wr_col_dma(it - 2, slot).wait()

            rd_row_dma(it, slot).wait()
            rd_col_dma(it, slot).wait()

            @pl.when(it + 1 < nmac)
            def _():
                nslot = jax.lax.rem(it + 1, 2)
                rd_row_dma(it + 1, nslot).start()
                rd_col_dma(it + 1, nslot).start()

            rowbuf = rb_r[slot]  # (64, wc): rows 8u+t
            # Column face arrives matrix-major (64, hb); one transpose per
            # macro gives (hb, 64) with per-step static lane slices.
            colbuf = jnp.swapaxes(rb_c[slot], 0, 1)  # (hb, 64)

            # Shared 8-aligned symbol window for the UNB steps.
            base = pl.multiple_of(qqb - UNB * it - UNB, UNB)
            win = askew_ref[pl.ds(base, hb + 8), :]

            for u in range(UNB):
                q = UNB * it + u + 1
                ap = win[UNB - 1 - u : UNB - 1 - u + hb, :]
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
                subs = (s3, 0, 0, 0, s_ab, s_bc, s_ac)

                valid = (jk <= q - 1) & edge
                cands = fused_plane_update(
                    (None, p1, p2, p3), subs, groups, jnp.maximum, roll1
                )
                new = []
                for t in range(NUM_MATRICES):
                    cand = jnp.where(valid, cands[t], zero)
                    # Halo install: column 0 from the col face, then row 0
                    # from the row face (row wins at [0,0], where the staged
                    # face carries the diagonal-corner value).
                    ccol = jnp.broadcast_to(
                        colbuf[:, 8 * u + t : 8 * u + t + 1], (hb, wc)
                    )
                    cand = jnp.where(kl == 0, ccol, cand)
                    crow = jnp.broadcast_to(
                        rowbuf[8 * u + t : 8 * u + t + 1, :], (hb, wc)
                    )
                    cand = jnp.where(jl == 0, crow, cand)
                    new.append(cand)

                    # Stage faces: bottom row (jl=tb) incl. the kl=0 corner;
                    # right column (kl=tc) incl. the jl=0 halo.
                    st_r[slot, 8 * u + t, :] = cand[tb, :]
                    st_c[slot, :, 8 * u + t] = cand[:, tc]

                # Final-cell capture for the block containing (lb, lc).
                @pl.when(q == qstar)
                def _():
                    for t in range(NUM_MATRICES):
                        out_ref[t, 0] = jnp.sum(
                            jnp.where(cellmask, new[t], 0)
                        )

                p1, p2, p3 = tuple(new), p1, p2

            st_ct[slot] = jnp.swapaxes(st_c[slot], 0, 1)
            wr_row_dma(it, slot).start()
            wr_col_dma(it, slot).start()
            return (p1, p2, p3)

        zeros7 = (zero,) * NUM_MATRICES
        jax.lax.fori_loop(0, nmac, macro, (zeros7, zeros7, zeros7))

        # Drain outstanding writes so the aliased HBM faces are complete
        # before the next block reads them.
        for back in (2, 1):
            it_last = nmac - back
            if it_last >= 0:
                slot = it_last % 2
                wr_row_dma(it_last, slot).wait()
                wr_col_dma(it_last, slot).wait()

    return kernel


def _build_askew_blocked(a_ext, qqb, hb, wc):
    """ASKREV[r, k] = A[(qqb - r) - k] over a (qqb+hb+8, wc) grid."""
    arows = qqb + hb + 8
    ext = jnp.concatenate([a_ext, jnp.full((arows + wc,), PAD_SYMBOL, jnp.int32)])
    ridx = jnp.arange(arows, dtype=jnp.int32)[:, None]
    kidx = jnp.arange(wc, dtype=jnp.int32)[None, :]
    u = jnp.clip(qqb - ridx - kidx, 0, ext.shape[0] - 1)
    return ext[u]


def make_block_call(dims: Tuple, n_srf_slabs: int, n_cf_slabs: int, scoring: Scoring, interpret: bool):
    """Build the per-block pallas_call with the given face-slab counts.

    Used by the single-chip scan (slabs per block column / block row) and by
    the multi-chip halo mode (local column slabs, one travelling row slab).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2 = dims
    kernel = _make_block_kernel(dims, scoring)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # askew
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
        scratch_shapes=[
            pltpu.VMEM((2, 64, wc), jnp.int32),  # rb_r
            pltpu.VMEM((2, 64, hb), jnp.int32),  # rb_c
            pltpu.VMEM((2, 64, wc), jnp.int32),  # st_r
            pltpu.VMEM((2, hb, 64), jnp.int32),  # st_c
            pltpu.VMEM((2, 64, hb), jnp.int32),  # st_ct
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_srf_slabs, 8 * sr1, wc), jnp.int32),
            jax.ShapeDtypeStruct((n_cf_slabs, 8 * sr2, hb), jnp.int32),
            jax.ShapeDtypeStruct((8, 1), jnp.int32),
        ),
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


@functools.partial(jax.jit, static_argnames=("dims", "scoring", "interpret"))
def _blocked_core(lens, a_ext, b_arr, c_arr, dims, scoring, interpret):
    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2 = dims
    tb, tc = hb - 1, wc - 1
    la, lb, lc = lens[0], lens[1], lens[2]
    askew = _build_askew_blocked(a_ext, qqb, hb, wc)
    zeros = jnp.zeros((hb, wc), jnp.int32)
    block_call = make_block_call(dims, n_kb, n_jb, scoring, interpret)

    # Target block containing the global final cell (lb, lc).
    jbstar = (lb - 1) // tb
    kbstar = (lc - 1) // tc
    jlstar = lb - jbstar * tb
    klstar = lc - kbstar * tc
    target_idx = jbstar * n_kb + kbstar

    srf0 = jnp.zeros((n_kb, 8 * sr1, wc), jnp.int32)
    cf0 = jnp.zeros((n_jb, 8 * sr2, hb), jnp.int32)
    res0 = jnp.zeros((8, 1), jnp.int32)

    def scan_body(carry, idx):
        srf, cf, res = carry
        jb = idx // n_kb
        kb = idx % n_kb
        j0 = jb * tb
        k0 = kb * tc
        is_t = idx == target_idx
        scal = jnp.stack(
            [
                la,
                j0,
                k0,
                jb,
                kb,
                jnp.where(is_t, la + jlstar + klstar, jnp.int32(-1)),
                jnp.where(is_t, jlstar, -1),
                jnp.where(is_t, klstar, -1),
            ]
        ).astype(jnp.int32)
        bp = jnp.broadcast_to(
            jax.lax.dynamic_slice(b_arr, (j0,), (hb,))[:, None], (hb, wc)
        )
        cp = jnp.broadcast_to(
            jax.lax.dynamic_slice(c_arr, (k0,), (wc,))[None, :], (hb, wc)
        )
        srf, cf, out = block_call(scal, askew, bp, cp, zeros, srf, cf)
        res = jnp.where(is_t, out, res)
        return (srf, cf, res), None

    (_, _, res), _ = jax.lax.scan(
        scan_body, (srf0, cf0, res0), jnp.arange(n_jb * n_kb, dtype=jnp.int32)
    )
    return res


def align_blocked(
    a,
    b,
    c,
    scoring: Scoring = Scoring(),
    interpret: Optional[bool] = None,
    block_shape: Optional[Tuple[int, int]] = None,
) -> int:
    """Optimal 3-sequence alignment score via the blocked (sliced) sweep.

    Handles |B|, |C| beyond the single-block kernel's 255 limit; |A| is
    bounded by the skewed symbol buffer (~8k with int32 planes)."""
    a = np.asarray(a)
    b = np.asarray(b)
    c = np.asarray(c)
    la, lb, lc = len(a), len(b), len(c)
    if min(la, lb, lc) == 0:
        return 0
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    hb, wc = block_shape if block_shape else (DEF_HB, DEF_WC)
    dims = plan_dims(la, lb, lc, hb, wc)
    _, _, lab, _, _, _, kdim, jdim, _, _ = dims

    a_ext = np.full(lab + 2, PAD_SYMBOL, dtype=np.int32)
    a_ext[1 : la + 1] = a
    b_arr = np.full(jdim + hb + 8, PAD_SYMBOL - 1, dtype=np.int32)
    b_arr[1 : lb + 1] = b
    c_arr = np.full(kdim + wc + 8, PAD_SYMBOL - 2, dtype=np.int32)
    c_arr[1 : lc + 1] = c
    lens = np.array([la, lb, lc], dtype=np.int32)

    res = _blocked_core(
        jnp.asarray(lens),
        jnp.asarray(a_ext),
        jnp.asarray(b_arr),
        jnp.asarray(c_arr),
        dims,
        scoring,
        interpret,
    )
    return int(jax.device_get(res)[:NUM_MATRICES, 0].max())
