"""Blocked wavefront sweep: the memory-efficient slicing method, HBM edition.

The reference bounds sequence length by SRAM, not PE count: the DP cuboid is
cut into |A| x n x n pillars processed block-by-block, exchanging boundary
faces through on-chip SRAMs (reference: pic/Memory.png,
src/TriAlign_1cyc.v:127-140, 288-340).  Here each pillar is a Pallas kernel
invocation whose working planes live in VMEM, and the boundary faces live in
HBM in *skewed* layout -- face row s = i + k (row face) / s = i + j (column
face) -- so that every wavefront step reads and writes exactly one contiguous
face row by async DMA.

Faces are stored as per-block-column (row face) / per-block-row (column
face) slabs, so every DMA moves one full (8, wc) / (hb, 8) face row of the
block's own slab -- no partial-width transfers, no tiling-alignment hazards,
and the diagonal-corner cell rides along for free: the staged bottom row
includes the halo position kl=0, whose value is exactly the corner the
diagonally-next block needs (the role the reference's double-buffered z-SRAM
banks play, src/TriAlign_1cyc.v:127-131).

Default block: (Tb, Tc) = (127, 127) cells -> a (128, 128) int32 plane per
matrix with halo row 0 / column 0.  Tests on CPU use smaller blocks to keep
interpret mode tractable.
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

DEF_HB = 128  # default plane rows (j): halo + Tb cells
DEF_WC = 128  # default plane cols (k): halo + Tc cells
# (128,128) measured fastest at 1k^3 on v5e: padding waste dominates the
# current per-slot cost; revisit when per-step DMA overhead is profiled out.
NRD = 8  # read-prefetch ring slots
DEPTH = 4  # read-prefetch distance (planes)
NWR = 2  # write ring slots


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def plan_dims(la: int, lb: int, lc: int, hb: int = DEF_HB, wc: int = DEF_WC) -> Tuple:
    """Static geometry for a blocked alignment, as a hashable tuple:
    (hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, s1, s2)."""
    tb, tc = hb - 1, wc - 1
    lab = _round_up(max(la, 16), 16)
    n_jb = max(1, -(-lb // tb))
    n_kb = max(1, -(-lc // tc))
    qqb = lab + tb + tc  # planes per block sweep
    kdim = _round_up(n_kb * tc + wc + 1, 128)  # B/C symbol array extents
    jdim = _round_up(n_jb * tb + hb + 1, 8)
    s1 = _round_up(qqb + (n_kb - 1) * tc + 2, 8)  # row-face rows: q + k0
    s2 = _round_up(qqb + (n_jb - 1) * tb + 2, 8)  # col-face rows: q + j0
    return (hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, s1, s2)


def _make_block_kernel(dims: Tuple, scoring: Scoring):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, s1, s2 = dims
    tb, tc = hb - 1, wc - 1
    w = scoring.weight_matrix()
    groups = transition_groups(w)
    match = np.int32(scoring.match)
    mismatch = np.int32(scoring.mismatch)
    sop = scoring.s3_mode == "sop"

    def kernel(
        scal_ref,  # (8,): la, j0, k0, jb, kb, qstar, jlstar, klstar
        askew_ref,  # (qqb+hb+8, wc) VMEM
        bp_ref,  # (hb, wc) VMEM: B[j0+jl]
        cp_ref,  # (hb, wc) VMEM: C[k0+kl]
        zeros_ref,  # (hb, wc) VMEM layout anchor
        srf_in,  # (n_kb, s1, 8, wc) HBM slabs (aliased with srf_out)
        cf_in,  # (n_jb, s2, 8, hb) HBM slabs (aliased with cf_out)
        srf_out,
        cf_out,
        out_ref,  # (8, 1) SMEM
        srf_buf,  # (NRD, 8, wc) VMEM scratch
        cf_buf,  # (NRD, 8, hb) VMEM scratch (matrix-major; transposed in-kernel)
        srf_st,  # (NWR, 8, wc) VMEM staging
        cf_st,  # (NWR, 8, hb) VMEM staging
        rd_sem,  # DMA sems (2, NRD)
        wr_sem,  # DMA sems (2, NWR)
    ):
        la = scal_ref[0]
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

        def srf_rd_dma(q, slot):
            return pltpu.make_async_copy(
                srf_in.at[kb, q + k0],
                srf_buf.at[slot],
                rd_sem.at[0, slot],
            )

        def cf_rd_dma(q, slot):
            return pltpu.make_async_copy(
                cf_in.at[jb, q + j0],
                cf_buf.at[slot],
                rd_sem.at[1, slot],
            )

        def srf_wr_dma(q, slot):
            # Bottom row (jl=tb): cells (i, j0+tb, k0+kl) for kl in [1, tc]
            # plus the installed halo at kl=0 (the corner value the next
            # block row needs); face row s = q - tb + k0 of slab kb.
            return pltpu.make_async_copy(
                srf_st.at[slot],
                srf_out.at[kb, q - tb + k0],
                wr_sem.at[0, slot],
            )

        def cf_wr_dma(q, slot):
            # Right column (kl=tc) incl the jl=0 halo; face row
            # s = q - tc + j0 of slab jb.
            return pltpu.make_async_copy(
                cf_st.at[slot],
                cf_out.at[jb, q - tc + j0],
                wr_sem.at[1, slot],
            )

        # Warm up the read pipeline.
        for q0 in range(1, DEPTH + 1):
            srf_rd_dma(q0, q0 % NRD).start()
            cf_rd_dma(q0, q0 % NRD).start()

        def body(q, carry):
            p1, p2, p3 = carry
            slot = q % NRD
            srf_rd_dma(q, slot).wait()
            cf_rd_dma(q, slot).wait()
            halo_row = srf_buf[slot]  # (8, wc): matrix-major row face
            # Col face arrives matrix-major (8, hb) -- HBM minor dims must be
            # 128-aligned -- so transpose once per plane to (hb, 8).
            halo_col = jnp.swapaxes(cf_buf[slot], 0, 1)

            @pl.when(q + DEPTH <= qqb)
            def _():
                nslot = (q + DEPTH) % NRD
                srf_rd_dma(q + DEPTH, nslot).start()
                cf_rd_dma(q + DEPTH, nslot).start()

            # Symbol plane: ap[jl, kl] = A[q - jl - kl] via the skewed array,
            # loaded as an 8-aligned window + sublane rotate.
            start = qqb - q
            base = pl.multiple_of((start // 8) * 8, 8)
            win = askew_ref[pl.ds(base, hb + 8), :]
            residue = start % 8
            ap = pltpu.roll(win, (hb + 8 - residue) % (hb + 8), 0)[0:hb, :]

            s_ab = jnp.where(ap == bp, match, mismatch)
            s_ac = jnp.where(ap == cp, match, mismatch)
            if sop:
                s3 = s_ab + s_ac + s_bc
            else:
                s3 = jnp.where(
                    ap == bp,
                    jnp.where(bp == cp, 3 * match, (match + mismatch) * 2),
                    3 * mismatch,
                )
            subs = (s3, 0, 0, 0, s_ab, s_bc, s_ac)

            i_grid = q - jk
            valid = (i_grid >= 1) & (i_grid <= la) & edge
            cands = fused_plane_update(
                (None, p1, p2, p3),
                subs,
                groups,
                jnp.maximum,
                lambda x, axis: pltpu.roll(x, 1, axis),
            )
            new = []
            for t in range(NUM_MATRICES):
                cand = jnp.where(valid, cands[t], 0)
                # Halo install: column 0 from the col face, then row 0 from
                # the row face (row wins at [0,0], where the banked face
                # carries the diagonal-corner value).
                ccol = jnp.broadcast_to(halo_col[:, t : t + 1], (hb, wc))
                cand = jnp.where(kl == 0, ccol, cand)
                crow = jnp.broadcast_to(halo_row[t : t + 1, :], (hb, wc))
                cand = jnp.where(jl == 0, crow, cand)
                new.append(cand)

            # Face writes (guarded: the far edges exist only once the
            # wavefront reaches them).
            wslot = q % NWR

            @pl.when(q > tb)
            def _():
                @pl.when(q > tb + NWR)
                def _():
                    srf_wr_dma(q - NWR, wslot).wait()
                for t in range(NUM_MATRICES):
                    srf_st[wslot, t : t + 1, :] = new[t][tb : tb + 1, :]
                srf_wr_dma(q, wslot).start()

            @pl.when(q > tc)
            def _():
                @pl.when(q > tc + NWR)
                def _():
                    cf_wr_dma(q - NWR, wslot).wait()
                cols = jnp.concatenate(
                    [new[t][:, tc : tc + 1] for t in range(NUM_MATRICES)]
                    + [new[0][:, tc : tc + 1]],
                    axis=1,
                )  # (hb, 8); slot 7 is padding
                cf_st[wslot] = jnp.swapaxes(cols, 0, 1)
                cf_wr_dma(q, wslot).start()

            # Final-cell capture for the block containing (lb, lc).
            @pl.when(q == qstar)
            def _():
                cellmask = (jl == jlstar) & (kl == klstar)
                for t in range(NUM_MATRICES):
                    out_ref[t, 0] = jnp.sum(jnp.where(cellmask, new[t], 0))

            return (tuple(new), p1, p2)

        zeros7 = (zero,) * NUM_MATRICES
        jax.lax.fori_loop(1, qqb + 1, body, (zeros7, zeros7, zeros7))

        # Drain outstanding writes so the aliased HBM faces are complete
        # before the next block reads them.
        for dq in range(NWR):
            q_last = qqb - dq
            if q_last > tb:
                srf_wr_dma(q_last, q_last % NWR).wait()
            if q_last > tc:
                cf_wr_dma(q_last, q_last % NWR).wait()

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

    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, s1, s2 = dims
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
            pltpu.VMEM((NRD, 8, wc), jnp.int32),
            pltpu.VMEM((NRD, 8, hb), jnp.int32),
            pltpu.VMEM((NWR, 8, wc), jnp.int32),
            pltpu.VMEM((NWR, 8, hb), jnp.int32),
            pltpu.SemaphoreType.DMA((2, NRD)),
            pltpu.SemaphoreType.DMA((2, NWR)),
        ],
    )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_srf_slabs, s1, 8, wc), jnp.int32),
            jax.ShapeDtypeStruct((n_cf_slabs, s2, 8, hb), jnp.int32),
            jax.ShapeDtypeStruct((8, 1), jnp.int32),
        ),
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


@functools.partial(jax.jit, static_argnames=("dims", "scoring", "interpret"))
def _blocked_core(lens, a_ext, b_arr, c_arr, dims, scoring, interpret):
    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, s1, s2 = dims
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

    srf0 = jnp.zeros((n_kb, s1, 8, wc), jnp.int32)
    cf0 = jnp.zeros((n_jb, s2, 8, hb), jnp.int32)
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
