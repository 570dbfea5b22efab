"""Heterogeneous A-axis chains: many DISTINCT triplets in one fused sweep.

The homogeneous chain (blocked.align_blocked_chain) shares B and C across
the chain; real throughput workloads (BASELINE config 3: 1024 independent
triplets, len 128-512) need per-slot B and C.  Here every chain slot m owns
sequences (A_m, B_m, C_m): the A's concatenate along the global i axis at
pitch d (slot borders i = m*d are zero faces via the i-mod mask), and the
per-step B/C symbol planes are BAND-SELECTS over a VMEM ring of per-slot
planes -- a cell at sweep step q belongs to slot m = (q - jk - 1) div d,
which partitions the (j, k) plane into <= NB contiguous anti-diagonal
bands, so NB-1 threshold compares pick each cell's own B/C plane
(kernels/blocked._block_sweep, hetero mode).  Slot planes rotate through
the ring by DMA from HBM tables one slot pitch ahead of first use.

Each slot's score is captured into a per-block capture plane at the cell
(lb_m, lc_m) one step after its final plane passes; the packer guarantees
distinct final cells per chain so one capture plane per block suffices.

This is the throughput mode the reference could not express: its host FSM
ran one triplet at a time through the PE array
(reference: src/TriAlign_tb.sv:313-333), idling the array through every
ramp; here the ramp (tb + tc planes) amortizes over the whole chain.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trialign.config import PAD_SYMBOL, Scoring
from trialign.kernels import blocked as BK
from trialign.kernels import plane_math as PM

# Cap on simultaneously-active bands (per-step select cost grows with NB);
# the planner pads the chain pitch d up instead of exceeding it.  6 keeps
# the pitch floor at (hb+wc)/5, so mosaic-canvas chains of mid-length A
# stay tightly packed (+2 selects/step vs 4 bands, ~7%).
MAX_BANDS = 6

def chain_pitch(la_max: int, hb: int, wc: int) -> int:
    """Slot pitch d for a chain: >= la_max + 1, padded up so the band
    count stays within MAX_BANDS.  With NB = S // d + 2 (S = hb + wc - 4;
    an interval of S+1 consecutive global-i values can straddle S // d + 1
    slot borders -- floor alignment -- i.e. touch S // d + 2 slots, a +1
    variant was caught mis-selecting by a TPU parity probe at (240, 640),
    d = 470), NB <= MAX_BANDS requires S // d <= MAX_BANDS - 2, i.e.
    d >= S // (MAX_BANDS - 1) + 1."""
    min_d = (hb + wc - 4) // (MAX_BANDS - 1) + 1
    return max(la_max + 1, min_d, BK.DEF_UNB * 4)


def plan_hetero(la_cap: int, lb_max: int, lc_max: int, npack_cap: int,
                hb: int, wc: int, unb: int = BK.DEF_UNB,
                nb: Optional[int] = None) -> Tuple:
    """14-tuple CLASS dims for hetero chains: plan_dims geometry +
    (0, npack_cap, MAX_BANDS).

    The slot pitch d and slot count npack are RUNTIME scalars (SMEM), so
    one compiled kernel serves every chain of a geometry class; la_cap and
    npack_cap only size the static buffers (askew rows, face slabs, B/C
    tables).  The per-step band count is statically MAX_BANDS --
    chain_pitch() pads small-la chains' d up so that always suffices, and
    selects for not-yet-active bands never fire."""
    d_cap = chain_pitch(la_cap, hb, wc)
    tb, tc = hb - 1, wc - 1
    lab = BK._round_up(max(npack_cap * d_cap, 16), 16)
    n_jb = max(1, -(-lb_max // tb))
    n_kb = max(1, -(-lc_max // tc))
    qqb = BK._round_up(lab + tb + tc, unb)
    kdim = BK._round_up(n_kb * tc + wc + 1, 128)
    jdim = BK._round_up(n_jb * tb + hb + 1, 8)
    sr1 = qqb + 2 * unb + 2
    sr2 = qqb + 2 * unb + 2
    return (hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb,
            0, npack_cap, MAX_BANDS if nb is None else nb)


def choose_chain_shape(la_max: int, lb_max: int, lc_max: int,
                       npack: int,
                       ring_planes: int = 1) -> Tuple[int, int, int]:
    """(hb, wc, unb) for a hetero chain.  Prefers single-block geometry
    (hb >= lb+1, single k-block up to wc=640) -- the raised Mosaic VMEM
    limit admits it -- falling back to multi-block for big lb/lc."""
    best = None
    d = la_max + 1
    for wc in (128, 256, 384, 512, 640):
        tc = wc - 1
        n_kb = max(1, -(-lc_max // tc))
        for hb in range(BK._round_up(min(lb_max + 1, 128), 8), 528, 8):
            tb = hb - 1
            n_jb = max(1, -(-lb_max // tb))
            dd_min = (hb + wc - 4) // (MAX_BANDS - 1) + 1
            nb = (hb + wc - 4) // max(d, dd_min) + 2
            nbr = nb + 3
            # 4*unb stack temporaries + 17 state + rings + inputs; past
            # ~55 MB Mosaic silently spills scratch to HBM at ~5x runtime
            # cost (measured), so the budget stays under the cliff.
            # Submatrix mode (ring_planes=3) triples the resident ring and
            # widens the step body.
            vmem = (((3 + ring_planes) * 8 + 17 + (1 + ring_planes) * nbr
                     + 5) * hb * wc
                    + 2 * (hb + 8) * wc) * 4
            if vmem > 50 * 2**20:
                continue
            dd = max(d, dd_min)
            qqb = npack * dd + tb + tc
            eff = {128: 2.0, 256: 1.08}.get(wc, 1.0)
            work = n_jb * n_kb * qqb * (hb * wc * eff + 20000)
            # hetero per-step tax grows with the band count
            work *= 1.0 + 0.05 * (nb - 1)
            if best is None or work < best[0]:
                best = (work, hb, wc, 8)
    if best is None:
        return (BK.DEF_HB, BK.DEF_WC, 8)
    return (best[1], best[2], best[3])


def prep_hetero(triplets, dims, d):
    """Host arrays for a hetero chain dispatch at runtime pitch ``d``.

    Returns (a_ext, b_all, c_all, qcap, cells) where b_all/c_all are
    (npack_cap, jdim/kdim) compact symbol rows (slot planes are built on
    device; rows past the real slot count are sentinel padding), qcap is
    the per-block capture-step table, and cells[p] = (block, jl*, kl*)
    locates slot p's score in the capture planes."""
    hb, wc = dims[0], dims[1]
    lab, n_jb, n_kb = dims[2], dims[3], dims[4]
    kdim, jdim = dims[6], dims[7]
    npack_cap = dims[12]
    tb, tc = hb - 1, wc - 1
    npack = len(triplets)
    assert npack <= npack_cap and npack * d <= lab

    a_ext = np.full(lab + 2, PAD_SYMBOL, dtype=np.int32)
    b_all = np.full((npack_cap, jdim + hb + 8), PAD_SYMBOL - 1, dtype=np.int32)
    c_all = np.full((npack_cap, kdim + wc + 8), PAD_SYMBOL - 2, dtype=np.int32)
    qcap = np.full((n_jb * n_kb, hb, wc), -7, dtype=np.int32)
    cells = []
    seen = set()
    for m, (a, b, c) in enumerate(triplets):
        la, lb, lc = len(a), len(b), len(c)
        assert la <= d - 1
        a_ext[m * d + 1 : m * d + 1 + la] = a
        b_all[m, 1 : lb + 1] = b
        c_all[m, 1 : lc + 1] = c
        jbstar = (lb - 1) // tb
        kbstar = (lc - 1) // tc
        jl = lb - jbstar * tb
        kl = lc - kbstar * tc
        blk = jbstar * n_kb + kbstar
        key = (blk, jl, kl)
        assert key not in seen, "chain packer must keep final cells distinct"
        seen.add(key)
        qcap[blk, jl, kl] = m * d + la + jl + kl
        cells.append((blk, jl, kl))
    return a_ext, b_all, c_all, qcap, cells


def pack_sub_tables(bpt, cpt, scoring, out_shape):
    """Packed 3-plane substitution tables for the hetero ring: broadcast
    the per-slot B/C symbol planes, run plane_math.hetero_sub_planes, and
    stack to ``out_shape[:-2] + (3,) + out_shape[-2:]`` (the per-slot ring
    entry the kernel DMAs whole)."""
    p0, p1, p2, _ = PM.hetero_sub_planes(
        bpt, cpt, scoring.submatrix, jnp.int32, jnp.where
    )
    full = jnp.broadcast_shapes(p0.shape, p1.shape, p2.shape)
    planes = [jnp.broadcast_to(x, full).reshape(out_shape)
              for x in (p0, p1, p2)]
    return jnp.stack(planes, axis=-3)


def _hetero_core_impl(a_ext, b_all, c_all, qcap, d, npack, dims, scoring,
                      interpret, edge=None, askew_override=None,
                      bct_override=None):
    """Device core: build slot-plane tables + askew, run the fused grid
    (or the per-call scan in interpret mode), return capture planes.

    ``d`` and ``npack`` are runtime scalars: one compile per geometry
    class, shared by every chain of the class.  The symbol table is
    BYTE-PACKED per (block, slot): bct[jb*n_kb+kb, s] = B | C << 8, so
    the kernel's band-select ring carries one plane per slot."""
    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    npack_cap = dims[12]
    tb, tc = hb - 1, wc - 1

    if askew_override is not None:
        askew = askew_override  # (NJB, qqb + hb + unb, wc) tiled bands
    else:
        askew = BK._build_askew_blocked(a_ext, qqb, hb, wc, unb)[None]
    if bct_override is not None:
        bct = bct_override
    else:
        # Per-(block row, slot) B windows / per-(block col, slot) C
        # windows, packed into per-(block, slot) planes.
        j0s = jnp.arange(n_jb, dtype=jnp.int32) * tb
        k0s = jnp.arange(n_kb, dtype=jnp.int32) * tc
        bwin = b_all[:, j0s[:, None] + jnp.arange(hb, dtype=jnp.int32)[None, :]]
        cwin = c_all[:, k0s[:, None] + jnp.arange(wc, dtype=jnp.int32)[None, :]]
        bpt = jnp.swapaxes(bwin, 0, 1)[:, None, :, :, None]  # (njb,1,s,hb,1)
        cpt = jnp.swapaxes(cwin, 0, 1)[None, :, :, None, :]  # (1,nkb,s,1,wc)
        if scoring.submatrix is None:
            bct = (bpt | (cpt << 8)).reshape(n_jb * n_kb, npack_cap, hb, wc)
        else:
            bct = pack_sub_tables(bpt, cpt, scoring,
                                  (n_jb * n_kb, npack_cap, hb, wc))
    zeros = jnp.zeros((hb, wc), jnp.int32)
    jgrid = jnp.arange(hb, dtype=jnp.int32)[:, None]
    kgrid = jnp.arange(wc, dtype=jnp.int32)[None, :]
    jkmod = jnp.remainder(jgrid + kgrid, d)[None].astype(jnp.int32)
    if edge is None:
        edge = (((jgrid >= 1) & (kgrid >= 1)).astype(jnp.int32))[None]
    srf0 = jnp.zeros((n_kb, 8 * sr1, wc), jnp.int32)
    cf0 = jnp.zeros((n_jb, 8 * sr2, BK._round_up(hb, 128)), jnp.int32)

    n_blocks = n_jb * n_kb
    idx = jnp.arange(n_blocks, dtype=jnp.int32)
    jbs, kbs = idx // n_kb, idx % n_kb
    scal_tab = jnp.stack(
        [jnp.full_like(idx, d), jbs * tb, kbs * tc, jbs, kbs,
         jnp.full_like(idx, npack), jnp.full_like(idx, -1),
         jnp.full_like(idx, -1)],
        axis=1,
    ).astype(jnp.int32)[:, None, :]

    if not interpret:
        call = BK.make_hetero_grid_call(dims, scoring, interpret)
        _, _, caps = call(scal_tab, askew, qcap, jkmod, edge, zeros, srf0,
                          cf0, bct)
        return caps

    # Interpret fallback: per-block calls scanned (grid io-aliasing is not
    # threaded across steps in interpret mode).
    call = BK.make_hetero_block_call(dims, scoring, interpret)
    caps0 = jnp.zeros((n_blocks, hb, wc), jnp.int32)

    def body(carry, i):
        srf, cf, caps = carry
        jb = i // n_kb
        kb = i % n_kb
        scal = jnp.stack(
            [jnp.int32(d), jb * tb, kb * tc, jb, kb,
             jnp.int32(npack), jnp.int32(-1), jnp.int32(-1)]
        ).astype(jnp.int32)
        qcap_i = jax.lax.dynamic_slice(qcap, (i, 0, 0), (1, hb, wc))
        srf, cf, cap = call(scal, askew, qcap_i, jkmod, edge, zeros, srf, cf,
                            bct)
        caps = jax.lax.dynamic_update_slice(caps, cap, (i, 0, 0))
        return (srf, cf, caps), None

    (_, _, caps), _ = jax.lax.scan(
        body, (srf0, cf0, caps0), jnp.arange(n_blocks, dtype=jnp.int32)
    )
    return caps


_hetero_core = jax.jit(
    _hetero_core_impl, static_argnames=("dims", "scoring", "interpret")
)


def align_chain(
    triplets: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    scoring: Scoring = Scoring(),
    interpret: Optional[bool] = None,
    block_shape: Optional[Tuple[int, int, int]] = None,
) -> List[int]:
    """Score a chain of distinct triplets in one fused sweep.

    Constraint (packer-enforced; asserted): the (lb, lc) pairs must map to
    distinct final cells per block.  Use align_batch_chained for arbitrary
    batches -- it buckets, packs and dispatches chains automatically."""
    if scoring.submatrix is not None and not PM.hetero_sub_ok(
            scoring.submatrix):
        raise ValueError(
            "hetero submatrix needs <= 4 symbols with byte-range entries: "
            "use api.align_batch (it routes such batches through the "
            "padded/bucketed path)")
    triplets = [tuple(np.asarray(s) for s in t) for t in triplets]
    if not triplets:
        return []
    assert all(min(map(len, t)) > 0 for t in triplets)
    la_max = max(len(t[0]) for t in triplets)
    lb_max = max(len(t[1]) for t in triplets)
    lc_max = max(len(t[2]) for t in triplets)
    npack = len(triplets)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if block_shape is None:
        block_shape = choose_chain_shape(
            la_max, lb_max, lc_max, npack,
            ring_planes=1 if scoring.submatrix is None else 3,
        )
    dims = plan_hetero(la_max, lb_max, lc_max, npack, *block_shape)
    d = chain_pitch(la_max, dims[0], dims[1])
    a_ext, b_all, c_all, qcap, cells = prep_hetero(triplets, dims, d)
    caps = _hetero_core(
        jnp.asarray(a_ext), jnp.asarray(b_all), jnp.asarray(c_all),
        jnp.asarray(qcap), jnp.int32(d), jnp.int32(npack),
        dims, scoring, interpret,
    )
    blks = jnp.asarray([c[0] for c in cells])
    jls = jnp.asarray([c[1] for c in cells])
    kls = jnp.asarray([c[2] for c in cells])
    scores = jax.device_get(caps[blks, jls, kls])
    return [int(s) for s in scores]


def pack_chains(triplets_idx, max_p: int = 32):
    """Greedy packer: split an indexed class of triplets into chains.

    ``triplets_idx`` = [(orig_index, (a, b, c)), ...] sharing one geometry
    class.  Slots are filled largest-|A|-first so chain pitches (max |A|
    in chain + 1) stay tight; a problem whose final cell collides with one
    already in the open chain starts/joins another chain.  Returns a list
    of chains, each [(orig_index, triplet), ...] with <= max_p slots."""
    order = sorted(triplets_idx, key=lambda it: -len(it[1][0]))
    chains: List[List] = []
    cellsets: List[set] = []
    for item in order:
        _, (a, b, c) = item
        cell = (len(b), len(c))
        for ci in range(len(chains)):
            if len(chains[ci]) < max_p and cell not in cellsets[ci]:
                chains[ci].append(item)
                cellsets[ci].add(cell)
                break
        else:
            chains.append([item])
            cellsets.append({cell})
    return chains


def _class_key(t) -> Tuple[int, int]:
    """Geometry class: (lb, lc) rounded up so one class shares (hb, wc)."""
    lb, lc = len(t[1]), len(t[2])
    return (BK._round_up(lb + 1, 64), BK._round_up(max(lc + 1, 128), 128))


def align_batch_chained(
    triplets: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    scoring: Scoring = Scoring(),
    max_p: int = 32,
) -> List[int]:
    """Batch scoring through hetero chains: bucket by geometry class, pack
    each class into A-axis chains, one fused-kernel dispatch per chain.

    The BASELINE config-3 workload (1024 triplets, len 128-512) runs here.
    Dispatches are queued asynchronously (device_get at the end) so host
    prep overlaps device compute.  Returns scores in input order."""
    triplets = [tuple(np.asarray(s) for s in t) for t in triplets]
    out = [0] * len(triplets)
    classes = {}
    for i, t in enumerate(triplets):
        if min(map(len, t)) == 0:
            continue  # zero-border face holds the final cell
        if len(t[1]) > 519 or len(t[2]) > 639:
            # beyond single-dispatch hetero geometry: blocked fallback
            from trialign.kernels.blocked import align_blocked

            out[i] = align_blocked(t[0], t[1], t[2], scoring)
            continue
        classes.setdefault(_class_key(t), []).append((i, t))

    interpret = jax.default_backend() != "tpu"
    pending = []
    for key, items in classes.items():
        chains = pack_chains(items, max_p=max_p)
        lb_max = max(len(t[1]) for _, t in items)
        lc_max = max(len(t[2]) for _, t in items)
        la_cap = max(len(t[0]) for _, t in items)
        # ONE compile per class: static dims sized for the class ceiling
        # (la_cap, max_p); each chain passes its runtime (d, npack).
        shape = choose_chain_shape(
            la_cap, lb_max, lc_max, max_p,
            ring_planes=1 if scoring.submatrix is None else 3,
        )
        dims = plan_hetero(la_cap, lb_max, lc_max, max_p, *shape)
        for chain in chains:
            la_max = max(len(t[0]) for _, t in chain)
            d = chain_pitch(la_max, dims[0], dims[1])
            a_ext, b_all, c_all, qcap, cells = prep_hetero(
                [t for _, t in chain], dims, d
            )
            caps = _hetero_core(
                jnp.asarray(a_ext), jnp.asarray(b_all), jnp.asarray(c_all),
                jnp.asarray(qcap), jnp.int32(d), jnp.int32(len(chain)),
                dims, scoring, interpret,
            )
            blks = jnp.asarray([c[0] for c in cells])
            jls = jnp.asarray([c[1] for c in cells])
            kls = jnp.asarray([c[2] for c in cells])
            pending.append((chain, caps[blks, jls, kls]))
    for chain, scores_dev in pending:
        for (i, _), s in zip(chain, jax.device_get(scores_dev)):
            out[i] = int(s)
    return out
