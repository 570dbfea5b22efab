"""Mosaic packing: a 2D tiling of MANY independent problem chains into ONE
universal plane geometry, swept by a single compiled kernel.

The hetero chain (kernels/chain.py) multiplexes problems along the A axis;
its per-(lb, lc) geometry classes still cost one compile each and leave
lanes/rows idle for small problems.  Mosaic packing removes both: the
plane is one universal (HB, WC) tile canvas (sized by the VMEM spill
cliff; see the constants below) whose rows split into static ASKEW
J-BANDS (the BANDS tuple) -- each band reads its symbols
from its own Hankel array, so vertically stacked tiles carry different A
chains (kernels/blocked._block_sweep multi-band windows).  A TILE is a
(band-run x lane-range) rectangle hosting its own chain of up to npack
problems; tile borders are zero faces via the runtime edge-mask plane,
captures land in the per-cell qcap plane, and per-slot B/C planes carry
every tile's sequences at once (the band ring machinery is tile-agnostic).

One kernel compile serves EVERY batch; a dispatch carries up to
NT_MAX x npack problems.  This is the full generalization of the
reference's single-problem PE array into a spatially+temporally shared
systolic fabric (reference: pic/Architecture.png; its host FSM ran one
triplet at a time, src/TriAlign_tb.sv:313-333).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trialign.config import PAD_SYMBOL, Scoring
from trialign.kernels import blocked as BK
from trialign.kernels import chain as CH

# 64 slots for the tall-problem hetero classes (round-4): with the sop
# rotation HALF the mixed 128-512 batch routes tall (mid > 326), making
# the tall classes ~60% of device time (probe_packab: canvas 0.846 s of
# a 2.54 s batch); deeper chains halve the per-chain ramp + dispatch
# count the same way canvas P_CAP=64 measured +7.5% end-to-end.
CH_P_CAP = 64
# Hetero class geometries for beyond-canvas problems.  Each stays under
# the ~51 MB fast-VMEM working set (the chip silently spills past ~55 MB
# at ~5x runtime cost); chains here have la >= mid-length > canvas rows,
# so 4 bands always suffice (S // la_floor + 2).
TALL_SHAPES = (
    (456, 384, 8),   # mid <= 455, min <= 382
    (520, 256, 8),   # mid <= 519, min <= 254
)

# Universal canvas: 328 rows = 3 askew bands, 512 lanes.  Bigger
# canvases blow the scoped-VMEM working set past what the chip runs at
# full speed (~80 MB measured at (520,512) runs ~5x slow -- silent HBM
# spill).  Problems too tall for the canvas go through the tall hetero
# chain classes instead.  UNB=16 (round-4 probe_canvas16: +16.8% over
# unb=8 AND a 5x faster cold compile, 55.7 s vs 279.4 s; VMEM model
# (2*16 + 17 + 2*9 + 5) = 72 resident planes x 168k x 4 B ~= 48 MB,
# under the ~55 MB cliff).  The TALL classes stay unb=8: probe_tall5
# measured 2cls@unb16 -2.3% and a 5-class split -7.9% at the batch
# level -- both measured-negative, do not flip without new evidence.
HB, WC = 328, 512
BANDS = (136, 128, 64)
NT_MAX = 16  # tiles per dispatch
# 64 chain slots per tile (round-4): the uniform 128-512 workload's
# canvas problems are too big to stack >2 tiles in 512 lanes, so deeper
# tiles are the way to more problems per dispatch -- modeled -12% canvas
# time at 64 together with the lb-bucketed/la-ordered packing (5
# dispatches instead of 9 on the bench workload); 96 modeled NEGATIVE
# (sweep length outgrows the amortization).
P_CAP = 64  # chain slots per tile
UNB = 16



@dataclasses.dataclass(frozen=True)
class CanvasGeometry:
    """One mosaic canvas configuration, passed explicitly through the
    packer/planner/prep/batch stack (round-3 VERDICT item 8: geometry is
    a parameter, not mutable module state, so a shrunk test canvas and
    the production canvas can coexist and the production constants stay
    CI-testable).  The module-level UPPERCASE constants above define the
    production instance (current_geometry()); test_canvas() builds a
    small one."""

    hb: int = HB
    wc: int = WC
    bands: Tuple[int, ...] = BANDS
    nt_max: int = NT_MAX
    p_cap: int = P_CAP
    unb: int = UNB
    ch_p_cap: int = CH_P_CAP
    tall_shapes: Tuple = TALL_SHAPES

    @property
    def boff(self) -> Tuple[int, ...]:
        return tuple(int(np.sum(self.bands[:i]))
                     for i in range(len(self.bands)))

    @property
    def runs(self):
        """Valid tile row-runs: contiguous band runs (b0, b1, j0, height)."""
        boff = self.boff
        out = []
        for b0 in range(len(self.bands)):
            for b1 in range(b0, len(self.bands)):
                out.append((b0, b1, boff[b0],
                            int(sum(self.bands[b0:b1 + 1]))))
        return out


def submatrix_geometry() -> CanvasGeometry:
    """Default geometry for runtime-submatrix batches: the hetero ring
    carries THREE packed score planes per slot (hetero_sub_planes), so
    the resident working set grows by ~2 ring planes per slot and the
    production canvas would cross the ~55 MB silent-spill cliff.  This
    variant narrows the canvas to <=384 lanes at unb=8 and drops the
    tall classes to <=256 lanes -- conservative until a TPU probe pins
    the submatrix kernels' real spill point.  Derived from the current
    (possibly test-shrunk) geometry so test_canvas() contexts compose."""
    g = current_geometry()
    return dataclasses.replace(
        g,
        wc=min(g.wc, 384),
        unb=min(g.unb, 8),
        tall_shapes=tuple((th, min(tw, 256), tu)
                          for th, tw, tu in g.tall_shapes),
    )


def current_geometry() -> CanvasGeometry:
    """The module-default geometry (production constants unless a
    test_canvas() context is active)."""
    return CanvasGeometry(hb=HB, wc=WC, bands=BANDS, nt_max=NT_MAX,
                          p_cap=P_CAP, unb=UNB, ch_p_cap=CH_P_CAP,
                          tall_shapes=TALL_SHAPES)


def test_canvas(hb: int = 48, wc: int = 128, bands: Tuple = (24, 24),
                p_cap: int = 4, nt_max: int = 6, ch_p_cap: int = 4,
                tall: Tuple = ((80, 128, 8),)):
    """Context manager: shrink the module-DEFAULT canvas so interpret-mode
    tests and multi-chip dryruns run in seconds (the tiling/band
    machinery is identical to the production canvas); restores the real
    geometry on exit.  Prefer passing ``geom=CanvasGeometry(...)`` to
    align_batch_mosaic directly -- this context exists for call sites
    that cannot thread a parameter (CLI, dryrun)."""
    import contextlib

    @contextlib.contextmanager
    def _cm():
        g = globals()
        saved = {k: g[k] for k in ("HB", "WC", "BANDS",
                                   "P_CAP", "NT_MAX", "CH_P_CAP",
                                   "TALL_SHAPES")}
        g.update(HB=hb, WC=wc, BANDS=bands,
                 P_CAP=p_cap, NT_MAX=nt_max, CH_P_CAP=ch_p_cap,
                 TALL_SHAPES=tall)
        try:
            yield
        finally:
            g.update(saved)

    return _cm()


def plan_mosaic(la_cap: int, npack_cap: Optional[int] = None,
                geom: Optional[CanvasGeometry] = None,
                nb: Optional[int] = None) -> Tuple:
    """15-tuple dims for the universal mosaic canvas (single block, no
    faces): chain.plan_hetero geometry extended with the askew band
    heights.

    ``nb`` overrides the static band-select count (default MAX_BANDS):
    a dispatch whose runtime pitch d satisfies S // d + 2 <= nb only
    ever spans nb chain slots per plane, so compiling its kernel at
    that nb drops 2 dead plane-ops per skipped band per step (round-5:
    every canvas dispatch of the uniform 128-512 bench workload has
    d >= 393, i.e. nb = 4 -- 4 ops below the MAX_BANDS=6 kernel)."""
    g = geom or current_geometry()
    if npack_cap is None:
        npack_cap = g.p_cap
    dims = CH.plan_hetero(la_cap, g.hb - 1, g.wc - 1, npack_cap, g.hb,
                          g.wc, g.unb, nb=nb)
    return dims + (g.bands,)


def _nb_for_pitch(d: int, hb: int, wc: int) -> int:
    """Static band count that covers a chain of pitch ``d`` on an
    (hb, wc) plane: S // d + 2 (chain_pitch's bound), capped at
    MAX_BANDS."""
    return min(CH.MAX_BANDS, (hb + wc - 4) // d + 2)


class Tile:
    """One tile: rows [j0, j0+th) x lanes [k0, k0+tw), bands [b0, b1]."""

    def __init__(self, b0, b1, j0, th, k0, tw):
        self.b0, self.b1, self.j0, self.th, self.k0, self.tw = (
            b0, b1, j0, th, k0, tw
        )
        self.problems: List = []  # [(orig_idx, (a, b, c)), ...]
        self.cells = set()  # (lb, lc) final cells used

    def fits(self, lb, lc):
        return lb + 1 < self.th and lc + 1 < self.tw + 1 and (
            (lb, lc) not in self.cells
        )


def _rotate(t, sop: bool):
    """Axis assignment: A = longest (chains along i love long A), then B =
    longer of the rest.  sop scoring is fully permutation-symmetric;
    rtl-mode s3 (3 if a==b==c, 0 if a==b!=c, -3 if a!=b) is only A<->B
    symmetric (measured: A<->C / B<->C swaps change scores on ~40% of
    random triplets), so rtl may only put the longer of (a, b) on A."""
    a, b, c = t
    if sop:
        seqs = sorted((a, b, c), key=len, reverse=True)
        return seqs[0], seqs[1], seqs[2]
    if len(b) > len(a):
        return b, a, c
    return t


# Modeled fixed cost of opening one more dispatch, in plane-equivalents:
# the static sweep's skipped macros (~2157 macros x 32.5 us at canvas
# geometry against ~9.2 us of compute per active UNB-plane) plus dispatch
# latency.  Drives the packer's open-vs-squeeze decision only; measured
# wall time is what bench reports.
DISPATCH_PENALTY_PLANES = 8000


def _marginal_planes(disp, meta, la, has_slot):
    """Added active sweep planes if a problem with |A| = la joins ``disp``.

    meta = [d (current max pitch), npack (current max tile count)].  The
    sweep length is npack * d: a problem rides free unless it raises the
    pitch (bigger la) or the max slot count (joining a fullest tile /
    fresh tile when every other tile is at the max)."""
    d_new = max(meta[0], la + 1)
    np_new = meta[1] + (0 if has_slot else 1)
    return np_new * d_new - meta[1] * meta[0]


def pack_mosaic(problems, npack_cap: Optional[int] = None,
                geom: Optional[CanvasGeometry] = None,
                order_key=None, tw_quant: Optional[Sequence[int]] = None):
    """Cost-driven shelf packer: problems -> dispatches of <= nt_max tiles.

    ``problems`` = [(orig_idx, (a, b, c)), ...] already rotated.  Each
    problem goes where it adds the fewest
    modeled sweep planes (a dispatch costs npack * d planes with runtime
    pitch d = max |A| + 1, so a problem rides free in a dispatch whose
    pitch already covers it and whose fullest tile it avoids), with
    DISPATCH_PENALTY_PLANES charged for opening a new dispatch.  This
    keeps pitches tight (uniform 128-512 batches waste ~20% of planes
    when every dispatch pays the batch-max pitch) AND dispatches few.
    Problems arrive in coarse tallest-|B| buckets (96 rows) with |A|
    DESCENDING inside each bucket: the buckets keep big tiles shelving
    before small ones, and the |A| ordering groups similar pitches into
    the same dispatches (the sweep pays npack * d with d = max |A| + 1,
    so mixed |A| wastes (d - la - 1) planes per slot).  Under the
    production sop rotation C is the SHORTEST sequence, so tiles are
    naturally narrow and pair side-by-side without further help:
    probe_packab (round 4, v5e) measured this order at 0.846 s summed
    canvas device time / 5 dispatches on the 1024-triplet bench workload
    vs 1.032 s / 6 for a widest-|C|-bucket + {wc/2, wc} width-quantized
    variant -- the variant only helps rtl-rotated (wide-|C|) workloads,
    which the bench does not exercise.  Tiles open on demand with the
    smallest band-run that fits, stacked k-shelf by k-shelf.

    ``order_key`` / ``tw_quant`` override the placement order and the
    tile lane-width quantization grid (width snap-up) for A/B modeling
    (experiments/model_fill2.py, probe_packab.py); production uses the
    defaults above."""
    g = geom or current_geometry()
    if npack_cap is None:
        npack_cap = g.p_cap
    runs_sorted = sorted(g.runs, key=lambda r: (r[3], r[0]))
    if order_key is None:
        order_key = lambda it: (-(len(it[1][1]) // 96),  # noqa: E731
                                -len(it[1][0]),
                                -len(it[1][1]))
    order = sorted(problems, key=order_key)
    dispatches: List[List[Tile]] = []
    metas: List[List[int]] = []  # [d, npack_max] per dispatch

    def open_tile(disp, lb, lc):
        # smallest run covering lb+1 rows, preferring later (smaller) bands
        for b0, b1, j0, h in runs_sorted:
            if h >= lb + 2:
                run = (b0, b1, j0, h)
                break
        else:
            return None
        b0, b1, j0, h = run
        tw = min(lc + 2, g.wc)
        if tw_quant:  # empty sequence = no quantization (A/B hook)
            # snap the tile width UP to the quantization grid so narrow
            # problems leave aligned lane room for a side-by-side tile
            tw = min((q for q in tw_quant if q >= tw), default=g.wc)
        # place at the first k where bands b0..b1 are all free for tw lanes
        taken = sorted(
            (t.k0, t.k0 + t.tw)
            for t in disp
            if not (t.b1 < b0 or t.b0 > b1)
        )
        k = 0
        for lo, hi in taken:
            if k + tw <= lo:
                break
            k = max(k, hi)
        if k + tw > g.wc:
            return None
        tile = Tile(b0, b1, j0, h, k, tw)
        disp.append(tile)
        return tile

    def can_open_tile(disp, lb, lc):
        if len(disp) >= g.nt_max:
            return False
        probe: List[Tile] = list(disp)
        t = open_tile(probe, lb, lc)
        if t is not None:
            probe.remove(t)  # dry run only
            return True
        return False

    for item in order:
        _, (a, b, c) = item
        la, lb, lc = len(a), len(b), len(c)
        # Candidate placements: (marginal planes, disp index, tile|None).
        best = None
        for di, disp in enumerate(dispatches):
            cands = [
                t for t in disp
                if t.fits(lb, lc) and len(t.problems) < npack_cap
            ]
            if cands:
                # The EMPTIEST fitting tile balances occupancy: the sweep
                # length is set by the fullest tile, so unbalanced fills
                # leave late tiles idle (first-fit measured ~12% slot
                # utilization on mixed batches).
                t = min(cands, key=lambda t: len(t.problems))
                has_slot = len(t.problems) + 1 <= metas[di][1]
                dc = _marginal_planes(disp, metas[di], la, has_slot)
                if best is None or dc < best[0]:
                    best = (dc, di, t)
            elif can_open_tile(disp, lb, lc):
                dc = _marginal_planes(disp, metas[di], la, False)
                if best is None or dc < best[0]:
                    best = (dc, di, None)
        open_cost = DISPATCH_PENALTY_PLANES + (la + 1) + g.hb + g.wc
        if best is None or best[0] > open_cost:
            disp = []
            t = open_tile(disp, lb, lc)
            assert t is not None, (lb, lc)
            dispatches.append(disp)
            metas.append([la + 1, 1])
            t.problems.append(item)
            t.cells.add((lb, lc))
            continue
        _, di, t = best
        disp = dispatches[di]
        if t is None:
            t = open_tile(disp, lb, lc)
            assert t is not None, (lb, lc)
        t.problems.append(item)
        t.cells.add((lb, lc))
        metas[di][0] = max(metas[di][0], la + 1)
        metas[di][1] = max(metas[di][1], len(t.problems))
    return dispatches


def prep_mosaic(disp: List[Tile], dims, d,
                geom: Optional[CanvasGeometry] = None):
    """Host arrays for one mosaic dispatch.

    Returns (a_cols, colmask, bpos, cpos, qcap, edge, layout, cells) where
    a_cols is (nt_max, lab+2) per-tile A-chain vectors, colmask
    (len(bands), nt_max, wc) band-ownership column masks, bpos/cpos the
    per-(slot, tile) B/C symbol rows positioned at the tile offsets, qcap
    and edge the capture/border planes, and cells[i] = (0, j, k) score
    locations aligned with the flattened problem list."""
    g = geom or current_geometry()
    lab = dims[2]
    npack_cap = dims[12]
    a_cols = np.full((g.nt_max, lab + 2), PAD_SYMBOL, np.int32)
    colmask = np.zeros((len(g.bands), g.nt_max, g.wc), np.int32)
    bpos = np.full((npack_cap, g.nt_max, g.hb), PAD_SYMBOL - 1, np.int32)
    cpos = np.full((npack_cap, g.nt_max, g.wc), PAD_SYMBOL - 2, np.int32)
    qcap = np.full((1, g.hb, g.wc), -7, np.int32)
    edge = np.zeros((1, g.hb, g.wc), np.int32)
    layout = np.zeros((g.nt_max, 4), np.int32)  # j0, th, k0, tw
    cells = []
    flat = []
    for ti, tile in enumerate(disp):
        layout[ti] = (tile.j0, tile.th, tile.k0, tile.tw)
        for b in range(tile.b0, tile.b1 + 1):
            colmask[b, ti, tile.k0 : tile.k0 + tile.tw] = 1
        # interior cells (local jl, kl >= 1) are live
        edge[0, tile.j0 + 1 : tile.j0 + tile.th,
             tile.k0 + 1 : tile.k0 + tile.tw] = 1
        for m, (oi, (a, b_, c_)) in enumerate(tile.problems):
            la, lb, lc = len(a), len(b_), len(c_)
            assert la <= d - 1 and lb + 1 <= tile.th and lc + 1 <= tile.tw
            a_cols[ti, m * d + 1 : m * d + 1 + la] = a
            bpos[m, ti, tile.j0 + 1 : tile.j0 + 1 + lb] = b_
            cpos[m, ti, tile.k0 + 1 : tile.k0 + 1 + lc] = c_
            jstar, kstar = tile.j0 + lb, tile.k0 + lc
            qcap[0, jstar, kstar] = m * d + la + jstar + kstar
            cells.append((0, jstar, kstar))
            flat.append(oi)
    return (a_cols, colmask, bpos, cpos, qcap, edge, layout, cells, flat)


def _mosaic_core_impl(a_cols, colmask, bpos, cpos, qcap, edge, layout, d,
                      npack, dims, scoring, interpret):
    """Device core: per-band composite Hankels (tile A-chains merged in
    compact space, one shear per band), per-slot B/C planes assembled by
    one-hot tile contractions, then the shared hetero kernel.

    The merges run in COMPACT space before any big array exists: a
    per-tile Hankel is rows x (rows + wc) and rows reaches ~17k at canvas
    geometry, so the previous 16-Hankel + per-band select design staged
    ~20 GB of intermediates per dispatch; the one-hot contractions touch
    ~16 MB and each band shears one (wc, rows + wc) array (~35 MB)."""
    from trialign.kernels.wavefront import shear_rows

    hb, wc, lab = dims[0], dims[1], dims[2]
    qqb, unb = dims[5], dims[10]
    npack_cap = dims[12]
    nbands = len(dims[14])
    nt = colmask.shape[1]
    hi = jax.lax.Precision.HIGHEST

    rows = qqb + hb + unb
    # Flipped/padded per-tile A vectors (build_askew's v/vp, batched):
    # vp[t, m] = a_cols[t, qqb - m] for m <= qqb else PAD.
    L = qqb + 1
    M = rows + wc
    ar = jnp.concatenate(
        [a_cols,
         jnp.full((nt, L - a_cols.shape[1]), PAD_SYMBOL, a_cols.dtype)],
        axis=1,
    )
    vp = jnp.concatenate(
        [jnp.flip(ar, 1),
         jnp.full((nt, M - L), PAD_SYMBOL, a_cols.dtype)],
        axis=1,
    ).astype(jnp.float32)
    askew = []
    for b in range(nbands):
        # One-hot column->tile contraction (exact: each column is owned
        # by at most one tile, so every sum has a single nonzero term).
        oh = colmask[b].astype(jnp.float32)  # (nt, wc)
        w = jnp.einsum("tk,tm->km", oh, vp, precision=hi)
        own = jnp.sum(oh, axis=0)
        w = jnp.where(own[:, None] > 0, w, jnp.float32(PAD_SYMBOL))
        askew.append(shear_rows(w.astype(jnp.int32), rows, PAD_SYMBOL).T)
    askew = jnp.stack(askew)

    # Per-slot B/C planes from tile rectangles, as one-hot row/col
    # contractions over the tile axis (cells outside every tile get the
    # sentinels; tile rectangles are disjoint so sums are single-term).
    jg = jnp.arange(hb, dtype=jnp.int32)[:, None]
    kg = jnp.arange(wc, dtype=jnp.int32)[None, :]
    j0, th, k0, tw = (layout[:, i] for i in range(4))
    rowm = ((jg.T >= j0[:, None]) & (jg.T < (j0 + th)[:, None])).astype(
        jnp.float32
    )  # (nt, hb)
    colm = ((kg >= k0[:, None]) & (kg < (k0 + tw)[:, None])).astype(
        jnp.float32
    )  # (nt, wc)
    owned = jnp.einsum("tj,tk->jk", rowm, colm, precision=hi) > 0
    bpt = jnp.einsum(
        "mtj,tk->mjk", bpos.astype(jnp.float32) * rowm[None], colm,
        precision=hi,
    ).astype(jnp.int32)
    cpt = jnp.einsum(
        "mtk,tj->mjk", cpos.astype(jnp.float32) * colm[None], rowm,
        precision=hi,
    ).astype(jnp.int32)
    bpt = jnp.where(owned[None], bpt, jnp.int32(PAD_SYMBOL - 1))
    cpt = jnp.where(owned[None], cpt, jnp.int32(PAD_SYMBOL - 2))

    if scoring.submatrix is None:
        bct = (bpt | (cpt << 8))[None]
    else:
        bct = CH.pack_sub_tables(bpt, cpt, scoring,
                                 (1, npack_cap, hb, wc))
    return CH._hetero_core(
        jnp.zeros((lab + 2,), jnp.int32), jnp.zeros((npack_cap, 1), jnp.int32),
        jnp.zeros((npack_cap, 1), jnp.int32), qcap, d, npack, dims, scoring,
        interpret, edge=edge,
        askew_override=askew, bct_override=bct,
    )


_mosaic_core = jax.jit(
    _mosaic_core_impl, static_argnames=("dims", "scoring", "interpret")
)


def _snake_perm(costs, ndata):
    """Permutation laying jobs (padded to a multiple of ``ndata``) into
    contiguous per-device chunks with snake-balanced cost: shard_map hands
    each device a contiguous block, and the fleet's wall time is the
    slowest device."""
    order = sorted(range(len(costs)), key=lambda i: -costs[i])
    chunks = [[] for _ in range(ndata)]
    for r, i in enumerate(order):
        dev = r % ndata if (r // ndata) % 2 == 0 else ndata - 1 - r % ndata
        chunks[dev].append(i)
    return [i for ch in chunks for i in ch]


@functools.lru_cache(maxsize=None)
def _sharded_chain_fn(dims, scoring, interpret, mesh):
    """Compiled data-parallel hetero-chain executor: stacked (K, ...)
    chain inputs of ONE geometry class shard across the mesh 'data'
    axis, each device lax.map-ing its chunk (d and npack are runtime
    scalars, so every chain of the class shares the compile)."""
    from jax.sharding import PartitionSpec as P

    def per_device(a_ext, b_all, c_all, qcap, d, npack):
        def one(args):
            return CH._hetero_core_impl(*args, dims=dims, scoring=scoring,
                                        interpret=interpret)

        return jax.lax.map(one, (a_ext, b_all, c_all, qcap, d, npack))

    spec = P("data")
    return jax.jit(jax.shard_map(
        per_device, mesh=mesh, in_specs=(spec,) * 6, out_specs=spec,
        check_vma=False,
    ))


@functools.lru_cache(maxsize=None)
def _sharded_blocked_fn(dims, scoring, interpret, mesh):
    """Compiled data-parallel blocked-residue executor: all residue
    problems share one ``plan_lens``-capped geometry, so their (K, ...)
    host arrays shard across the mesh 'data' axis and each device
    lax.maps its chunk, returning one score per problem."""
    from jax.sharding import PartitionSpec as P

    from trialign.config import NUM_MATRICES
    from trialign.kernels import blocked as BKm

    def per_device(lens, a_ext, b_arr, c_arr):
        def one(args):
            res = BKm._blocked_core_impl(*args, dims=dims, scoring=scoring,
                                         interpret=interpret)
            return res[:NUM_MATRICES, 0].max()

        return jax.lax.map(one, (lens, a_ext, b_arr, c_arr))

    spec = P("data")
    return jax.jit(jax.shard_map(
        per_device, mesh=mesh, in_specs=(spec,) * 4, out_specs=spec,
        check_vma=False,
    ))


@functools.lru_cache(maxsize=None)
def _sharded_canvas_fn(dims, scoring, interpret, mesh, nloc):
    """Compiled data-parallel canvas executor: the stacked (K, ...)
    dispatch arrays shard across the mesh 'data' axis; every device runs
    its ``nloc`` dispatches sequentially (lax.map) through the SAME
    kernel -- all canvas dispatches share one static geometry, d and
    npack being runtime scalars, so the whole fleet is one compile.
    This is the multi-chip form of the mixed batch: N devices = N
    reference accelerators each running a packed canvas stream."""
    from jax.sharding import PartitionSpec as P

    def per_device(a_cols, colmask, bpos, cpos, qcap, edge, layout, d, npack):
        def one(args):
            return _mosaic_core_impl(*args, dims=dims, scoring=scoring,
                                     interpret=interpret)

        return jax.lax.map(
            one, (a_cols, colmask, bpos, cpos, qcap, edge, layout, d, npack)
        )

    spec = P("data")
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # info, which trips shard_map's default VMA validation.
    return jax.jit(jax.shard_map(
        per_device, mesh=mesh, in_specs=(spec,) * 9, out_specs=spec,
        check_vma=False,
    ))


def _route_residue(residue, force=None, geom=None, ring_planes=1):
    """Route the tall residue (problems fitting no tall class):
    returns (blocked_items, (dims, chains) | None).

    Near-cubic big problems either run as per-problem blocked sweeps (a
    full tb+tc ramp each, one shared plan_lens geometry) or fuse into a
    DYNAMIC hetero-chain class (ramp amortized across the chain, band-
    select tax per step).  Modeled swept lane-slots decide: chains win
    once a few problems amortize the ramp (the BASELINE mixed-1024
    workload's 84-problem residue models ~681 ms blocked vs ~550 ms
    chained at the measured ~29.5 G lane-slots/s), blocked wins for
    singletons.  ``force`` ("blocked" | "chain") overrides the model --
    for A/B measurement and fleet-coverage tests."""
    g = geom or current_geometry()
    if force == "blocked":
        return residue, None
    caps = tuple(max(len(rt[ax]) for _, rt in residue) for ax in range(3))
    shape = CH.choose_chain_shape(caps[0], caps[1], caps[2], g.ch_p_cap,
                                  ring_planes=ring_planes)
    dims_r = CH.plan_hetero(caps[0], caps[1], caps[2], g.ch_p_cap, *shape)
    hb_r, wc_r = dims_r[0], dims_r[1]
    njb_r, nkb_r, qqb_r = dims_r[3], dims_r[4], dims_r[5]
    chains = CH.pack_chains(residue, max_p=g.ch_p_cap)
    # Static band count: the residue's near-cubic problems have large
    # pitches, so the class usually spans far fewer than MAX_BANDS
    # slots per plane -- compile at the chains' actual requirement
    # (2 plane-ops saved per dead band per step, round 5).
    nb_r = max(_nb_for_pitch(
        CH.chain_pitch(max(len(rt[0]) for _, rt in chain), hb_r, wc_r),
        hb_r, wc_r) for chain in chains)
    dims_r = CH.plan_hetero(caps[0], caps[1], caps[2], g.ch_p_cap, *shape,
                            nb=nb_r)
    cost_chain = 0
    for chain in chains:
        la_max = max(len(rt[0]) for _, rt in chain)
        dd = CH.chain_pitch(la_max, hb_r, wc_r)
        qq = min(len(chain) * dd + hb_r + wc_r - 2, qqb_r)
        cost_chain += njb_r * nkb_r * qq * hb_r * wc_r
    # Hetero band-select tax: ~5% per static band (the coefficient
    # choose_chain_shape's own work model uses) plus a 10% margin for the
    # ring DMAs and runtime-bound skip overhead.
    cost_chain *= 1.1 + 0.05 * nb_r
    bshape = BK.choose_block_shape(*caps)
    bdims = BK.plan_dims(*caps, *bshape)
    cost_blocked = (len(residue) * bdims[3] * bdims[4] * bdims[5]
                    * bdims[0] * bdims[1])
    if force == "chain" or cost_chain < cost_blocked:
        return [], (dims_r, chains)
    return residue, None


def align_batch_mosaic(
    triplets: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    scoring: Scoring = Scoring(),
    mesh=None,
    residue_route: str = "auto",
    on_scores=None,
    geom: Optional[CanvasGeometry] = None,
) -> List[int]:
    """Batch scoring through mosaic tiling: ONE kernel compile, a few
    large dispatches, scores in input order.

    Problems beyond the canvas (|B| + 2 > HB or |C| + 2 > WC after
    rotation) route to the tall classes; near-cubic problems fitting no
    class go to a dynamic hetero-chain class or per-problem blocked
    sweeps, whichever models cheaper (``residue_route`` = "auto", or
    force "chain" / "blocked"); empty sequences score 0 without dispatch.

    ``mesh``: a jax.sharding.Mesh with a 'data' axis spreads the canvas
    dispatches AND the tall/residue chain and blocked fleets across its
    devices (see _sharded_canvas_fn / _sharded_chain_fn /
    _sharded_blocked_fn).

    ``on_scores``: optional callable(orig_index, score) fired as each
    independent work unit (canvas dispatch, tall/residue chain, blocked
    residue) drains -- the progress feed resilience.align_batch_resilient
    uses to re-dispatch ONLY the units a failure killed (SURVEY section 5
    elastic-recovery row; the reference has none, its FSM parks forever,
    reference: src/TriAlign_1cyc.v:225-348)."""
    if scoring.submatrix is not None:
        from trialign.kernels.plane_math import hetero_sub_ok

        if not hetero_sub_ok(scoring.submatrix):
            raise ValueError(
                "mosaic submatrix needs <= 4 symbols with byte-range "
                "entries: use api.align_batch (it routes such batches "
                "through the padded/bucketed path)")
        g = geom or submatrix_geometry()
    else:
        g = geom or current_geometry()
    triplets = [tuple(np.asarray(s) for s in t) for t in triplets]
    sop = scoring.s3_mode == "sop"
    out = [0] * len(triplets)
    items = []
    tall = []
    for i, t in enumerate(triplets):
        if min(map(len, t)) == 0:
            if on_scores is not None:
                on_scores(i, 0)
            continue
        rt = _rotate(t, sop)
        if len(rt[1]) + 2 > g.hb or len(rt[2]) + 2 > g.wc:
            tall.append((i, rt))
            continue
        items.append((i, rt))
    # Tall problems (mid length beyond the canvas rows): route through
    # the smallest tall class that fits; the residue (near-cubic big
    # problems fitting no class) goes through a DYNAMIC hetero-chain
    # class when the modeled sweep is cheaper than per-problem blocked
    # sweeps (_route_residue), else blocked.  All chain dispatches queue
    # asynchronously (device_get at the end) so host prep overlaps
    # device compute, matching the canvas path.
    tall_pending = []
    blocked_residue = []  # modeled cheaper per-problem blocked than chained
    chain_groups = []  # [(dims, jobs)]: tall classes + dynamic residue class
    if tall:
        by_class = {si: [] for si in range(len(g.tall_shapes))}
        residue = []
        for i, rt in tall:
            cands = [si for si, (t_hb, t_wc, _) in enumerate(g.tall_shapes)
                     if len(rt[1]) < t_hb and len(rt[2]) < t_wc - 1]
            if cands:
                # Cheapest fitting class: every sweep plane costs its
                # hb x wc lane-slots, so min plane area wins (first-fit
                # sent (mid<456, min<255) problems through the 175k-cell
                # class when the 133k-cell one fits: ~11% of tall cost).
                si = min(cands,
                         key=lambda s: (g.tall_shapes[s][0]
                                        * g.tall_shapes[s][1]))
                by_class[si].append((i, rt))
            else:
                residue.append((i, rt))
        for si, chainable in by_class.items():
            if not chainable:
                continue
            t_hb, t_wc, t_unb = g.tall_shapes[si]
            la_cap_c = max(len(rt[0]) for _, rt in chainable)
            # la >= mid > canvas rows, so the pitch floor allows 4 bands.
            dims_t = CH.plan_hetero(la_cap_c, t_hb - 1, t_wc - 2, g.ch_p_cap,
                                    t_hb, t_wc, t_unb, nb=4)
            jobs = []
            for chain in CH.pack_chains(chainable, max_p=g.ch_p_cap):
                la_max = max(len(rt[0]) for _, rt in chain)
                # nb=4 requires S // d <= 2, i.e. d >= S // 3 + 1
                dd = max(CH.chain_pitch(la_max, t_hb, t_wc),
                         (t_hb + t_wc - 4) // 3 + 1)
                a_ext, b_all, c_all, qcap, cells = CH.prep_hetero(
                    [rt for _, rt in chain], dims_t, dd
                )
                jobs.append((a_ext, b_all, c_all, qcap, dd, len(chain),
                             chain, cells))
            chain_groups.append((dims_t, jobs))
        if residue:
            force = None if residue_route == "auto" else residue_route
            blocked_residue, grp = _route_residue(
                residue, force, geom=g,
                ring_planes=1 if scoring.submatrix is None else 3)
            if grp is not None:
                dims_r, chains_r = grp
                t_hb, t_wc = dims_r[0], dims_r[1]
                jobs = []
                for chain in chains_r:
                    la_max = max(len(rt[0]) for _, rt in chain)
                    dd = CH.chain_pitch(la_max, t_hb, t_wc)
                    a_ext, b_all, c_all, qcap, cells = CH.prep_hetero(
                        [rt for _, rt in chain], dims_r, dd
                    )
                    jobs.append((a_ext, b_all, c_all, qcap, dd, len(chain),
                                 chain, cells))
                chain_groups.append((dims_r, jobs))
    if chain_groups:
        ndata_t = mesh.shape.get("data", 1) if mesh is not None else 1
        interp_t = jax.default_backend() != "tpu"
        for dims_t, jobs in chain_groups:
            if ndata_t > 1 and len(jobs) > 1:
                # ~half the mixed-batch work is tall: spread the class's
                # chains over the mesh like the canvas dispatches.
                k = len(jobs)
                padded_j = jobs + [jobs[0]] * (-k % ndata_t)
                perm = _snake_perm([j[4] * j[5] for j in padded_j], ndata_t)
                padded_j = [padded_j[i] for i in perm]
                fn = _sharded_chain_fn(dims_t, scoring, interp_t, mesh)
                caps_all = fn(
                    jnp.asarray(np.stack([j[0] for j in padded_j])),
                    jnp.asarray(np.stack([j[1] for j in padded_j])),
                    jnp.asarray(np.stack([j[2] for j in padded_j])),
                    jnp.asarray(np.stack([j[3] for j in padded_j])),
                    jnp.asarray([j[4] for j in padded_j], dtype=jnp.int32),
                    jnp.asarray([j[5] for j in padded_j], dtype=jnp.int32),
                )
                for row, pi in enumerate(perm):
                    if pi >= k:
                        continue  # padding copy
                    _, _, _, _, _, _, chain, cells = jobs[pi]
                    blks = jnp.asarray([c[0] for c in cells])
                    jls = jnp.asarray([c[1] for c in cells])
                    kls = jnp.asarray([c[2] for c in cells])
                    tall_pending.append((chain, caps_all[row, blks, jls, kls]))
                continue
            for a_ext, b_all, c_all, qcap, dd, npk, chain, cells in jobs:
                caps = CH._hetero_core(
                    jnp.asarray(a_ext), jnp.asarray(b_all),
                    jnp.asarray(c_all), jnp.asarray(qcap), jnp.int32(dd),
                    jnp.int32(npk), dims_t, scoring, interp_t,
                )
                blks = jnp.asarray([c[0] for c in cells])
                jls = jnp.asarray([c[1] for c in cells])
                kls = jnp.asarray([c[2] for c in cells])
                tall_pending.append((chain, caps[blks, jls, kls]))
    blocked_pending = []

    def queue_blocked():
        # Residual problems go through the blocked sweep ASYNCHRONOUSLY,
        # after every chain/canvas dispatch is queued: a synchronous
        # align_blocked pays a full tunnel round-trip per problem (tens
        # of ms each on the remote axon link, serialized on the host).
        # Planning every problem at the residue's joint length caps
        # shares ONE compiled kernel across all of them (~22 distinct
        # shapes otherwise on a mixed 1024-triplet batch) for ~7% more
        # masked sweep planes.
        from trialign.kernels import blocked as BK2
        from trialign.kernels.blocked import align_blocked_async

        if not blocked_residue:
            return
        caps = tuple(
            max(len(rt[ax]) for _, rt in blocked_residue) for ax in range(3)
        )
        ndata_b = mesh.shape.get("data", 1) if mesh is not None else 1
        if ndata_b > 1 and len(blocked_residue) > 1:
            # Same fleet treatment as the canvas/tall dispatches: the
            # shared plan_lens geometry makes the stack homogeneous.
            interp_b = jax.default_backend() != "tpu"
            shape = BK2.choose_block_shape(*caps)
            dims_b = BK2.plan_dims(*caps, *shape)
            rows = [BK2.prep_blocked(rt[0], rt[1], rt[2], dims_b)
                    for _, rt in blocked_residue]
            k = len(rows)
            rows = rows + [rows[0]] * (-k % ndata_b)
            fn = _sharded_blocked_fn(dims_b, scoring, interp_b, mesh)
            scores_dev = fn(*(jnp.asarray(np.stack([r[f] for r in rows]))
                              for f in range(4)))
            for row, (i, _) in enumerate(blocked_residue):
                blocked_pending.append((i, scores_dev[row]))
            return
        for i, rt in blocked_residue:
            blocked_pending.append(
                (i, align_blocked_async(rt[0], rt[1], rt[2], scoring,
                                        plan_lens=caps))
            )

    def emit(i, score):
        out[i] = score
        if on_scores is not None:
            on_scores(i, score)

    def drain_all():
        for chain, scores_dev in tall_pending:
            for (i, _), sc_ in zip(chain, jax.device_get(scores_dev)):
                emit(i, int(sc_))
        for i, sc_dev in blocked_pending:
            emit(i, int(jax.device_get(sc_dev)))

    if not items:
        queue_blocked()
        drain_all()
        return out

    interpret = jax.default_backend() != "tpu"
    # Dispatch count AND active planes both cost (the pl.when skip removes
    # compute but leaves per-skipped-macro loop overhead): the packer
    # places each problem where it adds the fewest modeled sweep planes
    # and charges a penalty for opening dispatches (pack_mosaic).
    dispatches = pack_mosaic(items, geom=g)
    la_cap = max(len(rt[0]) for _, rt in items)
    # Per-dispatch static band count (round 5): dims differ only in
    # dims[13], so dispatches sharing an nb share a compile, and nbs
    # that never occur never compile (the uniform 128-512 bench
    # workload runs entirely at nb=4: one kernel, 4 fewer plane-ops
    # per step than MAX_BANDS=6).
    dims_by_nb = {}

    def dims_for(nb):
        if nb not in dims_by_nb:
            dims_by_nb[nb] = plan_mosaic(la_cap, geom=g, nb=nb)
        return dims_by_nb[nb]

    preps = []
    for disp in dispatches:
        d = CH.chain_pitch(max(len(rt[0]) for t in disp for _, rt in t.problems),
                           g.hb, g.wc)
        nb_d = _nb_for_pitch(d, g.hb, g.wc)
        preps.append(
            (prep_mosaic(disp, dims_for(nb_d), d, geom=g), d,
             max(len(t.problems) for t in disp), nb_d)
        )

    ndata = mesh.shape.get("data", 1) if mesh is not None else 1
    if ndata > 1:
        # Stack the dispatches and spread them across the mesh: pad the
        # dispatch count to a multiple of the data axis with copies of
        # dispatch 0 (their scores are never read).  shard_map hands each
        # device a CONTIGUOUS chunk, and the fleet's wall time is the
        # slowest device, so dispatches are snake-ordered by modeled
        # sweep planes (npack * d) into balanced chunks.
        k = len(preps)
        padded = preps + [preps[0]] * (-k % ndata)
        nloc = len(padded) // ndata
        perm = _snake_perm([p[1] * p[2] for p in padded], ndata)
        padded = [padded[i] for i in perm]
        stack = [
            np.stack([p[0][f] for p in padded]) for f in range(7)
        ] + [
            np.asarray([p[1] for p in padded], np.int32),
            np.asarray([p[2] for p in padded], np.int32),
        ]
        # One compile serves the whole stacked fleet: the band count
        # must cover every dispatch in it.
        dims_fleet = dims_for(max(p[3] for p in preps))
        fn = _sharded_canvas_fn(dims_fleet, scoring, interpret, mesh, nloc)
        caps_all = fn(*(jnp.asarray(s) for s in stack))
        queue_blocked()
        drain_all()
        caps_host = jax.device_get(caps_all)
        for row, pi in enumerate(perm):
            if pi >= k:
                continue  # padding copy of dispatch 0
            (_, _, _, _, _, _, _, cells, flat), _, _, _ = preps[pi]
            for (blk, j, kk), oi in zip(cells, flat):
                emit(oi, int(caps_host[row, blk, j, kk]))
        return out

    pending = []
    for (a_cols, colmask, bpos, cpos, qcap, edge, layout, cells, flat), d, \
            npk, nb_d in preps:
        caps = _mosaic_core(
            jnp.asarray(a_cols), jnp.asarray(colmask), jnp.asarray(bpos),
            jnp.asarray(cpos), jnp.asarray(qcap), jnp.asarray(edge),
            jnp.asarray(layout), jnp.int32(d), jnp.int32(npk),
            dims_for(nb_d), scoring, interpret,
        )
        js = jnp.asarray([c[1] for c in cells])
        ks = jnp.asarray([c[2] for c in cells])
        pending.append((flat, caps[0, js, ks]))
    queue_blocked()
    drain_all()
    for flat, scores_dev in pending:
        for oi, s in zip(flat, jax.device_get(scores_dev)):
            emit(oi, int(s))
    return out
