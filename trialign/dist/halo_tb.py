"""Sharded alignment recovery: Hirschberg splits on the halo fleet.

Restores full alignments (not just scores) for triplets partitioned across
the mesh's 'model' axis -- the composition the reference hardware could
never attempt: its traceback was stubbed out entirely (reference:
src/PE_1cyc.v:12-14,30) and its fabric capped sequences at one SRAM's
worth (src/TriAlign_1cyc.v:127-140).

Architecture (round-4 VERDICT item 5):

* The Hirschberg split at i = m needs the F slab (forward sweep of
  a[:m], captured at plane i = m), the G slab (backward sweep of a[m:]),
  and their elementwise sum's argmax.  Both sweeps are the O(n^3) cost;
  here they run on the halo-sharded blocked slab kernels: each device
  owns a k-stripe of block columns, sweeps them with the same Pallas
  slab-capture kernel the single-chip path uses (kernels/slab.py), and
  exchanges stripe-boundary column faces over ICI via lax.ppermute --
  the same tight pipeline schedule as dist/halo.py's score mode.
* Each stripe captures the i = m plane of ITS block columns only; the
  capture leaves shard_map as a global array sharded along the block-
  column axis, and the F + G + argmax combine runs under jit over the
  sharded operands, so XLA's SPMD partitioner keeps the elementwise sum
  stripe-local and lowers the argmax to the local-argmax + cross-device
  reduce this layout admits.  Only the crossing's coordinates reach the
  host.
* Recursion: halves whose sweeps fit one chip go to the proven
  single-chip solver (traceback/hirschberg.py _solve: direct engine /
  splits / walk); larger halves split sharded again, pin-mode and
  free_jk guard sweeps included.

Semantics are identical to hirschberg_align (zero-border free start,
max-over-states end): every path bottoms out in the same engines, and the
split algebra (crossing state pinned into both halves, free_jk restart
guard) mirrors traceback/hirschberg.py line for line.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from trialign.config import NUM_MATRICES, Scoring
from trialign.dist.halo import choose_halo_shape
from trialign.kernels import blocked as BK
from trialign.kernels import slab as SK
from trialign.traceback import hirschberg as HB
from trialign.traceback.engine import NEG

Column = Tuple[int, int, int]


def _plan_sharded(la, lb, lc, ndev, variant, scoring, block_shape):
    """Halo-padded slab-kernel geometry: block columns rounded up to a
    multiple of the stripe count, VMEM budgeted for the slab kernels'
    larger live set (capture scratch + deeper step body)."""
    if block_shape:
        hb, wc = block_shape[0], block_shape[1]
        unb = block_shape[2] if len(block_shape) > 2 else BK.DEF_UNB
    else:
        hb, wc, unb = choose_halo_shape(
            la, lb, lc, ndev,
            live_planes=SK._live_planes(variant, scoring),
            stack_per_step=3.5,
        )
    tb, tc = hb - 1, wc - 1
    n_kb = max(1, -(-lc // tc))
    n_kb = -(-n_kb // ndev) * ndev
    dims = BK.plan_dims(la, lb, max(lc, n_kb * tc), hb, wc, unb)
    return dims, n_kb // ndev


@functools.partial(
    jax.jit,
    static_argnames=("dims", "n_kb_local", "ndev", "scoring", "variant",
                     "mode", "interpret", "mesh"),
)
def _halo_slab_core(lens, ev, a_ext, b_arr, c_arr, dims, n_kb_local, ndev,
                    scoring, variant, mode, interpret, mesh):
    """One sharded slab sweep: returns (final vector (8,1), capture blocks
    (n_jb, n_kb, 7, hb, wc) sharded along the block-column axis).

    The tight halo schedule of dist/halo.py: device d sweeps block row
    jb = t - d at pipeline step t, handing its right-boundary column face
    to stripe d+1 between steps (the transfer is one slab of a few MB;
    these sweeps run once per Hirschberg node, so the ramp -- not the
    transfer -- is the modeled loss, and the overlapped schedule's extra
    ramp steps would cost more than they hide)."""
    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, sr1, sr2, unb = dims[:11]
    tb, tc = hb - 1, wc - 1
    hbp = BK._round_up(hb, 128)
    la, lb, lc = lens[0], lens[1], lens[2]
    block_call = SK.make_slab_block_call(
        dims, scoring, variant, mode, interpret, n_srf=n_kb_local, n_cf=1
    )

    jbstar = (lb - 1) // tb
    kbstar = (lc - 1) // tc
    jlstar = lb - jbstar * tb
    klstar = lc - kbstar * tc
    # Edge halos: free forward faces are zero borders; pin-mode and
    # backward faces are NEG walls (kernels/slab.py _slab_core).
    fill = jnp.int32(0 if (variant == "fwd" and mode != "pin") else NEG)

    def device_fn(lens, ev, a_ext, b_arr, c_arr):
        d = jax.lax.axis_index("model")
        askew = BK._build_askew_blocked(a_ext, qqb, hb, wc, unb)
        zeros = jnp.zeros((hb, wc), jnp.int32)
        srf0 = jnp.full((n_kb_local, 8 * sr1, wc), fill, jnp.int32)
        cf0 = jnp.full((1, 8 * sr2, hbp), fill, jnp.int32)
        res0 = jnp.zeros((8, 1), jnp.int32)
        caps0 = jnp.zeros((n_jb, n_kb_local, NUM_MATRICES, hb, wc),
                          jnp.int32)

        def row_sweep(jb, srf, cf, res, caps):
            j0 = jb * tb

            def kb_body(carry, kbl):
                srf, cf, res = carry
                kb = d * n_kb_local + kbl
                k0 = kb * tc
                is_t = (jb == jbstar) & (kb == kbstar)
                scal = jnp.stack(
                    [
                        la,
                        jb,
                        kb,
                        jnp.where(is_t, la + jlstar + klstar, jnp.int32(-1)),
                        jnp.where(is_t, jlstar, -1),
                        jnp.where(is_t, klstar, -1),
                        ev[0], ev[1], ev[2], ev[3], ev[4], ev[5], ev[6],
                        kbl,  # srf slab index (device-local stripe)
                        jnp.int32(0),  # cf slab index (travelling slab)
                    ]
                ).astype(jnp.int32)
                bp = jnp.broadcast_to(
                    jax.lax.dynamic_slice(b_arr, (j0,), (hb,))[:, None],
                    (hb, wc),
                )
                cp = jnp.broadcast_to(
                    jax.lax.dynamic_slice(c_arr, (k0,), (wc,))[None, :],
                    (hb, wc),
                )
                srf, cf, out, cap = block_call(scal, askew, bp, cp, zeros,
                                               srf, cf)
                res = jnp.where(is_t, out, res)
                return (srf, cf, res), cap[0]

            (srf, cf, res), caps_row = jax.lax.scan(
                kb_body, (srf, cf, res),
                jnp.arange(n_kb_local, dtype=jnp.int32),
            )
            caps = jax.lax.dynamic_update_slice(
                caps, caps_row[None], (jb, 0, 0, 0, 0)
            )
            return srf, cf, res, caps

        perm = [(i, i + 1) for i in range(ndev - 1)]

        def step(carry, t):
            srf, cf_recv, res, caps = carry
            jb = t - d
            valid = (jb >= 0) & (jb < n_jb)
            srf, cf, res, caps = jax.lax.cond(
                valid,
                lambda args: row_sweep(jnp.maximum(jb, 0), *args),
                lambda args: args,
                (srf, cf_recv, res, caps),
            )
            cf_next = jax.lax.ppermute(cf, "model", perm)
            return (srf, cf_next, res, caps), None

        nsteps = n_jb + ndev - 1
        (_, _, res, caps), _ = jax.lax.scan(
            step, (srf0, cf0, res0, caps0),
            jnp.arange(nsteps, dtype=jnp.int32),
        )
        return jax.lax.psum(res, "model"), caps

    fn = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=(P(), P(None, "model", None, None, None)),
        check_vma=False,
    )
    return fn(lens, ev, a_ext, b_arr, c_arr)


def _run_sharded_sweep(a, b, c, scoring, mesh, ndev, variant, mode, ev,
                       interpret, block_shape):
    """Dispatch one sharded slab sweep; returns (dims, res, cap) with cap
    still on device (sharded)."""
    dims, n_kb_local = _plan_sharded(len(a), len(b), len(c), ndev, variant,
                                     scoring, block_shape)
    lens, a_ext, b_arr, c_arr = BK.prep_blocked(a, b, c, dims)
    ev = (np.zeros(NUM_MATRICES, np.int32) if ev is None
          else np.asarray(ev, np.int32))
    from trialign.dist.halo import as_global

    res, cap = _halo_slab_core(
        *as_global(mesh, lens, ev, a_ext, b_arr, c_arr),
        dims, n_kb_local, ndev, scoring, variant, mode, interpret, mesh,
    )
    return dims, res, cap


def sharded_split_point(
    a,
    b,
    c,
    m: int,
    scoring: Scoring,
    mesh: Mesh,
    mode: str = "free",
    end_v: Optional[np.ndarray] = None,
    v0: Optional[np.ndarray] = None,
    interpret: Optional[bool] = None,
    block_shape: Optional[Tuple[int, ...]] = None,
) -> Tuple[int, int, int, int]:
    """The Hirschberg split at i = m with both slab sweeps halo-sharded
    across the mesh; returns (sstar, jstar, kstar, score) -- the optimal
    crossing of plane i = m.  Twin of kernels/slab.py
    split_point_blocked_async, distributed."""
    a = np.asarray(a, dtype=np.int32)
    b = np.asarray(b, dtype=np.int32)
    c = np.asarray(c, dtype=np.int32)
    la, lb, lc = len(a), len(b), len(c)
    assert 1 <= m < la, (m, la)
    assert (mode == "pin") == (v0 is not None), (mode, v0)
    ndev = mesh.shape["model"]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    fdims, _, fcap = _run_sharded_sweep(
        a[:m], b, c, scoring, mesh, ndev, "fwd", mode, v0, interpret,
        block_shape,
    )
    gdims, _, gcap = _run_sharded_sweep(
        a[m:][::-1].copy(), b[::-1].copy(), c[::-1].copy(), scoring, mesh,
        ndev, "bwd", "free", end_v, interpret, block_shape,
    )

    # F + G + argmax under jit over the stripe-sharded captures: the
    # partitioner keeps the sum local and reduces the argmax across
    # devices; two scalars cross the host link.
    flat, val = SK._combine_caps(
        fcap.reshape((-1,) + fcap.shape[2:]),
        gcap.reshape((-1,) + gcap.shape[2:]),
        fdims, gdims, lb, lc,
    )
    fl = int(jax.device_get(flat))
    score = int(jax.device_get(val))
    sstar, jstar, kstar = np.unravel_index(fl, (NUM_MATRICES, lb + 1, lc + 1))
    return int(sstar), int(jstar), int(kstar), score


def _sharded_final_vector(a, b, c, scoring, mesh, ndev, mode, ev,
                          interpret, block_shape=None) -> np.ndarray:
    """Final (7,) state vector of a sharded forward sweep -- the free_jk
    guard of the split (traceback/hirschberg.py _solve freeish branch)."""
    _, res, _ = _run_sharded_sweep(
        np.asarray(a, np.int32), np.asarray(b, np.int32),
        np.asarray(c, np.int32), scoring, mesh, ndev, "fwd", mode, ev,
        interpret, block_shape,
    )
    return np.asarray(jax.device_get(res))[:NUM_MATRICES, 0]


def _solve_sharded(
    a,
    b,
    c,
    scoring: Scoring,
    mode: str,
    s0: Optional[int],
    end_state: Optional[int],
    mesh: Mesh,
    ndev: int,
    single_cells: Optional[int],
    interpret: Optional[bool],
    block_shape: Optional[Tuple[int, ...]] = None,
) -> Tuple[int, List[Column]]:
    la, lb, lc = len(a), len(b), len(c)
    cells = (la + 1) * (lb + 1) * (lc + 1)
    if single_cells is not None:
        small = cells <= single_cells
    else:
        # Default handoff: once the direct engine can take the node in one
        # device-resident call, a single chip is the fastest executor --
        # the fleet's job is the sweeps too big for it.
        small = cells <= HB.DIRECT_CELLS and HB._direct_fits(la, lb, lc)
    if small or la <= 1 or min(lb, lc) < 1:
        return HB._solve(a, b, c, scoring, mode, s0, end_state)

    freeish = mode != "pin"
    m = la // 2
    v0 = None
    if mode == "pin":
        v0 = np.full(NUM_MATRICES, NEG, dtype=np.int32)
        v0[s0] = 0
    end_v = np.zeros(NUM_MATRICES, dtype=np.int32)
    if end_state is not None:
        end_v[:] = NEG
        end_v[end_state] = 0

    sstar, jstar, kstar, score = sharded_split_point(
        a, b, c, m, scoring, mesh, mode=mode, end_v=end_v, v0=v0,
        interpret=interpret, block_shape=block_shape,
    )

    if freeish:
        # Free j/k borders admit paths starting at i0 > m that never cross
        # the i = m plane; they live entirely in the right half with its
        # i = 0 face walled (mode free_jk) -- same guard as the
        # single-chip _solve, swept on the fleet.
        h_final = _sharded_final_vector(
            a[m:], b, c, scoring, mesh, ndev, "free_jk", None, interpret,
            block_shape,
        )
        h_val = (int(h_final[end_state]) if end_state is not None
                 else int(h_final.max()))
        if h_val > score:
            r_score, r_cols = _solve_sharded(
                a[m:], b, c, scoring, "free_jk", None, end_state, mesh,
                ndev, single_cells, interpret, block_shape,
            )
            prefix = [(int(a[i]), -1, -1) for i in range(m)]
            return r_score, prefix + r_cols

    # Halves run sequentially: they share the one mesh (unlike the
    # single-chip recursion, whose halves overlap tunnel round trips).
    left_score, left_cols = _solve_sharded(
        a[:m], b[:jstar], c[:kstar], scoring, mode, s0, sstar, mesh, ndev,
        single_cells, interpret, block_shape,
    )
    right_score, right_cols = _solve_sharded(
        a[m:], b[jstar:], c[kstar:], scoring, "pin", sstar, end_state,
        mesh, ndev, single_cells, interpret, block_shape,
    )
    assert left_score + right_score == score, (left_score, right_score,
                                               score)
    return score, left_cols + right_cols


def hirschberg_align_sharded(
    a,
    b,
    c,
    scoring: Scoring = Scoring(),
    mesh: Optional[Mesh] = None,
    single_cells: Optional[int] = None,
    interpret: Optional[bool] = None,
    block_shape: Optional[Tuple[int, ...]] = None,
) -> Tuple[int, List[List[int]]]:
    """Optimal score plus one optimal alignment, with every
    beyond-single-chip slab sweep halo-sharded across the mesh's 'model'
    axis.  Semantics match hirschberg_align exactly.

    ``single_cells``: cell-count handoff to the single-chip solver (None =
    the direct-engine fit gate; tests force tiny values to exercise
    multi-level sharded splits on small problems)."""
    a = np.asarray(a)
    b = np.asarray(b)
    c = np.asarray(c)
    if min(len(a), len(b), len(c)) == 0:
        return HB.hirschberg_align(a, b, c, scoring)
    if mesh is None:
        from trialign.dist.mesh import make_mesh

        mesh = make_mesh(data=1, model=len(jax.devices()))
    ndev = mesh.shape["model"]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    score, cols = _solve_sharded(
        a, b, c, scoring, "free", None, None, mesh, ndev, single_cells,
        interpret, block_shape,
    )
    rows = [list(r) for r in zip(*cols)]
    return score, rows
