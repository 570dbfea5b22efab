"""Batched, data-parallel alignment of independent triplets.

The reference aligns one triplet at a time (host FSM S_IDLE->S_ABSW->S_FINISH,
reference: src/TriAlign_tb.sv:313-333); throughput workloads (MSA
pre-alignment) need many.  Here a batch of padded triplets becomes one
leading array axis: vmap adds it to the wavefront kernel, and shard_map
splits it across the 'data' axis of a device mesh -- the dominant
multi-chip mode for this workload.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from trialign.config import NUM_MATRICES, PAD_SYMBOL, Scoring
from trialign.kernels.plane_math import (
    PLANE_DELTA,
    SHIFTS,
    submatrix_pair,
    submatrix_tables,
    target_update,
    transition_groups,
)
from trialign.kernels import wavefront as wf


def prep_padded(
    triplets: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int, int, int]:
    """Stack triplets into compact common-bucket arrays for the batched core.

    Only the three small sequence vectors cross host->device; the fat skewed
    symbol planes are built on-chip (wavefront._build_planes)."""
    la = max(len(t[0]) for t in triplets)
    lb = max(len(t[1]) for t in triplets)
    lc = max(len(t[2]) for t in triplets)
    lab, hb, wc = wf.bucket_dims(la, lb, lc)
    lens_l, a_l, b_l, c_l = [], [], [], []
    for a, b, c in triplets:
        lens, a_ext, b_full, c_full = wf.prepare_compact(a, b, c, lab, hb, wc)
        lens_l.append(lens)
        a_l.append(a_ext)
        b_l.append(b_full)
        c_l.append(c_full)
    return (
        np.stack(lens_l),
        np.stack(a_l),
        np.stack(b_l),
        np.stack(c_l),
        lab,
        hb,
        wc,
    )


@functools.partial(
    jax.jit, static_argnames=("lab", "hb", "wc", "scoring", "engine", "interpret")
)
def _batched_scores(lens, a_ext, b_full, c_full, lab, hb, wc, scoring, engine, interpret):
    """(B, ...) compact inputs -> (B,) int32 optimal scores."""
    if engine == "pallas":
        single = lambda l, a_, b_, c_: wf._run_compact(
            l, a_, b_, c_, lab, hb, wc, scoring, interpret
        )
        outs = jax.vmap(single)(lens, a_ext, b_full, c_full)  # (B, 8, 1)
        return jnp.max(outs[:, :NUM_MATRICES, 0], axis=1)

    def one(l, a_, b_, c_):
        askew, bp, cp = wf._build_planes(a_, b_, c_, lab, hb, wc)
        return _sweep_padded(l, askew, bp, cp, lab, hb, wc, scoring)

    return jax.vmap(one)(lens, a_ext, b_full, c_full)


def _sweep_padded(lens, askew, bp, cp, lab, hb, wc, scoring: Scoring):
    """XLA engine consuming the same padded inputs as the Pallas kernel:
    a lax.scan plane sweep with runtime lengths and mask-reduce extraction."""
    w = scoring.weight_matrix()
    groups = transition_groups(w)
    match = jnp.int32(scoring.match)
    mismatch = jnp.int32(scoring.mismatch)
    la, lb, lc = lens[0], lens[1], lens[2]
    qmax = la + lb + lc
    qq = lab + hb + wc

    j_grid = jnp.arange(hb, dtype=jnp.int32)[:, None] * jnp.ones((1, wc), jnp.int32)
    k_grid = jnp.ones((hb, 1), jnp.int32) * jnp.arange(wc, dtype=jnp.int32)[None, :]
    jk = j_grid + k_grid
    edge = (j_grid >= 1) & (k_grid >= 1)
    if scoring.submatrix is None:
        sub_t = None
        s_bc = jnp.where(bp == cp, match, mismatch)
    else:
        # Same select-chain tables as the Pallas kernels
        # (plane_math.submatrix_tables): pads fall through to the floor.
        sub_t = submatrix_tables(bp, cp, scoring.submatrix, jnp.int32,
                                 jnp.where)
        s_bc = sub_t[2]
    cellmask = (j_grid == lb) & (k_grid == lc)

    def shift(x, dj, dk):
        if dj:
            x = jnp.roll(x, dj, axis=-2)
        if dk:
            x = jnp.roll(x, dk, axis=-1)
        return x

    def step(carry, q):
        p1, p2, p3, captured = carry
        ap = jax.lax.dynamic_slice(askew, (qq - q, 0), (hb, wc))
        if sub_t is not None:
            s_ab = submatrix_pair(ap, sub_t[0], sub_t[3], jnp.where)
            s_ac = submatrix_pair(ap, sub_t[1], sub_t[3], jnp.where)
        else:
            s_ab = jnp.where(ap == bp, match, mismatch)
            s_ac = jnp.where(ap == cp, match, mismatch)
        if scoring.s3_mode == "sop":
            s3 = s_ab + s_ac + s_bc
        else:
            s3 = jnp.where(
                ap == bp,
                jnp.where(bp == cp, 3 * match, (match + mismatch) * 2),
                3 * mismatch,
            )
        subs = (s3, 0, 0, 0, s_ab, s_bc, s_ac)
        planes = (None, p1, p2, p3)
        i_grid = q - jk
        valid = (i_grid >= 1) & (i_grid <= la) & edge
        new = []
        for t in range(NUM_MATRICES):
            pred = shift(planes[PLANE_DELTA[t]], *SHIFTS[t])
            cand = target_update(pred, groups[t], jnp.maximum) + subs[t]
            new.append(jnp.where(valid, cand, 0))
        new = jnp.stack(new)
        cellv = jnp.sum(jnp.where(cellmask[None], new, 0), axis=(1, 2))
        captured = jnp.where(q == qmax, cellv, captured)
        return (new, p1, p2, captured), None

    z = jnp.zeros((NUM_MATRICES, hb, wc), jnp.int32)
    (_, _, _, captured), _ = jax.lax.scan(
        step,
        (z[:], z[:], z[:], jnp.zeros((NUM_MATRICES,), jnp.int32)),
        jnp.arange(1, qq + 1, dtype=jnp.int32),
    )
    return jnp.max(captured)


def _pick_engine(interpret_ok: bool = True) -> Tuple[str, bool]:
    if jax.default_backend() == "tpu":
        return "pallas", False
    return "xla", False


def align_batch_padded(
    triplets: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    scoring: Scoring = Scoring(),
    engine: Optional[str] = None,
) -> List[int]:
    """Align a batch of triplets on the local default device.

    Batches containing triplets beyond the single-block kernel's
    |B|,|C| <= 255 limit route through the bucketed dispatcher (small
    buckets stay batched; long ones chain through the blocked sweep).
    Triplets with an empty sequence score 0 (border-face semantics)."""
    if not triplets:
        return []
    empty = [i for i, t in enumerate(triplets) if min(map(len, t)) == 0]
    if empty:
        keep = [i for i in range(len(triplets)) if min(map(len, triplets[i])) > 0]
        sub = align_batch_padded([triplets[i] for i in keep], scoring, engine)
        out = [0] * len(triplets)
        for i, s in zip(keep, sub):
            out[i] = s
        return out
    # Triplets beyond the wavefront caps (|B|,|C| <= 255 AND |A| <= 4096,
    # wavefront.bucket_dims) must route through the bucketed dispatcher.
    if any(
        len(t[1]) > 255 or len(t[2]) > 255 or len(t[0]) > 4096 for t in triplets
    ):
        return align_batch_bucketed(triplets, scoring)
    lens, askew, bp, cp, lab, hb, wc = prep_padded(triplets)
    if (scoring.submatrix is not None
            and len(scoring.submatrix) > wf.SUBMATRIX_NSYM_CAP):
        # Alphabets past the select-chain cap can't ride the Pallas
        # kernel (its bucket geometry does not budget the 2*nsym+1 table
        # planes); the XLA engine evaluates the same tables at any size.
        engine = "xla"
    if engine is None:
        engine, interpret = _pick_engine()
    else:
        interpret = engine == "pallas" and jax.default_backend() != "tpu"
    scores = _batched_scores(
        jnp.asarray(lens),
        jnp.asarray(askew),
        jnp.asarray(bp),
        jnp.asarray(cp),
        lab,
        hb,
        wc,
        scoring,
        engine,
        interpret,
    )
    return [int(s) for s in jax.device_get(scores)]


@functools.lru_cache(maxsize=64)
def _chained_blocked_fn(dims, scoring, count, interpret):
    """jit'd chain of `count` blocked alignments sharing one geometry."""
    from trialign.kernels import blocked as BK

    @jax.jit
    def chained(*flat):
        outs = []
        for i in range(count):
            lens, ae, ba, ca = flat[4 * i : 4 * i + 4]
            outs.append(
                BK._blocked_core(lens, ae, ba, ca, dims, scoring, interpret)[
                    :NUM_MATRICES
                ].max()
            )
        return jnp.stack(outs)

    return chained


def _blocked_group(triplets, scoring, interpret, chain=8):
    """Score triplets sharing a block geometry, `chain` per dispatch.

    Chain-batches round-robin across the local devices: dispatch is async,
    so independent chains overlap on a multi-chip host (on one chip this
    degenerates to sequential execution)."""
    from trialign.kernels import blocked as BK

    devices = jax.local_devices()

    la = max(len(t[0]) for t in triplets)
    lb = max(len(t[1]) for t in triplets)
    lc = max(len(t[2]) for t in triplets)
    shape = BK.choose_block_shape(la, lb, lc,
                                  live_planes=BK._live_planes_for(scoring))
    dims = BK.plan_dims(la, lb, lc, *shape)
    hb, wc, lab = dims[0], dims[1], dims[2]
    kdim, jdim = dims[6], dims[7]

    def prep(a, b, c):
        a_ext = np.full(lab + 2, PAD_SYMBOL, np.int32)
        a_ext[1 : len(a) + 1] = a
        b_arr = np.full(jdim + hb + 8, PAD_SYMBOL - 1, np.int32)
        b_arr[1 : len(b) + 1] = b
        c_arr = np.full(kdim + wc + 8, PAD_SYMBOL - 2, np.int32)
        c_arr[1 : len(c) + 1] = c
        lens = np.array([len(a), len(b), len(c)], np.int32)
        return (lens, a_ext, b_arr, c_arr)

    n = len(triplets)
    pending = []  # (device result, real count)
    for ci, off in enumerate(range(0, n, chain)):
        grp = list(triplets[off : off + chain])
        real = len(grp)
        while len(grp) < min(chain, n):  # pad the tail: one compile per dims
            grp.append(grp[0])
        fn = _chained_blocked_fn(dims, scoring, len(grp), interpret)
        dev = devices[ci % len(devices)]
        flat = [jax.device_put(x, dev) for t in grp for x in prep(*t)]
        pending.append((fn(*flat), real))  # async dispatch; overlaps chips
    scores: List[int] = []
    for out, real in pending:
        scores.extend(int(s) for s in jax.device_get(out)[:real])
    return scores


def align_batch_bucketed(
    triplets: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    scoring: Scoring = Scoring(),
    chain: int = 8,
) -> List[int]:
    """Score a mixed-length batch: bucket by kernel geometry, one batched
    dispatch per wavefront bucket and chained blocked dispatches per long
    bucket (BASELINE config 3: 1024 triplets, len 128-512, padded/bucketed).

    Returns scores in input order."""
    if not triplets:
        return []
    interpret = jax.default_backend() != "tpu"
    small: dict = {}
    large: dict = {}
    out = [0] * len(triplets)
    for i, (a, b, c) in enumerate(triplets):
        la, lb, lc = len(a), len(b), len(c)
        if min(la, lb, lc) == 0:
            continue  # final cell on a zero-border face: score 0
        if lb <= 255 and lc <= 255 and la <= 4096:
            key = wf.bucket_dims(la, lb, lc)
            small.setdefault(key, []).append(i)
        else:
            key = (-(-la // 128), -(-lb // 128), -(-lc // 128))
            large.setdefault(key, []).append(i)
    for key, idxs in small.items():
        scores = align_batch_padded([triplets[i] for i in idxs], scoring)
        for i, s in zip(idxs, scores):
            out[i] = s
    for key, idxs in large.items():
        scores = _blocked_group(
            [triplets[i] for i in idxs], scoring, interpret, chain
        )
        for i, s in zip(idxs, scores):
            out[i] = s
    return out


def align_batch_multihost(
    triplets: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    scoring: Scoring = Scoring(),
    mesh: Optional[Mesh] = None,
    engine: Optional[str] = None,
) -> List[int]:
    """Multi-host (DCN) batch alignment over the global device mesh.

    Every participating process must call this with the SAME triplets (the
    usual SPMD contract).  Inputs become global arrays sharded over the
    'data' axis via make_array_from_callback, the batched core runs under
    shard_map exactly as in :func:`align_batch_sharded`, and the scores are
    allgathered back to every process.  Requires jax.distributed to be
    initialized (trialign.dist.mesh.init_distributed); also works
    single-process, where it degenerates to align_batch_sharded.

    This is the DCN half of the distributed backend the reference never
    had (its host link, RIFFA PCIe, was never committed --
    reference: .gitignore:4; SURVEY.md section 2)."""
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding

    if not triplets:
        return []
    if mesh is None:
        from trialign.dist.mesh import multihost_mesh

        mesh = multihost_mesh()
    if jax.process_count() == 1:
        return align_batch_sharded(triplets, scoring, mesh, engine)
    # The vmap core needs the wavefront caps; long triplets go through the
    # local bucketed chain on every process (replicated work -- acceptable
    # for the rare long tail; the sharded fast path carries the volume).
    long_idx = [
        i
        for i, t in enumerate(triplets)
        if len(t[1]) > 255 or len(t[2]) > 255 or len(t[0]) > 4096
        or min(map(len, t)) == 0
    ]
    if long_idx:
        long_set = set(long_idx)
        short_idx = [i for i in range(len(triplets)) if i not in long_set]
        out = [0] * len(triplets)
        for i, s in zip(long_idx, align_batch_bucketed(
                [triplets[i] for i in long_idx], scoring)):
            out[i] = s
        if short_idx:
            for i, s in zip(short_idx, align_batch_multihost(
                    [triplets[i] for i in short_idx], scoring, mesh, engine)):
                out[i] = s
        return out

    ndata = mesh.shape["data"]
    n = len(triplets)
    padded = list(triplets)
    while len(padded) % ndata:
        padded.append(padded[0])
    lens, askew, bp, cp, lab, hb, wc = prep_padded(padded)
    if engine is None:
        engine, interpret = _pick_engine()
    else:
        interpret = engine == "pallas" and jax.default_backend() != "tpu"

    spec = P("data")
    sh = NamedSharding(mesh, spec)

    def to_global(x):
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    core = functools.partial(
        _batched_scores,
        lab=lab, hb=hb, wc=wc, scoring=scoring, engine=engine,
        interpret=interpret,
    )
    fn = jax.shard_map(
        lambda l, ak, b_, c_: core(l, ak, b_, c_),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    scores = fn(to_global(lens), to_global(askew), to_global(bp), to_global(cp))
    gathered = multihost_utils.process_allgather(scores, tiled=True)
    return [int(s) for s in np.asarray(gathered)[:n]]


def align_batch_sharded(
    triplets: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
    scoring: Scoring = Scoring(),
    mesh: Optional[Mesh] = None,
    engine: Optional[str] = None,
) -> List[int]:
    """Align a batch data-parallel across the 'data' axis of a mesh.

    Pads the batch up to a multiple of the data-axis size, shards the batch
    dimension, and runs the padded batched core per device -- the TPU
    equivalent of running N reference accelerators side by side.
    """
    if not triplets:
        return []
    if mesh is None:
        from trialign.dist.mesh import default_mesh

        mesh = default_mesh()
    # Large mixed batches on TPU route through the mosaic tiling engine
    # with canvas dispatches spread over the mesh 'data' axis -- the same
    # gate as api.align_batch (>= 64 mosaic-eligible problems, bounded
    # rotated |A| so the chain pitch stays sane), composed with data
    # parallelism.  The remainder flows through the padded/bucketed paths
    # below.
    import os

    on_tpu = (
        jax.default_backend() == "tpu"
        or os.environ.get("TRIALIGN_FORCE_MOSAIC") == "1"
    )
    from trialign.kernels.plane_math import hetero_sub_ok

    if on_tpu and len(triplets) >= 64 and (
            scoring.submatrix is None or hetero_sub_ok(scoring.submatrix)):
        from trialign.api import LA_MOSAIC_CAP
        from trialign.kernels.mosaic import align_batch_mosaic

        sop = scoring.s3_mode == "sop"

        def la_rot(t):
            a, b, c = t
            return max(len(a), len(b), len(c)) if sop else max(len(a), len(b))

        mos_idx = [i for i, t in enumerate(triplets)
                   if la_rot(t) <= LA_MOSAIC_CAP]
        if len(mos_idx) >= 64:
            out = [0] * len(triplets)
            mos_scores = align_batch_mosaic(
                [triplets[i] for i in mos_idx], scoring, mesh=mesh
            )
            for i, s in zip(mos_idx, mos_scores):
                out[i] = s
            rest = [i for i in range(len(triplets)) if la_rot(triplets[i]) > LA_MOSAIC_CAP]
            if rest:
                for i, s in zip(rest, align_batch_sharded(
                        [triplets[i] for i in rest], scoring, mesh, engine)):
                    out[i] = s
            return out
    # Triplets beyond the wavefront caps can't join the sharded vmap batch;
    # route them through the bucketed dispatcher (which chains the blocked
    # sweep round-robin across local devices) and merge in input order.
    long_idx = [
        i
        for i, t in enumerate(triplets)
        if len(t[1]) > 255 or len(t[2]) > 255 or len(t[0]) > 4096
        or min(map(len, t)) == 0
    ]
    if long_idx:
        long_set = set(long_idx)
        short_idx = [i for i in range(len(triplets)) if i not in long_set]
        out = [0] * len(triplets)
        long_scores = align_batch_bucketed([triplets[i] for i in long_idx], scoring)
        for i, s in zip(long_idx, long_scores):
            out[i] = s
        if short_idx:
            short_scores = align_batch_sharded(
                [triplets[i] for i in short_idx], scoring, mesh, engine
            )
            for i, s in zip(short_idx, short_scores):
                out[i] = s
        return out
    ndata = mesh.shape["data"]
    n = len(triplets)
    padded = list(triplets)
    while len(padded) % ndata:
        padded.append(padded[0])  # harmless duplicates, sliced off below

    lens, askew, bp, cp, lab, hb, wc = prep_padded(padded)
    if (scoring.submatrix is not None
            and len(scoring.submatrix) > wf.SUBMATRIX_NSYM_CAP):
        engine = "xla"  # past the Pallas select-chain cap (align_batch_padded)
    if engine is None:
        engine, interpret = _pick_engine()
    else:
        interpret = engine == "pallas" and jax.default_backend() != "tpu"

    core = functools.partial(
        _batched_scores,
        lab=lab,
        hb=hb,
        wc=wc,
        scoring=scoring,
        engine=engine,
        interpret=interpret,
    )
    spec = P("data")
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes info,
    # which trips shard_map's default VMA validation.
    fn = jax.shard_map(
        lambda l, ak, b_, c_: core(l, ak, b_, c_),
        mesh=mesh,
        in_specs=(spec, spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    scores = fn(
        jnp.asarray(lens), jnp.asarray(askew), jnp.asarray(bp), jnp.asarray(cp)
    )
    return [int(s) for s in jax.device_get(scores)[:n]]
