"""Checkpoint / resume for long blocked alignments.

The reference has no recovery story (SURVEY.md section 5), but its boundary
faces in the y/z SRAMs are a complete intermediate state between blocks
(reference: src/TriAlign_1cyc.v:127-140).  The TPU blocked sweep inherits
that property: (row-face slabs, column-face slabs, result register, next
block index) fully determine the remaining computation, so a long run can
persist them every few blocks and resume after preemption.
"""

from __future__ import annotations

import functools
import os
import tempfile
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from trialign.config import NUM_MATRICES, PAD_SYMBOL, Scoring
from trialign.kernels import blocked as BK


@functools.partial(
    jax.jit, static_argnames=("dims", "count", "scoring", "interpret")
)
def _segment(lens, a_ext, b_arr, c_arr, srf, cf, res, idx0, dims, count, scoring, interpret):
    """Run `count` consecutive blocks starting at flat index idx0."""
    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, s1, s2, unb = dims
    tb, tc = hb - 1, wc - 1
    la, lb, lc = lens[0], lens[1], lens[2]
    askew = BK._build_askew_blocked(a_ext, qqb, hb, wc, unb)
    zeros = jnp.zeros((hb, wc), jnp.int32)
    block_call = BK.make_block_call(dims, n_kb, n_jb, scoring, interpret)

    jbstar = (lb - 1) // tb
    kbstar = (lc - 1) // tc
    jlstar = lb - jbstar * tb
    klstar = lc - kbstar * tc
    target_idx = jbstar * n_kb + kbstar

    def body(carry, off):
        srf, cf, res = carry
        idx = idx0 + off
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

    (srf, cf, res), _ = jax.lax.scan(
        body, (srf, cf, res), jnp.arange(count, dtype=jnp.int32)
    )
    return srf, cf, res


class CheckpointedAligner:
    """Blocked alignment that persists face state every `every` blocks."""

    def __init__(
        self,
        a,
        b,
        c,
        scoring: Scoring = Scoring(),
        ckpt_path: Optional[str] = None,
        every: int = 8,
        interpret: Optional[bool] = None,
        block_shape: Optional[Tuple[int, int]] = None,
    ):
        self.a = np.asarray(a)
        self.b = np.asarray(b)
        self.c = np.asarray(c)
        self.scoring = scoring
        self.every = every
        self.ckpt_path = ckpt_path or os.path.join(
            tempfile.gettempdir(), "trialign_ckpt.npz"
        )
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        if block_shape:
            hb, wc = block_shape[0], block_shape[1]
            unb = block_shape[2] if len(block_shape) > 2 else BK.DEF_UNB
        else:
            hb, wc, unb = BK.choose_block_shape(len(a), len(b), len(c))
        self.dims = BK.plan_dims(len(a), len(b), len(c), hb, wc, unb)

        hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, s1, s2, unb = self.dims
        self.n_blocks = n_jb * n_kb
        self.a_ext = np.full(lab + 2, PAD_SYMBOL, dtype=np.int32)
        self.a_ext[1 : len(a) + 1] = self.a
        self.b_arr = np.full(jdim + hb + 8, PAD_SYMBOL - 1, dtype=np.int32)
        self.b_arr[1 : len(b) + 1] = self.b
        self.c_arr = np.full(kdim + wc + 8, PAD_SYMBOL - 2, dtype=np.int32)
        self.c_arr[1 : len(c) + 1] = self.c
        self.lens = np.array([len(a), len(b), len(c)], dtype=np.int32)

        self.next_idx = 0
        self.srf = np.zeros((n_kb, 8 * s1, wc), dtype=np.int32)
        self.cf = np.zeros((n_jb, 8 * s2, ((hb + 127) // 128) * 128), dtype=np.int32)
        self.res = np.zeros((8, 1), dtype=np.int32)

    # ------------------------------------------------------------------
    def _fingerprint(self) -> str:
        """Identity of this exact problem: sequences, scoring, geometry.
        Resuming someone else's checkpoint would silently corrupt scores."""
        import hashlib

        h = hashlib.sha256()
        for arr in (self.a, self.b, self.c):
            h.update(np.ascontiguousarray(arr, dtype=np.uint8).tobytes())
        h.update(repr(self.scoring).encode())
        h.update(repr(self.dims).encode())
        return h.hexdigest()

    def save(self) -> None:
        tmp = self.ckpt_path + ".tmp.npz"
        np.savez_compressed(
            tmp, next_idx=self.next_idx, srf=self.srf, cf=self.cf, res=self.res,
            lens=self.lens, fingerprint=np.frombuffer(
                self._fingerprint().encode(), dtype=np.uint8
            ),
        )
        os.replace(tmp, self.ckpt_path)

    def resume(self) -> bool:
        """Load checkpoint state if present and it belongs to this exact
        problem (sequence + scoring + geometry fingerprint); returns True
        if resumed."""
        if not os.path.exists(self.ckpt_path):
            return False
        data = np.load(self.ckpt_path)
        if "fingerprint" not in data or bytes(
            data["fingerprint"].tobytes()
        ).decode() != self._fingerprint():
            return False
        if data["srf"].shape != self.srf.shape or not np.array_equal(
            data["lens"], self.lens
        ):
            return False
        self.next_idx = int(data["next_idx"])
        self.srf = data["srf"]
        self.cf = data["cf"]
        self.res = data["res"]
        return True

    def run(self, checkpoint: bool = True) -> int:
        """Run remaining blocks (possibly after resume); returns the score."""
        while self.next_idx < self.n_blocks:
            count = min(self.every, self.n_blocks - self.next_idx)
            srf, cf, res = _segment(
                jnp.asarray(self.lens),
                jnp.asarray(self.a_ext),
                jnp.asarray(self.b_arr),
                jnp.asarray(self.c_arr),
                jnp.asarray(self.srf),
                jnp.asarray(self.cf),
                jnp.asarray(self.res),
                jnp.int32(self.next_idx),
                self.dims,
                count,
                self.scoring,
                self.interpret,
            )
            self.srf = np.asarray(jax.device_get(srf))
            self.cf = np.asarray(jax.device_get(cf))
            self.res = np.asarray(jax.device_get(res))
            self.next_idx += count
            if checkpoint:
                self.save()
        return int(self.res[:NUM_MATRICES, 0].max())


def align_blocked_checkpointed(
    a, b, c, scoring: Scoring = Scoring(), ckpt_path: Optional[str] = None,
    every: int = 8, resume: bool = True, **kw
) -> int:
    """Convenience wrapper: align with periodic checkpoints, resuming from
    an existing compatible checkpoint when present."""
    runner = CheckpointedAligner(a, b, c, scoring, ckpt_path, every, **kw)
    if resume:
        runner.resume()
    score = runner.run()
    if runner.ckpt_path and os.path.exists(runner.ckpt_path):
        os.remove(runner.ckpt_path)
    return score
