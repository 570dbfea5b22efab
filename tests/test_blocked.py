"""Blocked (sliced) sweep parity tests.

Interpret mode is slow, so the default suite runs one small multi-block
case with a reduced block shape; the full-size cases are slow-marked.
Real-TPU parity at 300^3..1k^3 is exercised by bench.py and was verified
against the golden model / XLA reference during development.
"""

import numpy as np
import pytest

from trialign.golden import align_planes_numpy
from trialign.kernels.blocked import align_blocked, plan_dims
from tests.conftest import random_triplet

pytestmark = pytest.mark.heavy  # minutes-long on CPU interpret


def test_plan_dims_geometry():
    hb, wc, lab, n_jb, n_kb, qqb, kdim, jdim, s1, s2, unb = plan_dims(300, 300, 300)
    assert (hb, wc) == (256, 256)
    assert n_jb == 2 and n_kb == 2  # ceil(300/255)
    assert qqb % unb == 0 and qqb >= lab + 255 + 255
    # Face rows are slab-local (q + guard); must cover the last macro-step's
    # full batch.
    assert s1 >= qqb + 2 * unb
    assert s2 >= qqb + 2 * unb


def test_blocked_multiblock_j(rng):
    a, b, c = random_triplet(rng, 10, 40, 50)
    want = align_planes_numpy(a, b, c)
    got = align_blocked(a, b, c, interpret=True, block_shape=(16, 128))
    assert got == want


def test_blocked_plan_lens_parity(rng):
    """Planning at padded length caps (shared-kernel batching) must not
    change scores: runtime length scalars stay exact, padded planes are
    dead cells."""
    import jax

    from trialign.kernels.blocked import align_blocked_async

    for lens in [(10, 40, 50), (16, 33, 41), (9, 12, 14)]:
        a, b, c = random_triplet(rng, *lens)
        want = align_planes_numpy(a, b, c)
        got = int(jax.device_get(align_blocked_async(
            a, b, c, interpret=True, block_shape=(16, 128),
            plan_lens=(24, 48, 64),
        )))
        assert got == want


@pytest.mark.slow
def test_blocked_multiblock_jk(rng):
    a, b, c = random_triplet(rng, 8, 35, 300)
    want = align_planes_numpy(a, b, c)
    got = align_blocked(a, b, c, interpret=True, block_shape=(16, 128))
    assert got == want


@pytest.mark.slow
def test_blocked_nondefault_scoring(rng):
    from trialign.config import Scoring

    sc = Scoring(match=2, mismatch=-1, gap_open=3, gap_extend=1, s3_mode="rtl")
    a, b, c = random_triplet(rng, 6, 20, 140)
    want = align_planes_numpy(a, b, c, sc)
    got = align_blocked(a, b, c, sc, interpret=True, block_shape=(16, 128))
    assert got == want


def test_blocked_empty():
    e = np.zeros(0, dtype=np.uint8)
    assert align_blocked(e, e, e) == 0


def test_blocked_nondefault_macro_step(rng):
    """The macro-step (unb) is a plan parameter; a 16-plane macro must give
    identical scores to the default."""
    a, b, c = random_triplet(rng, 10, 40, 50)
    want = align_planes_numpy(a, b, c)
    got = align_blocked(a, b, c, interpret=True, block_shape=(16, 128, 16))
    assert got == want


def test_blocked_chain_parity(rng):
    """A-axis chain packing: several equal-length A's against shared B/C in
    one fused sweep must reproduce every individual golden score (the
    ramp-amortizing throughput mode, plan_dims_packed)."""
    from trialign.kernels.blocked import align_blocked_chain

    a_list = [random_triplet(rng, 20, 1, 1)[0] for _ in range(5)]
    _, b, c = random_triplet(rng, 1, 30, 40)
    want = [align_planes_numpy(a, b, c) for a in a_list]
    # multi-block geometry: chain borders must survive face exchange
    got = align_blocked_chain(a_list, b, c, block_shape=(16, 128))
    assert got == want
    # single-block geometry
    got2 = align_blocked_chain(a_list, b, c, block_shape=(48, 128))
    assert got2 == want


def test_blocked_chain_single_and_empty(rng):
    from trialign.kernels.blocked import align_blocked_chain

    a, b, c = random_triplet(rng, 12, 18, 25)
    assert align_blocked_chain([a], b, c, block_shape=(32, 128)) == [
        align_planes_numpy(a, b, c)
    ]
    assert align_blocked_chain([], b, c) == []
    e = np.zeros(0, dtype=np.uint8)
    assert align_blocked_chain([a, a], e, c) == [0, 0]


def test_blocked_chain_nondefault_scoring(rng):
    from trialign.config import Scoring
    from trialign.kernels.blocked import align_blocked_chain

    sc = Scoring(match=2, mismatch=-3, gap_open=4, gap_extend=1, s3_mode="rtl")
    a_list = [random_triplet(rng, 15, 1, 1)[0] for _ in range(3)]
    _, b, c = random_triplet(rng, 1, 22, 35)
    want = [align_planes_numpy(a, b, c, sc) for a in a_list]
    assert align_blocked_chain(a_list, b, c, sc, block_shape=(16, 128)) == want
