"""Heterogeneous A-axis chain tests (kernels/chain.py): distinct triplets
fused into one sweep, per-slot B/C band selection, packer, batch pipeline.
All on CPU interpret mode with exact golden parity."""

import numpy as np
import pytest

from trialign.config import Scoring
from trialign.golden import align_planes_numpy
from tests.conftest import random_triplet

pytestmark = pytest.mark.heavy  # minutes-long on CPU interpret


def _rt(rng, la, lb, lc):
    return tuple(rng.integers(0, 4, s).astype(np.uint8) for s in (la, lb, lc))


def test_hetero_chain_basic(rng):
    from trialign.kernels.chain import align_chain

    trips = [_rt(rng, 12, 10, 14), _rt(rng, 9, 13, 11),
             _rt(rng, 15, 8, 16), _rt(rng, 11, 12, 9)]
    got = align_chain(trips, block_shape=(24, 128, 8))
    assert got == [align_planes_numpy(*t) for t in trips]


def test_hetero_chain_multiblock(rng):
    from trialign.kernels.chain import align_chain

    trips = [_rt(rng, 10, 25, 140), _rt(rng, 8, 28, 135), _rt(rng, 12, 22, 150)]
    got = align_chain(trips, block_shape=(16, 128, 8))
    assert got == [align_planes_numpy(*t) for t in trips]


def test_hetero_chain_band_crossing_regression(rng):
    """Pinned regression: an interval of hb+wc-3 consecutive global-i
    values can straddle S//d + 1 slot borders, touching S//d + 2 slots;
    the band count must be S//d + 2 or the youngest cells right after a
    border crossing read the previous slot's B/C (caught on TPU at
    (240, 640), d=470, slot 15)."""
    from trialign.kernels.chain import align_chain, plan_hetero

    trips = [_rt(rng, 73, 20, 120), _rt(rng, 70, 18, 119),
             _rt(rng, 73, 22, 121), _rt(rng, 71, 19, 118),
             _rt(rng, 72, 21, 117)]
    # static band count must cover S//d + 2 = 4 for d = 74, S = 148
    assert plan_hetero(73, 22, 121, 5, 24, 128, 8)[13] >= 4
    got = align_chain(trips, block_shape=(24, 128, 8))
    assert got == [align_planes_numpy(*t) for t in trips]


def test_hetero_chain_single_slot(rng):
    from trialign.kernels.chain import align_chain

    t = _rt(rng, 30, 18, 22)
    assert align_chain([t], block_shape=(32, 128, 8)) == [align_planes_numpy(*t)]


def test_hetero_chain_nondefault_scoring(rng):
    from trialign.config import Scoring
    from trialign.kernels.chain import align_chain

    sc = Scoring(match=2, mismatch=-3, gap_open=4, gap_extend=1, s3_mode="rtl")
    trips = [_rt(rng, 10, 12, 15), _rt(rng, 8, 14, 10), _rt(rng, 13, 9, 18)]
    got = align_chain(trips, sc, block_shape=(24, 128, 8))
    assert got == [align_planes_numpy(*t, sc) for t in trips]


def test_pack_chains_collisions_and_order(rng):
    from trialign.kernels.chain import pack_chains

    trips = [(i, _rt(rng, 10 + i, 12, 14)) for i in range(5)]  # same (lb,lc)
    chains = pack_chains(trips, max_p=4)
    # identical final cells can never share a chain
    assert all(len(ch) == 1 for ch in chains) and len(chains) == 5
    mixed = [(i, _rt(rng, 10, 10 + i, 14)) for i in range(5)]
    chains2 = pack_chains(mixed, max_p=4)
    assert sum(len(c) for c in chains2) == 5 and len(chains2) == 2


def test_align_batch_chained_mixed(rng):
    from trialign.kernels.chain import align_batch_chained

    trips = [_rt(rng, 10, 12, 14), _rt(rng, 9, 12, 14), _rt(rng, 11, 12, 14),
             (np.zeros(0, np.uint8), np.zeros(3, np.uint8), np.zeros(3, np.uint8)),
             _rt(rng, 14, 9, 20), _rt(rng, 7, 16, 11)]
    got = align_batch_chained(trips)
    want = [align_planes_numpy(*t) if min(map(len, t)) else 0 for t in trips]
    assert got == want


def test_hetero_chain_submatrix_parity(rng):
    """Runtime submatrix through the hetero band-select ring: the ring
    carries 3 packed score planes per slot (plane_math.hetero_sub_planes)
    instead of the symbol plane -- TPU-native form of the testbench's
    never-wired score-matrix ports (reference:
    src/TriAlign_tb.sv:220-224,280-290)."""
    from trialign.kernels.chain import align_chain

    sub = ((2, -1, -2, -1), (-1, 2, -1, -2), (-2, -1, 2, -1), (-1, -2, -1, 2))
    scoring = Scoring(submatrix=sub)
    # Distinct (lb, lc) final cells per align_chain's packer contract
    # (same-cell triplets ride align_batch_chained, which splits chains).
    trips = [_rt(rng, 11, 9, 17), _rt(rng, 6, 9, 13), _rt(rng, 14, 21, 8),
             _rt(rng, 3, 10, 17)]
    got = align_chain(trips, scoring)
    want = [align_planes_numpy(*t, scoring) for t in trips]
    assert got == want


def test_hetero_chain_submatrix_asymmetric_floor(rng):
    """Asymmetric matrix + extreme byte-range entries: S(x,y) != S(y,x)
    must survive the packed-byte extraction, and the clamped floor must
    apply to pads."""
    from trialign.kernels.chain import align_chain

    sub = ((5, -3, 0), (-1, 4, -7), (2, -128, 3))  # 3 symbols, asymmetric
    scoring = Scoring(submatrix=sub)
    trips = [tuple(rng.integers(0, 3, n).astype(np.uint8) for n in lens)
             for lens in ((12, 8, 15), (10, 9, 13), (7, 11, 16))]
    got = align_chain(trips, scoring)
    want = [align_planes_numpy(*t, scoring) for t in trips]
    assert got == want


def test_hetero_chain_submatrix_ineligible_raises(rng):
    from trialign.kernels.chain import align_chain

    big = tuple(tuple(1 if i == j else -1 for j in range(5))
                for i in range(5))
    with np.testing.assert_raises(ValueError):
        align_chain([_rt(rng, 5, 5, 5)], Scoring(submatrix=big))
    wide = ((300, -1), (-1, 300))  # beyond byte range
    with np.testing.assert_raises(ValueError):
        align_chain([_rt(rng, 5, 5, 5)], Scoring(submatrix=wide))
