"""Hardware parity tests: run with

    TRIALIGN_TEST_TPU=1 python -m pytest tests/ -q -m tpu

(the default suite pins JAX to a virtual CPU mesh and deselects these).
Each test asserts bit-exact integer parity of a compiled TPU kernel against
the NumPy oracle."""

import numpy as np
import pytest

from trialign.config import Scoring
from trialign.golden import align_planes_numpy
from tests.conftest import random_triplet

tpu_only = pytest.mark.skipif(
    __import__("jax").default_backend() != "tpu", reason="needs TPU hardware"
)


@pytest.mark.tpu
@tpu_only
def test_wavefront_compiled_parity(rng):
    from trialign.kernels.wavefront import align_wavefront

    for dims in ((64, 64, 64), (200, 150, 250), (100, 30, 255)):
        a, b, c = random_triplet(rng, *dims)
        assert align_wavefront(a, b, c) == align_planes_numpy(a, b, c), dims


@pytest.mark.tpu
@tpu_only
def test_blocked_compiled_parity(rng):
    from trialign.kernels.blocked import align_blocked

    for dims, sc in (
        ((300, 300, 300), Scoring()),
        ((40, 400, 500), Scoring(s3_mode="rtl")),
    ):
        a, b, c = random_triplet(rng, *dims)
        assert align_blocked(a, b, c, sc) == align_planes_numpy(a, b, c, sc), dims


@pytest.mark.tpu
@tpu_only
def test_score_bits_compiled_parity(rng):
    """RTL bit-parity wrap (score_bits) must compile under Mosaic and
    match the golden emulation on both Pallas kernels, including real
    overflow through the blocked path's HBM faces."""
    from trialign.kernels.blocked import align_blocked
    from trialign.kernels.wavefront import align_wavefront

    a, b, c = random_triplet(rng, 100, 120, 140)
    assert align_wavefront(a, b, c, score_bits=12) == \
        align_planes_numpy(a, b, c, score_bits=12)
    # Real overflow through the blocked path's faces: 8-bit wrap (same
    # mechanism as the RTL's 12-bit, cheap enough for the 1-CPU oracle --
    # 12-bit overflow needs |A| ~ 700+, ~10 min of golden sweep).
    seq = np.full(100, 2, np.uint8)  # all-match: score 3*100 > 2^7, wraps
    want = align_planes_numpy(seq, seq, seq, score_bits=8)
    assert align_blocked(seq, seq, seq, score_bits=8,
                         block_shape=(64, 128)) == want
    assert want != align_planes_numpy(seq, seq, seq)  # wrap actually bit


@pytest.mark.tpu
@tpu_only
def test_submatrix_compiled_parity(rng):
    """Select-chain submatrix tables (plane_math.submatrix_tables) must
    compile under Mosaic and match the oracle on both Pallas kernels."""
    from trialign.kernels.blocked import align_blocked
    from trialign.kernels.wavefront import align_wavefront

    m = rng.integers(-4, 5, size=(4, 4))
    m = ((m + m.T) // 2).astype(int)
    sc = Scoring(submatrix=tuple(tuple(int(v) for v in row) for row in m))
    a, b, c = random_triplet(rng, 120, 100, 140)
    want = align_planes_numpy(a, b, c, sc)
    assert align_wavefront(a, b, c, sc) == want
    a2, b2, c2 = random_triplet(rng, 60, 300, 300)
    want2 = align_planes_numpy(a2, b2, c2, sc)
    assert align_blocked(a2, b2, c2, sc) == want2


@pytest.mark.tpu
@tpu_only
def test_traceback_compiled_parity(rng):
    import trialign.traceback.hirschberg as H
    from trialign.golden.numpy_model import rescore_alignment

    a, b, c = random_triplet(rng, 150, 120, 140)
    want = align_planes_numpy(a, b, c)
    score, rows = H.hirschberg_align(a, b, c)
    assert score == want
    assert rescore_alignment(rows) == want


@pytest.mark.tpu
@tpu_only
def test_chain_homo_compiled_parity(rng):
    """A-axis chain (shared B/C) on hardware, multi-block geometry."""
    from trialign.kernels.blocked import align_blocked_chain

    a_list = [random_triplet(rng, 60, 1, 1)[0] for _ in range(4)]
    _, b, c = random_triplet(rng, 1, 200, 300)
    want = [align_planes_numpy(a, b, c) for a in a_list]
    assert align_blocked_chain(a_list, b, c) == want


@pytest.mark.tpu
@tpu_only
def test_chain_hetero_compiled_parity(rng):
    """Hetero chain (per-slot B/C band rings) on hardware."""
    from trialign.kernels.chain import align_chain

    trips = [random_triplet(rng, 60, 80, 100), random_triplet(rng, 50, 90, 70),
             random_triplet(rng, 70, 60, 110)]
    want = [align_planes_numpy(*t) for t in trips]
    assert align_chain(trips) == want


@pytest.mark.tpu
@tpu_only
def test_mosaic_compiled_parity(rng):
    """Mosaic tiling (production canvas geometry, incl. multi-band tiles
    AND a tall-class problem) on hardware -- covers the shipped
    HB/WC/BANDS/TALL_SHAPES constants end to end, not a shrunk twin
    (round-3 VERDICT item 8)."""
    from trialign.kernels.mosaic import align_batch_mosaic

    trips = [random_triplet(rng, 150, 130, 140), random_triplet(rng, 200, 90, 180),
             random_triplet(rng, 120, 160, 100), random_triplet(rng, 180, 140, 150),
             # mid length 360 > HB-2: routes through the tall classes
             random_triplet(rng, 420, 360, 200)]
    want = [align_planes_numpy(*t) for t in trips]
    assert align_batch_mosaic(trips) == want


@pytest.mark.tpu
@tpu_only
def test_direct_traceback_compiled_parity(rng):
    """Direct choice-capture traceback engine on hardware."""
    from trialign.golden.numpy_model import rescore_alignment
    from trialign.traceback.direct import direct_traceback

    a, b, c = random_triplet(rng, 140, 130, 150)
    want = align_planes_numpy(a, b, c)
    score, cols = direct_traceback(a, b, c)
    rows = [list(r) for r in zip(*cols)]
    assert score == want
    assert rescore_alignment(rows, Scoring()) == want
