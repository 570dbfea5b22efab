"""Native C++ reference engine: exact parity with the golden model."""

import numpy as np
import pytest

from trialign.config import Scoring
from trialign.golden import align_planes_numpy
from tests.conftest import random_triplet

native = pytest.importorskip("trialign.native")
if not native.is_available():  # pragma: no cover - toolchain missing
    pytest.skip("g++ toolchain unavailable", allow_module_level=True)


@pytest.mark.parametrize("s3_mode", ["sop", "rtl"])
def test_native_matches_golden(rng, s3_mode):
    sc = Scoring(s3_mode=s3_mode)
    for _ in range(6):
        la, lb, lc = (int(x) for x in rng.integers(4, 40, size=3))
        a, b, c = random_triplet(rng, la, lb, lc)
        assert native.score_native(a, b, c, sc) == align_planes_numpy(a, b, c, sc)


def test_native_nondefault_scoring(rng):
    sc = Scoring(match=3, mismatch=-2, gap_open=5, gap_extend=2)
    a, b, c = random_triplet(rng, 20, 25, 15)
    assert native.score_native(a, b, c, sc) == align_planes_numpy(a, b, c, sc)


def test_native_batch(rng):
    trips = [
        tuple(random_triplet(rng, *(int(x) for x in rng.integers(3, 25, size=3))))
        for _ in range(12)
    ]
    want = [align_planes_numpy(a, b, c) for a, b, c in trips]
    assert native.score_native_batch(trips) == want


def test_native_empty():
    e = np.zeros(0, dtype=np.uint8)
    a = np.ones(3, dtype=np.uint8)
    assert native.score_native(a, e, a) == 0


def test_native_dat_triplet():
    from trialign.io import load_reference_triplet

    a, b, c = load_reference_triplet()
    assert native.score_native(a, b, c) == align_planes_numpy(a, b, c)


@pytest.mark.parametrize("s3_mode", ["sop", "rtl"])
def test_native_traceback_fuzz(rng, s3_mode):
    """Native alignments score exactly and rescore to their own score (any
    co-optimal alignment is acceptable; rescoring is the invariant)."""
    from trialign.golden.numpy_model import rescore_alignment

    sc = Scoring(s3_mode=s3_mode)
    for _ in range(8):
        la, lb, lc = (int(x) for x in rng.integers(2, 36, size=3))
        a, b, c = random_triplet(rng, la, lb, lc)
        score, rows = native.align_native(a, b, c, sc)
        assert score == align_planes_numpy(a, b, c, sc)
        assert rescore_alignment(rows, sc) == score
        # Gap-stripped rows reproduce the inputs.
        assert [v for v in rows[0] if v != -1] == list(a)
        assert [v for v in rows[1] if v != -1] == list(b)
        assert [v for v in rows[2] if v != -1] == list(c)


def test_native_traceback_matches_hirschberg_score():
    from trialign.traceback.hirschberg import hirschberg_align

    rng = np.random.default_rng(11)
    a, b, c = random_triplet(rng, 30, 24, 18)
    ns, _ = native.align_native(a, b, c)
    hs, _ = hirschberg_align(a, b, c)
    assert ns == hs


def test_api_native_traceback(rng):
    """align(backend='native', return_alignment=True) routes through the
    C++ choice-capture engine and returns a valid optimal alignment."""
    from trialign.api import align
    from trialign.golden.numpy_model import rescore_alignment

    a, b, c = random_triplet(rng, 22, 18, 27)
    res = align(a, b, c, backend="native", return_alignment=True)
    assert res.backend == "native"
    assert res.score == align_planes_numpy(a, b, c)
    assert rescore_alignment(res.alignment) == res.score


def test_native_traceback_empty():
    e = np.zeros(0, dtype=np.uint8)
    a = np.ones(3, dtype=np.uint8)
    score, rows = native.align_native(a, e, a)
    assert score == 0
    assert [v for v in rows[0] if v != -1] == [1, 1, 1]


def test_native_submatrix_score_and_traceback(rng):
    """Runtime substitution matrix in the C++ engine: score and recovered
    alignment must match the golden model via the (256, 256) lookup
    (trialign_score_sub / trialign_align_sub); pads score the clamped
    floor.  Batch stays gated (the padded device path owns it)."""
    from trialign.config import Scoring
    from trialign.golden.numpy_model import rescore_alignment

    for trial in range(4):
        m = rng.integers(-4, 5, size=(4, 4))
        m = ((m + m.T) // 2).astype(int)
        sc = Scoring(submatrix=tuple(tuple(int(v) for v in row) for row in m))
        la, lb, lc = (int(x) for x in rng.integers(3, 35, size=3))
        a, b, c = random_triplet(rng, la, lb, lc)
        want = align_planes_numpy(a, b, c, sc)
        assert native.score_native(a, b, c, sc) == want, trial
        s, rows = native.align_native(a, b, c, sc)
        assert s == want and rescore_alignment(rows, sc) == want, trial
    import pytest as _pytest

    with _pytest.raises(ValueError, match="submatrix"):
        native.score_native_batch([(a, b, c)], sc)
