"""Hirschberg divide-and-conquer alignment recovery: scores must equal the
golden DP optimum, recovered alignments must reproduce the sequences and
independently rescore to the optimum."""

import numpy as np
import pytest

import trialign.traceback.hirschberg as H
from trialign.config import Scoring
from trialign.golden import align_planes_numpy, rescore_alignment
from trialign.traceback.engine import backward_slab, forward_sweep
from trialign.traceback.hirschberg import hirschberg_align
from tests.conftest import random_triplet


def _check(a, b, c, scoring=Scoring()):
    want = align_planes_numpy(a, b, c, scoring)
    got, rows = hirschberg_align(a, b, c, scoring)
    assert got == want
    for row, seq in zip(rows, (a, b, c)):
        assert [v for v in row if v != -1] == list(map(int, seq))
    assert rescore_alignment(rows, scoring) == want


def test_small_cases_recursive(rng, monkeypatch):
    # Tiny base budget forces multiple split levels even at small sizes.
    monkeypatch.setattr(H, "BASE_CELLS", 2000)
    for _ in range(8):
        la, lb, lc = (int(x) for x in rng.integers(8, 40, size=3))
        _check(*random_triplet(rng, la, lb, lc))


def test_rtl_and_nondefault_scoring(rng, monkeypatch):
    monkeypatch.setattr(H, "BASE_CELLS", 2000)
    sc = Scoring(match=2, mismatch=-1, gap_open=3, gap_extend=1, s3_mode="rtl")
    for _ in range(3):
        la, lb, lc = (int(x) for x in rng.integers(10, 35, size=3))
        _check(*random_triplet(rng, la, lb, lc), scoring=sc)


def test_split_combination_equals_full_score(rng):
    # max(F + G) over the split slab must reproduce the full DP optimum
    # whenever some optimal path crosses i = m by real steps; with the
    # right-half free_jk fallback the max of the two equals the optimum.
    a, b, c = random_triplet(rng, 20, 15, 18)
    want = align_planes_numpy(a, b, c)
    m = 10
    _, f_slab, _ = forward_sweep(a[:m], b, c, capture_m=m)
    g_slab = backward_slab(a[m:], b, c)
    h_final, _, _ = forward_sweep(a[m:], b, c, mode="free_jk")
    combined = max(int((f_slab.astype(np.int64) + g_slab).max()), int(h_final.max()))
    assert combined == want


def test_identical_sequences(monkeypatch):
    monkeypatch.setattr(H, "BASE_CELLS", 500)
    n = 24
    a = np.tile(np.arange(4, dtype=np.uint8), n // 4)
    score, rows = hirschberg_align(a, a, a)
    assert score == 3 * n
    assert rows[0] == rows[1] == rows[2] == list(map(int, a))


def test_empty_sequence():
    e = np.zeros(0, dtype=np.uint8)
    a = np.array([0, 1, 2], dtype=np.uint8)
    score, rows = hirschberg_align(a, e, a)
    assert score == 0
    assert [v for v in rows[0] if v != -1] == [0, 1, 2]
    assert all(v == -1 for v in rows[1])


@pytest.mark.slow
def test_dat_triplet(monkeypatch):
    from trialign.io import load_reference_triplet

    monkeypatch.setattr(H, "BASE_CELLS", 2000)
    a, b, c = load_reference_triplet()
    _check(a, b, c)
