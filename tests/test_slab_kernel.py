"""Blocked Pallas slab sweeps (kernels/slab.py) vs the NumPy engine.

The slab kernels serve the Hirschberg top split above the direct engine's
cap; every captured cell must be elementwise-identical to
traceback/engine.py's sweeps (which are themselves fuzzed against the
golden model in test_hirschberg.py).
"""

import numpy as np
import pytest

from tests.conftest import random_triplet
from trialign.config import NUM_MATRICES, Scoring
from trialign.traceback.engine import NEG, backward_slab, forward_sweep

slab = pytest.importorskip("trialign.kernels.slab")

# Small geometry: 2x2 block grid (hb=24 -> tb=23, wc=128 -> tc=127),
# exercising both face-exchange directions.  wc stays 128: the HBM DMA
# minor dim must be a multiple of 128.
BS = (24, 128, 8)


def fwd_pair(a, b, c, scoring, mode):
    ref = forward_sweep(a, b, c, scoring, mode=mode, capture_m=len(a))
    got = slab.forward_slab_blocked_async(
        a, b, c, scoring, mode=mode, block_shape=BS, interpret=True
    )()
    return ref, got


@pytest.mark.heavy
@pytest.mark.parametrize("mode", ["free", "free_jk"])
def test_forward_slab_parity(rng, mode):
    a, b, c = random_triplet(rng, 20, 30, 150)
    (f_ref, s_ref, _), (f_got, s_got) = fwd_pair(a, b, c, Scoring(), mode)
    np.testing.assert_array_equal(f_ref, f_got)
    np.testing.assert_array_equal(s_ref, s_got)


@pytest.mark.heavy
def test_forward_slab_single_block(rng):
    # n_jb == n_kb == 1: no faces at all; free_jk borders set in-kernel.
    a, b, c = random_triplet(rng, 12, 18, 40)
    for mode in ("free", "free_jk"):
        (f_ref, s_ref, _), (f_got, s_got) = fwd_pair(
            a, b, c, Scoring(), mode
        )
        np.testing.assert_array_equal(f_ref, f_got)
        np.testing.assert_array_equal(s_ref, s_got)


@pytest.mark.heavy
def test_forward_slab_rtl_scoring(rng):
    a, b, c = random_triplet(rng, 16, 40, 140)
    (f_ref, s_ref, _), (f_got, s_got) = fwd_pair(
        a, b, c, Scoring(s3_mode="rtl"), "free"
    )
    np.testing.assert_array_equal(f_ref, f_got)
    np.testing.assert_array_equal(s_ref, s_got)


def test_slab_submatrix_parity(rng):
    """Runtime substitution matrix through BOTH slab variants: elementwise
    equality vs the numpy engine (which scores via pair_score), forward
    capture and backward suffix slab."""
    m = rng.integers(-3, 4, size=(4, 4))
    m = ((m + m.T) // 2).astype(int)
    sc = Scoring(submatrix=tuple(tuple(int(v) for v in row) for row in m))
    a, b, c = random_triplet(rng, 12, 24, 100)
    (f_ref, s_ref, _), (f_got, s_got) = fwd_pair(a, b, c, sc, "free")
    np.testing.assert_array_equal(f_ref, f_got)
    np.testing.assert_array_equal(s_ref, s_got)
    ref = backward_slab(a, b, c, sc)
    got = slab.backward_slab_blocked_async(
        a, b, c, sc, block_shape=BS, interpret=True
    )()
    np.testing.assert_array_equal(ref, got)


@pytest.mark.heavy
@pytest.mark.parametrize("end_state", [None, 0, 3])
def test_backward_slab_parity(rng, end_state):
    a, b, c = random_triplet(rng, 20, 30, 150)
    end_v = np.zeros(NUM_MATRICES, dtype=np.int32)
    if end_state is not None:
        end_v[:] = NEG
        end_v[end_state] = 0
    ref = backward_slab(a, b, c, Scoring(), end_v=end_v)
    got = slab.backward_slab_blocked_async(
        a, b, c, Scoring(), end_v=end_v, block_shape=BS, interpret=True
    )()
    np.testing.assert_array_equal(ref, got)


@pytest.mark.heavy
def test_backward_slab_single_block(rng):
    a, b, c = random_triplet(rng, 12, 18, 40)
    ref = backward_slab(a, b, c, Scoring())
    got = slab.backward_slab_blocked_async(
        a, b, c, Scoring(), block_shape=BS, interpret=True
    )()
    np.testing.assert_array_equal(ref, got)


@pytest.mark.heavy
def test_hirschberg_top_split_via_slab_kernels(rng, monkeypatch):
    """End-to-end: force the Hirschberg split through the Pallas slab
    kernels (TRIALIGN_SLAB_FORCE) and check the recovered alignment."""
    import trialign.traceback.hirschberg as H
    from trialign.golden import align_planes_numpy
    from trialign.golden.numpy_model import rescore_alignment

    monkeypatch.setenv("TRIALIGN_SLAB_FORCE", "1")
    # Thresholds sized so exactly the TOP split runs (cells ~67k > 2^16)
    # through the slab kernels and both halves land in the direct engine
    # -- the shape of a real 2k^3 solve.  The small test block shape keeps
    # the interpret sweeps fast.
    monkeypatch.setattr(H, "DIRECT_CELLS", 1 << 16)
    monkeypatch.setattr(H, "_DIRECT_SAFE_CELLS", 1 << 16)
    monkeypatch.setattr(
        slab, "_plan",
        lambda la, lb, lc, live, bs: slab.plan_dims(la, lb, lc, *BS),
    )
    a, b, c = random_triplet(rng, 18, 26, 130)
    score, rows = H.hirschberg_align(a, b, c, Scoring())
    assert score == align_planes_numpy(a, b, c, Scoring())
    assert rescore_alignment(rows) == score


@pytest.mark.heavy
def test_hirschberg_pin_splits_via_slab_kernels(rng, monkeypatch):
    """Pin-mode (v0-seeded) splits run on the Pallas slab kernels too:
    round-4 tb-trace caught the recursion's INTERIOR nodes falling back
    to the slow XLA engine (~55 s per 2k-class pin node of a 4k^3
    traceback).  Thresholds here force MULTIPLE levels of splitting, so
    pin nodes (the right halves) hit split_point_blocked_async with a
    one-hot origin vector; exact score + rescore parity proves the
    pin-mode kernel borders/origin seeding."""
    import trialign.traceback.hirschberg as H
    from trialign.golden import align_planes_numpy
    from trialign.golden.numpy_model import rescore_alignment

    monkeypatch.setenv("TRIALIGN_SLAB_FORCE", "1")
    monkeypatch.setattr(H, "BASE_CELLS", 1 << 9)
    monkeypatch.setattr(H, "DIRECT_CELLS", 1 << 10)
    monkeypatch.setattr(H, "_DIRECT_SAFE_CELLS", 1 << 10)
    monkeypatch.setattr(
        slab, "_plan",
        lambda la, lb, lc, live, bs: slab.plan_dims(la, lb, lc, *BS),
    )
    calls = {"pin": 0}
    orig_sp = slab.split_point_blocked_async

    def spy(a, b, c, m, scoring=Scoring(), mode="free", end_v=None,
            interpret=None, v0=None):
        if mode == "pin":
            calls["pin"] += 1
            assert v0 is not None
        return orig_sp(a, b, c, m, scoring, mode=mode, end_v=end_v,
                       interpret=interpret, v0=v0)

    monkeypatch.setattr(
        "trialign.kernels.slab.split_point_blocked_async", spy
    )
    a, b, c = random_triplet(rng, 18, 26, 60)
    score, rows = H.hirschberg_align(a, b, c, Scoring())
    assert score == align_planes_numpy(a, b, c, Scoring())
    assert rescore_alignment(rows) == score
    assert calls["pin"] >= 1, "no pin-mode split exercised the kernels"
