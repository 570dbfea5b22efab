"""Seeded randomized cross-backend parity sweep.

Every compute path must produce the identical integer on every input: the
golden vectorized sweep is itself validated against the O(49 n^3) brute
force (test_golden), so here it serves as the oracle for the compiled
backends across random shapes, scorings, and both S3 modes.
"""

import numpy as np
import pytest

from trialign.config import Scoring
from trialign.golden import align_planes_numpy
from tests.conftest import random_triplet


SCORINGS = [
    Scoring(),
    Scoring(s3_mode="rtl"),
    Scoring(match=2, mismatch=-3, gap_open=4, gap_extend=1),
    Scoring(match=3, mismatch=0, gap_open=1, gap_extend=1),  # go == ge: single group
]


@pytest.mark.slow
def test_fuzz_backends_50_cases(rng):
    from trialign.kernels.blocked import align_blocked
    from trialign.kernels.wavefront import align_wavefront
    from trialign.kernels.xla_ref import align_xla
    from trialign.native import score_native

    for trial in range(50):
        la, lb, lc = (int(x) for x in rng.integers(1, 48, size=3))
        a, b, c = random_triplet(rng, la, lb, lc, nsym=int(rng.integers(2, 6)))
        sc = SCORINGS[trial % len(SCORINGS)]
        want = align_planes_numpy(a, b, c, sc)
        assert align_xla(a, b, c, sc) == want, (trial, "xla")
        assert align_wavefront(a, b, c, sc) == want, (trial, "wavefront")
        assert score_native(a, b, c, sc) == want, (trial, "native")
        if trial % 5 == 0:
            assert align_blocked(a, b, c, sc, block_shape=(16, 128)) == want


def test_fuzz_score_bits_xla_matches_golden(rng):
    """RTL bit-parity mode on a compiled backend: the XLA sweep with
    score_bits-wide wrapping registers matches the golden emulation bit for
    bit, including cases where the running scores actually overflow
    (reference: src/TriAlign_1cyc.v:6; PARITY.md quirk 3)."""
    from trialign.kernels.xla_ref import align_xla

    for trial in range(12):
        la, lb, lc = (int(x) for x in rng.integers(4, 28, size=3))
        a, b, c = random_triplet(rng, la, lb, lc, nsym=int(rng.integers(2, 5)))
        sc = SCORINGS[trial % len(SCORINGS)]
        # bits=6 wraps at +/-32 (real overflow at these sizes); bits=12 is
        # the hardware width.
        for bits in (6, 12):
            want = align_planes_numpy(a, b, c, sc, score_bits=bits)
            got = align_xla(a, b, c, sc, score_bits=bits)
            assert got == want, (trial, bits, got, want)
    # An identical-sequence run long enough to overflow 6-bit registers
    # must agree wrapped AND differ from the clean score (wrap really bit).
    n = 30
    seq = np.full(n, 2, np.uint8)
    clean = align_planes_numpy(seq, seq, seq)
    wrapped = align_planes_numpy(seq, seq, seq, score_bits=6)
    assert align_xla(seq, seq, seq, score_bits=6) == wrapped
    assert wrapped != clean


def test_api_score_bits_routing(rng):
    from trialign.api import align

    a, b, c = random_triplet(rng, 10, 10, 10)
    want = align_planes_numpy(a, b, c, score_bits=12)
    res = align(a, b, c, score_bits=12)  # auto -> a wrap-capable backend
    assert res.score == want and res.backend in (
        "xla", "pallas", "pallas_interpret"
    )
    with pytest.raises(ValueError, match="score_bits"):
        align(a, b, c, backend="native", score_bits=12)


def test_fuzz_score_bits_blocked_matches_golden(rng):
    """RTL bit-parity mode on the blocked (sliced) backend -- the regime
    where the hardware's wraparound actually occurs: scores past 2^11 need
    sequences beyond the single-block kernel's 255 cap, which only this
    backend sweeps (reference: src/TriAlign_1cyc.v:6; PARITY.md quirk 3).
    Wrapped stored planes flow through the halo faces too (multi-block
    shape)."""
    from trialign.kernels.blocked import align_blocked

    for trial in range(4):
        a, b, c = random_triplet(rng, 20, 30, 150,
                                 nsym=int(rng.integers(2, 5)))
        sc = SCORINGS[trial % len(SCORINGS)]
        for bits in (6, 12):
            want = align_planes_numpy(a, b, c, sc, score_bits=bits)
            got = align_blocked(a, b, c, sc, block_shape=(24, 128),
                                score_bits=bits)
            assert got == want, (trial, bits, got, want)
    # Real 6-bit overflow through the blocked path: wrapped matches golden
    # AND differs from the clean score.
    seq = np.full(40, 2, np.uint8)
    clean = align_planes_numpy(seq, seq, seq)
    wrapped = align_planes_numpy(seq, seq, seq, score_bits=6)
    assert align_blocked(seq, seq, seq, block_shape=(24, 128),
                         score_bits=6) == wrapped
    assert wrapped != clean


def test_fuzz_score_bits_pallas_matches_golden(rng):
    """RTL bit-parity mode on the PRODUCTION Pallas wavefront backend
    (round-2 VERDICT item 8): wrapped stored registers, carried max7 from
    wrapped planes, bit-exact vs the golden emulation including real
    overflow."""
    from trialign.kernels.wavefront import align_wavefront

    for trial in range(12):
        la, lb, lc = (int(x) for x in rng.integers(4, 28, size=3))
        a, b, c = random_triplet(rng, la, lb, lc, nsym=int(rng.integers(2, 5)))
        sc = SCORINGS[trial % len(SCORINGS)]
        for bits in (6, 12):
            want = align_planes_numpy(a, b, c, sc, score_bits=bits)
            got = align_wavefront(a, b, c, sc, score_bits=bits)
            assert got == want, (trial, bits, got, want)
    # Real 6-bit overflow: wrapped result must match golden AND differ
    # from the clean score.
    seq = np.full(30, 2, np.uint8)
    clean = align_planes_numpy(seq, seq, seq)
    wrapped = align_planes_numpy(seq, seq, seq, score_bits=6)
    assert align_wavefront(seq, seq, seq, score_bits=6) == wrapped
    assert wrapped != clean


@pytest.mark.slow
def test_fuzz_traceback_20_cases(rng):
    from trialign.golden.numpy_model import rescore_alignment
    from trialign.traceback.hirschberg import hirschberg_align

    for trial in range(20):
        la, lb, lc = (int(x) for x in rng.integers(2, 36, size=3))
        a, b, c = random_triplet(rng, la, lb, lc)
        sc = SCORINGS[trial % 2]
        want = align_planes_numpy(a, b, c, sc)
        score, rows = hirschberg_align(a, b, c, sc)
        assert score == want, trial
        assert rescore_alignment(rows, sc) == want, trial
        for row, seq in zip(rows, (a, b, c)):
            assert [v for v in row if v != -1] == list(map(int, seq))


def test_submatrix_scoring_golden_vs_xla(rng):
    """Runtime 4x4 substitution matrix (the testbench's planned-never-
    wired score-matrix ports, src/TriAlign_tb.sv:220-224,280-290): the
    brute force, the golden plane sweep and the compiled XLA backend must
    agree on random matrices; a matrix that replicates match/mismatch
    equality must reproduce default scoring exactly."""
    from trialign.golden import align_bruteforce
    from trialign.kernels.xla_ref import align_xla

    for trial in range(6):
        m = rng.integers(-4, 5, size=(4, 4))
        m = ((m + m.T) // 2).astype(int)  # symmetric, like real sub matrices
        sub = tuple(tuple(int(v) for v in row) for row in m)
        sc = Scoring(submatrix=sub)
        la, lb, lc = (int(x) for x in rng.integers(2, 14, size=3))
        a, b, c = random_triplet(rng, la, lb, lc)
        want = align_planes_numpy(a, b, c, sc)
        assert align_bruteforce(a, b, c, sc) == want, trial
        assert align_xla(a, b, c, sc) == want, trial

    # Degenerate matrix == equality scoring.
    eye = tuple(
        tuple(1 if i == j else -1 for j in range(4)) for i in range(4)
    )
    a, b, c = random_triplet(rng, 10, 11, 9)
    assert align_planes_numpy(a, b, c, Scoring(submatrix=eye)) == \
        align_planes_numpy(a, b, c, Scoring())
    assert align_xla(a, b, c, Scoring(submatrix=eye)) == \
        align_xla(a, b, c, Scoring())


def test_submatrix_validation_and_routing(rng):
    from trialign.api import align
    from trialign.kernels.wavefront import align_wavefront

    sub = ((2, -1), (-1, 2))
    with pytest.raises(ValueError, match="sop"):
        Scoring(submatrix=sub, s3_mode="rtl")
    with pytest.raises(ValueError, match="square"):
        Scoring(submatrix=((1, 2), (3,)))
    a, b, c = random_triplet(rng, 6, 7, 5, nsym=2)
    sc = Scoring(submatrix=sub)
    # auto routes small alphabets to the production kernels (off-TPU the
    # CPU _pick_backend falls back to xla for big planes; this problem is
    # tiny, so pallas_interpret).
    res = align(a, b, c, sc)
    assert res.backend in ("pallas", "pallas_interpret", "blocked", "xla")
    assert res.score == align_planes_numpy(a, b, c, sc)
    # Alphabets beyond the select-chain cap stay on golden/xla.
    big = tuple(tuple(1 if i == j else -1 for j in range(9)) for i in range(9))
    sc_big = Scoring(submatrix=big)
    res_big = align(a, b, c, sc_big)
    assert res_big.backend == "xla"
    assert res_big.score == align_planes_numpy(a, b, c, sc_big)
    with pytest.raises(ValueError, match="submatrix"):
        align(a, b, c, sc_big, backend="pallas")
    with pytest.raises(ValueError, match="symbols"):
        align_wavefront(a, b, c, sc_big)
    # The C++ engine evaluates the matrix via its (256, 256) lookup.
    try:
        from trialign.native import is_available

        native_ok = is_available()
    except Exception:
        native_ok = False  # toolchain missing
    if native_ok:
        res_n = align(a, b, c, sc, backend="native")
        assert res_n.score == align_planes_numpy(a, b, c, sc)
    # Big alphabet + score_bits + auto must route, not raise.
    res_bits = align(a, b, c, sc_big, score_bits=8)
    assert res_bits.backend == "xla"
    assert res_bits.score == align_planes_numpy(a, b, c, sc_big,
                                                score_bits=8)


def test_fuzz_submatrix_pallas_and_blocked_match_golden(rng):
    """Runtime substitution matrix on the PRODUCTION kernels: the Pallas
    wavefront and the blocked (multi-block, face-exchanging) sweep must
    match the golden model on random symmetric matrices, including pads
    falling through to the clamped floor (reference capability:
    src/TriAlign_tb.sv:220-224,280-290; select-chain design in
    plane_math.submatrix_tables)."""
    from trialign.kernels.blocked import align_blocked
    from trialign.kernels.wavefront import align_wavefront

    for trial in range(4):
        nsym = int(rng.integers(2, 6))
        m = rng.integers(-4, 5, size=(nsym, nsym))
        m = ((m + m.T) // 2).astype(int)
        sub = tuple(tuple(int(v) for v in row) for row in m)
        sc = Scoring(submatrix=sub)
        a, b, c = random_triplet(rng, int(rng.integers(3, 20)),
                                 int(rng.integers(3, 16)),
                                 int(rng.integers(3, 16)), nsym=nsym)
        want = align_planes_numpy(a, b, c, sc)
        assert align_wavefront(a, b, c, sc, interpret=True) == want, trial
    # Blocked path with real face traffic (multi-block shape).
    m = rng.integers(-3, 4, size=(4, 4))
    sub = tuple(tuple(int(v) for v in row) for row in m)
    sc = Scoring(submatrix=sub)
    a, b, c = random_triplet(rng, 18, 28, 140)
    want = align_planes_numpy(a, b, c, sc)
    assert align_blocked(a, b, c, sc, block_shape=(24, 128)) == want


def test_submatrix_with_score_bits_composes(rng):
    """Runtime submatrix AND RTL register wrap together: every compiled
    backend must reproduce the golden emulation bit-for-bit through real
    overflow (big positive matrix values force it at short lengths)."""
    from trialign.api import align
    from trialign.kernels.blocked import align_blocked
    from trialign.kernels.wavefront import align_wavefront
    from trialign.kernels.xla_ref import align_xla

    sub = ((6, -2, -1, 0), (-2, 6, 0, -1), (-1, 0, 6, -1), (0, -1, -1, 6))
    sc = Scoring(submatrix=sub)
    seq = np.full(30, 1, np.uint8)
    clean = align_planes_numpy(seq, seq, seq, sc)
    for bits in (6, 8):
        want = align_planes_numpy(seq, seq, seq, sc, score_bits=bits)
        assert want != clean  # overflow actually occurred
        assert align_xla(seq, seq, seq, sc, score_bits=bits) == want
        assert align_wavefront(seq, seq, seq, sc, interpret=True,
                               score_bits=bits) == want
        assert align_blocked(seq, seq, seq, sc, block_shape=(24, 128),
                             score_bits=bits) == want
    res = align(seq, seq, seq, sc, score_bits=8)  # auto-routing composes
    assert res.score == align_planes_numpy(seq, seq, seq, sc, score_bits=8)


def test_fuzz_score_bits_chain_matches_golden(rng):
    """RTL bit-parity mode on the A-axis chain path (round-4 VERDICT
    weak 5): every slot of a chained sweep must wrap exactly like the
    golden emulation, including a slot with real 6-bit overflow, so
    throughput-mode RTL-parity studies are possible."""
    from trialign.kernels.blocked import align_blocked_chain

    a_list = [rng.integers(0, 4, 24).astype(np.uint8) for _ in range(3)]
    a_list.append(np.full(24, 2, np.uint8))  # overflow-prone slot
    b = np.full(40, 2, np.uint8)
    c = np.concatenate([np.full(30, 2, np.uint8),
                        rng.integers(0, 4, 10).astype(np.uint8)])
    for bits in (6, 12):
        want = [align_planes_numpy(a, b, c, score_bits=bits)
                for a in a_list]
        got = align_blocked_chain(a_list, b, c, block_shape=(24, 128),
                                  score_bits=bits)
        assert got == want, (bits, got, want)
    # The 6-bit case must actually overflow somewhere in the chain.
    clean = [align_planes_numpy(a, b, c) for a in a_list]
    assert [align_planes_numpy(a, b, c, score_bits=6) for a in a_list] != clean
