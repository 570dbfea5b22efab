"""Pallas wavefront kernel parity vs the golden model.

On CPU these run in interpret mode (slow: keep sizes small); the same
kernel is exercised compiled on real TPU by bench.py and the tpu-marked
tests.  Bit-exact integer parity is required, not approximate equality.
"""

import numpy as np
import pytest

from trialign.config import Scoring
from trialign.golden import align_planes_numpy
from trialign.kernels.wavefront import align_wavefront, bucket_dims
from tests.conftest import random_triplet


@pytest.mark.parametrize("dims", [(3, 3, 3), (6, 5, 7), (12, 9, 11)])
def test_kernel_matches_golden_small(rng, dims):
    a, b, c = random_triplet(rng, *dims)
    assert align_wavefront(a, b, c, interpret=True) == align_planes_numpy(a, b, c)


def test_kernel_rtl_s3_mode(rng):
    a, b, c = random_triplet(rng, 8, 7, 9)
    sc = Scoring(s3_mode="rtl")
    assert align_wavefront(a, b, c, sc, interpret=True) == align_planes_numpy(a, b, c, sc)


def test_kernel_nondefault_scoring(rng):
    sc = Scoring(match=2, mismatch=-3, gap_open=5, gap_extend=2)
    a, b, c = random_triplet(rng, 9, 6, 8)
    assert align_wavefront(a, b, c, sc, interpret=True) == align_planes_numpy(a, b, c, sc)


def test_kernel_asymmetric_lengths(rng):
    # Exercises the bucket padding paths (i-axis much longer than j/k).
    a, b, c = random_triplet(rng, 40, 4, 6)
    assert align_wavefront(a, b, c, interpret=True) == align_planes_numpy(a, b, c)


def test_bucket_dims_bounds():
    assert bucket_dims(64, 63, 63) == (64, 64, 128)
    assert bucket_dims(255, 255, 255) == (256, 256, 256)
    with pytest.raises(ValueError):
        bucket_dims(100, 300, 100)


def test_empty_sequence_shortcut():
    e = np.zeros(0, dtype=np.uint8)
    a = np.zeros(4, dtype=np.uint8)
    assert align_wavefront(a, a, e) == 0


@pytest.mark.slow
def test_kernel_dat_vectors(rng):
    from trialign.io import load_reference_triplet

    a, b, c = load_reference_triplet()
    assert align_wavefront(a, b, c, interpret=True) == align_planes_numpy(a, b, c)
