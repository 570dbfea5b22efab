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
def test_traceback_compiled_parity(rng):
    import trialign.traceback.hirschberg as H
    from trialign.golden.numpy_model import rescore_alignment

    a, b, c = random_triplet(rng, 150, 120, 140)
    want = align_planes_numpy(a, b, c)
    score, rows = H.hirschberg_align(a, b, c)
    assert score == want
    assert rescore_alignment(rows) == want
