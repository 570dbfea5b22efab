"""Sharded alignment recovery (dist/halo_tb.py) on the virtual CPU mesh:
Hirschberg splits whose F/G slab sweeps run k-striped across the 'model'
axis with ppermute column-face halos.  Exact score parity vs the golden
model AND independent rescoring of the recovered alignment are required --
the same bar as every other traceback path (the reference stubbed the
capability out entirely, src/PE_1cyc.v:12-14,30)."""

import numpy as np
import pytest

from tests.conftest import random_triplet
from trialign.config import Scoring
from trialign.dist.halo import align_sharded_triplet
from trialign.dist.halo_tb import _solve_sharded, hirschberg_align_sharded
from trialign.dist.mesh import make_mesh
from trialign.golden import align_planes_numpy
from trialign.golden.numpy_model import rescore_alignment
from trialign.traceback import hirschberg as HB

pytestmark = pytest.mark.heavy  # minutes-long on CPU interpret


def _check_rows(rows, a, b, c):
    """Each alignment row must reproduce its sequence exactly (gaps
    removed)."""
    for row, seq in zip(rows, (a, b, c)):
        assert [v for v in row if v != -1] == [int(x) for x in seq]


def test_sharded_traceback_single_split(rng):
    """One sharded top split (F/G sweeps + on-fleet argmax), halves on the
    single-chip solver: the production handoff shape."""
    a, b, c = random_triplet(rng, 24, 20, 22)
    want = align_planes_numpy(a, b, c)
    score, rows = hirschberg_align_sharded(
        a, b, c, mesh=make_mesh(data=1, model=2), single_cells=6000
    )
    assert score == want
    assert rescore_alignment(rows) == want
    _check_rows(rows, a, b, c)


def test_sharded_pin_split(rng):
    """Pin-mode sharded split (origin seeded from v0, NEG-walled faces) --
    the recursion's interior nodes.  Score must match the single-chip
    solver's; the alignment must reconstruct the sequences."""
    sc = Scoring()
    a, b, c = random_triplet(rng, 20, 18, 18)
    want, _ = HB._solve(a, b, c, sc, "pin", 0, None)
    mesh = make_mesh(data=1, model=2)
    score, cols = _solve_sharded(
        a, b, c, sc, "pin", 0, None, mesh, 2, 3000, True
    )
    assert score == want
    rows = [list(r) for r in zip(*cols)]
    _check_rows(rows, a, b, c)


def test_api_return_alignment_routes_sharded(rng):
    """align_sharded_triplet(return_alignment=True) returns (score, rows)
    with the same score its score-only mode reports."""
    a, b, c = random_triplet(rng, 12, 16, 40)
    mesh = make_mesh(data=1, model=2)
    score_only = align_sharded_triplet(a, b, c, mesh=mesh,
                                       block_shape=(16, 128))
    score, rows = align_sharded_triplet(a, b, c, mesh=mesh,
                                        return_alignment=True)
    assert score == score_only == align_planes_numpy(a, b, c)
    assert rescore_alignment(rows) == score
    _check_rows(rows, a, b, c)


@pytest.mark.slow
def test_sharded_traceback_deep_four_devices(rng):
    """Two levels of sharded splits (free top + pin/end-state halves) on a
    4-stripe mesh, with k-padding in play (lc not block-aligned)."""
    a, b, c = random_triplet(rng, 32, 24, 25)
    want = align_planes_numpy(a, b, c)
    score, rows = hirschberg_align_sharded(
        a, b, c, mesh=make_mesh(data=1, model=4), single_cells=5000
    )
    assert score == want
    assert rescore_alignment(rows) == want
    _check_rows(rows, a, b, c)
