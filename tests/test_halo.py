"""Multi-chip single-triplet halo mode on the virtual CPU mesh: the DP block
grid k-striped over the 'model' axis, block rows pipelined device-to-device,
column faces travelling by ppermute.  Exact score parity vs the golden model
is required at every mesh size."""

import numpy as np
import pytest

from trialign.dist.halo import align_sharded_triplet
from trialign.dist.mesh import make_mesh
from trialign.golden import align_planes_numpy
from tests.conftest import random_triplet


@pytest.mark.parametrize("ndev", [2, 4])
def test_halo_matches_golden(rng, ndev):
    a, b, c = random_triplet(rng, 10, 45, 70 * ndev)
    want = align_planes_numpy(a, b, c)
    got = align_sharded_triplet(
        a, b, c, mesh=make_mesh(data=1, model=ndev), block_shape=(16, 128)
    )
    assert got == want


def test_halo_single_device_degenerates(rng):
    a, b, c = random_triplet(rng, 8, 30, 140)
    want = align_planes_numpy(a, b, c)
    got = align_sharded_triplet(
        a, b, c, mesh=make_mesh(data=1, model=1), block_shape=(16, 128)
    )
    assert got == want


@pytest.mark.slow
def test_halo_eight_devices(rng):
    a, b, c = random_triplet(rng, 8, 35, 150)
    want = align_planes_numpy(a, b, c)
    got = align_sharded_triplet(
        a, b, c, mesh=make_mesh(data=1, model=8), block_shape=(16, 128)
    )
    assert got == want


def test_scaling_efficiency_model():
    from trialign.dist.halo import scaling_efficiency

    # BASELINE north star: >= 80% efficiency at 2 hosts once the grid is
    # deep enough (n_jb >= 4 rows for D=2).
    assert scaling_efficiency(4, 2) == 0.8
    assert scaling_efficiency(32, 2) > 0.96
    assert scaling_efficiency(32, 8) > 0.8
    assert scaling_efficiency(1, 1) == 1.0
