"""Device mesh helpers.

The reference is a single chip whose only "communication" is PE-to-PE wires
and SRAM boundary faces (reference: src/TriAlign_1cyc.v:118-140); its host
link (RIFFA PCIe) was never committed (.gitignore:4).  The TPU framework
replaces all of that with jax.sharding meshes: a 'data' axis for independent
triplets (batch data-parallelism) and a 'model' axis for partitioning one
long triplet's DP block grid with halo exchange over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: int = 1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a (data, model) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = data * model
    if n > len(devices):
        raise ValueError(f"mesh wants {n} devices, only {len(devices)} available")
    arr = np.array(devices[:n]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def default_mesh() -> Mesh:
    """All local devices on the 'data' axis (throughput mode)."""
    return make_mesh(data=len(jax.devices()), model=1)
