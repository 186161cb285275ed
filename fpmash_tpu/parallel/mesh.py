"""Mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def default_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices.

    The workload is embarrassingly data-parallel at the read/window/pair
    level (SURVEY §2.4: DP is the whole communication surface), so a 1-D
    mesh with collectives for bottom-k merge and distance-tile gathering is
    the natural layout; ICI carries the all-gathers.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))
