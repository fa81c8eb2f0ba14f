"""Device-mesh helpers."""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int = 0, axis_names=("dp",)) -> Mesh:
    devs = jax.devices()
    if n_devices == 0:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    return Mesh(np.array(devs[:n_devices]).reshape(shape), axis_names)
