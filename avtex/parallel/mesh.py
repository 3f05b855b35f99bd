"""Mesh construction + basic sharding helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axis_names: Tuple[str, ...] = ("data", "model")) -> Mesh:
    """Mesh over all local devices.

    Default: all devices on 'data', 'model' trivial — the v5e-8 single-host
    layout (SURVEY.md §5.8). Pass shape=(4, 2) etc. for real TP.
    """
    devices = np.asarray(jax.devices())
    n = devices.size
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    return Mesh(devices.reshape(shape), axis_names)


def shard_leading(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits an array's leading dim over one mesh axis."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
