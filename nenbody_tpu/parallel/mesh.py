"""Mesh helpers: the TPU replacement for the reference's Gpu device layer
(gfx.rs:20-100) — instead of one wgpu device/queue, a named mesh of chips
with sharding rules."""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

AGENT_AXIS = "agents"
DATA_AXIS = "data"


def make_mesh(
    axis_sizes: Optional[dict] = None, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a named mesh. Default: every device on the agent axis.

    axis_sizes: ordered {axis_name: size} (use -1 for "all remaining
    devices"), e.g. {"data": 2, "agents": 4}.
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {AGENT_AXIS: len(devices)}
    names = tuple(axis_sizes)
    sizes = list(axis_sizes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    if total > len(devices):
        raise ValueError(f"mesh {dict(zip(names, sizes))} needs {total} devices, "
                         f"have {len(devices)}")
    arr = np.array(devices[:total]).reshape(sizes)
    return Mesh(arr, names)


@functools.lru_cache(maxsize=1)
def default_mesh() -> Mesh:
    """All local devices on the agent axis (cached)."""
    return make_mesh()


def shard_state_specs(batch: bool, agent_axis: str = AGENT_AXIS,
                      data_axis: Optional[str] = None):
    """PartitionSpecs for a SceneState's leaves: pos/vel get
    (data?, agents, None); key/t get (data?,)."""
    lead = (data_axis,) if batch else ()
    return {
        "pos": P(*lead, agent_axis, None),
        "vel": P(*lead, agent_axis, None),
        "key": P(*lead),
        "t": P(*lead),
    }
