"""Pallas-RDMA ring prototype (parallel/rdma.py) vs the dense gravity oracle.

Runs on the 8-virtual-CPU-device rig with Pallas interpret-mode RDMA
emulation (`InterpretParams`): the double-buffered `make_async_remote_copy`
hops, capacity handshake, and per-hop partial accumulation execute exactly
as they would per-device on a real slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu.config import SimConfig
from nenbody_tpu.parallel import rdma
from nenbody_tpu.parallel.mesh import make_mesh
from nenbody_tpu.physics import dense


def _spawn_pos(key, n, spread=100.0):
    return jax.random.uniform(key, (n, 2), minval=-spread, maxval=spread)


@pytest.mark.parametrize("n", [2048, 1000])  # divisible and sentinel-padded
def test_rdma_gravity_matches_dense(n):
    cfg = SimConfig(n=n, controller="gravity")
    mesh = make_mesh()
    pos = _spawn_pos(jax.random.key(n), n)
    got = np.asarray(rdma.rdma_ring_gravity_forces(pos, cfg, mesh=mesh))
    want = np.asarray(dense.gravity_forces(pos, cfg.gravity))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


@pytest.mark.slow
def test_rdma_gravity_matches_shardmap_ring():
    from nenbody_tpu.parallel import ring

    cfg = SimConfig(n=512, controller="gravity")
    mesh = make_mesh()
    pos = _spawn_pos(jax.random.key(3), 512)
    got = np.asarray(rdma.rdma_ring_gravity_forces(pos, cfg, mesh=mesh))
    want = np.asarray(ring.ring_gravity_forces(pos, cfg, mesh=mesh))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)


def test_rdma_rejects_batched():
    cfg = SimConfig(n=64, controller="gravity")
    pos = jnp.zeros((4, 64, 2))
    with pytest.raises(ValueError, match="unbatched"):
        rdma.rdma_ring_gravity_forces(pos, cfg)
