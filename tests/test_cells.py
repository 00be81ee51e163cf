"""Cell-list boids backend (physics/cells.py) vs the dense O(N^2) oracle.

The exactness contract: with capacity >= the densest scanned hash bucket
(cells_stats), the cell-list rules equal the dense folds up to fp32
summation order — including the VELOCITY-space alignment rule, which gets
its own cell list over velocity coordinates.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu.config import BoidsConfig, SimConfig
from nenbody_tpu.physics import cells, dense


def _sparse_scene(key, n, spread=2000.0, vspread=1.0):
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (n, 2), minval=-spread, maxval=spread)
    vel = jax.random.uniform(kv, (n, 2), minval=-vspread, maxval=vspread)
    return pos, vel


def test_matches_dense_sparse():
    cfg = BoidsConfig()
    pos, vel = _sparse_scene(jax.random.key(0), 512)
    got = np.asarray(cells.boids_velocity_cells(pos, vel, cfg))
    want = np.asarray(dense.boids_accels(pos, vel, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_velocity_space_alignment_exact():
    """A small alignment radius makes rule 3 non-trivial (not all-true):
    the v-space cell list must reproduce the dense velocity-space mask."""
    cfg = BoidsConfig(alignment_dist=0.3)
    pos, vel = _sparse_scene(jax.random.key(1), 400, vspread=0.8)
    got = np.asarray(cells.boids_velocity_cells(pos, vel, cfg))
    want = np.asarray(dense.boids_accels(pos, vel, cfg))
    # sanity: the rule actually distinguishes agents (not the global mean)
    vd2 = np.sum(
        (np.asarray(vel)[None] - np.asarray(vel)[:, None]) ** 2, axis=-1
    )
    assert 0 < (vd2 < 0.3**2).sum() < 400 * 399
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_global_alignment_identity():
    cfg = BoidsConfig(global_alignment=True)
    pos, vel = _sparse_scene(jax.random.key(2), 300, vspread=0.5)
    got = np.asarray(cells.boids_velocity_cells(pos, vel, cfg))
    want = np.asarray(dense.boids_accels(pos, vel, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dense_cluster_exact_with_sized_capacity():
    """At higher density the default capacity overflows; sizing it from
    cells_stats restores exactness (the documented contract)."""
    import math

    cfg = BoidsConfig()
    pos, vel = _sparse_scene(jax.random.key(3), 600, spread=120.0)
    r = math.sqrt(cfg.cohesion_dist_sq)
    k = cells.cells_stats(pos, r)["max_occupancy"]
    got = np.asarray(cells.boids_velocity_cells(pos, vel, cfg, capacity=k))
    want = np.asarray(dense.boids_accels(pos, vel, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_overflow_detected_by_stats():
    import math

    cfg = BoidsConfig()
    pos, vel = _sparse_scene(jax.random.key(4), 600, spread=40.0)
    r = math.sqrt(cfg.cohesion_dist_sq)
    stats = cells.cells_stats(pos, r)
    assert stats["max_occupancy"] > 4  # a capacity of 4 would be wrong here
    got = np.asarray(cells.boids_velocity_cells(pos, vel, cfg, capacity=4))
    want = np.asarray(dense.boids_accels(pos, vel, cfg))
    assert not np.allclose(got, want, rtol=1e-5, atol=1e-5)


def test_batched_matches_dense():
    cfg = BoidsConfig()
    pos = jnp.stack(
        [_sparse_scene(jax.random.key(10 + i), 128)[0] for i in range(3)]
    )
    vel = jnp.stack(
        [_sparse_scene(jax.random.key(20 + i), 128)[1] for i in range(3)]
    )
    got = np.asarray(cells.boids_velocity_cells(pos, vel, cfg))
    want = np.asarray(dense.boids_accels(pos, vel, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_scene_backend_cells():
    from nenbody_tpu.scene import Scene

    cfg = SimConfig(
        n=256,
        controller="boids",
        backend="cells",
        spawn_pos_range=(-1500.0, 1500.0),
    )
    dcfg = dataclasses.replace(cfg, backend="dense")
    sc, sd = Scene(cfg), Scene(dcfg)
    state = sc.spawn(seed=7)
    for _ in range(3):
        state_c = sc.step(state)
        state_d = sd.step(state)
        np.testing.assert_allclose(
            np.asarray(state_c.pos), np.asarray(state_d.pos),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(state_c.vel), np.asarray(state_d.vel),
            rtol=1e-5, atol=1e-5,
        )
        state = state_d


def test_scene_rejects_gravity_cells():
    from nenbody_tpu.scene import Scene

    with pytest.raises(ValueError, match="all-pairs"):
        Scene(SimConfig(n=64, controller="gravity", backend="cells"))
