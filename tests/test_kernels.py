"""Tiled Pallas kernels vs the dense jnp oracle (SURVEY.md §4.2) —
interpreter mode on CPU, compiled Mosaic on TPU. Sizes deliberately include
non-multiples of the tile shapes to exercise the padding/mask path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu import SimConfig, VisionConfig, spawn
from nenbody_tpu.config import BoidsConfig, GravityConfig
from nenbody_tpu.ops import boids as boids_ops
from nenbody_tpu.ops import pairwise, raycast, tiled
from nenbody_tpu.physics import dense
from nenbody_tpu.vision import render


def _state(n, controller="gravity", seed=0):
    return spawn(jax.random.key(seed), SimConfig(n=n, controller=controller))


@pytest.mark.parametrize("n", [16, 257, 1000])
def test_gravity_kernel_matches_dense(n):
    st = _state(n)
    cfg = GravityConfig()
    got = pairwise.gravity_forces_tiled(st.pos, cfg)
    want = dense.gravity_forces(st.pos, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-7)


def test_gravity_kernel_approx_mode():
    """approx_reciprocal trades ~2^-12 per-pair weight error for throughput;
    the accumulated force stays within ~1e-2 of the exact norm."""
    st = _state(300, seed=6)
    want = np.asarray(dense.gravity_forces(st.pos, GravityConfig()))
    got = np.asarray(
        pairwise.gravity_forces_tiled(st.pos, GravityConfig(approx_reciprocal=True))
    )
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-2


def test_gravity_kernel_nonstandard_tiles():
    st = _state(512, seed=2)
    cfg = GravityConfig()
    want = dense.gravity_forces(st.pos, cfg)
    for ti, tj in [(8, 128), (64, 256), (256, 512)]:
        got = pairwise.gravity_forces_tiled(st.pos, cfg, ti=ti, tj=tj)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-7, err_msg=f"{ti}x{tj}"
        )


@pytest.mark.parametrize("n", [16, 300])
def test_boids_kernel_matches_dense(n):
    st = _state(n, controller="boids", seed=1)
    cfg = BoidsConfig()
    got = boids_ops.boids_velocity_tiled(st.pos, st.vel, cfg)
    want = dense.boids_accels(st.pos, st.vel, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-6)


def test_boids_kernel_dense_positions():
    """Clustered positions so all three rule masks fire (incl. separation)."""
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.uniform(-8, 8, (128, 2)).astype(np.float32))
    vel = jnp.asarray(rng.uniform(-1, 1, (128, 2)).astype(np.float32))
    cfg = BoidsConfig()
    got = boids_ops.boids_velocity_tiled(pos, vel, cfg)
    want = dense.boids_accels(pos, vel, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-6)


@pytest.mark.parametrize("exclude", [True, False])
def test_boids_partials_kernel_matches_dense(exclude):
    """The cross-block partials primitive the boids ring streams hops
    through, including the hop-0 diagonal exclusion."""
    rng = np.random.RandomState(3)
    pos_i = jnp.asarray(rng.uniform(-10, 10, (64, 2)).astype(np.float32))
    vel_i = jnp.asarray(rng.uniform(-1, 1, (64, 2)).astype(np.float32))
    # aliased blocks (the ring's hop-0 case) so the diagonal actually matters
    got = boids_ops.boids_partials_tiled(
        pos_i, vel_i, pos_i, vel_i, BoidsConfig(), exclude_diagonal=exclude
    )
    want = dense.boids_partials_cross(
        pos_i, vel_i, pos_i, vel_i, BoidsConfig(), exclude_diagonal=exclude
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=3e-5, atol=1e-5)


def test_boids_partials_kernel_cross_blocks():
    rng = np.random.RandomState(4)
    pos_i = jnp.asarray(rng.uniform(-10, 10, (32, 2)).astype(np.float32))
    vel_i = jnp.asarray(rng.uniform(-1, 1, (32, 2)).astype(np.float32))
    pos_j = jnp.asarray(rng.uniform(-10, 10, (48, 2)).astype(np.float32))
    vel_j = jnp.asarray(rng.uniform(-1, 1, (48, 2)).astype(np.float32))
    got = boids_ops.boids_partials_tiled(
        pos_i, vel_i, pos_j, vel_j, BoidsConfig(), exclude_diagonal=False
    )
    want = dense.boids_partials_cross(
        pos_i, vel_i, pos_j, vel_j, BoidsConfig(), exclude_diagonal=False
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=3e-5, atol=1e-5)


def test_tiled_steppers_match_dense_steppers():
    for controller in ("gravity", "boids"):
        st = _state(200, controller=controller, seed=3)
        cfg = SimConfig(n=200, controller=controller, backend="pallas")
        got = tiled.STEPPERS[controller](st, cfg=cfg)
        want = dense.STEPPERS[controller](st, cfg=cfg)
        np.testing.assert_allclose(
            np.asarray(got.pos), np.asarray(want.pos), rtol=3e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.vel), np.asarray(want.vel), rtol=3e-5, atol=1e-6
        )


@pytest.mark.parametrize("n,w", [(24, 64), (100, 128), (60, 32)])
def test_raycast_kernel_matches_dense_renderer(n, w):
    st = _state(n, seed=4)
    # give agents real headings
    key = jax.random.key(7)
    vel = jax.random.uniform(key, (n, 2), minval=-1, maxval=1, dtype=jnp.float32)
    st = st.replace(vel=vel)
    cfg = VisionConfig(width=w)
    got_s, got_d = raycast.render_rows_tiled(st.pos, st.vel, cfg)
    want_s, want_d = render.render_rows(st.pos, st.vel, cfg)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-5, atol=1e-5)


def test_raycast_kernel_scene_dispatch():
    """backend='pallas' routes observe() through the kernel."""
    from nenbody_tpu import Scene

    cfg = SimConfig(
        n=64, controller="gravity", backend="pallas", vision=VisionConfig(width=64)
    )
    scene = Scene(cfg)
    state = scene.spawn(seed=0)
    obs = scene.observe(state)
    dense_cfg = SimConfig(
        n=64, controller="gravity", backend="dense", vision=VisionConfig(width=64)
    )
    obs_dense = Scene(dense_cfg).observe(state)
    np.testing.assert_allclose(np.asarray(obs), np.asarray(obs_dense), rtol=1e-5, atol=1e-5)
