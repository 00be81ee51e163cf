"""Numerics parity: dense jnp controllers vs the NumPy reference oracle
(SURVEY.md §4.1), at fp32 tolerances, N=256 (BASELINE config 1 scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu import SimConfig, spawn
from nenbody_tpu.physics import dense
from oracle import boids_step_np, gravity_step_np


def _random_state(cfg, seed=0):
    return spawn(jax.random.key(seed), cfg)


@pytest.mark.parametrize("n", [4, 64, 256])
def test_gravity_matches_oracle(n):
    cfg = SimConfig(n=n, controller="gravity", backend="dense")
    state = _random_state(cfg)
    pos0 = np.asarray(state.pos)
    vel0 = np.asarray(state.vel)

    out = dense.gravity_step(state, cfg)
    ref_pos, ref_vel = gravity_step_np(pos0, vel0)

    np.testing.assert_allclose(np.asarray(out.vel), ref_vel, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.pos), ref_pos, rtol=2e-5, atol=1e-5)


def test_gravity_multistep_stays_close():
    cfg = SimConfig(n=64, controller="gravity", backend="dense")
    state = _random_state(cfg, seed=3)
    pos, vel = np.asarray(state.pos), np.asarray(state.vel)
    for _ in range(5):
        state = dense.gravity_step(state, cfg)
        pos, vel = gravity_step_np(pos, vel)
    np.testing.assert_allclose(np.asarray(state.pos), pos, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n", [4, 64, 256])
def test_boids_matches_oracle(n):
    cfg = SimConfig(n=n, controller="boids", backend="dense")
    state = _random_state(cfg, seed=1)
    pos0 = np.asarray(state.pos)
    vel0 = np.asarray(state.vel)

    out = dense.boids_step(state, cfg)
    ref_pos, ref_vel = boids_step_np(pos0, vel0)

    np.testing.assert_allclose(np.asarray(out.vel), ref_vel, rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.pos), ref_pos, rtol=2e-5, atol=1e-5)


def test_boids_threshold_edge_cases():
    """Agents straddling the separation threshold (d=5) and identical
    velocities (alignment always matches) must follow reference masks."""
    cfg = SimConfig(n=3, controller="boids", backend="dense")
    pos = jnp.array([[0.0, 0.0], [4.9, 0.0], [5.1, 0.0]], dtype=jnp.float32)
    vel = jnp.zeros((3, 2), dtype=jnp.float32)
    state = spawn(jax.random.key(0), cfg).replace(pos=pos, vel=vel)
    out = dense.boids_step(state, cfg)
    ref_pos, ref_vel = boids_step_np(np.asarray(pos), np.asarray(vel))
    np.testing.assert_allclose(np.asarray(out.vel), ref_vel, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out.pos), ref_pos, rtol=1e-6, atol=1e-7)


def test_random_walk_statistics():
    """Random kicks are U(-accel, accel) per axis and position integrates
    velocity without dt (src/main.rs:381-402)."""
    cfg = SimConfig(n=4096, controller="random")
    state = _random_state(cfg, seed=7)
    out = dense.random_step(state, cfg)
    kick = np.asarray(out.vel - state.vel)
    a = cfg.random_walk.accel
    assert kick.max() <= a and kick.min() >= -a
    assert abs(kick.mean()) < a / 10
    np.testing.assert_allclose(
        np.asarray(out.pos), np.asarray(state.pos + out.vel), rtol=1e-6
    )
    # consecutive steps draw fresh randomness
    out2 = dense.random_step(out, cfg)
    assert not np.allclose(np.asarray(out2.vel - out.vel), kick)


def test_gravity_corrected_mode():
    """dt_on_position=True switches to standard semi-implicit Euler."""
    from nenbody_tpu.config import GravityConfig

    cfg = SimConfig(
        n=32, controller="gravity",
        gravity=GravityConfig(dt_on_position=True),
    )
    state = _random_state(cfg)
    out = dense.gravity_step(state, cfg)
    g = dense.gravity_forces(state.pos, cfg.gravity)
    want_vel = state.vel + g * cfg.gravity.dt
    want_pos = state.pos + want_vel * cfg.gravity.dt
    np.testing.assert_allclose(np.asarray(out.pos), np.asarray(want_pos), rtol=1e-6)
    # and reference mode differs
    ref = dense.gravity_step(state, SimConfig(n=32, controller="gravity"))
    assert not np.allclose(np.asarray(out.pos), np.asarray(ref.pos))


# -- invariance tests (SURVEY.md §4.3) ---------------------------------------


def test_gravity_permutation_equivariance():
    cfg = SimConfig(n=128, controller="gravity", backend="dense")
    state = _random_state(cfg, seed=5)
    perm = np.random.RandomState(0).permutation(cfg.n)
    state_p = state.replace(pos=state.pos[perm], vel=state.vel[perm])
    out = dense.gravity_step(state, cfg)
    out_p = dense.gravity_step(state_p, cfg)
    np.testing.assert_allclose(
        np.asarray(out.pos)[perm], np.asarray(out_p.pos), rtol=1e-4, atol=1e-5
    )


def test_gravity_translation_equivariance():
    cfg = SimConfig(n=64, controller="gravity", backend="dense")
    state = _random_state(cfg, seed=9)
    shift = jnp.array([10.0, -3.0], dtype=jnp.float32)
    out = dense.gravity_step(state, cfg)
    out_s = dense.gravity_step(state.replace(pos=state.pos + shift), cfg)
    np.testing.assert_allclose(
        np.asarray(out.pos + shift), np.asarray(out_s.pos), rtol=1e-4, atol=1e-3
    )


def test_step_is_order_independent():
    """The reference gets order independence from old_* snapshots
    (src/main.rs:414-416); the pure-functional update has it by
    construction — same state in, same state out, twice."""
    cfg = SimConfig(n=64, controller="boids", backend="dense")
    state = _random_state(cfg, seed=11)
    a = dense.boids_step(state, cfg)
    b = dense.boids_step(state, cfg)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
