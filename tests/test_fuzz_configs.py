"""Config-combination fuzz: random (n, controller, vision, flags) configs
must agree across every backend and never produce non-finite state — the
class of bug that hides in unusual-but-valid combinations."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu import Scene, SimConfig, VisionConfig, spawn
from nenbody_tpu.config import BoidsConfig, GravityConfig

def _random_cfg(i):
    # per-test seeding: a failing test id reproduces its exact config in
    # isolation (a shared module RNG would depend on execution order)
    rng = np.random.RandomState(20260816 + i)
    n = int(rng.choice([3, 17, 33, 65, 127, 200, 333]))
    controller = str(rng.choice(["gravity", "boids"]))
    width = int(rng.choice([8, 16, 24, 48, 64, 96, 160]))
    # wireframe joins the fuzz space (1/4 of draws); AA composes with both
    sprite_mode = str(rng.choice(["disc", "disc", "disc", "wireframe"]))
    vision = VisionConfig(
        width=width,
        hfov_deg=float(rng.uniform(30, 150)),
        sprite_radius=float(rng.uniform(0.3, 3.0)),
        antialias=bool(rng.randint(2)),
        sprite_mode=sprite_mode,
    )
    gravity = GravityConfig(dt_on_position=bool(rng.randint(2)))
    boids = BoidsConfig(global_alignment=bool(rng.randint(2)))
    return SimConfig(
        n=n, controller=controller, vision=vision, gravity=gravity, boids=boids
    )


@pytest.mark.parametrize("i", range(8))
def test_random_config_backend_agreement(i):
    cfg = _random_cfg(i)
    state = spawn(jax.random.key(1000 + i), cfg)
    # give agents real headings so vision exercises all quadrants
    state = state.replace(
        vel=jax.random.uniform(
            jax.random.key(i), (cfg.n, 2), minval=-1, maxval=1, dtype=jnp.float32
        )
    )

    results = {}
    for backend in ("dense", "pallas"):
        c = dataclasses.replace(cfg, backend=backend)
        scene = Scene(c)
        out = scene.step(state)
        obs = scene.observe(out)
        assert np.isfinite(np.asarray(out.pos)).all(), (backend, cfg)
        assert np.isfinite(np.asarray(obs)).all(), (backend, cfg)
        results[backend] = (np.asarray(out.pos), np.asarray(obs))

    pos_d, obs_d = results["dense"]
    pos_p, obs_p = results["pallas"]
    np.testing.assert_allclose(pos_p, pos_d, rtol=5e-5, atol=1e-5, err_msg=str(cfg))
    np.testing.assert_allclose(obs_p, obs_d, rtol=1e-4, atol=1e-4, err_msg=str(cfg))


@pytest.mark.parametrize("i", range(4))
def test_random_config_ring_agreement(i):
    """Same fuzz against the 8-device ring backend (divisible agent counts)."""
    cfg = _random_cfg(100 + i)
    n = int(np.random.RandomState(300 + i).choice([16, 64, 128, 256]))
    cfg = dataclasses.replace(cfg, n=n)
    state = spawn(jax.random.key(2000 + i), cfg)
    state = state.replace(
        vel=jax.random.uniform(
            jax.random.key(i), (cfg.n, 2), minval=-1, maxval=1, dtype=jnp.float32
        )
    )
    dense_scene = Scene(dataclasses.replace(cfg, backend="dense"))
    dense_out = dense_scene.step(state)
    ring_scene = Scene(dataclasses.replace(cfg, backend="ring"))
    ring_out = ring_scene.step(state)
    np.testing.assert_allclose(
        np.asarray(ring_out.pos), np.asarray(dense_out.pos),
        rtol=5e-5, atol=1e-5, err_msg=str(cfg),
    )
    # CLAUDE.md invariant: ring observations must also match the oracle.
    # atol 5e-4: antialiased edge pixels can differ by ~2e-4 when the ring's
    # per-hop depth merges reassociate fp32 relative to the dense reduction;
    # a real sharding bug would show O(1) errors across many pixels.
    obs_ring = ring_scene.observe(ring_out)
    obs_dense = dense_scene.observe(dense_out)
    np.testing.assert_allclose(
        np.asarray(obs_ring), np.asarray(obs_dense),
        rtol=1e-3, atol=5e-4, err_msg=str(cfg),
    )
