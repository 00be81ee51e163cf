"""Multi-chip differentiable perception: ring_render_rows_diff's backward
ring (parallel/ring.py) against single-chip autodiff oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu.config import SimConfig, VisionConfig
from nenbody_tpu.parallel import mesh as mesh_lib
from nenbody_tpu.parallel import ring
from nenbody_tpu.vision import render


@pytest.fixture(scope="module")
def ring_mesh():
    # 4 hops: per-hop mechanics are identical at any ring length and the
    # interpret-mode cost scales with hops (commit ad98a89's precedent)
    return mesh_lib.make_mesh({"agents": 4}, devices=jax.devices()[:4])


def _scene(key, n, spread=35.0):
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (n, 2), minval=-spread, maxval=spread,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (n, 2), minval=-1, maxval=1, dtype=jnp.float32)
    return pos, vel


@pytest.mark.parametrize(
    "antialias",
    [
        False,
        # slow tier: disc-AA-through-the-backward-ring — the AA coverage
        # stream's VJP is pinned fast single-device (test_wireframe_vjp AA
        # params, the dense FD check) and the ring backward + AA composition
        # by test_ring_diff_wireframe_kernel_edition (4 hops, fast)
        pytest.param(True, marks=pytest.mark.slow),
    ],
)
def test_ring_vjp_matches_dense_autodiff(ring_mesh, antialias):
    # the slow AA param keeps the 4-hop fixture (hop-index arithmetic is
    # direction-degenerate at 2 devices); the fast plain param runs 2 hops —
    # same VJP plumbing, and the CPU compile scales with the unrolled hops
    if not antialias:
        ring_mesh = mesh_lib.make_mesh(
            {"agents": 2}, devices=jax.devices()[:2]
        )
    cfg = VisionConfig(width=32, antialias=antialias)
    n = 64
    pos, vel = _scene(jax.random.key(0), n)
    kw, kw2 = jax.random.split(jax.random.key(9))
    ws = jax.random.normal(kw, (n, cfg.width), dtype=jnp.float32)
    wd = jax.random.normal(kw2, (n, cfg.width), dtype=jnp.float32) * 1e-3

    def loss_ring(p, v):
        s, d = ring.ring_render_rows_diff(p, v, cfg, mesh=ring_mesh)
        return jnp.sum(s * ws) + jnp.sum(jnp.where(d < cfg.far, d, 0.0) * wd)

    def loss_dense(p, v):
        s, d = render.render_rows(p, v, cfg)
        return jnp.sum(s * ws) + jnp.sum(jnp.where(d < cfg.far, d, 0.0) * wd)

    gr = jax.grad(loss_ring, argnums=(0, 1))(pos, vel)
    gd = jax.grad(loss_dense, argnums=(0, 1))(pos, vel)
    for a, b in zip(gd, gr):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a).max() > 0
        np.testing.assert_allclose(b, a, rtol=3e-4, atol=3e-4 * np.abs(a).max())


@pytest.mark.slow
def test_ring_vjp_batched_with_data_axis():
    """Slow tier: the data-axis composition through ring_render_rows_diff is
    also exercised fast by test_apg_diff_vision_on_mesh (same (data, agents)
    mesh, same backward ring), and the unbatched VJP parity by
    test_ring_vjp_matches_dense_autodiff."""
    mesh = mesh_lib.make_mesh({"data": 2, "agents": 4})
    cfg = VisionConfig(width=16, antialias=True)
    n, b = 32, 4
    kp, kv = jax.random.split(jax.random.key(2))
    pos = jax.random.uniform(kp, (b, n, 2), minval=-30, maxval=30, dtype=jnp.float32)
    vel = jax.random.uniform(kv, (b, n, 2), minval=-1, maxval=1, dtype=jnp.float32)

    def loss_ring(p, v):
        s, _ = ring.ring_render_rows_diff(
            p, v, cfg, mesh=mesh, data_axis="data"
        )
        return jnp.mean(s)

    def loss_dense(p, v):
        s, _ = jax.vmap(lambda a, c: render.render_rows(a, c, cfg))(p, v)
        return jnp.mean(s)

    gr = jax.grad(loss_ring, argnums=(0, 1))(pos, vel)
    gd = jax.grad(loss_dense, argnums=(0, 1))(pos, vel)
    for a, b in zip(gd, gr):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(b, a, rtol=3e-4, atol=3e-4 * np.abs(a).max())


def test_ring_diff_rejects_indivisible(ring_mesh):
    cfg = VisionConfig(width=16)
    pos, vel = _scene(jax.random.key(1), 21)
    with pytest.raises(ValueError, match="divisible"):
        ring.ring_render_rows_diff(pos, vel, cfg, mesh=ring_mesh)


def test_apg_diff_vision_on_mesh():
    """APG with diff_vision=True over a (data, agents) mesh: the gradient
    rides the backward ring; one full step must produce finite, nonzero
    gradients with an observation-defined reward."""
    import optax

    from nenbody_tpu.rl import apg as apg_lib
    from nenbody_tpu.rl.env import VisionEnv
    from nenbody_tpu.rl.policy import MLPPolicy

    mesh = mesh_lib.make_mesh({"data": 2, "agents": 4})
    env = VisionEnv(
        SimConfig(n=16, controller="gravity", vision=VisionConfig(width=16, antialias=True)),
        max_accel=1.0, smooth_clip=True, reward_mode="visibility",
    )
    opt = optax.adam(1e-3)
    ts, apply_fn, _ = apg_lib.init_apg_state(
        env, jax.random.key(0), opt, policy=MLPPolicy(use_bf16=False)
    )
    step = jax.jit(
        apg_lib.make_apg_step(
            env, apply_fn, opt, horizon=3, num_envs=4, mesh=mesh,
            diff_vision=True,
        )
    )
    ts2, metrics = step(ts)
    g = float(metrics["grad_norm"])
    assert np.isfinite(g) and g > 0.0, metrics
