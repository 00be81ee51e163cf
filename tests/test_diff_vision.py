"""Differentiable perception: the raycast custom VJP (ops/raycast.py)
against the dense-jnp autodiff oracle, and APG learning THROUGH vision.

The forward contract is pinned by tests/test_kernels.py; here we pin the
backward: for a random linear functional of (shade, depth), grad through
render_rows_diff must equal grad through the dense renderer's plain JAX
autodiff at fp32 tolerances, in both antialias modes. (Antialiased shade is
the mode that matters — it is piecewise-linear in positions by design,
VisionConfig.antialias — but the interior vignette gradient exists without
AA too.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu.config import SimConfig, VisionConfig
from nenbody_tpu.ops import raycast
from nenbody_tpu.vision import render


def _random_scene(key, n, spread=30.0):
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (n, 2), minval=-spread, maxval=spread,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (n, 2), minval=-1, maxval=1, dtype=jnp.float32)
    return pos, vel


@pytest.mark.parametrize("antialias", [False, True])
@pytest.mark.parametrize("seed", [0, 7])
def test_vjp_matches_dense_autodiff(antialias, seed):
    cfg = VisionConfig(width=32, antialias=antialias)
    key = jax.random.key(seed)
    ks, kw, kw2 = jax.random.split(key, 3)
    n = 24
    pos, vel = _random_scene(ks, n)
    ws = jax.random.normal(kw, (n, cfg.width), dtype=jnp.float32)
    wd = jax.random.normal(kw2, (n, cfg.width), dtype=jnp.float32) * 1e-3

    def loss(render_fn):
        def fn(p, v):
            s, d = render_fn(p, v, cfg)
            # depth cotangent only on hits (miss depth is the far constant)
            return jnp.sum(s * ws) + jnp.sum(jnp.where(d < cfg.far, d, 0.0) * wd)

        return fn

    gd = jax.grad(loss(render.render_rows), argnums=(0, 1))(pos, vel)
    gp = jax.grad(loss(raycast.render_rows_diff), argnums=(0, 1))(pos, vel)
    for a, b in zip(gd, gp):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a).max() > 0  # the check must not pass vacuously
        np.testing.assert_allclose(
            b, a, rtol=2e-4, atol=2e-4 * np.abs(a).max()
        )


def test_vjp_zero_cotangent_zero_grad():
    cfg = VisionConfig(width=16, antialias=True)
    pos, vel = _random_scene(jax.random.key(3), 12)

    def loss(p, v):
        s, d = raycast.render_rows_diff(p, v, cfg)
        return jnp.sum(s * 0.0)

    g = jax.grad(loss)(pos, vel)
    np.testing.assert_array_equal(np.asarray(g), 0.0)


def test_perception_gradient_ascent_improves_visibility():
    """The cleanest through-perception learning signal: one eye at the
    origin heading +x, one target in view but off-center; gradient ascent
    on the TARGET's position through the raycast VJP must raise the eye's
    visibility signal (the splat approaches and centers). Dense autodiff
    and the Pallas VJP must follow the same trajectory."""
    import optax

    cfg = VisionConfig(width=32, antialias=True)
    vel = jnp.array([[1.0, 0.0], [0.0, 1.0]], jnp.float32)

    results = {}
    for name, render_fn in (
        ("dense", lambda p: render.render_rows(p, vel, cfg)[0]),
        ("pallas", lambda p: raycast.render_rows_diff(p, vel, cfg)[0]),
    ):
        def loss(t, render_fn=render_fn):
            p = jnp.stack([jnp.zeros(2, jnp.float32), t])
            return -jnp.mean(render_fn(p)[0] - cfg.background)

        t = jnp.array([20.0, 8.0], jnp.float32)
        opt = optax.adam(0.3)
        st = opt.init(t)
        v0 = -float(loss(t))
        step = jax.jit(
            lambda t, st: opt.update(jax.grad(loss)(t), st, t)  # noqa: B023
        )
        for _ in range(60):
            up, st = step(t, st)
            t = optax.apply_updates(t, up)
        results[name] = (v0, -float(loss(t)), np.asarray(t))

    for name, (v0, v1, _) in results.items():
        assert v1 > v0 * 2, f"{name}: visibility {v0:.4f} -> {v1:.4f}"
    np.testing.assert_allclose(
        results["pallas"][2], results["dense"][2], rtol=1e-3, atol=1e-3
    )


def test_trajopt_through_env_perception_learns():
    """Open-loop analytic-gradient optimization (the APG gradient path
    without a policy in the way): optimize a per-step action sequence
    through env.dynamics AND env.observe, maximizing the visibility
    reward — gradients must flow obs -> raycast VJP -> positions across
    the whole rollout."""
    import optax

    from nenbody_tpu.rl.env import VisionEnv

    env = VisionEnv(
        SimConfig(
            n=8, controller="gravity",
            vision=VisionConfig(width=16, antialias=True),
            spawn_pos_range=(-25.0, 25.0),
        ),
        max_accel=2.0, smooth_clip=True, reward_mode="visibility",
    )
    from nenbody_tpu.state import spawn

    state0 = spawn(jax.random.key(5), env.cfg)
    horizon = 6

    def loss(actions):
        def body(state, a):
            state = env.dynamics(state, a)
            obs = env.observe(state)
            return state, jnp.mean(env.reward_obs(obs))

        _, rs = jax.lax.scan(body, state0, actions)
        return -jnp.mean(rs)

    actions = jnp.zeros((horizon, env.cfg.n, 2), jnp.float32)
    opt = optax.adam(0.5)
    st = opt.init(actions)
    r0 = -float(loss(actions))
    step = jax.jit(lambda a, st: opt.update(jax.grad(loss)(a), st, a))
    for _ in range(30):
        up, st = step(actions, st)
        actions = optax.apply_updates(actions, up)
    r1 = -float(loss(actions))
    assert np.isfinite(r1)
    assert r1 > r0 + 1e-4, f"trajopt through perception flat: {r0:.5f} -> {r1:.5f}"


def test_apg_diff_vision_gradient_is_load_bearing():
    """With an observation-defined reward, stop-gradient APG has EXACTLY
    zero gradient; diff_vision=True makes it finite and nonzero — the
    perception VJP is the only gradient path."""
    import optax

    from nenbody_tpu.rl import apg as apg_lib
    from nenbody_tpu.rl.env import VisionEnv
    from nenbody_tpu.rl.policy import MLPPolicy

    norms = {}
    for diff in (False, True):
        env = VisionEnv(
            SimConfig(
                n=16, controller="gravity",
                vision=VisionConfig(width=16, antialias=True),
            ),
            max_accel=1.0, smooth_clip=True, reward_mode="visibility",
        )
        opt = optax.adam(1e-3)
        ts, apply_fn, _ = apg_lib.init_apg_state(
            env, jax.random.key(0), opt, policy=MLPPolicy(use_bf16=False)
        )
        step = jax.jit(
            apg_lib.make_apg_step(
                env, apply_fn, opt, horizon=4, num_envs=8, diff_vision=diff
            )
        )
        ts, metrics = step(ts)
        norms[diff] = float(metrics["grad_norm"])

    assert norms[False] == 0.0, f"stop-gradient APG leaked: {norms[False]}"
    assert np.isfinite(norms[True]) and norms[True] > 0.0, norms[True]


# (diff_vision on a mesh is exercised in tests/test_ring_diff_vision.py —
# the backward vision ring makes it multi-chip.)


def test_apg_through_wireframe_perception():
    """The AA'd wireframe observation is differentiable on the dense path,
    so APG diff_vision works with the reference's EXACT sprite: with an
    observation-defined reward the gradient is zero under stop-gradient and
    finite-nonzero with diff_vision=True (the wireframe edition of the
    load-bearing test above)."""
    import optax

    from nenbody_tpu.rl import apg as apg_lib
    from nenbody_tpu.rl.env import VisionEnv
    from nenbody_tpu.rl.policy import MLPPolicy

    norms = {}
    for diff in (False, True):
        env = VisionEnv(
            SimConfig(
                n=16, controller="gravity",
                vision=VisionConfig(
                    width=16, antialias=True, sprite_mode="wireframe"
                ),
            ),
            max_accel=1.0, smooth_clip=True, reward_mode="visibility",
        )
        opt = optax.adam(1e-3)
        ts, apply_fn, _ = apg_lib.init_apg_state(
            env, jax.random.key(0), opt, policy=MLPPolicy(use_bf16=False)
        )
        step = jax.jit(
            apg_lib.make_apg_step(
                env, apply_fn, opt, horizon=4, num_envs=8, diff_vision=diff
            )
        )
        ts, metrics = step(ts)
        norms[diff] = float(metrics["grad_norm"])

    assert norms[False] == 0.0, f"stop-gradient APG leaked: {norms[False]}"
    assert np.isfinite(norms[True]) and norms[True] > 0.0, norms[True]
