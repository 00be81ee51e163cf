"""Analytic policy gradients (APG) through the differentiable dynamics.

The third trainer: where REINFORCE estimates gradients from log-probs and
ES from perturbations, APG backpropagates the reward THROUGH the physics —
the Pallas gravity force carries a custom VJP (ops/pairwise.py), so
`d reward / d action` flows chip-side through every rollout step. The
vision observation is stop-gradiented (the rasterizer's depth test is
piecewise constant, so its gradient is zero-almost-everywhere anyway);
gradients reach the policy through the actions it emitted, not through
perception — "semi-APG", the standard trick for sims with hard visibility.

Deterministic (mean-action) policy; short horizons recommended (gradient
explosion through long chaotic rollouts is a property of the physics, not
the implementation — use jax.checkpoint on the step for memory if needed).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..state import spawn_batch
from .env import VisionEnv


class APGState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array
    iteration: jax.Array


def make_apg_step(
    env: VisionEnv,
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    horizon: int = 8,
    num_envs: int = 8,
    remat: bool = False,
    mesh=None,
):
    """Build the jitted APG step: rollout -> -mean reward -> grad through
    dynamics -> optax update. Fresh envs each iteration (episodic).

    With a mesh, envs shard over the data axis and agents over the agent
    axis; the gradient flows through the ppermute ring (collectives are
    linear, so their transpose is the reversed ring — XLA derives it)."""
    if mesh is None:
        observe_b = jax.vmap(env.observe)
        dyn_b = jax.vmap(env.dynamics)
    else:
        from ..parallel import ring
        from ..parallel.mesh import DATA_AXIS

        cfg = env.cfg

        def observe_b(states):
            lines = ring.ring_render_rows(
                states.pos, states.vel, cfg.vision, mesh=mesh, data_axis=DATA_AXIS
            )[0]
            return jnp.concatenate([lines, states.vel], axis=-1)

        def dyn_b(states, action):
            accel = jnp.clip(action, -env.max_accel, env.max_accel)
            g = ring.ring_gravity_forces(
                states.pos, cfg, mesh=mesh, data_axis=DATA_AXIS
            )
            gcfg = cfg.gravity
            vel = states.vel + (g + accel) * gcfg.dt
            pos = states.pos + vel * (gcfg.dt if gcfg.dt_on_position else 1.0)
            return states.replace(pos=pos, vel=vel, t=states.t + 1)

    reward_b = jax.vmap(env.reward)
    if remat:
        dyn_b = jax.checkpoint(dyn_b)

    def loss(params, env_states):
        def body(states, _):
            # perception OUTSIDE the gradient: the raycast kernel has no
            # JVP (and its depth test is piecewise constant anyway); the
            # grad path runs action -> dynamics -> reward only.
            obs = observe_b(jax.lax.stop_gradient(states))
            action, _ = apply_fn(params, obs)
            states = dyn_b(states, action)
            return states, jnp.mean(reward_b(states))

        _, rewards = jax.lax.scan(body, env_states, None, length=horizon)
        return -jnp.mean(rewards)

    def apg_step(ts: APGState) -> Tuple[APGState, dict]:
        key, k_envs = jax.random.split(ts.key)
        env_states = spawn_batch(k_envs, env.cfg, num_envs)
        value, grads = jax.value_and_grad(loss)(ts.params, env_states)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        metrics = {
            "loss": value,
            "reward_mean": -value,
            "grad_norm": optax.global_norm(grads),
        }
        return APGState(params, opt_state, key, ts.iteration + 1), metrics

    return apg_step


def init_apg_state(
    env: VisionEnv,
    key: jax.Array,
    optimizer: optax.GradientTransformation,
    policy=None,
) -> Tuple[APGState, Callable, Any]:
    from .policy import MLPPolicy

    policy = policy or MLPPolicy()
    kp, kr = jax.random.split(key)
    params = policy.init(kp, jnp.zeros((1, env.obs_width), jnp.float32))
    opt_state = optimizer.init(params)
    return APGState(params, opt_state, kr, jnp.int32(0)), policy.apply, policy
