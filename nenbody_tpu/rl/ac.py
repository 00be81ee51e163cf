"""REINFORCE with a learned value baseline (actor-critic variance reduction).

Same rollout machinery as rl/train.py; the advantage is
`returns-to-go - V(obs)` with a per-agent value head trained on the returns,
which cuts the score-function estimator's variance without changing its
bias. Composes with meshes exactly like the plain trainer (the env fns are
shared)."""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from ..state import SceneState, spawn_batch
from .env import VisionEnv
from .policy import MLPPolicy, ValueMLP, gaussian_log_prob, sample_action
from .train import Trajectory, _batched_env_fns, discounted_returns


class ACState(NamedTuple):
    params: Any  # {"policy": ..., "value": ...}
    opt_state: Any
    env_states: SceneState
    key: jax.Array


def make_ac_step(
    env: VisionEnv,
    policy_apply: Callable,
    value_apply: Callable,
    optimizer: optax.GradientTransformation,
    horizon: int = 8,
    gamma: float = 0.99,
    value_coef: float = 0.5,
    mesh: Optional[Mesh] = None,
    episodic: bool = True,
):
    """episodic=True respawns envs per iteration (see train.make_train_step)."""
    observe_b, step_b = _batched_env_fns(env, mesh)

    def rollout(params, env_states, key):
        obs0 = observe_b(env_states)

        def body(carry, _):
            states, obs, key = carry
            key, sub = jax.random.split(key)
            action, _ = sample_action(params["policy"], policy_apply, obs, sub)
            action = jax.lax.stop_gradient(action)
            states, next_obs, reward = step_b(states, action)
            return (states, next_obs, key), (obs, action, reward)

        (env_states, _, _), (obs, action, reward) = jax.lax.scan(
            body, (env_states, obs0, key), None, length=horizon
        )
        return env_states, Trajectory(obs, action, reward)

    def ac_step(ts: ACState) -> Tuple[ACState, dict]:
        key, sub, k_envs = jax.random.split(ts.key, 3)
        start_states = ts.env_states
        if episodic:
            num_envs = ts.env_states.pos.shape[0]
            start_states = spawn_batch(k_envs, env.cfg, num_envs)
        env_states, traj = rollout(ts.params, start_states, sub)
        rets = discounted_returns(traj.reward, gamma)

        def loss_fn(p):
            mean, log_std = policy_apply(p["policy"], traj.obs)
            logp = gaussian_log_prob(traj.action, mean, log_std)
            v = value_apply(p["value"], traj.obs)  # [T, B, N]
            adv = jax.lax.stop_gradient(rets - v)
            pg = -jnp.mean(logp * adv)
            v_loss = jnp.mean((v - rets) ** 2)
            return pg + value_coef * v_loss, (pg, v_loss)

        (loss, (pg, v_loss)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params
        )
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        metrics = {
            "loss": loss,
            "pg_loss": pg,
            "value_loss": v_loss,
            "reward_mean": jnp.mean(traj.reward),
        }
        return ACState(params, opt_state, env_states, key), metrics

    return ac_step


def init_ac_state(
    env: VisionEnv,
    num_envs: int,
    key: jax.Array,
    optimizer: optax.GradientTransformation,
    policy: Optional[MLPPolicy] = None,
    value: Optional[ValueMLP] = None,
) -> Tuple[ACState, Callable, Callable]:
    from .policy import value_init_obs

    policy = policy or MLPPolicy()
    value = value or ValueMLP()
    kp, kv, ke, kr = jax.random.split(key, 4)
    env_states = spawn_batch(ke, env.cfg, num_envs)
    dummy = jnp.zeros((1, env.obs_width), jnp.float32)
    # the centralized (pooled) critic consumes whole [N, W] rows; AC's loss
    # is full-batch [T, B, N, W], so it drops in with no other change
    vdummy = value_init_obs(value, env.cfg.n, env.obs_width)
    params = {"policy": policy.init(kp, dummy), "value": value.init(kv, vdummy)}
    opt_state = optimizer.init(params)
    return (
        ACState(params, opt_state, env_states, kr),
        policy.apply,
        value.apply,
    )
