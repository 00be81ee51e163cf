"""Behavior cloning: fit a policy to recorded (obs, action) datasets.

Closes the datagen loop — `rl/datagen.py` exports batched rollout shards;
this trains a Gaussian policy on them by maximizing the action log-density
(equivalently MSE on the mean plus entropy calibration of log_std). Useful
for distilling an expensive controller (e.g. the reference boids rules or
an ES-trained policy) into a cheap MLP, and as the warm start for the
on-policy trainers.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .env import VisionEnv
from .policy import MLPPolicy, gaussian_log_prob


class BCState(NamedTuple):
    params: Any
    opt_state: Any
    key: jax.Array
    step: jax.Array


def flatten_dataset(data: dict) -> Tuple[np.ndarray, np.ndarray]:
    """{obs [T,B,N,W], action [T,B,N,2]} -> (obs [M,W], action [M,2])."""
    obs = np.asarray(data["obs"], np.float32)
    act = np.asarray(data["action"], np.float32)
    return obs.reshape(-1, obs.shape[-1]), act.reshape(-1, act.shape[-1])


def make_bc_step(
    apply_fn: Callable,
    optimizer: optax.GradientTransformation,
    batch_size: int = 4096,
):
    """Jitted minibatch step over device-resident (obs, action) arrays."""

    def bc_step(ts: BCState, obs: jax.Array, act: jax.Array):
        key, sub = jax.random.split(ts.key)
        idx = jax.random.randint(sub, (batch_size,), 0, obs.shape[0])
        ob, ac = obs[idx], act[idx]

        def loss_fn(p):
            mean, log_std = apply_fn(p, ob)
            return -jnp.mean(gaussian_log_prob(ac, mean, log_std))

        loss, grads = jax.value_and_grad(loss_fn)(ts.params)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return BCState(params, opt_state, key, ts.step + 1), loss

    return jax.jit(bc_step)


def fit(
    env: VisionEnv,
    data: dict,
    key: jax.Array,
    steps: int = 1000,
    batch_size: int = 4096,
    lr: float = 1e-3,
    policy: Optional[MLPPolicy] = None,
    log_every: int = 0,
):
    """Train a policy on a dataset dict (from datagen.load_shards).

    Returns (params, apply_fn, final_loss)."""
    if steps <= 0:
        raise ValueError(f"steps must be positive, got {steps}")
    policy = policy or MLPPolicy()
    obs_np, act_np = flatten_dataset(data)
    if obs_np.shape[-1] != env.obs_width:
        raise ValueError(
            f"dataset obs width {obs_np.shape[-1]} != env obs width {env.obs_width}"
        )
    obs = jnp.asarray(obs_np)
    act = jnp.asarray(act_np)

    kp, kr = jax.random.split(key)
    params = policy.init(kp, obs[:1])
    opt = optax.adam(lr)
    ts = BCState(params, opt.init(params), kr, jnp.int32(0))
    step = make_bc_step(policy.apply, opt, batch_size=min(batch_size, obs.shape[0]))

    loss = None
    for i in range(steps):
        ts, loss = step(ts, obs, act)
        if log_every and i % log_every == 0:
            print(f"bc step {i}: loss {float(loss):.4f}", flush=True)
    return ts.params, policy.apply, float(loss)
