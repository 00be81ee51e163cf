"""RL-style datagen (BASELINE.json config 5): batched vision+control
rollouts exported as training datasets.

`collect` drives B parallel envs under a policy (or random actions) for T
steps and returns/persists (obs, action, reward) tensors; chunked npz
shards keep host memory bounded while the device generates the next chunk.
The on-disk format is plain npz (obs [T,B,N,W+2] f32 or bf16, action
[T,B,N,2], reward [T,B,N]) — trivially loadable anywhere.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..state import SceneState, spawn_batch
from .env import VisionEnv
from .policy import sample_action


def make_collect_fn(
    env: VisionEnv,
    apply_fn=None,
    horizon: int = 32,
    obs_dtype=jnp.float32,
    mesh=None,
):
    """Jitted chunk collector: (params, states, key) ->
    (next_states, {obs, action, reward}). With apply_fn=None, actions are
    uniform random in [-max_accel, max_accel] (pure exploration data).

    mesh: generate on a (data, agents) device mesh — envs shard over data,
    physics/vision run the agent-axis ppermute ring, the behavior policy is
    replicated (the trainers' layout, rl/train._batched_env_fns)."""
    from .train import _batched_env_fns

    observe_b, step_b = _batched_env_fns(env, mesh)

    def chunk(params, states: SceneState, key: jax.Array):
        obs0 = observe_b(states)

        def body(carry, _):
            states, obs, key = carry
            key, sub = jax.random.split(key)
            if apply_fn is None:
                action = jax.random.uniform(
                    sub, obs.shape[:-1] + (2,),
                    minval=-env.max_accel, maxval=env.max_accel,
                )
            else:
                action, _ = sample_action(params, apply_fn, obs, sub)
            states, next_obs, reward = step_b(states, action)
            return (states, next_obs, key), (
                obs.astype(obs_dtype), action, reward
            )

        (states, _, _), (obs, action, reward) = jax.lax.scan(
            body, (states, obs0, key), None, length=horizon
        )
        return states, {"obs": obs, "action": action, "reward": reward}

    return jax.jit(chunk)


def collect(
    env: VisionEnv,
    num_envs: int,
    total_steps: int,
    key: jax.Array,
    params=None,
    apply_fn=None,
    horizon: int = 32,
    out_dir: Optional[str] = None,
    obs_dtype=jnp.float32,
    mesh=None,
) -> Iterator[Tuple[int, dict]]:
    """Generate ceil(total_steps/horizon) chunks of batched trajectories.

    Yields (chunk_index, host pytree); with out_dir set, each chunk is also
    written as shard_{i:05d}.npz. Device compute for chunk k+1 is dispatched
    before chunk k's host copy completes (async dispatch), so the generator
    overlaps IO with simulation. With mesh set, generation runs sharded
    (make_collect_fn); the yielded host chunks are identical either way.
    """
    fn = make_collect_fn(
        env, apply_fn, horizon=horizon, obs_dtype=obs_dtype, mesh=mesh
    )
    key, ke = jax.random.split(key)
    states = spawn_batch(ke, env.cfg, num_envs)
    if mesh is not None:
        from ..parallel.mesh import place_state_on_mesh

        states = place_state_on_mesh(states, mesh)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)

    num_chunks = -(-total_steps // horizon)
    pending = None  # (index, device pytree)
    for i in range(num_chunks):
        key, kc = jax.random.split(key)
        states, traj = fn(params, states, kc)
        if pending is not None:
            yield _drain(pending, out_dir)
        pending = (i, traj)
    if pending is not None:
        yield _drain(pending, out_dir)


def _drain(pending, out_dir):
    i, traj = pending
    host = {k: np.asarray(v) for k, v in traj.items()}
    if out_dir:
        np.savez(os.path.join(out_dir, f"shard_{i:05d}.npz"), **host)
    return i, host


def load_shards(out_dir: str) -> dict:
    """Concatenate all shards along time: {obs, action, reward}."""
    files = sorted(
        f for f in os.listdir(out_dir)
        if f.startswith("shard_") and f.endswith(".npz")
    )
    if not files:
        raise FileNotFoundError(f"no shard_*.npz in {out_dir}")
    parts = [np.load(os.path.join(out_dir, f)) for f in files]
    return {
        k: np.concatenate([p[k] for p in parts], axis=0)
        for k in ("obs", "action", "reward")
    }
