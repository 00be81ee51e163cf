"""Imitation from vision: distill a scripted seek controller into an MLP.

expert (scripted phototaxis) --datagen--> (obs, action) shards --BC--> MLP,
then closed-loop evaluation of expert vs clone vs random on fresh envs —
the full datagen -> dataset -> train -> deploy loop the framework provides.

    python examples/imitation_demo.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from nenbody_tpu import SimConfig, VisionConfig
from nenbody_tpu.rl import bc, datagen, scripted
from nenbody_tpu.rl.env import VisionEnv
from nenbody_tpu.state import spawn_batch


def closed_loop_reward(env, apply_fn, params, key, num_envs=16, horizon=64):
    states = spawn_batch(key, env.cfg, num_envs)
    observe_b = jax.vmap(env.observe)
    step_b = jax.vmap(env.step)

    @jax.jit
    def roll(params, states):
        def body(carry, _):
            states, obs = carry
            mean, _ = apply_fn(params, obs)
            states, next_obs, reward = step_b(states, mean)
            return (states, next_obs), jnp.mean(reward)

        (_, _), rewards = jax.lax.scan(
            body, (states, observe_b(states)), None, length=horizon
        )
        return jnp.mean(rewards)

    return float(roll(params, states))


def main():
    env = VisionEnv(
        SimConfig(n=32, controller="gravity", vision=VisionConfig(width=32)),
        max_accel=0.5,
        speed_penalty=0.02,
    )
    expert = scripted.as_apply_fn(scripted.seek_brightest, gain=0.3)

    print("collecting expert dataset...", flush=True)
    chunks = list(
        datagen.collect(
            env, num_envs=64, total_steps=64, key=jax.random.key(0),
            params=None, apply_fn=expert, horizon=16,
        )
    )
    data = {
        k: np.concatenate([c[k] for _, c in chunks], axis=0)
        for k in ("obs", "action", "reward")
    }
    print(f"dataset: obs {data['obs'].shape}", flush=True)

    print("behavior cloning...", flush=True)
    params, clone_apply, loss = bc.fit(
        env, data, jax.random.key(1), steps=1500, batch_size=8192, lr=2e-3
    )
    print(f"final BC loss: {loss:.4f}", flush=True)

    k = jax.random.key(2)
    r_expert = closed_loop_reward(env, expert, None, k)
    r_clone = closed_loop_reward(env, clone_apply, params, k)
    zero = scripted.as_apply_fn(lambda obs: jnp.zeros(obs.shape[:-1] + (2,)))
    r_zero = closed_loop_reward(env, zero, None, k)
    print(f"closed-loop mean reward: expert {r_expert:.4f} | "
          f"clone {r_clone:.4f} | no-op {r_zero:.4f}")
    gap = (r_clone - r_zero) / max(abs(r_expert - r_zero), 1e-9)
    print(f"clone recovers {100*gap:.0f}% of the expert's improvement over no-op")


if __name__ == "__main__":
    main()
