"""Train a cohesion policy with APG (gradients through the Pallas physics)
and render untrained-vs-trained behavior side by side.

    python examples/train_and_show.py [--iters 300] [--out docs/trained_policy.gif]
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nenbody_tpu import SimConfig, VisionConfig
from nenbody_tpu.rl import apg as apg_lib
from nenbody_tpu.rl.env import VisionEnv
from nenbody_tpu.rl.policy import MLPPolicy
from nenbody_tpu.state import spawn
from nenbody_tpu.viz import frame as frame_lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--agents", type=int, default=64)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--stride", type=int, default=6)
    ap.add_argument("--out", default="docs/trained_policy.gif")
    args = ap.parse_args()

    env = VisionEnv(
        SimConfig(n=args.agents, controller="gravity", vision=VisionConfig(width=32)),
        max_accel=1.0,
        speed_penalty=0.05,  # teach braking, not just seeking
    )
    opt = optax.adam(1e-2)
    ts, apply_fn, _ = apg_lib.init_apg_state(
        env, jax.random.key(0), opt, policy=MLPPolicy(use_bf16=False)
    )
    params0 = ts.params
    step = jax.jit(apg_lib.make_apg_step(env, apply_fn, opt, horizon=32, num_envs=32))
    for i in range(args.iters):
        ts, m = step(ts)
        if i % 50 == 0:
            print(f"iter {i:4d}: reward {float(m['reward_mean']):.4f}", flush=True)

    # roll both policies from the SAME spawn and render side by side
    import functools

    @functools.partial(jax.jit, static_argnums=(2,))
    def advance(params, state, k):
        def body(s, _):
            obs = env.observe(s)
            action, _ = apply_fn(params, obs)
            return env.dynamics(s, action), ()

        return jax.lax.scan(body, state, None, length=k)[0]

    s_raw = spawn(jax.random.key(7), env.cfg)
    s_tr = s_raw
    frames = []
    for _ in range(args.steps // args.stride):
        s_raw = advance(params0, s_raw, args.stride)
        s_tr = advance(ts.params, s_tr, args.stride)
        left = frame_lib.render_topdown(
            np.asarray(s_raw.pos), np.asarray(s_raw.vel), size=(270, 270),
            center=np.asarray(s_raw.pos).mean(0), half_extent=160.0,
        )
        right = frame_lib.render_topdown(
            np.asarray(s_tr.pos), np.asarray(s_tr.vel), size=(270, 270),
            center=np.asarray(s_tr.pos).mean(0), half_extent=160.0,
        )
        sep = np.ones((270, 4, 3), np.float32)
        frames.append(frame_lib.to_uint8(np.concatenate([left, sep, right], axis=1)))

    import imageio.v2 as imageio

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    imageio.mimsave(args.out, frames, duration=40, loop=0)
    print(f"wrote {args.out}  (left: untrained, right: APG-trained cohesion)")

    def spread(s):
        p = np.asarray(s.pos)
        return float(((p - p.mean(0)) ** 2).sum(1).mean())

    print(f"final spread: untrained {spread(s_raw):.0f} vs trained {spread(s_tr):.0f}")


if __name__ == "__main__":
    main()
