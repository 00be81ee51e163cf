"""Trajectory optimization through the differentiable Pallas physics:
find initial velocities that minimize the swarm's final spread after a
gravity rollout — jax.grad flows through every tiled force evaluation via
the custom-VJP backward kernel (ops/pairwise.py).

    python examples/trajopt_demo.py [--n 256] [--horizon 20] [--iters 30]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from nenbody_tpu import SimConfig, spawn
from nenbody_tpu.ops import tiled


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--horizon", type=int, default=20)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--lr", type=float, default=0.5)
    args = ap.parse_args()

    cfg = SimConfig(n=args.n, controller="gravity", backend="pallas")
    state0 = spawn(jax.random.key(0), cfg)

    def final_spread(vel0):
        s = state0.replace(vel=vel0)

        def body(s, _):
            return tiled.gravity_step(s, cfg=cfg), ()

        s, _ = jax.lax.scan(body, s, None, length=args.horizon)
        centroid = jnp.mean(s.pos, axis=0)
        return jnp.mean(jnp.sum((s.pos - centroid) ** 2, axis=-1))

    opt = optax.adam(args.lr)
    vel = state0.vel
    opt_state = opt.init(vel)
    step = jax.jit(
        lambda v, o: (lambda l, g: (l, *_apply(o, g, v)))(
            *jax.value_and_grad(final_spread)(v)
        )
    )

    def _apply(o, g, v):
        updates, o2 = opt.update(g, o, v)
        return optax.apply_updates(v, updates), o2

    for i in range(args.iters):
        loss, vel, opt_state = step(vel, opt_state)
        if i % 5 == 0 or i == args.iters - 1:
            print(f"iter {i:3d}: final spread = {float(loss):10.2f}")


if __name__ == "__main__":
    main()
