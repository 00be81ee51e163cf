"""Differentiable perception at the reference's EXACT observation config:
N=100 agents (src/main.rs:654), 1024-px antialiased WIREFRAME eye lines
(main.rs:694 + 130-139) — gradient-ASCEND agent positions on the
swarm's mutual visibility (mean eye-row brightness over the background —
smooth in the positions through the AA coverage term, the same signal
tests/test_diff_vision.py pins on the disc path).

jax.grad flows through the compacted-candidate wireframe kernel pair
(ops/wireframe.py: the forward's screen-sorted group culling AND its
culled compact backward — wide rows route both automatically), so every
step runs kernel-speed forward + backward at the reference's own shape.

    python examples/refconfig_diff_vision.py [--n 100] [--width 1024]
"""

import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from nenbody_tpu.config import VisionConfig
from nenbody_tpu.ops import wireframe


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--lr", type=float, default=0.5)
    args = ap.parse_args()

    cfg = VisionConfig(width=args.width, sprite_mode="wireframe",
                       antialias=True, far=200.0)
    route = "compact" if wireframe._compact_route_ok(cfg, args.n) else "streaming"
    print(f"n={args.n} width={cfg.width} wireframe+AA -> {route} fwd/bwd pair")

    kp, kv = jax.random.split(jax.random.key(0))
    pos = jax.random.uniform(kp, (args.n, 2), minval=-100, maxval=100,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (args.n, 2), minval=-1, maxval=1,
                             dtype=jnp.float32)

    def visibility(pos):
        shade, _ = wireframe.render_rows_wireframe_diff(pos, vel, cfg)
        # sprites render brighter than the clear color; AA coverage makes
        # this smooth as sprites approach/expand in view
        return jnp.mean(shade - cfg.background)

    opt = optax.adam(args.lr)
    opt_state = opt.init(pos)

    @jax.jit
    def step(pos, opt_state):
        loss, g = jax.value_and_grad(lambda p: -visibility(p))(pos)
        updates, opt_state = opt.update(g, opt_state, pos)
        return optax.apply_updates(pos, updates), opt_state, -loss

    for i in range(args.iters):
        pos, opt_state, v = step(pos, opt_state)
        if i % 5 == 0 or i == args.iters - 1:
            print(f"iter {i:3d}: mean visibility = {float(v):.5f}")


if __name__ == "__main__":
    main()
