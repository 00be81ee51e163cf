"""Serving artifacts end to end: train, export, then deploy-and-drive the
blob as a black box.

train (REINFORCE, tiny) --export--> StableHLO blob (params baked in)
    --load--> step fleet rollouts with NO checkpoint / net / env config —
the deployment story: the serving site needs jax + the blob, nothing else.

    python examples/serving_demo.py
"""

import sys

sys.path.insert(0, ".")

import jax
import numpy as np
import optax

from nenbody_tpu import SimConfig, VisionConfig
from nenbody_tpu.rl import train as train_lib
from nenbody_tpu.rl.env import VisionEnv
from nenbody_tpu.state import spawn_batch
from nenbody_tpu.utils import export as export_lib


def main():
    env = VisionEnv(
        SimConfig(n=64, controller="gravity", vision=VisionConfig(width=32))
    )
    opt = optax.adam(1e-3)
    ts, apply_fn, _ = train_lib.init_train_state(
        env, num_envs=16, key=jax.random.key(0), optimizer=opt
    )
    step = jax.jit(train_lib.make_train_step(env, apply_fn, opt, horizon=8))
    for i in range(10):
        ts, metrics = step(ts)
    print(f"trained 10 iters, reward_mean={float(metrics['reward_mean']):.4f}")

    # one artifact per serving shape: a 32-env fleet, 8 sim steps per call
    blob = export_lib.export_policy_step(
        env, apply_fn, ts.params, num_envs=32, steps=8
    )
    path = "/tmp/nenbody_policy_step.nxs"
    with open(path, "wb") as f:
        f.write(blob)
    print(f"exported {len(blob)} bytes -> {path}")

    # ---- the serving site: only the blob crosses this line ----
    serve = export_lib.load_policy_step(path)
    st = spawn_batch(jax.random.key(7), env.cfg, 32)
    pos, vel = st.pos, st.vel
    for chunk in range(4):
        pos, vel, action = serve(pos, vel)  # 8 baked steps per dispatch
    spread = float(np.mean(np.sum(
        (np.asarray(pos) - np.asarray(pos).mean(1, keepdims=True)) ** 2, -1
    )))
    print(f"served 32 envs x 32 steps in 4 dispatches; final spread {spread:.2f}")


if __name__ == "__main__":
    main()
