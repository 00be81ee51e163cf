"""Multi-chip scaling walkthrough — runs anywhere via virtual CPU devices.

Shows the agent-axis ring (ppermute over ICI on real pods) and DP x ring
training sharding, on an 8-device mesh faked on the host CPU:

    python examples/multichip_demo.py
"""

import sys

sys.path.insert(0, ".")

import jax

# Provision 8 virtual devices BEFORE any backend use (on a real pod, delete
# these two lines — jax.devices() already holds the chips).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import optax

from nenbody_tpu import SimConfig, VisionConfig, spawn
from nenbody_tpu.parallel import mesh as mesh_lib, ring
from nenbody_tpu.physics import dense
from nenbody_tpu.rl import train as train_lib
from nenbody_tpu.rl.env import VisionEnv


def main():
    print(f"devices: {len(jax.devices())} x {jax.devices()[0].platform}")

    # -- 1. agent-axis ring: N agents sharded over all 8 devices -------------
    mesh = mesh_lib.make_mesh({"agents": 8})
    cfg = SimConfig(n=1024, controller="gravity", backend="ring")
    st = spawn(jax.random.key(0), cfg)
    g_ring = ring.ring_gravity_forces(st.pos, cfg, mesh=mesh)
    g_dense = dense.gravity_forces(st.pos, cfg.gravity)
    err = float(np.abs(np.asarray(g_ring) - np.asarray(g_dense)).max())
    print(f"ring gravity over 8 shards: max |err| vs dense = {err:.2e}")

    shade, depth = ring.ring_render_rows(
        st.pos, st.vel, VisionConfig(width=32), mesh=mesh
    )
    print(f"ring vision: obs {shade.shape}, sharded {shade.sharding}")

    # -- 2. DP x ring: envs over 'data', agents over 'agents' ----------------
    mesh2 = mesh_lib.make_mesh({"data": 2, "agents": 4})
    env = VisionEnv(
        SimConfig(n=64, controller="gravity", vision=VisionConfig(width=16))
    )
    opt = optax.adam(1e-3)
    ts, apply_fn, _ = train_lib.init_train_state(
        env, num_envs=4, key=jax.random.key(0), optimizer=opt, mesh=mesh2
    )
    step = jax.jit(train_lib.make_train_step(env, apply_fn, opt, horizon=2, mesh=mesh2))
    ts, metrics = step(ts)
    print(
        f"train step on (data=2, agents=4): loss={float(metrics['loss']):.4f} "
        f"reward={float(metrics['reward_mean']):.4f}"
    )
    print("env state sharding:", ts.env_states.pos.sharding)


if __name__ == "__main__":
    main()
