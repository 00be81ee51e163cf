"""Quick TPU smoke + timing for the Pallas kernels (dev utility).

Uses the chained-scan methodology (see bench.py / DESIGN.md §7): naive
per-dispatch timing lies under the remote-execution tunnel.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from nenbody_tpu import SimConfig, VisionConfig, spawn
from nenbody_tpu.config import BoidsConfig, GravityConfig
from nenbody_tpu.ops import boids as boids_ops
from nenbody_tpu.ops import pairwise, raycast
from nenbody_tpu.physics import dense
from nenbody_tpu.vision import render

print("backend:", jax.default_backend(), jax.devices())

# -- correctness on-chip at small N vs the dense oracle -----------------------
st = spawn(jax.random.key(0), SimConfig(n=512, controller="gravity"))
err = float(jnp.max(jnp.abs(
    pairwise.gravity_forces_tiled(st.pos, GravityConfig())
    - dense.gravity_forces(st.pos, GravityConfig()))))
print(f"gravity kernel max err vs dense @512: {err:.3e}")

errb = float(jnp.max(jnp.abs(
    boids_ops.boids_velocity_tiled(st.pos, st.vel, BoidsConfig())
    - dense.boids_accels(st.pos, st.vel, BoidsConfig()))))
print(f"boids kernel max err vs dense @512: {errb:.3e}")

vcfg = VisionConfig(width=128)
gs, _ = raycast.render_rows_tiled(st.pos, st.vel, vcfg)
ws, _ = render.render_rows(st.pos, st.vel, vcfg)
print(f"raycast shade max err @512: {float(jnp.max(jnp.abs(gs - ws))):.3e}")


# -- throughput via chained scans ---------------------------------------------
from nenbody_tpu.utils.profiling import scan_throughput as scan_time


n = 65536
key = jax.random.key(1)
pos = jax.random.uniform(key, (n, 2), minval=-100, maxval=100, dtype=jnp.float32)
vel = jax.random.uniform(key, (n, 2), dtype=jnp.float32)

dt = scan_time(
    lambda c: (c[0] + c[1], c[1] + 0.1 * pairwise.gravity_forces_tiled(c[0], GravityConfig())),
    (pos, vel), 10, lambda c: c[0][:1],
)
print(f"gravity N={n}: {dt*1e3:.2f} ms/step -> {n*n/dt:.3e} pair-evals/s")

dt = scan_time(
    lambda c: (c[0] + 0.04 * c[1], boids_ops.boids_velocity_tiled(c[0], c[1], BoidsConfig())),
    (pos, vel), 10, lambda c: c[0][:1],
)
print(f"boids   N={n}: {dt*1e3:.2f} ms/step -> {n*n/dt:.3e} pair-evals/s")

for nn, w in [(1024, 64), (4096, 256)]:
    p, v = pos[:nn], vel[:nn]
    cfg = VisionConfig(width=w)
    dt = scan_time(
        lambda q: q + 1e-7 * raycast.render_rows_tiled(q, v, cfg)[0][:, :2],
        p, 10, lambda q: q[:1],
    )
    print(f"vision N={nn} W={w}: {dt*1e3:.3f} ms -> {nn/dt:.3e} agent-frames/s")
