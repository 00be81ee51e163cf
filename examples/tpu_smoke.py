"""Quick TPU smoke + timing for the Pallas kernels (dev utility)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from nenbody_tpu import SimConfig, VisionConfig, spawn
from nenbody_tpu.config import BoidsConfig, GravityConfig
from nenbody_tpu.ops import boids as boids_ops
from nenbody_tpu.ops import pairwise, raycast
from nenbody_tpu.physics import dense

print("backend:", jax.default_backend(), jax.devices())


def bench(fn, *args, iters=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# correctness on-chip at small N vs dense
st = spawn(jax.random.key(0), SimConfig(n=512, controller="gravity"))
got = pairwise.gravity_forces_tiled(st.pos, GravityConfig())
want = dense.gravity_forces(st.pos, GravityConfig())
err = float(jnp.max(jnp.abs(got - want)))
print(f"gravity kernel max err vs dense @512: {err:.3e}")

gotb = boids_ops.boids_velocity_tiled(st.pos, st.vel, BoidsConfig())
wantb = dense.boids_accels(st.pos, st.vel, BoidsConfig())
print(f"boids kernel max err vs dense @512: {float(jnp.max(jnp.abs(gotb - wantb))):.3e}")

vcfg = VisionConfig(width=128)
gs, gd = raycast.render_rows_tiled(st.pos, st.vel, vcfg)
ws, wd = __import__("nenbody_tpu.vision.render", fromlist=["render"]).render_rows(
    st.pos, st.vel, vcfg
)
print(f"raycast shade max err @512: {float(jnp.max(jnp.abs(gs - ws))):.3e}")

# throughput at N=65536
n = 65536
key = jax.random.key(1)
pos = jax.random.uniform(key, (n, 2), minval=-100, maxval=100, dtype=jnp.float32)
f = jax.jit(lambda p: pairwise.gravity_forces_tiled(p, GravityConfig()))
dt = bench(f, pos)
print(f"gravity N={n}: {dt*1e3:.2f} ms/step -> {n*n/dt:.3e} pair-evals/s")

fb = jax.jit(lambda p, v: boids_ops.boids_velocity_tiled(p, v, BoidsConfig()))
vel = jax.random.uniform(key, (n, 2), dtype=jnp.float32)
dt = bench(fb, pos, vel)
print(f"boids   N={n}: {dt*1e3:.2f} ms/step -> {n*n/dt:.3e} pair-evals/s")

# vision at N=1024 / W=64 and N=4096 / W=256
for nn, w in [(1024, 64), (4096, 256)]:
    p = pos[:nn]
    v = vel[:nn]
    cfg = VisionConfig(width=w)
    fv = jax.jit(lambda p, v: raycast.render_rows_tiled(p, v, cfg)[0])
    dt = bench(fv, p, v)
    print(f"vision N={nn} W={w}: {dt*1e3:.3f} ms -> {nn/dt:.3e} agent-frames/s")
