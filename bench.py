"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json): body-pair force evaluations/sec/chip at N=65,536
via the tiled Pallas gravity kernel, fp32, reference force law. Baseline
target is 1e9 pair-evals/s/chip; vs_baseline = value / 1e9.

Methodology: K data-dependent steps chained under one `lax.scan` inside a
single jit, synchronized once by fetching a slice of the result — this
measures pure device throughput (the rollout use case) and is immune to
per-dispatch RPC latency and to runtimes whose `block_until_ready` returns
before remote execution finishes.

Secondary metrics ride along in the same JSON object: vision agent-frames/s
for the batched-env datagen config (target 1e6/s) and the N=1,024 single-env
config, plus boids pair throughput.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timed(fn, *args, sync_slice, steps, label=""):
    """Compile, then time one chained-scan dispatch; returns sec/step.
    (Same methodology as utils.profiling.scan_throughput, plus compile-time
    progress on stderr so a stalled remote compile is visible, plus one
    retry — the remote-execution tunnel occasionally throws a transient
    'TPU backend error (Internal)' on a cold first dispatch.)

    The timed dispatch runs on perturbed inputs so it is never bit-identical
    to the warm-up dispatch — a runtime that deduped or cached identical
    dispatches would otherwise report inflated throughput."""
    last_err = None
    for attempt in range(2):
        try:
            t0 = time.perf_counter()
            _ = np.asarray(sync_slice(fn(*args)))  # compile + full sync
            print(f"[bench] {label}: compiled in {time.perf_counter()-t0:.0f}s",
                  file=sys.stderr, flush=True)
            args2 = tuple(
                jax.block_until_ready(a + jnp.float32(1e-6))
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a
                for a in args
            )
            t0 = time.perf_counter()
            _ = np.asarray(sync_slice(fn(*args2)))
            return (time.perf_counter() - t0) / steps
        except Exception as e:  # noqa: BLE001 - transient runtime errors
            last_err = e
            print(f"[bench] {label}: attempt {attempt} failed: {e}",
                  file=sys.stderr, flush=True)
            if attempt == 0:
                time.sleep(2.0)
    raise last_err


def main():
    from nenbody_tpu.config import BoidsConfig, GravityConfig, VisionConfig
    from nenbody_tpu.ops import boids as boids_ops
    from nenbody_tpu.ops import pairwise, raycast

    on_tpu = jax.default_backend() == "tpu"
    key = jax.random.key(0)

    # -- headline: pair-force evals/s at N=65,536 (gravity, Pallas, fp32) ----
    n = 65536 if on_tpu else 2048
    k_steps = 20 if on_tpu else 3
    pos = jax.random.uniform(key, (n, 2), minval=-100, maxval=100, dtype=jnp.float32)
    vel = jax.random.uniform(key, (n, 2), dtype=jnp.float32)
    gcfg = GravityConfig()

    @jax.jit
    def grav_roll(p, v):
        def body(c, _):
            p, v = c
            g = pairwise.gravity_forces_tiled(p, gcfg)
            v = v + g * gcfg.dt
            return (p + v, v), ()

        c, _ = jax.lax.scan(body, (p, v), None, length=k_steps)
        return c[0]

    dt = _timed(grav_roll, pos, vel, sync_slice=lambda o: o[:1], steps=k_steps, label="gravity")
    pair_evals_per_s = n * n / dt

    # fast mode: approximate reciprocal (documented ~1e-3 force error)
    gcfg_fast = GravityConfig(approx_reciprocal=True)

    @jax.jit
    def grav_roll_fast(p, v):
        def body(c, _):
            p, v = c
            g = pairwise.gravity_forces_tiled(p, gcfg_fast)
            v = v + g * gcfg_fast.dt
            return (p + v, v), ()

        c, _ = jax.lax.scan(body, (p, v), None, length=k_steps)
        return c[0]

    dt_fast = _timed(grav_roll_fast, pos, vel, sync_slice=lambda o: o[:1], steps=k_steps, label="gravity-approx")
    pair_evals_fast = n * n / dt_fast

    # -- boids pair throughput at the same N ---------------------------------
    bcfg = BoidsConfig()

    @jax.jit
    def boids_roll(p, v):
        def body(c, _):
            p, v = c
            nv = boids_ops.boids_velocity_tiled(p, v, bcfg)
            return (p + nv * bcfg.dt, nv), ()

        c, _ = jax.lax.scan(body, (p, v), None, length=k_steps)
        return c[0]

    dt_b = _timed(boids_roll, pos, vel, sync_slice=lambda o: o[:1], steps=k_steps, label="boids")
    boids_pairs_per_s = n * n / dt_b

    # -- vision: batched datagen config (4096 envs x 256 agents x W=64) ------
    benvs = 1024 if on_tpu else 16  # 1024 compiles fast; fps matches 4096
    bn, bw = 256, 64
    kv_steps = 5 if on_tpu else 2
    vcfg = VisionConfig(width=bw)
    kp, kv = jax.random.split(key)
    bpos = jax.random.uniform(kp, (benvs, bn, 2), minval=-100, maxval=100, dtype=jnp.float32)
    bvel = jax.random.uniform(kv, (benvs, bn, 2), minval=-1, maxval=1, dtype=jnp.float32)

    @jax.jit
    def vis_roll(p, v):
        def body(p, _):
            s = jax.vmap(lambda a, b: raycast.render_rows_tiled(a, b, vcfg)[0])(p, v)
            return p + 1e-7 * s[..., :2], ()  # consume obs to defeat DCE

        p, _ = jax.lax.scan(body, p, None, length=kv_steps)
        return p

    dt_v = _timed(vis_roll, bpos, bvel, sync_slice=lambda o: o[:1, :1], steps=kv_steps, label="vision-batched")
    vision_fps_batched = benvs * bn / dt_v

    # -- vision: single env N=1024, W=64 (BASELINE config 2) -----------------
    n1 = 1024
    p1, v1 = bpos[:4].reshape(n1, 2), bvel[:4].reshape(n1, 2)

    @jax.jit
    def vis1_roll(p, v):
        def body(p, _):
            s = raycast.render_rows_tiled(p, v, vcfg)[0]
            return p + 1e-7 * s[:, :2], ()

        p, _ = jax.lax.scan(body, p, None, length=k_steps)
        return p

    dt_v1 = _timed(vis1_roll, p1, v1, sync_slice=lambda o: o[:1], steps=k_steps, label="vision-single")
    vision_fps_single = n1 / dt_v1

    print(
        json.dumps(
            {
                "metric": f"pair-force evals/sec/chip at N={n} (tiled Pallas gravity, fp32)",
                "value": pair_evals_per_s,
                "unit": "pair-evals/s",
                "vs_baseline": pair_evals_per_s / 1e9,
                "extra": {
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                    "gravity_ms_per_step": dt * 1e3,
                    "gravity_pair_evals_per_s_approx_reciprocal": pair_evals_fast,
                    "boids_pair_evals_per_s": boids_pairs_per_s,
                    "vision_agent_frames_per_s_batched_1024x256_w64": vision_fps_batched,
                    "vision_agent_frames_per_s_n1024_w64": vision_fps_single,
                    "vision_vs_1e6_target": vision_fps_batched / 1e6,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
