"""Hardware throughput gates (SURVEY.md §4.5) — run ON the TPU:

    python -m pytest tpu_tests/ -q

Kept outside tests/ because tests/conftest.py forces the CPU backend for
the portable suite; these assert the BASELINE.json numbers on real silicon
and skip cleanly anywhere else.
"""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU"
)


from nenbody_tpu.utils.profiling import scan_throughput as _scan_time


@requires_tpu
def test_pair_eval_gate_1e9():
    """BASELINE: >= 1e9 pair-force evals/s/chip at N=65,536 (we target 100x)."""
    from nenbody_tpu.config import GravityConfig
    from nenbody_tpu.ops import pairwise

    n = 65536
    key = jax.random.key(0)
    pos = jax.random.uniform(key, (n, 2), minval=-100, maxval=100, dtype=jnp.float32)
    vel = jax.random.uniform(key, (n, 2), dtype=jnp.float32)
    cfg = GravityConfig()

    def body(c):
        p, v = c
        g = pairwise.gravity_forces_tiled(p, cfg)
        v = v + g * cfg.dt
        return (p + v, v)

    dt = _scan_time(body, (pos, vel), steps=10, sync=lambda c: c[0][:1])
    rate = n * n / dt
    assert rate >= 1e9, f"pair-eval rate {rate:.3e} < 1e9"
    assert rate >= 1e11, f"regression: pair-eval rate {rate:.3e} < 1e11 (was ~2e11)"


@requires_tpu
def test_vision_fps_gate_1e6():
    """BASELINE: >= 1e6 agent 1D-vision frames/s (batched datagen config)."""
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import raycast

    b, n, w = 1024, 256, 64
    key = jax.random.key(0)
    pos = jax.random.uniform(key, (b, n, 2), minval=-100, maxval=100, dtype=jnp.float32)
    vel = jax.random.uniform(key, (b, n, 2), minval=-1, maxval=1, dtype=jnp.float32)
    vcfg = VisionConfig(width=w)

    def body(p):
        s = jax.vmap(lambda a, c: raycast.render_rows_tiled(a, c, vcfg)[0])(p, vel)
        return p + 1e-7 * s[..., :2]

    dt = _scan_time(body, pos, steps=5, sync=lambda p: p[:1, :1])
    rate = b * n / dt
    assert rate >= 1e6, f"vision rate {rate:.3e} < 1e6"


def _single_env_vision_rate(n, w, steps):
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import raycast

    key = jax.random.key(7)
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (n, 2), minval=-100, maxval=100, dtype=jnp.float32)
    vel = jax.random.uniform(kv, (n, 2), minval=-1, maxval=1, dtype=jnp.float32)
    vcfg = VisionConfig(width=w)

    def body(c):
        p, v = c
        s = raycast.render_rows_tiled(p, v, vcfg)[0]
        return p + 1e-7 * s[:, :2], v

    dt = _scan_time(body, (pos, vel), steps=steps, sync=lambda c: c[0][:1])
    return n / dt


@requires_tpu
def test_vision_single_env_gate_1e6():
    """VERDICT r1 #1: the SINGLE-env BASELINE config 2 shape (N=1,024 agents,
    W=64 eyes) must clear 1e6 agent-frames/s on one chip (measured ~5-6e6
    after the o2-select kernel rework + slope timing)."""
    rate = _single_env_vision_rate(1024, 64, steps=100)
    assert rate >= 1e6, f"single-env vision rate {rate:.3e} < 1e6"
    assert rate >= 3e6, f"regression: single-env rate {rate:.3e} < 3e6 (was ~5e6)"


@requires_tpu
def test_vision_reference_width_gates():
    """VERDICT r1 #2 + r2 #4: the reference's ACTUAL eye is 1024 px wide
    (src/main.rs:694). The shipping scale (N=100, main.rs:654) clears the
    BASELINE 1e6 agent-frames/s line through the small-m-wide streaming
    route (measured 2.9e6 on v5e, slope-timed over a 400-step chain); the
    wide-eye stress shape N=1,024 holds its measured 4.1e5 order (its work
    is 16x BASELINE config 2's)."""
    ref100 = _single_env_vision_rate(100, 1024, steps=400)
    assert ref100 >= 1e6, f"reference-100 vision rate {ref100:.3e} < 1e6"
    assert ref100 >= 2e6, (
        f"regression: reference-100 rate {ref100:.3e} < 2e6 (was ~2.9e6)"
    )
    wide = _single_env_vision_rate(1024, 1024, steps=20)
    assert wide >= 3e5, f"N=1024/W=1024 vision rate {wide:.3e} < 3e5"


@requires_tpu
def test_ring_single_chip_parity_on_hardware():
    """The pallas-partials ring compiles and matches dense on real silicon
    (1-chip ring)."""
    from nenbody_tpu import SimConfig, spawn
    from nenbody_tpu.parallel import mesh as mesh_lib, ring
    from nenbody_tpu.physics import dense

    m = mesh_lib.make_mesh({"agents": 1})
    cfg = SimConfig(n=512, controller="boids", backend="ring")
    st = spawn(jax.random.key(0), cfg)
    got = ring.ring_boids_velocity(st.pos, st.vel, cfg, mesh=m)
    want = dense.boids_accels(st.pos, st.vel, cfg.boids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-5, atol=1e-6)


@requires_tpu
def test_apg_learns_through_pallas_physics():
    """End-to-end capability gate: analytic policy gradients through the
    custom-VJP force kernel must improve cohesion reward on a FIXED eval
    set (fresh training spawns mask the trend otherwise)."""
    import optax

    from nenbody_tpu import SimConfig, VisionConfig
    from nenbody_tpu.rl import apg as apg_lib
    from nenbody_tpu.rl.env import VisionEnv
    from nenbody_tpu.rl.policy import MLPPolicy
    from nenbody_tpu.state import spawn_batch

    env = VisionEnv(
        SimConfig(n=64, controller="gravity", vision=VisionConfig(width=32)),
        max_accel=1.0,
    )
    opt = optax.adam(1e-2)
    ts, apply_fn, _ = apg_lib.init_apg_state(
        env, jax.random.key(0), opt, policy=MLPPolicy(use_bf16=False)
    )
    step = jax.jit(apg_lib.make_apg_step(env, apply_fn, opt, horizon=8, num_envs=32))

    eval_envs = spawn_batch(jax.random.key(999), env.cfg, 64)

    @jax.jit
    def evaluate(params):
        def body(states, _):
            obs = jax.vmap(env.observe)(states)
            action, _ = apply_fn(params, obs)
            states = jax.vmap(env.dynamics)(states, action)
            return states, jnp.mean(jax.vmap(env.reward)(states))

        _, r = jax.lax.scan(body, eval_envs, None, length=16)
        return jnp.mean(r)

    r0 = float(evaluate(ts.params))
    for _ in range(150):
        ts, _ = step(ts)
    r1 = float(evaluate(ts.params))
    assert r1 > r0 + 0.005, f"no learning: {r0:.4f} -> {r1:.4f}"


@requires_tpu
def test_ppo_scale_gate():
    """VERDICT r2 #5: the production-scale PPO datapoint (DESIGN.md §5,
    examples/ppo_scale.py) as a gate instead of prose: 2,048 envs x 64
    agents, difference rewards, 30 iterations must improve the fixed-set
    cohesion eval by the recorded +0.03-class margin AND sustain >=1.5e6
    agent-steps/s through the FULL train step (rollout + GAE + 4x8
    minibatched updates in one jit; recorded 2.01e6)."""
    import time

    import optax

    from nenbody_tpu import SimConfig, VisionConfig
    from nenbody_tpu.rl import ppo as ppo_lib
    from nenbody_tpu.rl.env import VisionEnv
    from nenbody_tpu.rl.policy import MLPPolicy, ValueMLP
    from nenbody_tpu.state import spawn_batch

    envs, agents, width, horizon, iters = 2048, 64, 32, 32, 30
    cfg = SimConfig(
        n=agents, controller="gravity", vision=VisionConfig(width=width)
    )
    env = VisionEnv(cfg, max_accel=1.0, reward_mode="difference")
    eval_env = VisionEnv(cfg, max_accel=1.0, reward_mode="cohesion")
    opt = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(3e-4))
    ts, papply, vapply = ppo_lib.init_ppo_state(
        env, jax.random.key(0), opt,
        policy=MLPPolicy(use_bf16=False), value=ValueMLP(),
    )
    step = jax.jit(ppo_lib.make_ppo_step(
        env, papply, vapply, opt, horizon=horizon, num_envs=envs,
    ))

    eval_envs = spawn_batch(jax.random.key(999), cfg, 256)

    @jax.jit
    def evaluate(params):
        def body(states, _):
            obs = jax.vmap(eval_env.observe)(states)
            action, _ = papply(params.policy, obs)
            states = jax.vmap(eval_env.dynamics)(states, action)
            return states, jnp.mean(jax.vmap(eval_env.reward)(states))

        _, r = jax.lax.scan(body, eval_envs, None, length=horizon)
        return jnp.mean(r)

    r0 = float(evaluate(ts.params))
    ts, m = step(ts)  # compile
    jax.block_until_ready(m)
    t0 = time.time()
    for _ in range(iters - 1):
        ts, m = step(ts)
    jax.block_until_ready(m)
    rate = envs * agents * horizon * (iters - 1) / (time.time() - t0)
    r1 = float(evaluate(ts.params))
    assert r1 > r0 + 0.015, f"PPO scale run flat: {r0:.4f} -> {r1:.4f}"
    assert rate >= 1.5e6, f"PPO train throughput {rate:.3e} < 1.5e6 (was ~2e6)"


@requires_tpu
def test_wireframe_kernel_gate():
    """The exact-sprite Pallas kernel (ops/wireframe.py) must hold the
    BASELINE 1e6 line at the config-2 shape (VERDICT r4 #4: the rasterq
    inverse-depth kernel measured 1.10e6 af/s on v5e — DESIGN 4g; the
    division-route kernel capped at ~6.6e5) AND stay depth-exact against
    the dense wireframe oracle on silicon (this scene measured 0 coverage
    mismatches / 1.7e-5 max depth delta; a near-tie-heavy scene could
    legitimately flip winners within tolerance, see
    tests/test_wireframe_kernel._assert_rows_close)."""
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import wireframe
    from nenbody_tpu.vision import render

    vcfg = VisionConfig(width=64, sprite_mode="wireframe", far=200.0)
    kp, kv = jax.random.split(jax.random.key(3))
    pos = jax.random.uniform(kp, (1024, 2), minval=-40, maxval=40,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (1024, 2), minval=-1, maxval=1,
                             dtype=jnp.float32)

    gs, gd = map(np.asarray, wireframe.render_rows_wireframe_tiled(pos, vel, vcfg))
    ws, wd = map(np.asarray, render.render_rows(pos, vel, vcfg))
    np.testing.assert_array_equal(gd < 1e4, wd < 1e4)
    np.testing.assert_allclose(gd, wd, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(gs, ws, rtol=1e-5, atol=1e-4)

    def body(c):
        p, v = c
        s = wireframe.render_rows_wireframe_tiled(p, v, vcfg)[0]
        return p + 1e-7 * s[:, :2], v

    dt = _scan_time(body, (pos, vel), steps=50, sync=lambda c: c[0][:1])
    rate = 1024 / dt
    assert rate >= 9e5, f"wireframe kernel rate {rate:.3e} < 9e5 (was 1.10e6)"


@requires_tpu
def test_wireframe_batched_gate():
    """VERDICT r3 #8: batched-env EXACT-sprite observations must hold the
    1e6 line (the batched disc path holds 7e6; exact sprites were ~3
    orders under it through the vmapped forced-streaming diff forward).
    Measured on v5e: render_rows_wireframe_batched raster-vmap route
    2.01e6 af/s at B=1024 x n=256 x W=64 AA (r4; 3.67e6 at B=256 x n=64),
    2.68e6 with the rasterq inverse-depth kernel under the vmap (r5,
    DESIGN 4g). Gate ~18% under at the bench shape."""
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import wireframe

    benvs, bn = 1024, 256
    vcfg = VisionConfig(width=64, sprite_mode="wireframe", antialias=True)
    kp, kv = jax.random.split(jax.random.key(7))
    pos = jax.random.uniform(kp, (benvs, bn, 2), minval=-100, maxval=100,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (benvs, bn, 2), minval=-1, maxval=1,
                             dtype=jnp.float32)

    def body(c):
        p, v = c
        s = wireframe.render_rows_wireframe_batched(p, v, vcfg)[0]
        return p + 1e-7 * s[..., :2], v

    dt = _scan_time(body, (pos, vel), steps=5, sync=lambda c: c[0][:1, :1])
    rate = benvs * bn / dt
    assert rate >= 2.2e6, f"batched wireframe rate {rate:.3e} < 2.2e6"


@requires_tpu
def test_config3_fused_step_observe_gate():
    """BASELINE config 3 (BASELINE.md: N=4,096 flocking + neighbor-
    visibility observations, the boids-4096 preset shape at W=256): the
    fused boids-step + disc-render chain must hold its measured order.
    Measured on v5e (r5, bench label config3-boids4096-vision256):
    3.18e5 agent-frames/s with every agent's 256-px eye rendered every
    step — work the reference's own frame loop never attempts at this N
    (it renders eyes for N=100, main.rs:653-654). Floor ~18% under."""
    from nenbody_tpu.config import BoidsConfig, VisionConfig
    from nenbody_tpu.ops import boids as boids_ops
    from nenbody_tpu.ops import raycast

    bcfg = BoidsConfig()
    vcfg = VisionConfig(width=256)
    kp, kv = jax.random.split(jax.random.key(23))
    pos = jax.random.uniform(kp, (4096, 2), minval=-100, maxval=100,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (4096, 2), minval=-1, maxval=1,
                             dtype=jnp.float32)

    def body(c):
        p, v = c
        nv = boids_ops.boids_velocity_tiled(p, v, bcfg)
        pn = p + nv * bcfg.dt
        s = raycast.render_rows_tiled(pn, nv, vcfg)[0]
        return pn + 1e-7 * s[:, :2], nv

    dt = _scan_time(body, (pos, vel), steps=50, sync=lambda c: c[0][:1])
    rate = 4096 / dt
    assert rate >= 2.6e5, f"config-3 rate {rate:.3e} < 2.6e5 (was 3.18e5)"


@requires_tpu
def test_wireframe_batched_diff_gate():
    """VERDICT r4 #1: batched DIFFERENTIABLE exact-sprite vision must be
    usable at training scale. Measured on v5e (r5):
    render_rows_wireframe_batched_diff — batched-router forward +
    winner-index pullback — 2.19e5 af/s fwd+bwd at the bench shape
    B=1024 x n=256 x W=64 AA (the r4 vmap-serialized streaming route
    measured ~1.3e4 at the SINGLE-env shape), then 1.63e6 with the
    one-hot pullback (gathers/scatters -> MXU contractions) and 1.96e6
    with the rasterq track_idx forward (DESIGN 4d/4g). Gate ~18% under;
    the 1e5 ask from VERDICT r4 #1 sits ~20x below measurement."""
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import wireframe

    benvs, bn = 1024, 256
    vcfg = VisionConfig(width=64, sprite_mode="wireframe", antialias=True)
    kp, kv = jax.random.split(jax.random.key(31))
    pos = jax.random.uniform(kp, (benvs, bn, 2), minval=-100, maxval=100,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (benvs, bn, 2), minval=-1, maxval=1,
                             dtype=jnp.float32)

    def body(c):
        p, v = c

        def loss(pq):
            s, d = wireframe.render_rows_wireframe_batched_diff(pq, v, vcfg)
            return jnp.sum(s * s) + 1e-3 * jnp.sum(d)

        g = jax.grad(loss)(p)
        return p + 1e-6 * g, v

    dt = _scan_time(body, (pos, vel), steps=5, sync=lambda c: c[0][:1, :1])
    rate = benvs * bn / dt
    assert rate >= 1.6e6, f"batched wireframe diff {rate:.3e} < 1.6e6"


def _wireframe_ref_rate(aa, texture, steps=400):
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import wireframe
    from nenbody_tpu.vision.render import checker_texture

    vcfg = VisionConfig(width=1024, sprite_mode="wireframe", antialias=aa)
    tex = checker_texture(8, 2) if texture else None
    kp, kv = jax.random.split(jax.random.key(13))
    pos = jax.random.uniform(kp, (100, 2), minval=-100, maxval=100,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (100, 2), minval=-1, maxval=1,
                             dtype=jnp.float32)

    def body(c):
        p, v = c
        s = wireframe.render_rows_wireframe_tiled(p, v, vcfg, texture=tex)[0]
        return p + 1e-7 * s[:, :2], v

    dt = _scan_time(body, (pos, vel), steps=steps, sync=lambda c: c[0][:1], m=8)
    return 100 / dt


@requires_tpu
def test_wireframe_reference_config_gates():
    """VERDICT r2 #1: the FULL reference-parity vision config — the
    1024-px (src/main.rs:694), wireframe-LineStrip-sprite (main.rs:130-139),
    antialiased (main.rs:652), skin-textured (main.rs:322-356) eye at the
    shipping N=100 — through the compacted-candidate kernel.

    Measured on v5e after the r4 prologue rework (DESIGN.md §4f: the
    always-sort compaction prologue carrying only the 6 per-vert projection
    columns, per-edge fields recomputed bit-identically post-sort): plain
    1.451e6, +AA 1.264e6, +AA+texture 1.098e6 agent-frames/s — ALL THREE
    now over the BASELINE 1e6 line with the EXACT sprite at the reference's
    own width, 22-29x the reference's own ~5e4 cap (500 frames/s at N=100,
    main.rs:837-845). Floors sit ~9-14% under measurement; the full-parity
    aatex shape holds AT the 1e6 BASELINE line."""
    plain = _wireframe_ref_rate(aa=False, texture=False)
    assert plain >= 1e6, f"wireframe n100/w1024 rate {plain:.3e} < 1e6"
    assert plain >= 1.25e6, (
        f"regression: wireframe n100/w1024 rate {plain:.3e} < 1.25e6 "
        f"(was ~1.45e6)"
    )
    aa = _wireframe_ref_rate(aa=True, texture=False)
    assert aa >= 1.1e6, f"wireframe+AA n100/w1024 rate {aa:.3e} < 1.1e6 (was ~1.26e6)"
    aatex = _wireframe_ref_rate(aa=True, texture=True)
    assert aatex >= 1e6, (
        f"wireframe+AA+tex n100/w1024 rate {aatex:.3e} < 1e6 (the BASELINE "
        f"line at the FULL reference-parity eye; was ~1.10e6)"
    )
    # the "beats the reference at its own configuration" line: >= 10x its hw
    assert aatex >= 10 * 5e4, f"full-parity rate {aatex:.3e} < 10x reference"


@requires_tpu
def test_wireframe_wide_stress_gate():
    """VERDICT r3 #5: the many-target wide-eye stress shape — N=1,024
    agents x 1,024-px antialiased wireframe eyes (main.rs:653's 2048-entity
    ambition x main.rs:694's eye width) — was the only benched shape with
    no regression protection. Measured on v5e: 4.7e4 full-work (r2) ->
    9.8e4 sorted compaction (r3) -> 1.59e5 r4 verts-only sort prologue ->
    1.88e5 r4 many-target group unroll (COMPACT_GROUP_UNROLL_MANY=6).
    Gate ~15% under."""
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import wireframe

    vcfg = VisionConfig(width=1024, sprite_mode="wireframe", antialias=True)
    kp, kv = jax.random.split(jax.random.key(13))
    pos = jax.random.uniform(kp, (1024, 2), minval=-100, maxval=100,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (1024, 2), minval=-1, maxval=1,
                             dtype=jnp.float32)

    def body(c):
        p, v = c
        s = wireframe.render_rows_wireframe_tiled(p, v, vcfg)[0]
        return p + 1e-7 * s[:, :2], v

    dt = _scan_time(body, (pos, vel), steps=20, sync=lambda c: c[0][:1])
    rate = 1024 / dt
    assert rate >= 1.6e5, f"wide-stress wireframe rate {rate:.3e} < 1.6e5"


@requires_tpu
def test_wireframe_stress_compile_bound():
    """VERDICT r3 #7: the (sorted-compact, AA, wide, many-target) unroll
    ladder compiled for 90 s in r3 — the worst label by 6x, unbounded by
    any gate. The r4 verts-only sort prologue cut its service-cold Mosaic
    compile to ~20 s; every other benched label is <= 15 s. This pins the
    worst-case label's FRESH in-process compile (persistent cache enabled,
    like bench.py — a warm disk cache makes this ~1-2 s; service-cold ~20 s)
    under 45 s so ladder growth can't silently regress. The 30 s/label
    budget itself is asserted on the bench artifact (compile_seconds_max)."""
    import time

    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import wireframe
    from nenbody_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    vcfg = VisionConfig(width=1024, sprite_mode="wireframe", antialias=True)
    kp, kv = jax.random.split(jax.random.key(13))
    pos = jax.random.uniform(kp, (1024, 2), minval=-100, maxval=100,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (1024, 2), minval=-1, maxval=1,
                             dtype=jnp.float32)

    @jax.jit
    def once(p, v):
        return wireframe.render_rows_wireframe_tiled(p, v, vcfg)[0]

    jax.clear_caches()
    t0 = time.perf_counter()
    _ = np.asarray(once(pos, vel)[:1])
    cs = time.perf_counter() - t0
    assert cs <= 45.0, (
        f"stress-shape compile took {cs:.1f}s (> 45s bound; was 90s in r3, "
        f"~20s service-cold after the verts-only sort prologue)"
    )


@requires_tpu
def test_wireframe_diff_gates():
    """VERDICT r2 #6: differentiable exact-sprite perception (forward +
    backward through the wireframe VJP kernels) holds its measured order.

    Measured on v5e: N=1024/W=64 1.14e4 r2 streaming backward -> 1.34e4
    r4 with trusted_depth=True -> 2.21e5 r5 (the WINNER-INDEX backward:
    the forward tracks the winning target index as one more min-reduced
    payload stream and the VJP is O(N*W) elementwise fragment
    re-evaluation) -> 6.12e5 r5 session 2 (rasterq track_idx forward +
    the ONE-HOT pullback: XLA dynamic gather/scatter at ~60-80
    cycles/element replaced by two Precision.HIGHEST einsums, DESIGN 4d).
    N=100/W=1024: 1.23e4 r2 streaming -> 2.17e5 r3 (group-range-culled
    compact bwd) -> 1.06e5 r4 (an UNACKNOWLEDGED regression: the
    always-sort prologue switch made the backward's jax.vjp recompute
    pull cotangents through lax.sort's scatter transpose) -> 2.06e5 r5
    (COMPACT_BWD_SORT_MIN_M keeps the rank edition in the backward
    builds) -> winner route A/B'd 9% faster and made the wide default
    (WF_WINNER_OVER_COMPACT, 2.03e5 same-scene). Floors sit ~18% under
    the BEST measured rate per shape, never a regressed one."""
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import wireframe

    for n, w, steps, floor in ((1024, 64, 20, 5e5), (100, 1024, 20, 1.7e5)):
        vcfg = VisionConfig(width=w, sprite_mode="wireframe", antialias=True,
                            far=200.0)
        kp, kv = jax.random.split(jax.random.key(17))
        pos = jax.random.uniform(kp, (n, 2), minval=-100, maxval=100,
                                 dtype=jnp.float32)
        vel = jax.random.uniform(kv, (n, 2), minval=-1, maxval=1,
                                 dtype=jnp.float32)

        def body(c, vcfg=vcfg, n=n):
            p, v = c

            def loss(pq):
                s, d = wireframe.render_rows_wireframe_diff(pq, v, vcfg)
                return jnp.sum(s * s) + 1e-3 * jnp.sum(d)

            g = jax.grad(loss)(p)
            return p + 1e-6 * g, v

        dt = _scan_time(body, (pos, vel), steps=steps, sync=lambda c: c[0][:1])
        rate = n / dt
        assert rate >= floor, (
            f"wireframe diff rate {rate:.3e} < {floor:.0e} at N={n}/W={w}"
        )


@requires_tpu
def test_rdma_ring_compiles_on_hardware():
    """The Pallas-RDMA ring prototype (parallel/rdma.py) lowers through
    Mosaic and matches the dense oracle on silicon (D=1 degenerate ring;
    multi-chip execution needs pod hardware)."""
    from nenbody_tpu.config import SimConfig
    from nenbody_tpu.parallel import rdma
    from nenbody_tpu.parallel.mesh import make_mesh
    from nenbody_tpu.physics import dense

    cfg = SimConfig(n=2048, controller="gravity")
    kp, kv = jax.random.split(jax.random.key(0))
    pos = jax.random.uniform(kp, (2048, 2), minval=-100.0, maxval=100.0)
    got = np.asarray(rdma.rdma_ring_gravity_forces(pos, cfg, mesh=make_mesh()))
    want = np.asarray(dense.gravity_forces(pos, cfg.gravity))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)

    # r3's boids + vision hop variants lower through Mosaic too
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.vision import render

    vel = jax.random.uniform(kv, (2048, 2), minval=-1.0, maxval=1.0)
    bgot = np.asarray(
        rdma.rdma_ring_boids_velocity(pos, vel, SimConfig(n=2048), mesh=make_mesh())
    )
    bwant = np.asarray(dense.boids_accels(pos, vel, SimConfig(n=2048).boids))
    np.testing.assert_allclose(bgot, bwant, rtol=3e-5, atol=1e-5)

    vcfg = VisionConfig(width=64)
    vgot_s, vgot_d = map(
        np.asarray,
        rdma.rdma_ring_render_rows(pos[:512], vel[:512], vcfg, mesh=make_mesh()),
    )
    vwant_s, vwant_d = map(
        np.asarray, render.render_rows(pos[:512], vel[:512], vcfg)
    )
    np.testing.assert_allclose(vgot_d, vwant_d, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(vgot_s, vwant_s, rtol=1e-5, atol=1e-4)


@requires_tpu
def test_wireframe_trusted_depth_canary():
    """The diff path's backward skips its pass-1 depth recompute by trusting
    the streaming forward's saved depth (ops/wireframe._wf_bwd_kernel
    trusted_depth). That identity crosses TWO Mosaic lowerings (forward
    kernel vs vjp-traced backward): a contraction/reassociation divergence
    would silently drop winner cotangents. Canary: trusted and untrusted
    gradients must match BIT-exactly on hardware. _rrwd_bwd ships
    trusted_depth=False until this has passed on silicon; once it holds,
    flip it True (and back to False on any future Mosaic break)."""
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import wireframe
    from nenbody_tpu.vision import camera

    for w, n in ((64, 256), (1024, 100)):
        cfg = VisionConfig(width=w, sprite_mode="wireframe", antialias=True,
                           far=200.0)
        kp, kv, ku, kd = jax.random.split(jax.random.key(23), 4)
        pos = jax.random.uniform(kp, (n, 2), minval=-100, maxval=100,
                                 dtype=jnp.float32)
        vel = jax.random.uniform(kv, (n, 2), minval=-1, maxval=1,
                                 dtype=jnp.float32)
        us = jax.random.normal(ku, (n, w), jnp.float32)
        ud = 0.01 * jax.random.normal(kd, (n, w), jnp.float32)
        dirs = camera.unit_heading(vel)
        shade, depth = wireframe.render_rows_wireframe_tiled(
            pos, vel, cfg, force_streaming=True
        )
        gt = wireframe.render_rows_wireframe_vjp_cross(
            pos, dirs, depth, us, ud, cfg, trusted_depth=True
        )
        gu = wireframe.render_rows_wireframe_vjp_cross(
            pos, dirs, depth, us, ud, cfg, trusted_depth=False
        )
        for a, b, name in zip(gt, gu, ("eye", "dirs", "tgt", "hdg")):
            a, b = np.asarray(a), np.asarray(b)
            assert np.abs(b).max() > 0, f"{name} grads all zero at w={w}"
            np.testing.assert_array_equal(
                a, b, err_msg=f"trusted!=untrusted {name} w={w}"
            )


@requires_tpu
def test_wireframe_compact_diff_silicon_parity():
    """The compact backward's winner matching crosses two Mosaic lowerings
    (the forward compact kernel's best_q vs the backward's
    _compact_group_eval recompute) plus the 1/x depth round trip absorbed
    by the 1e-5 gate — all validated in interpret mode, but reassociation
    on real silicon could shift near-tie pixels. Pin gradient parity vs
    the dense autodiff oracle at the reference diff shape, the same
    tolerances as the CPU pins (tests/test_wireframe_vjp.py)."""
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import wireframe
    from nenbody_tpu.vision import render

    cfg = VisionConfig(width=1024, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    n = 100
    assert wireframe._compact_route_ok(cfg, n)
    kp, kv, ku, kd = jax.random.split(jax.random.key(29), 4)
    pos = jax.random.uniform(kp, (n, 2), minval=-100, maxval=100,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, (n, 2), minval=-1, maxval=1,
                             dtype=jnp.float32)
    cu = jax.random.normal(ku, (n, cfg.width), jnp.float32)
    cd = 0.01 * jax.random.normal(kd, (n, cfg.width), jnp.float32)

    def loss_k(p, v):
        sh, dep = wireframe.render_rows_wireframe_diff(p, v, cfg)
        return jnp.sum(sh * cu) + jnp.sum(dep * cd)

    def loss_d(p, v):
        sh, dep = render.render_rows(p, v, cfg)
        return jnp.sum(sh * cu) + jnp.sum(dep * cd)

    gk = jax.grad(loss_k, argnums=(0, 1))(pos, vel)
    gd = jax.grad(loss_d, argnums=(0, 1))(pos, vel)
    for a, b, name in zip(gk, gd, ("pos", "vel")):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a).max() > 0, f"{name} grads all zero"
        # clutter at N=100 random spawns can put a handful of
        # coverage-boundary pixels on different sprites across the two fp
        # routes; require near-total agreement, never systematic drift
        close = np.isclose(a, b, rtol=2e-4, atol=2e-4)
        assert close.mean() >= 0.995, (
            f"{name}: {(~close).mean():.3%} gradient entries mismatched"
        )


@requires_tpu
@pytest.mark.xfail(
    strict=False,
    reason="r4 measured: the compact route flips near-tie winners vs dense "
    "autodiff at cluttered scenes — 4.1% of vel grad entries off on v5e AND "
    "4.7% on CPU interpret (route-inherent, not a lowering bug). Paired "
    "with a perf negative (+16%, not the modeled 10x: W=64 is one pixel "
    "block, group-range culling never engages), COMPACT_DIFF_NARROW stays "
    "False. This test remains the flag-flip criterion: it must PASS before "
    "any future default flip.",
)
def test_wireframe_compact_diff_narrow_silicon_parity():
    """COMPACT_DIFF_NARROW on real silicon: the narrow-row diff route runs
    the compact kernels with sub-128-lane pixel blocks (W=64 pads to 128
    lanes) — a Mosaic lowering class interpret mode cannot vouch for. Same
    gradient pin as the wide silicon test, at the RL observation shape
    class. Run BEFORE flipping the flag's default."""
    from nenbody_tpu.config import VisionConfig
    from nenbody_tpu.ops import wireframe
    from nenbody_tpu.vision import render

    cfg = VisionConfig(width=64, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    n = 256
    saved = wireframe.COMPACT_DIFF_NARROW
    try:
        wireframe.COMPACT_DIFF_NARROW = True
        jax.clear_caches()  # trace-time global, not a jit key
        assert wireframe._compact_diff_route_ok(cfg, n)
        kp, kv, ku, kd = jax.random.split(jax.random.key(31), 4)
        pos = jax.random.uniform(kp, (n, 2), minval=-100, maxval=100,
                                 dtype=jnp.float32)
        vel = jax.random.uniform(kv, (n, 2), minval=-1, maxval=1,
                                 dtype=jnp.float32)
        cu = jax.random.normal(ku, (n, cfg.width), jnp.float32)
        cd = 0.01 * jax.random.normal(kd, (n, cfg.width), jnp.float32)

        def loss_k(p, v):
            sh, dep = wireframe.render_rows_wireframe_diff(p, v, cfg)
            return jnp.sum(sh * cu) + jnp.sum(dep * cd)

        def loss_d(p, v):
            sh, dep = render.render_rows(p, v, cfg)
            return jnp.sum(sh * cu) + jnp.sum(dep * cd)

        gk = jax.grad(loss_k, argnums=(0, 1))(pos, vel)
        gd = jax.grad(loss_d, argnums=(0, 1))(pos, vel)
        for a, b, name in zip(gk, gd, ("pos", "vel")):
            a, b = np.asarray(a), np.asarray(b)
            assert np.abs(a).max() > 0, f"{name} grads all zero"
            close = np.isclose(a, b, rtol=2e-4, atol=2e-4)
            assert close.mean() >= 0.99, (
                f"{name}: {(~close).mean():.3%} gradient entries mismatched"
            )
    finally:
        wireframe.COMPACT_DIFF_NARROW = saved
        jax.clear_caches()
