"""Pallas wireframe kernel (ops/wireframe.py) vs the dense wireframe oracle.

The dense path (vision.render, sprite_mode='wireframe') is pinned to the
reference sprite by tests/test_wireframe.py; these tests pin the Pallas
kernel to the dense path at fp32 tolerances across both kernel variants
(precompute raster + streaming), albedo, cross-block targets, and the Scene
dispatch surface.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu.config import SimConfig, VisionConfig
from nenbody_tpu.ops import wireframe
from nenbody_tpu.vision import render


def _spawnish(key, n, spread=40.0):
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (n, 2), minval=-spread, maxval=spread)
    vel = jax.random.uniform(kv, (n, 2), minval=-1.0, maxval=1.0)
    return pos, vel


def _assert_rows_close(got, want, atol=2e-4, flip_frac=0.0):
    """flip_frac > 0 allows that fraction of BOUNDARY flips — the
    inverse-depth routes (rasterq/compact) derive hit intervals on a
    different division route than the dense oracle, so a pixel grazing an
    edge endpoint can flip hit<->miss within ~1 ulp of interval math (the
    documented COMPACT_INTERVAL_HIT boundary class). Flipped pixels must
    still be visually background-grade: their shade on the hit side may
    differ, but every NON-flipped pixel holds the strict tolerance."""
    gs, gd = map(np.asarray, got)
    ws, wd = map(np.asarray, want)
    # depth can sit at `far` on one side and a real hit on the other only if
    # coverage flipped — require exact agreement on what was hit
    ghit = np.isfinite(gd) & (gd < 1e4)
    whit = np.isfinite(wd) & (wd < 1e4)
    if flip_frac == 0.0:
        np.testing.assert_array_equal(ghit, whit)
        np.testing.assert_allclose(gd, wd, rtol=1e-5, atol=atol)
        np.testing.assert_allclose(gs, ws, rtol=1e-5, atol=atol)
        return
    flips = ghit != whit
    flips |= np.abs(gd - wd) > (atol + 1e-5 * np.abs(wd))
    flips |= np.abs(gs - ws) > (atol + 1e-5 * np.abs(ws))
    assert flips.mean() <= flip_frac, (
        f"{flips.mean():.2e} near-tie flips > allowance {flip_frac:.0e}"
    )


@pytest.mark.parametrize(
    # 137: odd non-multiple-of-128 target count exercises raster-path target
    # padding (shrunk from 257 — same route and single j-tile either way per
    # fit_tile, at half the interpret cost)
    "n,width", [(32, 64), (100, 128), (137, 64), (64, 256)]
)
def test_kernel_matches_dense(n, width):
    cfg = VisionConfig(width=width, sprite_mode="wireframe", far=200.0)
    pos, vel = _spawnish(jax.random.key(n * width), n)
    want = render.render_rows(pos, vel, cfg)
    got = wireframe.render_rows_wireframe_tiled(pos, vel, cfg)
    _assert_rows_close(got, want)


def test_streaming_kernel_matches_dense(monkeypatch):
    # force the streaming variant by disabling the precompute gate
    monkeypatch.setattr(wireframe, "_PRECOMPUTE_MAX_ELEMS", 0)
    cfg = VisionConfig(width=64, sprite_mode="wireframe", far=200.0)
    pos, vel = _spawnish(jax.random.key(7), 150)
    want = render.render_rows(pos, vel, cfg)
    got = wireframe.render_rows_wireframe_tiled(pos, vel, cfg)
    _assert_rows_close(got, want)


@pytest.mark.parametrize("streaming", [False, True])
def test_albedo_matches_dense(monkeypatch, streaming):
    if streaming:
        monkeypatch.setattr(wireframe, "_PRECOMPUTE_MAX_ELEMS", 0)
    cfg = VisionConfig(width=64, sprite_mode="wireframe", far=200.0)
    pos, vel = _spawnish(jax.random.key(3), 80)
    albedo = jax.random.uniform(jax.random.key(9), (80,), minval=0.3, maxval=1.0)
    want = render.render_rows(pos, vel, cfg, albedo=albedo)
    got = wireframe.render_rows_wireframe_tiled(pos, vel, cfg, albedo=albedo)
    _assert_rows_close(got, want)


@pytest.mark.parametrize("streaming", [False, True])
def test_cross_block_targets_merge(monkeypatch, streaming):
    """Partial renders against disjoint target blocks depth-merge into the
    full render — the multi-chip vision-ring contract, wireframe edition."""
    if streaming:
        monkeypatch.setattr(wireframe, "_PRECOMPUTE_MAX_ELEMS", 0)
    cfg = VisionConfig(width=64, sprite_mode="wireframe", far=200.0)
    pos, vel = _spawnish(jax.random.key(11), 96)
    full = wireframe.render_rows_wireframe_tiled(pos, vel, cfg)
    a = wireframe.render_rows_wireframe_tiled(
        pos, vel, cfg, targets=pos[:48], target_vel=vel[:48]
    )
    b = wireframe.render_rows_wireframe_tiled(
        pos, vel, cfg, targets=pos[48:], target_vel=vel[48:]
    )
    merged = render.merge_rows(a, b)
    _assert_rows_close(merged, full)


def test_targets_require_target_vel():
    cfg = VisionConfig(width=64, sprite_mode="wireframe")
    pos, vel = _spawnish(jax.random.key(0), 16)
    with pytest.raises(ValueError, match="target_vel"):
        wireframe.render_rows_wireframe_tiled(pos, vel, cfg, targets=pos[:8])


def test_disc_config_rejected():
    cfg = VisionConfig(width=64)
    pos, vel = _spawnish(jax.random.key(0), 16)
    with pytest.raises(ValueError, match="wireframe"):
        wireframe.render_rows_wireframe_tiled(pos, vel, cfg)


def test_scene_dispatch_pallas_wireframe():
    """Scene(backend='pallas') with wireframe sprites routes observe/
    observe_with_depth through the kernel and agrees with the dense scene."""
    from nenbody_tpu.scene import Scene

    vcfg = VisionConfig(width=64, sprite_mode="wireframe", far=200.0)
    mk = lambda be: Scene(
        SimConfig(n=48, controller="boids", backend=be, vision=vcfg)
    )
    sp, sd = mk("pallas"), mk("dense")
    state = sp.spawn(seed=5)
    np.testing.assert_allclose(
        np.asarray(sp.observe(state)),
        np.asarray(sd.observe(state)),
        rtol=1e-5,
        atol=2e-4,
    )
    gs, gd = sp.observe_with_depth(state)
    ws, wd = sd.observe_with_depth(state)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), rtol=1e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(ws), rtol=1e-5, atol=2e-4)


def test_observe_rgb_pallas_wireframe():
    from nenbody_tpu.scene import Scene

    vcfg = VisionConfig(width=64, sprite_mode="wireframe", far=200.0)
    mk = lambda be: Scene(
        SimConfig(n=32, controller="boids", backend=be, vision=vcfg)
    )
    sp, sd = mk("pallas"), mk("dense")
    state = sp.spawn(seed=2)
    colors = render.default_agent_colors(32)
    np.testing.assert_allclose(
        np.asarray(sp.observe_rgb(state, colors)),
        np.asarray(sd.observe_rgb(state, colors)),
        rtol=1e-5,
        atol=2e-4,
    )


@pytest.mark.parametrize("streaming", [False, True])
def test_self_sprite_culled_when_radius_exceeds_near(monkeypatch, streaming):
    """The eye's own sprite never occludes the scene, even when
    sprite_radius > near would put its nose vertex in front of the near
    plane (the explicit coincident-target cull; at the reference's
    radius == near == 1 the nose sits exactly ON the near plane,
    src/main.rs:131-135 + gfx.rs:365). Dense oracle and both kernel
    variants agree."""
    if streaming:
        monkeypatch.setattr(wireframe, "_PRECOMPUTE_MAX_ELEMS", 0)
    cfg = VisionConfig(
        width=64, sprite_mode="wireframe", far=200.0, sprite_radius=2.5
    )
    # one distant target dead ahead: if the self sprite survived it would
    # win the depth test at depth ~< 2.5 across the center pixels
    pos = jnp.asarray([[0.0, 0.0], [30.0, 0.0]], jnp.float32)
    vel = jnp.asarray([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
    ws, wd = map(np.asarray, render.render_rows(pos, vel, cfg))
    gs, gd = map(
        np.asarray, wireframe.render_rows_wireframe_tiled(pos, vel, cfg)
    )
    # no fragment closer than the real target anywhere on eye 0's line
    assert wd[0][wd[0] < cfg.far].min() > 25.0
    assert gd[0][gd[0] < cfg.far].min() > 25.0
    np.testing.assert_allclose(gd, wd, rtol=1e-5, atol=2e-4)
    np.testing.assert_allclose(gs, ws, rtol=1e-5, atol=2e-4)


@pytest.mark.parametrize("streaming", [False, True])
@pytest.mark.parametrize("texture", [False, True])
def test_antialias_matches_dense(monkeypatch, streaming, texture):
    """AA'd wireframe through both kernel variants (and the raw/texture
    winner mode with its coverage stream) pins to the dense AA oracle."""
    if streaming:
        monkeypatch.setattr(wireframe, "_PRECOMPUTE_MAX_ELEMS", 0)
    cfg = VisionConfig(width=64, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _spawnish(jax.random.key(21), 90)
    tex = render.checker_texture(8, 2) if texture else None
    want = render.render_rows(pos, vel, cfg, texture=tex)
    got = wireframe.render_rows_wireframe_tiled(pos, vel, cfg, texture=tex)
    _assert_rows_close(got, want)


def test_antialias_albedo_matches_dense():
    cfg = VisionConfig(width=64, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _spawnish(jax.random.key(23), 70)
    albedo = jax.random.uniform(jax.random.key(2), (70,), minval=0.3, maxval=1.0)
    want = render.render_rows(pos, vel, cfg, albedo=albedo)
    got = wireframe.render_rows_wireframe_tiled(pos, vel, cfg, albedo=albedo)
    _assert_rows_close(got, want)


@pytest.mark.parametrize("aa", [False, True])
@pytest.mark.parametrize("texture", [False, True])
def test_compact_wide_row_matches_dense(aa, texture):
    """W >= 512 few-target shapes route to the compacted-candidate kernel
    (ops/wireframe._render_compact — the reference's own N=100 x W=1024
    eye shape class, src/main.rs:654+694); pin every payload mode to the
    dense oracle."""
    cfg = VisionConfig(width=512, sprite_mode="wireframe", antialias=aa,
                       far=200.0)
    pos, vel = _spawnish(jax.random.key(31), 40)
    tex = render.checker_texture(8, 2) if texture else None
    albedo = jax.random.uniform(jax.random.key(5), (40,), minval=0.3,
                                maxval=1.0)
    want = render.render_rows(pos, vel, cfg, albedo=albedo, texture=tex)
    got = wireframe.render_rows_wireframe_tiled(pos, vel, cfg, albedo=albedo,
                                                texture=tex)
    # the compact kernel's inverse-depth route (depth = 1/q) loses ~2e-5
    # RELATIVE precision at clamped AA interval endpoints; at depth ~25
    # that exceeds the 2e-4 absolute gate the direct-depth kernels meet
    _assert_rows_close(got, want, atol=1e-3)


@pytest.mark.slow
def test_compact_operand_layout_variants_bit_identical():
    """The compact kernel's operand-layout A/B flags (COMPACT_PACKED_FIELDS:
    one [TE*K, F] candidate-major operand vs F per-field columns;
    COMPACT_WHOLE_BLOCK: one (sub, F) block load + static lane slices vs
    per-field dynamic loads) are pure data-movement alternatives — all three
    variants must produce BIT-identical rows (same fp ops in the same
    order), so the hardware sweep can flip them freely."""
    cfg = VisionConfig(width=512, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _spawnish(jax.random.key(51), 16)
    kt, kv = jax.random.split(jax.random.key(52))
    tgt = jax.random.uniform(kt, (60, 2), minval=-80, maxval=80,
                             dtype=jnp.float32)
    tvel = jax.random.uniform(kv, (60, 2), minval=-1, maxval=1,
                              dtype=jnp.float32)
    albedo = jax.random.uniform(jax.random.key(53), (60,), minval=0.3,
                                maxval=1.0)
    saved = (wireframe.COMPACT_PACKED_FIELDS, wireframe.COMPACT_WHOLE_BLOCK)
    outs = {}
    try:
        for packed, whole in ((True, True), (True, False), (False, False)):
            wireframe.COMPACT_PACKED_FIELDS = packed
            wireframe.COMPACT_WHOLE_BLOCK = whole
            jax.clear_caches()  # trace-time globals, not jit keys
            s, d = wireframe.render_rows_wireframe_tiled(
                pos, vel, cfg, targets=tgt, target_vel=tvel, albedo=albedo)
            outs[(packed, whole)] = (np.asarray(s), np.asarray(d))
    finally:
        wireframe.COMPACT_PACKED_FIELDS = saved[0]
        wireframe.COMPACT_WHOLE_BLOCK = saved[1]
        jax.clear_caches()
    base = outs[(False, False)]
    for k, v in outs.items():
        np.testing.assert_array_equal(v[0], base[0], err_msg=str(k))
        np.testing.assert_array_equal(v[1], base[1], err_msg=str(k))


def test_compact_non_512_width_matches_dense():
    """W=768 exercises the compact launcher's pixel-block fallback (wb=256:
    the preferred 512 does not divide the width)."""
    cfg = VisionConfig(width=768, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _spawnish(jax.random.key(37), 16)
    want = render.render_rows(pos, vel, cfg)
    got = wireframe.render_rows_wireframe_tiled(pos, vel, cfg)
    _assert_rows_close(got, want, atol=1e-3)


@pytest.mark.slow
def test_compact_reference_shape_matches_dense():
    """The full reference-parity vision shape (N=100, W=1024, AA) through
    the compacted-candidate kernel."""
    cfg = VisionConfig(width=1024, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _spawnish(jax.random.key(33), 100, spread=100.0)
    want = render.render_rows(pos, vel, cfg)
    got = wireframe.render_rows_wireframe_tiled(pos, vel, cfg)
    _assert_rows_close(got, want, atol=1e-3)


@pytest.mark.slow
def test_antialias_far_plane_straddle_parity():
    """A sprite straddling the far plane: the AA slab clip can land a
    fragment at EXACTLY far in fp32; it must be a miss on every path
    (dense counted it as a hit with shade != background while the kernels'
    d < far reduce did not — found by review, pinned here)."""
    cfg = VisionConfig(width=64, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    for x in np.arange(199.5, 200.8, 0.05):
        pos = jnp.array([[0.0, 0.0], [float(x), 0.0]], jnp.float32)
        vel = jnp.array([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
        ws, wd = map(np.asarray, render.render_rows(pos, vel, cfg))
        gs, gd = map(np.asarray,
                     wireframe.render_rows_wireframe_tiled(pos, vel, cfg))
        np.testing.assert_array_equal(wd, gd)
        np.testing.assert_allclose(ws, gs, atol=2e-4)
        assert not ((wd == 200.0) & (np.abs(ws - cfg.background) > 1e-6)).any()


def test_compact_sorted_prologue_bit_identical():
    """The sorted-compaction edition (stable co-sort) must produce the SAME
    slots, sentinels, and group ranges as the rank + one-hot edition — the
    stable sort on the member-keyed column reproduces (key, index) order
    and both move exact field values."""
    from nenbody_tpu.vision import camera

    cfg = VisionConfig(width=512, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _spawnish(jax.random.key(41), 24)
    kt, kv = jax.random.split(jax.random.key(43))
    tgt = jax.random.uniform(kt, (120, 2), minval=-80, maxval=80,
                             dtype=jnp.float32)
    tvel = jax.random.uniform(kv, (120, 2), minval=-1, maxval=1,
                              dtype=jnp.float32)
    dirs = camera.unit_heading(vel)
    hdg = camera.unit_heading(tvel)
    albedo = jax.random.uniform(jax.random.key(44), (120,), minval=0.3,
                                maxval=1.0)
    args = (pos, dirs, tgt, hdg, cfg, albedo, 24, 120, 24, 128, 1, 512)
    fe, kse, kee = wireframe._compact_candidates(*args, use_sort=False)
    fs, kss, kes = wireframe._compact_candidates(*args, use_sort=True)
    np.testing.assert_array_equal(np.asarray(fe), np.asarray(fs))
    np.testing.assert_array_equal(np.asarray(kse), np.asarray(kss))
    np.testing.assert_array_equal(np.asarray(kee), np.asarray(kes))


def test_compact_sorted_many_targets_matches_dense():
    """m > COMPACT_SORT_MIN_M wide rows route to the compact kernel through
    the sorted prologue (they previously ran the full-work raster/streaming
    paths — the N=1024 x W=1024 stress shape's class); pin to the dense
    oracle with AA + per-target albedo."""
    cfg = VisionConfig(width=512, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _spawnish(jax.random.key(47), 16)
    kt, kv = jax.random.split(jax.random.key(48))
    m = 300  # > COMPACT_SORT_MIN_M, not a multiple of 8 (slot padding)
    tgt = jax.random.uniform(kt, (m, 2), minval=-100, maxval=100,
                             dtype=jnp.float32)
    tvel = jax.random.uniform(kv, (m, 2), minval=-1, maxval=1,
                              dtype=jnp.float32)
    albedo = jax.random.uniform(jax.random.key(49), (m,), minval=0.3,
                                maxval=1.0)
    want = render.render_rows(pos, vel, cfg, targets=tgt, target_vel=tvel,
                              albedo=albedo)
    got = wireframe.render_rows_wireframe_tiled(
        pos, vel, cfg, targets=tgt, target_vel=tvel, albedo=albedo
    )
    _assert_rows_close(got, want, atol=1e-3)


@pytest.mark.slow
def test_compact_group_unroll_bit_identical():
    """COMPACT_GROUP_UNROLL is a pure loop transformation: duplicate tail
    groups merge as no-ops (max / strict-greater), out-of-range groups fail
    every per-pixel test, so any unroll factor is BIT-identical to 1."""
    cfg = VisionConfig(width=512, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _spawnish(jax.random.key(71), 40)
    tex = render.checker_texture(8, 2)
    saved = wireframe.COMPACT_GROUP_UNROLL
    outs = {}
    try:
        for ur in (1, 2, 4):
            wireframe.COMPACT_GROUP_UNROLL = ur
            jax.clear_caches()  # trace-time global, not a jit key
            s, d = wireframe.render_rows_wireframe_tiled(pos, vel, cfg,
                                                         texture=tex)
            outs[ur] = (np.asarray(s), np.asarray(d))
    finally:
        wireframe.COMPACT_GROUP_UNROLL = saved
        jax.clear_caches()
    for ur in (2, 4):
        np.testing.assert_array_equal(outs[ur][0], outs[1][0])
        np.testing.assert_array_equal(outs[ur][1], outs[1][1])


@pytest.mark.slow
def test_compact_interval_hit_matches_dense():
    """COMPACT_INTERVAL_HIT op-diet (the slab-clipped screen intervals ARE
    the hit region — see the flag's comment): same oracle parity as the
    default route in both sprite-payload modes. Not bit-identical to
    ih=False (interval endpoints ride a division fp route), so this pins
    against the DENSE oracle at the compact route's usual tolerance.

    Slow tier (r5 re-tier): the test's unique coverage is the NON-default
    plain-mode ih=True flag state (ih resolves to aa by default, so every
    default-tier AA compact test already runs the interval-hit core, and
    every compact test runs the R=2 group unroll this test used to carry);
    31 s of forced-flag compiles moved out of the default tier."""
    pos, vel = _spawnish(jax.random.key(31), 40)
    tex = render.checker_texture(8, 2)
    configs = [
        (VisionConfig(width=512, sprite_mode="wireframe", antialias=aa,
                      far=200.0), t)
        for aa, t in ((False, None), (True, tex))
    ]
    # oracle rows BEFORE the flag flip: the dense render is flag-independent
    # and these exact (cfg, shape) graphs are already compiled by
    # test_compact_wide_row_matches_dense — computing them after
    # clear_caches() would recompile both for nothing
    wants = [render.render_rows(pos, vel, cfg, texture=t)
             for cfg, t in configs]
    saved = (wireframe.COMPACT_INTERVAL_HIT, wireframe.COMPACT_GROUP_UNROLL)
    try:
        wireframe.COMPACT_INTERVAL_HIT = True
        wireframe.COMPACT_GROUP_UNROLL = 2
        jax.clear_caches()  # trace-time globals, not jit keys
        for (cfg, t), want in zip(configs, wants):
            got = wireframe.render_rows_wireframe_tiled(pos, vel, cfg,
                                                        texture=t)
            _assert_rows_close(got, want, atol=1e-3)
    finally:
        wireframe.COMPACT_INTERVAL_HIT, wireframe.COMPACT_GROUP_UNROLL = saved
        jax.clear_caches()


@pytest.mark.slow
def test_compact_interval_hit_diff_matches_default_grads():
    """The diff route under COMPACT_INTERVAL_HIT: the backward kernel pulls
    back through the same _compact_group_eval, so winner matching stays
    internally consistent and (pos, vel) grads agree with the default
    flag's grads at fp tolerance."""
    cfg = VisionConfig(width=512, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _spawnish(jax.random.key(61), 48, spread=60.0)
    assert wireframe._compact_route_ok(cfg, 48)

    def loss(p, v):
        s, d = wireframe.render_rows_wireframe_diff(p, v, cfg)
        return jnp.sum(s * jnp.cos(0.1 * d))

    saved = wireframe.COMPACT_INTERVAL_HIT
    grads = {}
    try:
        for ih in (False, True):
            wireframe.COMPACT_INTERVAL_HIT = ih
            jax.clear_caches()
            grads[ih] = jax.grad(loss, argnums=(0, 1))(pos, vel)
    finally:
        wireframe.COMPACT_INTERVAL_HIT = saved
        jax.clear_caches()
    for a, b in zip(grads[True], grads[False]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(b).max() > 0
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("aa,texture,albedo,streaming", [
    (False, False, False, False),   # raster-vmap route
    (True, True, True, False),
    (False, False, False, True),    # env-in-the-grid streaming route
    (True, True, True, True),
])
def test_batched_matches_dense(aa, texture, albedo, streaming):
    """render_rows_wireframe_batched vs the dense oracle per env, on BOTH
    batched routes (raster-vmap and the env-indexed streaming grid) —
    incl. a non-te-divisible agent count so per-env eye padding and the
    env-indexed target BlockSpec both bite."""
    b, n, w = 3, 42, 64
    cfg = VisionConfig(width=w, sprite_mode="wireframe", far=200.0,
                       antialias=aa)
    kp, kv = jax.random.split(jax.random.key(5))
    pos = jax.random.uniform(kp, (b, n, 2), minval=-40.0, maxval=40.0)
    vel = jax.random.uniform(kv, (b, n, 2), minval=-1.0, maxval=1.0)
    tex = render.checker_texture(8, 2) if texture else None
    alb = (jax.random.uniform(jax.random.key(11), (b, n), minval=0.3,
                              maxval=1.0) if albedo else None)
    got = wireframe.render_rows_wireframe_batched(
        pos, vel, cfg, albedo=alb, texture=tex, force_streaming=streaming)
    for e in range(b):
        want = render.render_rows(
            pos[e], vel[e], cfg,
            albedo=None if alb is None else alb[e], texture=tex)
        _assert_rows_close((got[0][e], got[1][e]), want, flip_frac=1e-3)


def test_batched_rejects_bad_rank_and_mode():
    cfg = VisionConfig(width=64, sprite_mode="wireframe")
    pos, vel = _spawnish(jax.random.key(2), 16)
    with pytest.raises(ValueError, match=r"\[B, N, 2\]"):
        wireframe.render_rows_wireframe_batched(pos, vel, cfg)
    with pytest.raises(ValueError, match="wireframe"):
        wireframe.render_rows_wireframe_batched(
            pos[None], vel[None], VisionConfig(width=64))
