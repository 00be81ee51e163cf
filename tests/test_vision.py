"""Vision renderer vs a brute-force Python oracle + geometric properties
(SURVEY.md §4.2: raycast kernel vs brute-force visibility oracle)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu import Scene, SimConfig, VisionConfig, spawn
from nenbody_tpu.vision import camera, render


def brute_force_row(p_i, d_i, pos, cfg):
    """Per-pixel loop oracle: nearest covering sprite wins; vignette shade."""
    t = math.tan(math.radians(cfg.hfov_deg) / 2)
    right = np.array([d_i[1], -d_i[0]])
    shade = np.full(cfg.width, cfg.background, dtype=np.float32)
    depth = np.full(cfg.width, cfg.far, dtype=np.float32)
    for px in range(cfg.width):
        u_p = 2 * (px + 0.5) / cfg.width - 1
        best_f, best_o = np.inf, 0.0
        for j in range(pos.shape[0]):
            rel = pos[j] - p_i
            f = float(rel @ d_i)
            if not (cfg.near < f < cfg.far):
                continue
            u_c = (rel @ right) / (f * t)
            du = cfg.sprite_radius / (f * t)
            if abs(u_c) > 1 + du:
                continue
            o = (u_p - u_c) / du
            if abs(o) < 1 and f < best_f:
                best_f, best_o = f, o
        if np.isfinite(best_f):
            depth[px] = best_f
            shade[px] = cfg.sprite_albedo * (1 - 0.25 * best_o * best_o)
    return shade, depth


@pytest.mark.parametrize("seed", [0, 1])
def test_render_matches_brute_force(seed):
    cfg = VisionConfig(width=64)
    rng = np.random.RandomState(seed)
    n = 24
    pos = rng.uniform(-50, 50, (n, 2)).astype(np.float32)
    vel = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    dirs = np.asarray(camera.unit_heading(jnp.asarray(vel)))

    shade, depth = render.render_rows(jnp.asarray(pos), jnp.asarray(vel), cfg)
    shade, depth = np.asarray(shade), np.asarray(depth)
    assert shade.shape == (n, 64)

    for i in range(n):
        ref_shade, ref_depth = brute_force_row(pos[i], dirs[i], pos, cfg)
        np.testing.assert_allclose(shade[i], ref_shade, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(depth[i], ref_depth, rtol=1e-4, atol=1e-4)


def _two_agent_state(cfg, eye_pos, eye_vel, others):
    n = 1 + len(others)
    sim = SimConfig(n=n, controller="gravity", vision=cfg)
    st = spawn(jax.random.key(0), sim)
    pos = jnp.asarray([eye_pos] + others, dtype=jnp.float32)
    vel = jnp.zeros((n, 2), dtype=jnp.float32).at[0].set(jnp.asarray(eye_vel))
    return st.replace(pos=pos, vel=vel), sim


def test_target_dead_ahead_hits_center_pixels():
    cfg = VisionConfig(width=64)
    st, _ = _two_agent_state(cfg, [0, 0], [1, 0], [[10.0, 0.0]])
    shade, depth = render.render_rows(st.pos, st.vel, cfg)
    row, drow = np.asarray(shade[0]), np.asarray(depth[0])
    hits = np.where(drow < cfg.far)[0]
    assert hits.size > 0
    mid = (hits.min() + hits.max()) / 2
    assert abs(mid - (cfg.width - 1) / 2) <= 1.0
    # vignette: brightest at splat center, darker at edges
    assert row[hits].max() == pytest.approx(row[int(round(mid))], abs=1e-3)
    assert row[hits].min() < row[hits].max()


def test_nearer_occluder_wins_depth_test():
    cfg = VisionConfig(width=64)
    st, _ = _two_agent_state(cfg, [0, 0], [1, 0], [[10.0, 0.0], [5.0, 0.0]])
    _, depth = render.render_rows(st.pos, st.vel, cfg)
    drow = np.asarray(depth[0])
    hits = drow[drow < cfg.far]
    np.testing.assert_allclose(hits.min(), 5.0, atol=0.01)
    # the far agent is fully occluded at the center (same axis, wider near splat)
    center = drow[cfg.width // 2]
    assert center == pytest.approx(5.0, abs=0.01)


def test_behind_and_out_of_fov_invisible():
    cfg = VisionConfig(width=32)
    # one behind, one far outside the 90-degree cone, one beyond far plane
    st, _ = _two_agent_state(
        cfg, [0, 0], [1, 0], [[-10.0, 0.0], [10.0, 100.0], [20000.0, 0.0]]
    )
    shade, depth = render.render_rows(st.pos, st.vel, cfg)
    assert np.all(np.asarray(depth[0]) == cfg.far)
    np.testing.assert_allclose(np.asarray(shade[0]), cfg.background)


def test_closer_is_wider():
    """Apparent size grows as distance shrinks — the rasterizer's
    perspective-division distance cue."""
    cfg = VisionConfig(width=256)
    for dist, min_px in [(50.0, 1), (10.0, 5), (5.0, 10)]:
        st, _ = _two_agent_state(cfg, [0, 0], [1, 0], [[dist, 0.0]])
        _, depth = render.render_rows(st.pos, st.vel, cfg)
        npix = int((np.asarray(depth[0]) < cfg.far).sum())
        assert npix >= min_px, (dist, npix)
    # ordering
    widths = []
    for dist in [5.0, 10.0, 50.0]:
        st, _ = _two_agent_state(cfg, [0, 0], [1, 0], [[dist, 0.0]])
        _, depth = render.render_rows(st.pos, st.vel, cfg)
        widths.append(int((np.asarray(depth[0]) < cfg.far).sum()))
    assert widths[0] > widths[1] > widths[2]


def test_near_plane_culls_self_and_touching():
    cfg = VisionConfig(width=32)
    st, _ = _two_agent_state(cfg, [0, 0], [1, 0], [[0.5, 0.0]])  # inside near=1
    _, depth = render.render_rows(st.pos, st.vel, cfg)
    assert np.all(np.asarray(depth[0]) == cfg.far)


def test_left_right_convention():
    """+u (right half of the image) is to the right of the heading:
    for heading +x, a target at (10, -3) (clockwise, i.e. to the right when
    facing +x with z up) lands in pixels > W/2."""
    cfg = VisionConfig(width=64)
    st, _ = _two_agent_state(cfg, [0, 0], [1, 0], [[10.0, -3.0]])
    _, depth = render.render_rows(st.pos, st.vel, cfg)
    hits = np.where(np.asarray(depth[0]) < cfg.far)[0]
    assert hits.size and hits.mean() > cfg.width / 2


def test_antialias_soft_edges():
    """MSAA-analog: with antialias on, splat edges take fractional values
    between background and sprite shade, and interior pixels are unchanged."""
    cfg_hard = VisionConfig(width=128)
    cfg_soft = VisionConfig(width=128, antialias=True)
    st, _ = _two_agent_state(cfg_hard, [0, 0], [1, 0], [[8.0, 0.3]])
    hard, _ = render.render_rows(st.pos, st.vel, cfg_hard)
    soft, _ = render.render_rows(st.pos, st.vel, cfg_soft)
    h, s = np.asarray(hard[0]), np.asarray(soft[0])
    covered = h > cfg_hard.background + 0.3
    # erode by one pixel: boundary pixels legitimately get fractional coverage
    interior = covered & np.roll(covered, 1) & np.roll(covered, -1)
    np.testing.assert_allclose(s[interior], h[interior], atol=0.02)
    # soft edges introduce values strictly between bg and the hard edge value
    frac = (s > cfg_hard.background + 1e-4) & (s < h.max() * 0.6)
    assert frac.sum() >= 1
    # and the obs is now continuous in position: tiny shifts move the obs a
    # little, not by full pixels
    st2 = st.replace(pos=st.pos.at[1, 1].add(0.02))
    soft2, _ = render.render_rows(st2.pos, st2.vel, cfg_soft)
    delta = np.abs(np.asarray(soft2[0]) - s).max()
    assert 0 < delta < 0.5


@pytest.mark.parametrize("n,w", [(24, 64), (100, 32)])
def test_antialias_kernel_matches_dense(n, w):
    from nenbody_tpu.ops import raycast

    cfg = VisionConfig(width=w, antialias=True)
    key = jax.random.key(11)
    pos = jax.random.uniform(key, (n, 2), minval=-50, maxval=50, dtype=jnp.float32)
    vel = jax.random.uniform(jax.random.key(12), (n, 2), minval=-1, maxval=1, dtype=jnp.float32)
    got_s, got_d = raycast.render_rows_tiled(pos, vel, cfg)
    want_s, want_d = render.render_rows(pos, vel, cfg)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-4)


def test_scene_observe_with_depth():
    scene = Scene(SimConfig(n=32, controller="gravity", vision=VisionConfig(width=32)))
    state = scene.spawn(seed=0)
    shade, depth = scene.observe_with_depth(state)
    assert shade.shape == (32, 32) and depth.shape == (32, 32)
    cfg = scene.cfg.vision
    d = np.asarray(depth)
    assert (d <= cfg.far).all() and (d > cfg.near).all()
    # shade agrees with plain observe
    np.testing.assert_allclose(
        np.asarray(scene.observe(state)), np.asarray(shade), rtol=1e-6
    )


def test_scene_observe_integration():
    scene = Scene(SimConfig(n=64, controller="gravity", vision=VisionConfig(width=64)))
    state = scene.spawn(seed=0)
    obs = scene.observe(state)
    assert obs.shape == (64, 64) and obs.dtype == jnp.float32
    # batched
    batch = scene.spawn_envs(3, seed=1)
    obs_b = scene.observe(batch)
    assert obs_b.shape == (3, 64, 64)
    # rollout with obs recording
    _, traj = scene.rollout(state, 4, record=("obs",))
    assert traj["obs"].shape == (4, 64, 64)


def test_observe_rgb():
    scene = Scene(SimConfig(n=32, controller="gravity", vision=VisionConfig(width=32)))
    state = scene.spawn(seed=0)
    rgb = scene.observe_rgb(state)
    assert rgb.shape == (32, 32, 3)
    arr = np.asarray(rgb)
    assert arr.min() >= 0 and arr.max() <= 1
    # background pixels carry the clear-color chroma (blue-dominant)
    _, depth = scene.observe_with_depth(state)
    bg = np.asarray(depth) == scene.cfg.vision.far
    if bg.any():
        px = arr[bg]
        assert (px[:, 2] > px[:, 0]).all()  # b > r for clear color
    # hits are warm (r >= b for the sprite color)
    hits = ~bg
    if hits.any():
        px = arr[hits]
        assert (px[:, 0] >= px[:, 2]).all()


@pytest.mark.parametrize("hfov", [45.0, 120.0])
def test_nonstandard_fov(hfov):
    """The camera algebra must hold away from the reference's 90-degree FOV
    (kernels vs dense vs brute force)."""
    from nenbody_tpu.ops import raycast

    cfg = VisionConfig(width=48, hfov_deg=hfov)
    rng = np.random.RandomState(3)
    n = 16
    pos = rng.uniform(-40, 40, (n, 2)).astype(np.float32)
    vel = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
    dirs = np.asarray(camera.unit_heading(jnp.asarray(vel)))

    shade, depth = render.render_rows(jnp.asarray(pos), jnp.asarray(vel), cfg)
    for i in range(0, n, 5):
        ref_shade, ref_depth = brute_force_row(pos[i], dirs[i], pos, cfg)
        np.testing.assert_allclose(np.asarray(shade[i]), ref_shade, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth[i]), ref_depth, rtol=1e-4, atol=1e-4)

    got_s, got_d = raycast.render_rows_tiled(jnp.asarray(pos), jnp.asarray(vel), cfg)
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(shade), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(depth), rtol=1e-5, atol=1e-4)
