"""Texture-sampled sprites — the full C23 mechanism: the reference's frag
shader samples skin.png at the interpolated vertex uv, then darkens by the
radial vignette (shaders/scene.frag:11-16; texture+sampler bound at
src/main.rs:322-376). We synthesize textures instead of copying assets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu.config import VisionConfig
from nenbody_tpu.vision import render


def test_sample_texture_bilinear_and_clamp():
    tex = jnp.array([[0.0, 1.0], [1.0, 0.0]], jnp.float32)
    # corners hit texels exactly
    uv = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(render.sample_texture(tex, uv)), [0.0, 1.0, 1.0, 0.0]
    )
    # center is the bilinear average
    mid = render.sample_texture(tex, jnp.array([0.5, 0.5], jnp.float32))
    assert float(mid) == pytest.approx(0.5)
    # out-of-range uv clamps to the edge
    far = render.sample_texture(tex, jnp.array([2.0, -1.0], jnp.float32))
    assert float(far) == pytest.approx(1.0)


def test_constant_texture_equals_albedo_path():
    cfg = VisionConfig(width=48)
    key = jax.random.key(0)
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (20, 2), minval=-30, maxval=30, dtype=jnp.float32)
    vel = jax.random.uniform(kv, (20, 2), minval=-1, maxval=1, dtype=jnp.float32)
    ones = jnp.ones((4, 4), jnp.float32)
    s0, d0 = render.render_rows(pos, vel, cfg)
    s1, d1 = render.render_rows(pos, vel, cfg, texture=ones)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s0), atol=1e-6)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-6)


def test_disc_texture_pattern_appears_across_splat():
    """A left/right-split texture must brighten one side of the splat and
    darken the other (uv.x spans the splat; scene.frag's v_TexCoord.x)."""
    cfg = VisionConfig(width=65)
    pos = jnp.array([[0.0, 0.0], [8.0, 0.0]], jnp.float32)
    vel = jnp.array([[1.0, 0.0], [0.0, 1.0]], jnp.float32)
    lr = jnp.concatenate(
        [jnp.zeros((4, 8), jnp.float32), jnp.ones((4, 8), jnp.float32)], axis=1
    )
    shade, depth = render.render_rows(pos, vel, cfg, texture=lr)
    row = np.asarray(shade)[0]
    hit = np.asarray(depth)[0] < cfg.far
    mid = cfg.width // 2
    left = row[:mid][hit[:mid]]
    right = row[mid + 1 :][hit[mid + 1 :]]
    assert left.size and right.size
    # left half of the splat samples uv.x < .5 -> texel 0; right -> texel 1
    assert left.mean() < 0.15
    assert right.mean() > 0.3


def test_wireframe_texture_uses_interpolated_uv():
    cfg = VisionConfig(width=64, sprite_mode="wireframe")
    key = jax.random.key(2)
    kp, kv = jax.random.split(key)
    pos = jax.random.uniform(kp, (12, 2), minval=-25, maxval=25, dtype=jnp.float32)
    vel = jax.random.uniform(kv, (12, 2), minval=-1, maxval=1, dtype=jnp.float32)
    tex = render.checker_texture(16, cells=4, lo=0.0, hi=1.0)
    s_plain, d_plain = render.render_rows(pos, vel, cfg)
    s_tex, d_tex = render.render_rows(pos, vel, cfg, texture=tex)
    np.testing.assert_allclose(np.asarray(d_tex), np.asarray(d_plain))
    hit = np.asarray(d_plain) < cfg.far
    # texture modulates shade (somewhere the checker differs from 1.0)
    assert not np.allclose(np.asarray(s_tex)[hit], np.asarray(s_plain)[hit])
    # and never brightens beyond the untextured fragment (tex in [0,1])
    assert (np.asarray(s_tex)[hit] <= np.asarray(s_plain)[hit] + 1e-6).all()


def test_checker_texture_shape_and_range():
    t = np.asarray(render.checker_texture(32, cells=8))
    assert t.shape == (32, 32)
    np.testing.assert_allclose(np.unique(t), [0.35, 1.0], rtol=1e-6)


def test_scene_observe_textured_backends():
    """Scene.observe_textured agrees across dense/pallas/ring and both
    sprite modes; batched states vmap (texture broadcast)."""
    from nenbody_tpu.scene import Scene
    from nenbody_tpu.config import SimConfig, VisionConfig

    tex = render.checker_texture(16, 4)
    for mode in ("disc", "wireframe"):
        vcfg = VisionConfig(width=32, sprite_mode=mode, far=200.0)
        mk = lambda be: Scene(
            SimConfig(n=64, controller="boids", backend=be, vision=vcfg)
        )
        sd = mk("dense")
        st = sd.spawn(seed=1)
        want = np.asarray(sd.observe_textured(st, tex))
        assert want.shape == (64, 32)
        for be in ("pallas", "ring"):
            got = np.asarray(mk(be).observe_textured(st, tex))
            np.testing.assert_allclose(
                got, want, rtol=1e-4, atol=1e-4, err_msg=(mode, be)
            )
    # batched
    vcfg = VisionConfig(width=32)
    sd = Scene(SimConfig(n=16, controller="gravity", backend="dense", vision=vcfg))
    sts = sd.spawn_envs(3, seed=2)
    obs_b = np.asarray(sd.observe_textured(sts, tex))
    assert obs_b.shape == (3, 16, 32)
    one = np.asarray(
        sd.observe_textured(
            jax.tree.map(lambda x: x[1] if getattr(x, "ndim", 0) else x, sts), tex
        )
    )
    np.testing.assert_allclose(obs_b[1], one, rtol=1e-5, atol=1e-5)
