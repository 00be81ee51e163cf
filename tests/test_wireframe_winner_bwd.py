"""The r5 winner-index backward (ops/wireframe WF_WINNER_BWD route).

The forward kernels carry the winning target's global index as one more
min-reduced payload stream (track_idx=True), and the backward re-evaluates
ONLY each pixel's winning fragment in plain XLA — O(N*W) elementwise work +
one segment_sum — instead of re-rendering every (eye, target-chunk) tile
under the in-kernel vjp. Pins: forward unchanged by the index stream, the
index stream is self-consistent (re-evaluating the indexed fragment
reproduces the forward's depth), gradients match the dense oracle AND the
streaming backward, and the batched entry is bit-equal to vmapping the
single-env entry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu.config import VisionConfig
from nenbody_tpu.ops import wireframe
from nenbody_tpu.vision import render


def _scene(key, n, spread=40.0, batch=None):
    kp, kv = jax.random.split(key)
    shape = (n, 2) if batch is None else (batch, n, 2)
    pos = jax.random.uniform(kp, shape, minval=-spread, maxval=spread,
                             dtype=jnp.float32)
    vel = jax.random.uniform(kv, shape, minval=-1, maxval=1,
                             dtype=jnp.float32)
    return pos, vel


def test_winner_route_is_default_for_narrow_shapes():
    narrow = VisionConfig(width=64, sprite_mode="wireframe", antialias=True)
    wide = VisionConfig(width=512, sprite_mode="wireframe", antialias=True)
    assert wireframe._wf_diff_route(narrow, 1024) == "winner"
    # compact-eligible wide rows keep the compact pair unless the silicon
    # A/B flips WF_WINNER_OVER_COMPACT
    expected = "winner" if wireframe.WF_WINNER_OVER_COMPACT else "compact"
    assert wireframe._wf_diff_route(wide, 100) == expected


@pytest.mark.parametrize("aa,rasterq", [
    (False, True), (True, True),
    pytest.param(False, False, marks=pytest.mark.slow),
    pytest.param(True, False, marks=pytest.mark.slow),
])
def test_track_idx_forward_parity_and_self_consistency(aa, rasterq,
                                                       monkeypatch):
    """The index stream must not perturb (shade, depth) — same kernel, one
    more payload, on BOTH raster editions (rasterq default-tier, the
    division route slow-tier) — and must be SELF-consistent: re-evaluating
    the indexed fragment (the backward's exact recompute) reproduces the
    forward's depth at every hit pixel (allclose, not bit-equal: the
    recompute is the division route while the rasterq forward derives
    depth from the inverse-depth constants)."""
    monkeypatch.setattr(wireframe, "WF_RASTERQ", rasterq)
    cfg = VisionConfig(width=64, sprite_mode="wireframe", antialias=aa,
                       far=200.0)
    pos, vel = _scene(jax.random.key(3), 48)
    s0, d0 = wireframe.render_rows_wireframe_tiled(pos, vel, cfg)
    s1, d1, widx = wireframe.render_rows_wireframe_tiled(
        pos, vel, cfg, track_idx=True
    )
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))

    hit = np.asarray(d0) < cfg.far
    wi = np.asarray(widx)
    assert (np.isfinite(wi) == hit).all()
    assert (wi[hit] >= 0).all() and (wi[hit] < pos.shape[0]).all()

    # the backward's fragment recompute at the winner reproduces the depth
    from nenbody_tpu.vision import camera
    n, w = pos.shape[0], cfg.width
    j = jnp.where(jnp.isfinite(widx), widx, 0.0).astype(jnp.int32)
    dirs = camera.unit_heading(vel)
    u_p = (2.0 * (jnp.arange(w, dtype=jnp.float32) + 0.5) / w - 1.0)[None, :]
    _, dep = wireframe._winner_fragment_rows(
        pos[:, 0:1], pos[:, 1:2], dirs[:, 0:1], dirs[:, 1:2],
        pos[:, 0][j], pos[:, 1][j], dirs[:, 0][j], dirs[:, 1][j],
        cfg.sprite_albedo, None, u_p, cfg,
    )
    np.testing.assert_allclose(np.asarray(dep)[hit], np.asarray(d0)[hit],
                               rtol=1e-5, atol=1e-5)


def test_winner_gradients_match_streaming_backward():
    """Route cross-check (the sort/rank-edition pattern): the winner-index
    pullback and the streaming backward kernel spend each pixel's cotangent
    on the same fragment, so their gradients agree to fp tolerances — this
    also keeps the streaming backward covered in the default tier now that
    winner is the narrow-shape default."""
    cfg = VisionConfig(width=32, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _scene(jax.random.key(7), 32)
    ku, kd = jax.random.split(jax.random.key(9))
    cu = jax.random.normal(ku, (32, cfg.width), jnp.float32)
    cd = 0.01 * jax.random.normal(kd, (32, cfg.width), jnp.float32)

    def loss(p, v):
        sh, dep = wireframe.render_rows_wireframe_diff(p, v, cfg)
        return jnp.sum(sh * cu) + jnp.sum(dep * cd)

    old = wireframe.WF_WINNER_BWD
    try:
        wireframe.WF_WINNER_BWD = True
        jax.clear_caches()  # trace-time global, not a jit key
        g_win = jax.grad(loss, argnums=(0, 1))(pos, vel)
        wireframe.WF_WINNER_BWD = False
        jax.clear_caches()
        g_str = jax.grad(loss, argnums=(0, 1))(pos, vel)
    finally:
        wireframe.WF_WINNER_BWD = old
        jax.clear_caches()
    for a, b, name in zip(g_win, g_str, ("pos", "vel")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
        assert (np.abs(np.asarray(a)) > 0).any()


def test_batched_diff_matches_vmapped_single():
    """render_rows_wireframe_batched_diff == vmap(render_rows_wireframe_
    diff) bit-for-bit: the batched forward IS the vmapped raster launch,
    and the batched backward vmaps the same pullback."""
    cfg = VisionConfig(width=64, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _scene(jax.random.key(11), 24, batch=3)

    def loss_b(p, v):
        s, d = wireframe.render_rows_wireframe_batched_diff(p, v, cfg)
        return jnp.sum(s * s) + 1e-3 * jnp.sum(d)

    def loss_v(p, v):
        def one(pp, vv):
            s, d = wireframe.render_rows_wireframe_diff(pp, vv, cfg)
            return jnp.sum(s * s) + 1e-3 * jnp.sum(d)
        return jnp.sum(jax.vmap(one)(p, v))

    gb = jax.grad(loss_b, argnums=(0, 1))(pos, vel)
    gv = jax.grad(loss_v, argnums=(0, 1))(pos, vel)
    for a, b, name in zip(gb, gv, ("pos", "vel")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)
        assert (np.abs(np.asarray(a)) > 0).any()

    # the diff primal rides the track_idx division-route launch (it must
    # bit-match its own grad-context forward, custom_vjp semantics), so
    # pin THAT identity exactly; the plain batched API rides rasterq and
    # agrees at fp32 tolerances only (near-tie winners may flip)
    s0, d0, _ = wireframe.render_rows_wireframe_batched(
        pos, vel, cfg, track_idx=True)
    s1, d1 = wireframe.render_rows_wireframe_batched_diff(pos, vel, cfg)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(d0), np.asarray(d1))
    sq, dq = wireframe.render_rows_wireframe_batched(pos, vel, cfg)
    np.testing.assert_allclose(np.asarray(sq), np.asarray(s1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(d1), atol=2e-4,
                               rtol=1e-4)


def test_batched_pullback_chunking_matches_vmap(monkeypatch):
    """The one-hot pullback's lax.map env-chunking (WF_WINNER_PULL_ELEMS)
    must reproduce the plain-vmap gradients — the budget never trips at
    test sizes, so this pins the reshape/lax.map plumbing with a tiny
    patched budget (B=4 -> 2 chunks of 2). Same per-env program on both
    sides, so the comparison is tight."""
    cfg = VisionConfig(width=32, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _scene(jax.random.key(21), 16, batch=4)

    @jax.jit  # jit BOTH sides: XLA reassociates the dtgt pixel sums, so
    # eager-vs-compiled gradients differ at summation-order level (the
    # per-env contributions cancel; measured ~1e-3 rel on CPU) — the
    # chunking comparison must hold the compilation regime fixed
    def grads(p, v):
        def loss(pq, vq):
            s, d = wireframe.render_rows_wireframe_batched_diff(pq, vq, cfg)
            return jnp.sum(s * s) + 1e-3 * jnp.sum(d)
        return jax.grad(loss, argnums=(0, 1))(p, v)

    g_vmap = jax.tree.map(np.asarray, grads(pos, vel))
    per_env = 16 * cfg.width * 17
    monkeypatch.setattr(wireframe, "WF_WINNER_PULL_ELEMS", 2 * per_env)
    jax.clear_caches()  # trace-time global
    g_chunk = jax.tree.map(np.asarray, grads(pos, vel))
    for a, b, name in zip(g_chunk, g_vmap, ("pos", "vel")):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5, err_msg=name)
        assert (np.abs(a) > 0).any()


@pytest.mark.slow
def test_batched_diff_textured_albedo_matches_dense():
    """Per-env albedo + shared texture through the batched diff entry:
    gradients (texture cotangent summed over envs) match the dense textured
    oracle per env."""
    cfg = VisionConfig(width=64, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    B, n = 2, 16
    pos, vel = _scene(jax.random.key(5), n, batch=B)
    ka = jax.random.key(8)
    alb = jax.random.uniform(ka, (B, n), minval=0.3, maxval=1.0)
    tex = render.checker_texture(8, 2)

    def loss_b(p, v, a, t):
        s, d = wireframe.render_rows_wireframe_batched_diff(
            p, v, cfg, albedo=a, texture=t
        )
        return jnp.sum(s * s) + 1e-3 * jnp.sum(d)

    def loss_d(p, v, a, t):
        def one(pp, vv, aa_):
            s, d = render.render_rows(pp, vv, cfg, albedo=aa_, texture=t)
            return jnp.sum(s * s) + 1e-3 * jnp.sum(d)
        return jnp.sum(jax.vmap(one)(p, v, a))

    gb = jax.grad(loss_b, argnums=(0, 1, 2, 3))(pos, vel, alb, tex)
    gd = jax.grad(loss_d, argnums=(0, 1, 2, 3))(pos, vel, alb, tex)
    for a, b, name in zip(gb, gd, ("pos", "vel", "albedo", "texture")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)
        assert (np.abs(np.asarray(b)) > 0).any(), f"{name} oracle grads zero"


@pytest.mark.slow
def test_batched_diff_streaming_grid_route(monkeypatch, request):
    """Above the raster element budget the batched forward folds the env
    axis into the streaming kernel's grid — the winner index must stay
    ENV-LOCAL there (the index payload counts within the per-env target
    block). Shrink the budget so a tiny batch takes the streaming route and
    pin gradients against the raster-vmap route."""
    cfg = VisionConfig(width=32, sprite_mode="wireframe", antialias=True,
                       far=200.0)
    pos, vel = _scene(jax.random.key(13), 16, batch=2)

    def loss(p, v):
        s, d = wireframe.render_rows_wireframe_batched_diff(p, v, cfg)
        return jnp.sum(s * s) + 1e-3 * jnp.sum(d)

    g_raster = jax.grad(loss, argnums=(0, 1))(pos, vel)
    monkeypatch.setattr(wireframe, "BATCHED_RASTER_MAX_ELEMS", 1)
    jax.clear_caches()  # trace-time global, not a jit key
    request.addfinalizer(jax.clear_caches)
    g_stream = jax.grad(loss, argnums=(0, 1))(pos, vel)
    for a, b, name in zip(g_stream, g_raster, ("pos", "vel")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
        assert (np.abs(np.asarray(a)) > 0).any()


def test_winner_pullback_degenerate_scenes_finite():
    """All-miss scenes (background widx = +inf everywhere) and the
    single-agent self-cull must produce finite, exactly-zero gradients
    through the winner pullback — the drop bucket + zeroed cotangents."""
    cfg = VisionConfig(width=64, sprite_mode="wireframe", antialias=True,
                       far=50.0)
    pos = jnp.array([[0.0, 0.0], [1000.0, 1000.0], [-1000.0, 1000.0],
                     [0.0, -1500.0]], jnp.float32)
    vel = jnp.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.0, 1.0]],
                    jnp.float32)

    def loss(p, v, c):
        return jnp.sum(wireframe.render_rows_wireframe_diff(p, v, c)[0] ** 2)

    g = np.asarray(jax.grad(loss)(pos, vel, cfg))
    assert np.isfinite(g).all() and np.abs(g).max() == 0.0

    pos1 = jnp.zeros((1, 2), jnp.float32)
    vel1 = jnp.ones((1, 2), jnp.float32)
    g1 = np.asarray(jax.grad(loss)(pos1, vel1, cfg))
    assert np.isfinite(g1).all()
