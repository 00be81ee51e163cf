"""Viz frame compositor, native host runtime (PNG/recorder), checkpointing."""

import os

import jax
import numpy as np
import pytest

from nenbody_tpu import Scene, SimConfig, VisionConfig, spawn
from nenbody_tpu.utils import checkpoint, native, profiling
from nenbody_tpu.viz import frame as frame_lib
from nenbody_tpu.viz import viewer as viewer_lib


def test_topdown_frame():
    pos = np.array([[0.0, 0.0], [20.0, 10.0], [-30.0, -5.0]], np.float32)
    vel = np.array([[1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]], np.float32)
    img = frame_lib.render_topdown(pos, vel, size=(120, 160), sprite_scale=5.0)
    assert img.shape == (120, 160, 3)
    # background is the clear color; sprites add brighter pixels
    assert np.isclose(img[0, 0], frame_lib.CLEAR_COLOR).all()
    assert (img == np.array(frame_lib.AGENT_COLOR, np.float32)).all(-1).sum() > 10
    # follows agent 0: its sprite is centered
    cy, cx = 60, 80
    patch = img[cy - 8 : cy + 8, cx - 8 : cx + 8]
    assert patch.max() > 0.5


def test_eye_strip_and_compose():
    row = np.linspace(0, 1, 64, dtype=np.float32)
    strip = frame_lib.eye_strip(row, height=10, width=128)
    assert strip.shape == (10, 128, 3)
    assert strip[0, 0, 0] < strip[0, -1, 0]  # gradient preserved
    scene_img = np.zeros((20, 128, 3), np.float32)
    out = frame_lib.compose(scene_img, strip)
    assert out.shape == (34, 128, 3)


def test_viewer_capture(tmp_path):
    scene = Scene(SimConfig(n=16, controller="boids", vision=VisionConfig(width=32)))
    state = scene.spawn(seed=0)
    obs = scene.observe(state)
    v = viewer_lib.Viewer(out_dir=str(tmp_path), size=(64, 96), use_native=False)
    p = v.capture(state, obs)
    assert os.path.exists(p)
    from PIL import Image

    img = np.asarray(Image.open(p))
    assert img.shape[2] == 3 and img.shape[0] > 64  # scene + strip


@pytest.mark.skipif(not native.available(), reason="libnenhost.so not built")
class TestNative:
    def test_png_roundtrip(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 255, (33, 47, 3), np.uint8)
        data = native.encode_png(img)
        assert data[:8] == b"\x89PNG\r\n\x1a\n"
        from io import BytesIO

        from PIL import Image

        back = np.asarray(Image.open(BytesIO(data)))
        np.testing.assert_array_equal(back, img)

    def test_async_image_write(self, tmp_path):
        img = np.zeros((16, 16, 3), np.uint8)
        img[4:12, 4:12] = 200
        p = str(tmp_path / "f.png")
        assert native.write_image_async(p, img)
        native.flush()
        from PIL import Image

        back = np.asarray(Image.open(p))
        np.testing.assert_array_equal(back, img)

    def test_trajectory_recorder_roundtrip(self, tmp_path):
        p = str(tmp_path / "run.nentraj")
        n = 8
        rng = np.random.RandomState(1)
        poss = rng.randn(5, n, 2).astype(np.float32)
        vels = rng.randn(5, n, 2).astype(np.float32)
        with native.TrajectoryRecorder(p, n) as rec:
            for t in range(5):
                assert rec.append(t * 10, poss[t], vels[t])
        ts, rpos, rvel = native.read_trajectory(p)
        np.testing.assert_array_equal(ts, np.arange(5) * 10)
        np.testing.assert_array_equal(rpos, poss)
        np.testing.assert_array_equal(rvel, vels)

    def test_stats_ema(self):
        native.stats_record_ms(10.0)
        native.stats_record_ms(10.0)
        assert native.stats_ema_ms() > 0


def test_checkpoint_roundtrip(tmp_path):
    cfg = SimConfig(n=32, controller="gravity")
    state = spawn(jax.random.key(7), cfg)
    scene = Scene(cfg)
    state = scene.step(state)
    p = checkpoint.save_state(str(tmp_path / "s.npz"), state)
    back = checkpoint.load_state(p)
    np.testing.assert_array_equal(np.asarray(back.pos), np.asarray(state.pos))
    np.testing.assert_array_equal(np.asarray(back.t), np.asarray(state.t))
    # resumed rollout == continuous rollout (incl. PRNG key state)
    a = scene.step(state)
    b = scene.step(back)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_checkpoint_batched(tmp_path):
    cfg = SimConfig(n=8, controller="random")
    scene = Scene(cfg)
    batch = scene.spawn_envs(3, seed=1)
    p = checkpoint.save_state(str(tmp_path / "b.npz"), batch)
    back = checkpoint.load_state(p)
    a = scene.step(batch)
    b = scene.step(back)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_periodic_checkpointer(tmp_path):
    cfg = SimConfig(n=8, controller="gravity")
    scene = Scene(cfg)
    state = scene.spawn(seed=0)
    ck = checkpoint.PeriodicCheckpointer(str(tmp_path), every=2, keep=2)
    saved = []
    for _ in range(6):
        state = scene.step(state)
        p = ck.maybe_save(state)
        if p:
            saved.append(p)
    assert len(saved) == 3
    assert len(os.listdir(tmp_path)) == 2  # keep=2 pruned the oldest
    assert ck.latest() == saved[-1]


def test_pytree_checkpoint(tmp_path):
    import optax

    from nenbody_tpu.rl import env as env_lib
    from nenbody_tpu.rl import train as train_lib

    env = env_lib.VisionEnv(
        SimConfig(n=8, controller="gravity", vision=VisionConfig(width=16))
    )
    ts, _, _ = train_lib.init_train_state(
        env, num_envs=2, key=jax.random.key(0), optimizer=optax.adam(1e-3)
    )
    p = checkpoint.save_pytree(str(tmp_path / "params.npz"), ts.params)
    back = checkpoint.load_pytree(p, ts.params)
    for a, b in zip(jax.tree.leaves(ts.params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_full_train_state_checkpoint(tmp_path):
    """A whole TrainState (params + optimizer + batched env states + PRNG
    key) round-trips, and training resumes identically."""
    import jax as _jax
    import optax

    from nenbody_tpu import SimConfig, VisionConfig
    from nenbody_tpu.rl import env as env_lib
    from nenbody_tpu.rl import train as train_lib

    env = env_lib.VisionEnv(
        SimConfig(n=8, controller="gravity", vision=VisionConfig(width=16))
    )
    opt = optax.adam(1e-3)
    ts, apply_fn, _ = train_lib.init_train_state(
        env, num_envs=2, key=_jax.random.key(0), optimizer=opt
    )
    step = _jax.jit(train_lib.make_train_step(env, apply_fn, opt, horizon=2))
    ts, _ = step(ts)

    p = checkpoint.save_pytree(str(tmp_path / "ts.npz"), ts)
    back = checkpoint.load_pytree(p, ts)

    a, _ = step(ts)
    b, _ = step(back)
    for x, y in zip(_jax.tree.leaves(a.params), _jax.tree.leaves(b.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_array_equal(
        np.asarray(a.env_states.pos), np.asarray(b.env_states.pos)
    )


def test_step_timer():
    t = profiling.StepTimer(n_agents=100)
    t.mark()
    import time as _t

    _t.sleep(0.05)  # compile-like first interval: skipped from the EMA
    dt = t.mark()
    assert dt > 0 and t.ema_s is None
    _t.sleep(0.01)
    t.mark()
    assert t.pair_evals_per_s > 0
    assert t.ema_s < 0.05  # first (slow) interval did not poison the EMA
    assert "pair_evals_per_s" in t.report()


def test_periodic_checkpointer_chunked_polling(tmp_path):
    """Checkpoints must fire even when the polling stride doesn't divide
    `every` (the CLI only checks at --log-every boundaries)."""
    from nenbody_tpu import Scene, SimConfig

    cfg = SimConfig(n=8, controller="gravity")
    scene = Scene(cfg)
    state = scene.spawn(seed=0)
    ck = checkpoint.PeriodicCheckpointer(str(tmp_path), every=10, keep=10)
    saved = []
    for _ in range(7):  # poll every 3 steps: t = 3, 6, 9, 12, ...
        state, _ = scene.rollout(state, 3)
        p = ck.maybe_save(state)
        if p:
            saved.append(p)
    # t = 3..21; saves at 12 (>=10) and 21 isn't (21-12=9 < 10) -> 1 save,
    # NOT zero (the old exact-multiple test saved never)
    assert len(saved) == 1 and "000000012" in saved[0]


def test_viewer_falls_back_without_native(tmp_path, monkeypatch):
    """The framework must work unbuilt: Viewer(use_native=True) degrades to
    the PIL writer when libnenhost.so is unavailable."""
    from nenbody_tpu.utils import native as native_mod

    monkeypatch.setattr(native_mod, "available", lambda: False)
    scene = Scene(SimConfig(n=8, controller="gravity", vision=VisionConfig(width=16)))
    state = scene.spawn(seed=0)
    v = viewer_lib.Viewer(out_dir=str(tmp_path), size=(32, 48), use_native=True)
    assert v._native is None  # fell back
    p = v.capture(state, scene.observe(state))
    assert os.path.exists(p)


@pytest.mark.skipif(not native.available(), reason="libnenhost.so not built")
def test_native_error_counting(tmp_path):
    """Failed writes (unwritable path) land in the error counter instead of
    crashing the worker."""
    lib, host = native._get_host()
    before = lib.nen_host_errors(host)
    img = np.zeros((8, 8, 3), np.uint8)
    assert native.write_image_async("/nonexistent_dir_xyz/f.png", img)
    native.flush()
    assert lib.nen_host_errors(host) == before + 1
    # worker still alive afterwards
    p = str(tmp_path / "ok.png")
    assert native.write_image_async(p, img)
    native.flush()
    assert os.path.exists(p)


@pytest.mark.skipif(not native.available(), reason="libnenhost.so not built")
def test_native_grayscale_png():
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 255
    data = native.encode_png(img)
    from io import BytesIO

    from PIL import Image

    back = np.asarray(Image.open(BytesIO(data)))
    np.testing.assert_array_equal(back, img)
