"""Serving artifacts (utils.export): the policy step serialized as a
self-contained StableHLO blob — params baked in, loadable and exact without
the checkpoint/net/env at the serving site."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nenbody_tpu import SimConfig, VisionConfig
from nenbody_tpu.rl import train as train_lib
from nenbody_tpu.rl.env import VisionEnv
from nenbody_tpu.state import spawn, spawn_batch
from nenbody_tpu.utils import export as export_lib


def _env_and_params(n=8, w=16):
    env = VisionEnv(SimConfig(n=n, controller="gravity",
                              vision=VisionConfig(width=w)))
    ts, apply_fn, _ = train_lib.init_train_state(
        env, num_envs=2, key=jax.random.key(0), optimizer=optax.adam(1e-3)
    )
    return env, apply_fn, ts.params


def test_export_roundtrip_matches_live_step(tmp_path):
    env, apply_fn, params = _env_and_params()
    blob = export_lib.export_policy_step(env, apply_fn, params)
    path = str(tmp_path / "step.nxs")
    with open(path, "wb") as f:
        f.write(blob)
    step = export_lib.load_policy_step(path)  # from disk, bytes-free caller
    live = jax.jit(export_lib.make_policy_step(env, apply_fn, params))
    st = spawn(jax.random.key(1), env.cfg)
    got = step(st.pos, st.vel)
    want = live(st.pos, st.vel)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-7)


def test_export_batched_and_multi_step(tmp_path):
    """A batched artifact steps a fleet of envs; chaining its own outputs
    advances the sim (the serving loop)."""
    env, apply_fn, params = _env_and_params()
    blob = export_lib.export_policy_step(env, apply_fn, params, num_envs=2)
    step = export_lib.load_policy_step(blob)
    st = spawn_batch(jax.random.key(2), env.cfg, 2)
    pos, vel = st.pos, st.vel
    for _ in range(3):
        pos, vel, action = step(pos, vel)
    assert pos.shape == (2, env.cfg.n, 2) and action.shape == pos.shape
    assert np.isfinite(np.asarray(pos)).all()
    # it actually moved
    assert float(np.abs(np.asarray(pos) - np.asarray(st.pos)).max()) > 0


def test_export_sim_step_matches_scene(tmp_path):
    """Sim-as-a-service: the --policy-free artifact advances (pos, vel)
    exactly like Scene.step, with `steps` baked as one scanned call."""
    from nenbody_tpu import Scene

    cfg = SimConfig(n=16, controller="boids")
    blob = export_lib.export_sim_step(cfg, steps=3)
    step = export_lib.load_policy_step(blob)
    scene = Scene(cfg)
    st = scene.spawn(seed=5)
    pos, vel = step(st.pos, st.vel)
    want = st
    for _ in range(3):
        want = scene.step(want)
    np.testing.assert_allclose(np.asarray(pos), np.asarray(want.pos),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vel), np.asarray(want.vel),
                               rtol=1e-6, atol=1e-6)


def test_export_sim_rejects_random_controller():
    with pytest.raises(ValueError, match="random"):
        export_lib.export_sim_step(SimConfig(n=8, controller="random"))


def test_export_rejects_nonpositive_steps():
    """steps=0 would scan nothing: the policy artifact would crash on
    actions[-1] and the sim artifact would be a silent identity."""
    env, apply_fn, params = _env_and_params()
    with pytest.raises(ValueError, match="steps"):
        export_lib.export_policy_step(env, apply_fn, params, steps=0)
    with pytest.raises(ValueError, match="steps"):
        export_lib.export_sim_step(SimConfig(n=8, controller="gravity"),
                                   steps=-1)


def test_export_multi_step_policy_matches_chained_single(tmp_path):
    """A steps=2 policy artifact equals two chained steps=1 calls (same
    closed loop, one dispatch)."""
    env, apply_fn, params = _env_and_params()
    one = export_lib.load_policy_step(
        export_lib.export_policy_step(env, apply_fn, params))
    two = export_lib.load_policy_step(
        export_lib.export_policy_step(env, apply_fn, params, steps=2))
    st = spawn(jax.random.key(3), env.cfg)
    p, v, a = one(*one(st.pos, st.vel)[:2])
    p2, v2, a2 = two(st.pos, st.vel)
    for g, w in zip((p2, v2, a2), (p, v, a)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-6)


def test_export_fleet_on_mesh_matches_live(tmp_path):
    """Multi-chip serving: the fleet step over a (data, agents) mesh
    serializes with its sharded layouts, reloads, executes with sharded
    outputs, and matches the live jitted step at fp32 exactness."""
    from nenbody_tpu.parallel.mesh import make_mesh, place_state_on_mesh

    env, apply_fn, params = _env_and_params()
    mesh = make_mesh({"data": 2, "agents": 4})
    blob = export_lib.export_policy_step(
        env, apply_fn, params, num_envs=2, steps=2, mesh=mesh
    )
    step = export_lib.load_policy_step(blob)
    live = jax.jit(export_lib.make_fleet_step(env, apply_fn, params, mesh,
                                              steps=2))
    st = place_state_on_mesh(spawn_batch(jax.random.key(4), env.cfg, 2), mesh)
    got = step(st.pos, st.vel)
    want = live(st.pos, st.vel)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-7)
    # the artifact records the device requirement
    assert "agents" in str(got[0].sharding.spec)


def test_export_mesh_requires_envs_and_policy(tmp_path, capsys):
    from nenbody_tpu.cli import main
    from nenbody_tpu.parallel.mesh import make_mesh

    env, apply_fn, params = _env_and_params()
    with pytest.raises(ValueError, match="num_envs"):
        export_lib.export_policy_step(
            env, apply_fn, params, mesh=make_mesh({"data": 2, "agents": 4})
        )
    rc = main([
        "export", "--agents", "8", "--mesh", "2x4", "--out",
        str(tmp_path / "x.nxs"),
    ])
    assert rc == 2 and "--policy" in capsys.readouterr().err


def test_export_cli(tmp_path, capsys):
    from nenbody_tpu.cli import main
    from nenbody_tpu.utils import checkpoint as ck

    env, apply_fn, params = _env_and_params()
    pol = str(tmp_path / "pol.npz")
    ck.save_pytree(pol, params)
    out = str(tmp_path / "step.nxs")
    rc = main([
        "export", "--policy", pol, "--agents", "8", "--vision-width", "16",
        "--out", out, "--check",
    ])
    assert rc == 0 and os.path.getsize(out) > 0
    meta = json.loads([l for l in capsys.readouterr().out.splitlines()
                       if l.startswith("{")][-1])
    assert meta["checked"] and meta["bytes"] == os.path.getsize(out)
    # gru is the live-playback-only family: rejected at the flag level
    with pytest.raises(SystemExit):
        main([
            "export", "--policy", pol, "--net", "gru", "--agents", "8",
            "--vision-width", "16", "--out", out,
        ])
    # missing policy file errors cleanly
    rc = main([
        "export", "--policy", str(tmp_path / "nope.npz"), "--agents", "8",
        "--vision-width", "16", "--out", out,
    ])
    assert rc == 2 and "not found" in capsys.readouterr().err
    # sim mode: no policy, controller baked, multi-step, checked
    sim_out = str(tmp_path / "sim.nxs")
    rc = main([
        "export", "--agents", "8", "--controller", "boids", "--steps", "4",
        "--envs", "2", "--out", sim_out, "--check",
    ])
    assert rc == 0 and os.path.getsize(sim_out) > 0
    meta = json.loads([l for l in capsys.readouterr().out.splitlines()
                       if l.startswith("{")][-1])
    assert meta["mode"] == "sim:boids" and meta["steps"] == 4
