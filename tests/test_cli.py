"""CLI end-to-end: run/train/info subcommands (in-process, CPU)."""

import json
import os

import numpy as np
import pytest

from nenbody_tpu.cli import main


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """ONE tiny REINFORCE train run shared by the policy-consuming CLI
    tests (each in-process `train` call recompiles its step on the 1-core
    box — sharing the artifacts keeps the suite compile-bound time flat).
    iters 2 < checkpoint-every 50 also pins the final-save-always-fires
    behavior."""
    d = tmp_path_factory.mktemp("trained")
    params, ckpt = str(d / "p.npz"), str(d / "ts.npz")
    rc = main([
        "train", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "2", "--iters", "2", "--save", params,
        "--checkpoint", ckpt, "--checkpoint-every", "50",
    ])
    assert rc == 0 and os.path.exists(params)
    # 2 iters < checkpoint-every 50: the final save must still fire
    assert os.path.exists(ckpt)
    return {"params": params, "ckpt": ckpt}


def test_info(capsys):
    assert main(["info"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["backend"] == "cpu" and len(out["devices"]) == 8
    assert "boids-4096" in out["presets"]


def test_run_with_capture_record_checkpoint(tmp_path, capsys):
    record = str(tmp_path / "run.nentraj")
    rc = main([
        "run", "--n", "32", "--controller", "gravity", "--steps", "60",
        "--log-every", "20", "--vision-width", "16",
        "--capture", "20", "--out-dir", str(tmp_path / "frames"),
        "--record", record,
        "--checkpoint-dir", str(tmp_path / "ck"), "--checkpoint-every", "20",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines[-1]["t"] == 60
    assert lines[-1]["pair_evals_per_s"] > 0
    assert len(os.listdir(tmp_path / "frames")) >= 1
    assert len(os.listdir(tmp_path / "ck")) >= 1
    if os.path.exists(record):
        from nenbody_tpu.utils import native

        ts, pos, vel = native.read_trajectory(record)
        assert pos.shape[1:] == (32, 2) and len(ts) == 3


def test_run_resume(tmp_path, capsys):
    ckdir = str(tmp_path / "ck")
    main([
        "run", "--n", "16", "--controller", "boids", "--steps", "40",
        "--log-every", "20", "--checkpoint-dir", ckdir, "--checkpoint-every", "20",
    ])
    capsys.readouterr()
    from nenbody_tpu.utils.checkpoint import PeriodicCheckpointer

    latest = PeriodicCheckpointer(ckdir).latest()
    assert latest
    rc = main([
        "run", "--n", "16", "--controller", "boids", "--steps", "20",
        "--log-every", "20", "--resume", latest,
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines[-1]["t"] == 60  # resumed from 40


def test_replay_cli(tmp_path, capsys):
    from nenbody_tpu.utils import native

    if not native.available():
        pytest.skip("libnenhost.so not built")
    traj = str(tmp_path / "t.nentraj")
    rng = np.random.RandomState(0)
    with native.TrajectoryRecorder(traj, 16) as rec:
        for t in range(6):
            rec.append(t, rng.randn(16, 2).astype(np.float32) * 50,
                       rng.randn(16, 2).astype(np.float32))
    out = str(tmp_path / "r.gif")
    rc = main(["replay", traj, "--out", out, "--stride", "2"])
    assert rc == 0 and os.path.exists(out)


def test_scene_render_frame():
    from nenbody_tpu import Scene, SimConfig, VisionConfig

    scene = Scene(SimConfig(n=24, controller="boids", vision=VisionConfig(width=32)))
    st = scene.spawn(seed=0)
    img = scene.render_frame(st, selected_eye=3, size=(64, 96))
    assert img.dtype == np.uint8 and img.shape[1] == 96 and img.shape[0] > 64
    with pytest.raises(ValueError):
        scene.render_frame(scene.spawn_envs(2, seed=0))


def test_train_cli(capsys):
    rc = main([
        "train", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "2", "--iters", "2",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == 2 and np.isfinite(lines[-1]["loss"])


def test_gif_policy_playback(tmp_path, capsys, trained):
    """train --save -> gif --policy: the trained policy actuates the swarm
    in the demo-gif path (deterministic playback of the Gaussian mean)."""
    params = trained["params"]
    out = str(tmp_path / "pol.gif")
    rc = main([
        "gif", "--n", "8", "--controller", "gravity", "--vision-width", "16",
        "--steps", "4", "--stride", "2", "--out", out, "--policy", params,
    ])
    assert rc == 0
    assert os.path.exists(out)
    capsys.readouterr()
    # missing params: clean error (rc 2), not a traceback
    rc = main([
        "gif", "--n", "8", "--vision-width", "16", "--steps", "2",
        "--stride", "2", "--out", out, "--policy", str(tmp_path / "no.npz"),
    ])
    assert rc == 2 and "not found" in capsys.readouterr().err
    # vision disabled: the policy has nothing to consume — clean error
    rc = main([
        "gif", "--n", "8", "--vision-width", "0", "--steps", "2",
        "--stride", "2", "--out", out, "--policy", params,
    ])
    assert rc == 2 and "vision" in capsys.readouterr().err


def test_ppo_save_normalizes_to_policy_subtree(tmp_path, capsys):
    """`train --algo ppo --save` strips the value head so the npz loads
    straight into playback (`gif --policy`) like every other save."""
    params = str(tmp_path / "ppo.npz")
    rc = main([
        "train", "--algo", "ppo", "--envs", "2", "--agents", "8",
        "--vision-width", "16", "--horizon", "4", "--iters", "1",
        "--save", params,
    ])
    assert rc == 0
    out = str(tmp_path / "ppo.gif")
    rc = main([
        "gif", "--n", "8", "--controller", "gravity", "--vision-width", "16",
        "--steps", "4", "--stride", "2", "--out", out, "--policy", params,
    ])
    assert rc == 0 and os.path.exists(out)


@pytest.mark.slow
def test_ppo_central_critic_cli(tmp_path, capsys):
    """[slow: the central-critic MECHANISM is pinned every tier by
    tests/test_ppo.py::test_ppo_central_critic_runs_and_updates and the
    driver dryrun runs a mesh MAPPO step; this covers only the --critic
    arg wiring] --critic central (MAPPO pooled V(s)) trains via the CLI with team
    rewards; the save still normalizes to the policy subtree. Non-PPO algos
    reject the flag."""
    params = str(tmp_path / "mappo.npz")
    rc = main([
        "train", "--algo", "ppo", "--critic", "central", "--reward-mode",
        "team", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "4", "--iters", "1", "--save", params,
    ])
    assert rc == 0 and os.path.exists(params)
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert np.isfinite(lines[-1]["loss"])
    rc = main([
        "train", "--algo", "ac", "--critic", "central", "--reward-mode",
        "team", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "4", "--iters", "1",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert np.isfinite(lines[-1]["value_loss"])
    rc = main([
        "train", "--algo", "reinforce", "--critic", "central", "--envs", "2",
        "--agents", "8", "--vision-width", "16", "--iters", "1",
    ])
    assert rc == 2 and "value baseline" in capsys.readouterr().err


def test_policy_advance_gru_threads_carry(tmp_path):
    """--net gru playback: the hidden state persists across advance()
    calls, so identical states can map to different actions over time."""
    import jax
    import jax.numpy as jnp

    from nenbody_tpu.cli import _policy_advance
    from nenbody_tpu.config import SimConfig, VisionConfig
    from nenbody_tpu.rl.policy import GRUPolicy
    from nenbody_tpu.state import spawn
    from nenbody_tpu.utils import checkpoint as ck

    cfg = SimConfig(n=8, controller="gravity", vision=VisionConfig(width=16))
    pol = GRUPolicy()
    params = pol.init(
        jax.random.key(0), pol.initial_carry((1,)),
        jnp.zeros((1, cfg.vision.width + 2), jnp.float32),
    )
    # shrink the mean head: untrained means rail against the env's
    # max_accel clip, which would mask carry-dependent action differences
    head = params["params"]["Dense_1"]
    head["kernel"] = head["kernel"] * 1e-3
    head["bias"] = head["bias"] * 1e-3
    path = str(tmp_path / "gru.npz")
    ck.save_pytree(path, params)
    advance = _policy_advance(cfg, path, "gru")
    st = spawn(jax.random.key(1), cfg)
    s1 = advance(st, 2)
    s2 = advance(st, 2)  # same input state, but the carry moved on
    assert int(np.asarray(s1.t)) == int(np.asarray(s2.t))
    # the scaled-down head makes action (hence position) differences small
    # but real; allclose's rtol vs ~100-magnitude positions would hide them
    diff = np.abs(np.asarray(s1.pos) - np.asarray(s2.pos)).max()
    assert diff > 1e-7, f"carry did not thread across advance calls ({diff=})"


def test_eval_cli(capsys, trained):
    """eval: deterministic policy metrics as one JSON line; the zero-action
    baseline runs without --policy."""
    params = trained["params"]
    capsys.readouterr()
    rc = main([
        "eval", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "4", "--policy", params, "--reward-mode", "difference",
    ])
    assert rc == 0
    m = json.loads([l for l in capsys.readouterr().out.splitlines()
                    if l.startswith("{")][-1])
    assert np.isfinite(m["reward_mean"]) and m["horizon"] == 4
    assert m["reward_mode"] == "difference"
    # --mesh 2x2: envs over data + the agent ring; must agree with the
    # single-device rollout at fp32 tolerances (same spawns, same policy)
    rc = main([
        "eval", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "4", "--policy", params, "--reward-mode", "difference",
        "--mesh", "2x2",
    ])
    assert rc == 0
    m_mesh = json.loads([l for l in capsys.readouterr().out.splitlines()
                         if l.startswith("{")][-1])
    assert m_mesh["reward_mean"] == pytest.approx(m["reward_mean"], rel=1e-4)
    rc = main([
        "eval", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "2",
    ])
    assert rc == 0


def test_train_checkpoint_resume(tmp_path, capsys, monkeypatch, trained):
    """train --checkpoint saves the FULL train state; --resume restores it
    (params + optimizer + PRNG key) and continues — §5.4 for training."""
    ckpt = trained["ckpt"]
    base = [
        "train", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "2",
    ]
    # resume AND pin the periodic in-loop save: every-1 over 2 iters must
    # write the checkpoint at i=0, i=1, and the unconditional final save
    # (the `trained` fixture only exercises the final save — its
    # checkpoint-every 50 never fires in-loop)
    import nenbody_tpu.utils.checkpoint as ckmod

    saves = []
    orig_save = ckmod.save_pytree
    monkeypatch.setattr(
        ckmod, "save_pytree",
        lambda path, tree: (saves.append(path), orig_save(path, tree))[1],
    )
    ck2 = str(tmp_path / "ck2.npz")
    rc = main(base + [
        "--iters", "2", "--resume", ckpt,
        "--checkpoint", ck2, "--checkpoint-every", "1",
    ])
    assert rc == 0
    assert saves.count(ck2) == 3, f"periodic save regressed: {saves}"
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert np.isfinite(lines[-1]["loss"])
    capsys.readouterr()
    rc = main(base + ["--iters", "1", "--resume", str(tmp_path / "no.npz")])
    assert rc == 2 and "not found" in capsys.readouterr().err


def test_run_policy_record_replay(tmp_path, capsys, trained):
    """run --policy records a trained-policy trajectory (.nentraj) that
    replay re-renders — the train -> run -> replay loop, all CLI."""
    params = trained["params"]
    traj = str(tmp_path / "run.nentraj")
    rc = main([
        "run", "--n", "8", "--controller", "gravity", "--vision-width", "16",
        "--steps", "4", "--log-every", "1", "--record", traj,
        "--policy", params,
    ])
    assert rc == 0
    if not os.path.exists(traj):
        # cmd_run warns and ignores --record when the native recorder is
        # unavailable — same environment test_replay_cli skips on
        pytest.skip("libnenhost.so not built")
    capsys.readouterr()
    out = str(tmp_path / "r.gif")
    rc = main(["replay", traj, "--out", out])
    assert rc == 0 and os.path.exists(out)


def test_bc_cli_from_datagen_shards(tmp_path, capsys):
    """datagen -> bc --data -> eval --policy: the offline pipeline, all
    CLI-driven; the bc save loads back like any other params npz."""
    ds = str(tmp_path / "ds")
    rc = main([
        "datagen", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--steps", "4", "--horizon", "2", "--out-dir", ds,
    ])
    assert rc == 0
    capsys.readouterr()
    params = str(tmp_path / "bc.npz")
    rc = main([
        "bc", "--data", ds, "--agents", "8", "--vision-width", "16",
        "--steps", "5", "--batch-size", "64", "--save", params,
    ])
    assert rc == 0
    m = json.loads([l for l in capsys.readouterr().out.splitlines()
                    if l.startswith("{")][-1])
    assert np.isfinite(m["bc_loss"])
    rc = main([
        "eval", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "2", "--policy", params,
    ])
    assert rc == 0
    capsys.readouterr()
    # exactly one source must be given
    rc = main(["bc", "--agents", "8", "--vision-width", "16"])
    assert rc == 2 and "exactly one" in capsys.readouterr().err


def test_train_cli_mesh(capsys):
    """--mesh 2x2 runs the REINFORCE step on a (data, agents) device mesh
    (envs over data, the agent-axis ppermute ring inside the rollout) —
    the multi-chip path, CLI-driven, on the 8 virtual CPU devices."""
    rc = main([
        "train", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "2", "--iters", "1", "--mesh", "2x2",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines()
             if l.startswith("{")]
    assert np.isfinite(lines[-1]["loss"])
    # malformed / oversized specs error cleanly
    rc = main([
        "train", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "2", "--iters", "1", "--mesh", "3z",
    ])
    assert rc == 2 and "DATAxAGENTS" in capsys.readouterr().err
    rc = main([
        "train", "--envs", "2", "--agents", "8", "--vision-width", "16",
        "--horizon", "2", "--iters", "1", "--mesh", "64x64",
    ])
    assert rc == 2 and "devices" in capsys.readouterr().err
    # env batch not divisible by the data axis: clean rc-2 error BEFORE any
    # jit trace (previously a raw ValueError traceback from inside the jit)
    rc = main([
        "train", "--envs", "3", "--agents", "8", "--vision-width", "16",
        "--horizon", "2", "--iters", "1", "--mesh", "2x2",
    ])
    assert rc == 2 and "divide evenly" in capsys.readouterr().err
    rc = main([
        "eval", "--envs", "3", "--agents", "8", "--vision-width", "16",
        "--horizon", "2", "--mesh", "2x2",
    ])
    assert rc == 2 and "divide evenly" in capsys.readouterr().err
    # ppo mesh minibatch-scheme validation also reports cleanly (was a raw
    # ValueError traceback from make_ppo_step)
    rc = main([
        "train", "--algo", "ppo", "--envs", "2", "--agents", "8",
        "--vision-width", "16", "--horizon", "2", "--iters", "1",
        "--mesh", "2x2",
    ])
    assert rc == 2 and "time axis" in capsys.readouterr().err


def test_cli_mismatch_and_edge_errors(tmp_path, capsys, trained):
    """The silent-mismatch failure modes error readably (rc 2)."""
    params, ckpt = trained["params"], trained["ckpt"]
    capsys.readouterr()
    # MLP params loaded as --net gru: missing-leaf ValueError, not KeyError
    rc = main([
        "gif", "--n", "8", "--vision-width", "16", "--steps", "2",
        "--stride", "2", "--out", str(tmp_path / "x.gif"),
        "--policy", params, "--net", "gru",
    ])
    err = capsys.readouterr().err
    assert rc == 2 and "net family" in err
    # params trained at width 16 used at width 32: shape ValueError
    rc = main([
        "eval", "--envs", "2", "--agents", "8", "--vision-width", "32",
        "--horizon", "2", "--policy", params,
    ])
    assert rc == 2 and "expected" in capsys.readouterr().err
    # resume written at --envs 2, resumed at --envs 4: rc 2 with guidance
    rc = main([
        "train", "--envs", "4", "--agents", "8", "--vision-width", "16",
        "--horizon", "2", "--iters", "1", "--resume", ckpt,
    ])
    assert rc == 2 and "--envs" in capsys.readouterr().err
    # constructor-level env errors are clean too
    rc = main([
        "eval", "--envs", "2", "--agents", "1", "--vision-width", "16",
        "--horizon", "2", "--reward-mode", "difference",
    ])
    assert rc == 2 and "n >= 2" in capsys.readouterr().err


def test_train_cli_apg(capsys):
    rc = main([
        "train", "--algo", "apg", "--envs", "2", "--agents", "8",
        "--vision-width", "16", "--horizon", "2", "--iters", "2",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == 2 and np.isfinite(lines[-1]["loss"])


def test_device_trace_writes_profile(tmp_path, monkeypatch):
    from nenbody_tpu.utils.profiling import device_trace
    import jax.numpy as jnp
    import jax as _jax

    monkeypatch.setenv("NENBODY_TRACE", str(tmp_path / "trace"))
    with device_trace():
        _jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert any((tmp_path / "trace").rglob("*"))


def test_preset_flag_overrides(capsys):
    """Explicit flags override preset fields (was: silently dropped)."""
    rc = main([
        "run", "--preset", "boids-4096", "--n", "64", "--vision-width", "16",
        "--steps", "20", "--log-every", "20",
    ])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert lines[-1]["n"] == 64  # not the preset's 4096


def test_build_cfg_sprite_mode():
    from nenbody_tpu.cli import _build_cfg, _add_sim_flags
    import argparse

    p = argparse.ArgumentParser()
    _add_sim_flags(p)
    # plain flags
    cfg = _build_cfg(p.parse_args(
        ["--n", "16", "--vision-width", "32", "--sprite-mode", "wireframe"]
    ))
    assert cfg.vision.sprite_mode == "wireframe"
    # overrides a preset's vision without touching its width
    cfg = _build_cfg(p.parse_args(
        ["--preset", "gravity-vision-1024", "--sprite-mode", "wireframe"]
    ))
    assert cfg.vision.sprite_mode == "wireframe"
    assert cfg.vision.width == 64
    # default stays disc
    cfg = _build_cfg(p.parse_args(["--n", "16", "--vision-width", "32"]))
    assert cfg.vision.sprite_mode == "disc"


def test_train_family_vision_flags(capsys):
    """--sprite-mode/--antialias reach _train_env on every train-family
    subcommand (plumbing only — the batched wireframe observe itself is
    pinned in test_rl.py; a real wireframe train here would re-compile the
    kernel graph for no extra coverage)."""
    from nenbody_tpu.cli import _train_env
    import argparse
    import sys as _sys

    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd")
    # mirror the registration: every _train_env consumer gets the flags
    from nenbody_tpu.cli import _add_train_vision_flags

    for name in ("train", "eval", "datagen", "bc", "export"):
        p = sub.add_parser(name)
        p.add_argument("--agents", type=int, default=8)
        p.add_argument("--vision-width", type=int, default=16)
        _add_train_vision_flags(p)

    args = ap.parse_args(["train", "--sprite-mode", "wireframe", "--antialias"])
    env = _train_env(args)
    assert env.cfg.vision.sprite_mode == "wireframe"
    assert env.cfg.vision.antialias
    args = ap.parse_args(["eval"])
    assert _train_env(args).cfg.vision.sprite_mode == "disc"

    # the REAL parsers advertise the flags (--help exits 0, no jax work)
    from nenbody_tpu.cli import main as _main
    for name in ("train", "eval", "datagen", "bc", "export"):
        try:
            _main([name, "--help"])
        except SystemExit as e:
            assert e.code == 0
        help_text = capsys.readouterr().out
        assert "--sprite-mode" in help_text, name
        assert "--antialias" in help_text, name
