"""Recurrent (GRU) policy: carry threading, BPTT reach-back, trainers.

The 1D eye line is a partial observation (agents cannot see behind
themselves — the reference's eye is a forward 90-degree camera,
src/gfx.rs:358-369), so a memory policy is the natural extension of the
reference's "control algorithms on vision" purpose (README.md:4)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nenbody_tpu.config import SimConfig, VisionConfig
from nenbody_tpu.rl import env as env_lib
from nenbody_tpu.rl import policy as policy_lib
from nenbody_tpu.rl import train as train_lib


def _env(n=8, w=16):
    return env_lib.VisionEnv(
        SimConfig(n=n, controller="gravity", vision=VisionConfig(width=w))
    )


def _pol(hidden=16):
    return policy_lib.GRUPolicy(hidden=hidden, use_bf16=False)


def test_gru_policy_shapes_and_carry_threading():
    """Step-by-step application must equal a lax.scan over the same
    sequence — the carry is the only cross-step channel."""
    pol = _pol()
    obs_seq = jax.random.normal(jax.random.key(0), (5, 3, 10))  # [T, B, W]
    h0 = pol.initial_carry((3,))
    params = pol.init(jax.random.key(1), h0, obs_seq[0])

    h = h0
    means = []
    for t in range(5):
        h, (mean, log_std) = pol.apply(params, h, obs_seq[t])
        means.append(mean)
        assert mean.shape == (3, 2)
        assert log_std.shape == (2,)
        assert h.shape == (3, 16)

    def body(h, o):
        h, (m, _) = pol.apply(params, h, o)
        return h, m

    h_s, means_s = jax.lax.scan(body, h0, obs_seq)
    # scan vs loop differ only by XLA fusion/reassociation fp noise
    np.testing.assert_allclose(
        np.asarray(means_s), np.stack(means), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(h_s), np.asarray(h), rtol=1e-5, atol=1e-7
    )


def test_gru_gradient_reaches_back_in_time():
    """The defining property a feedforward policy cannot have: the action
    at step T depends (with nonzero gradient) on the observation at step 0,
    through the carry. An MLPPolicy's same gradient is exactly zero."""
    pol = _pol(hidden=8)
    T, W = 4, 6
    obs_seq = jax.random.normal(jax.random.key(2), (T, W))
    h0 = pol.initial_carry(())
    params = pol.init(jax.random.key(3), h0, obs_seq[0])

    def last_mean(obs0):
        seq = obs_seq.at[0].set(obs0)

        def body(h, o):
            h, (m, _) = pol.apply(params, h, o)
            return h, m

        _, means = jax.lax.scan(body, h0, seq)
        return jnp.sum(means[-1])

    g = jax.grad(last_mean)(obs_seq[0])
    assert float(jnp.max(jnp.abs(g))) > 0.0

    mlp = policy_lib.MLPPolicy(hidden=(8,), use_bf16=False)
    mparams = mlp.init(jax.random.key(4), obs_seq[:1])

    def mlp_last_mean(obs0):
        seq = obs_seq.at[0].set(obs0)
        mean, _ = mlp.apply(mparams, seq)
        return jnp.sum(mean[-1])

    gm = jax.grad(mlp_last_mean)(obs_seq[0])
    np.testing.assert_array_equal(np.asarray(gm), 0.0)


def test_recurrent_train_step_runs_and_updates_params():
    env = _env(n=8, w=16)
    opt = optax.adam(1e-3)
    ts, _, pol = train_lib.init_recurrent_train_state(
        env, num_envs=4, key=jax.random.key(0), optimizer=opt, policy=_pol()
    )
    step = jax.jit(train_lib.make_recurrent_train_step(env, pol, opt, horizon=3))
    ts2, metrics = step(ts)
    assert np.isfinite(float(metrics["loss"]))
    leaves0 = jax.tree.leaves(ts.params)
    leaves1 = jax.tree.leaves(ts2.params)
    assert any(
        float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(leaves0, leaves1)
    )
    # GRU recurrence params must receive gradient signal too
    k0 = ts.params["params"]["GRUCell_0"]
    k1 = ts2.params["params"]["GRUCell_0"]
    assert any(
        float(jnp.max(jnp.abs(a - b))) > 0
        for a, b in zip(jax.tree.leaves(k0), jax.tree.leaves(k1))
    )


def test_recurrent_train_step_on_mesh():
    """Same (data=2, agents=4) mesh contract as make_train_step: envs DP,
    agents over the ppermute ring, replicated GRU params."""
    from nenbody_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.make_mesh({"data": 2, "agents": 4})
    env = _env(n=8, w=16)
    opt = optax.adam(1e-3)
    ts, _, pol = train_lib.init_recurrent_train_state(
        env, num_envs=4, key=jax.random.key(0), optimizer=opt,
        policy=_pol(), mesh=mesh,
    )
    step = jax.jit(
        train_lib.make_recurrent_train_step(env, pol, opt, horizon=2, mesh=mesh)
    )
    ts2, metrics = step(ts)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["reward_mean"]))
    leaves0 = jax.tree.leaves(ts.params)
    leaves1 = jax.tree.leaves(ts2.params)
    assert any(
        float(jnp.max(jnp.abs(a - b))) > 0 for a, b in zip(leaves0, leaves1)
    )


def test_recurrent_cli(capsys):
    import json

    from nenbody_tpu.cli import main

    rc = main([
        "train", "--algo", "reinforce-gru", "--envs", "2", "--agents", "8",
        "--vision-width", "16", "--horizon", "2", "--iters", "2",
    ])
    assert rc == 0
    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert len(lines) == 2 and np.isfinite(lines[-1]["loss"])


@pytest.mark.slow
def test_recurrent_reinforce_learns_brake_task():
    """Estimator correctness through the recurrence: on the single-agent
    brake task (reward = -0.5|v|^2) the GRU policy must improve, same pin
    as the feedforward REINFORCE brake test (tests/test_rl.py)."""
    env = env_lib.VisionEnv(
        SimConfig(n=1, controller="gravity", vision=VisionConfig(width=8)),
        max_accel=1.0,
        speed_penalty=0.5,
    )
    opt = optax.adam(3e-3)
    ts, _, pol = train_lib.init_recurrent_train_state(
        env, num_envs=128, key=jax.random.key(0), optimizer=opt,
        policy=policy_lib.GRUPolicy(hidden=32, use_bf16=False),
    )
    step = jax.jit(train_lib.make_recurrent_train_step(env, pol, opt, horizon=8))
    _, m0 = step(ts)
    for _ in range(150):
        ts, m = step(ts)
    assert float(m["reward_mean"]) > float(m0["reward_mean"]) + 1e-3
    assert float(m["reward_mean"]) > -2e-3
