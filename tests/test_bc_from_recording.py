"""Recording -> demonstrations -> behavior cloning (VERDICT r1 #10).

A scripted expert drives the actuated gravity world; the host records only
(t, pos, vel) through the native .nentraj recorder (the CLI's --record
stream). rl.bc.dataset_from_trajectory must (a) recover the expert's
actuated actions EXACTLY by inverse dynamics and (b) feed bc.fit well
enough that the cloned policy reproduces the expert's actions. (a) is the
fast-tier test; the end-to-end clone (b) sits in the slow tier — bc.fit's
learning behavior itself is pinned fast by
test_rl.test_behavior_cloning_recovers_policy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nenbody_tpu.config import SimConfig, VisionConfig
from nenbody_tpu.rl import bc
from nenbody_tpu.rl.env import VisionEnv
from nenbody_tpu.rl.policy import MLPPolicy
from nenbody_tpu.utils import native


@pytest.fixture(scope="module")
def native_lib():
    if not native.available() and not native.build():
        pytest.skip("native runtime unavailable")
    return native


def _expert(env, params, apply_fn):
    def act(obs):
        mean, _ = apply_fn(params, obs)
        return env.actuate(0.5 * jnp.tanh(mean))  # bounded, deterministic

    return act


def _record_expert(tmp_path, native_lib, steps=16):
    """Drive the expert, record (t, pos, vel) via the native recorder, and
    return (env, path, true actuated actions)."""
    env = VisionEnv(
        SimConfig(n=12, controller="gravity", vision=VisionConfig(width=16)),
        max_accel=0.3,
    )
    policy = MLPPolicy(use_bf16=False)
    kp, ks = jax.random.split(jax.random.key(0))
    params = policy.init(kp, jnp.zeros((1, env.obs_width), jnp.float32))
    expert = _expert(env, params, policy.apply)

    from nenbody_tpu.state import spawn

    state = spawn(ks, env.cfg)
    path = str(tmp_path / "expert.nentraj")
    rec = native_lib.TrajectoryRecorder(path, env.cfg.n)
    true_actions = []
    rec.append(0, np.asarray(state.pos), np.asarray(state.vel))
    for t in range(1, steps + 1):
        obs = env.observe(state)
        a = expert(obs)
        true_actions.append(np.asarray(a))
        state = env.dynamics(state, a)
        rec.append(t, np.asarray(state.pos), np.asarray(state.vel))
    rec.close()
    return env, path, true_actions


def test_inverse_dynamics_recovers_actions(tmp_path, native_lib):
    env, path, true_actions = _record_expert(tmp_path, native_lib)
    data = bc.dataset_from_trajectory(path, env)
    assert data["obs"].shape == (16, 1, 12, env.obs_width)
    assert data["action"].shape == (16, 1, 12, 2)
    # inverse dynamics recovers the expert's actuated actions exactly
    np.testing.assert_allclose(
        data["action"][:, 0], np.stack(true_actions), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_bc_from_nentraj_recording(tmp_path, native_lib):
    """End-to-end: the cloned policy reproduces the expert on the recorded
    demonstrations (slow tier: bc.fit's compile dominates; its learning is
    pinned fast by test_rl.test_behavior_cloning_recovers_policy and the
    recording->dataset contract by test_inverse_dynamics_recovers_actions)."""
    env, path, _ = _record_expert(tmp_path, native_lib, steps=40)
    data = bc.dataset_from_trajectory(path, env)
    params_bc, apply_bc, loss = bc.fit(
        env, data, jax.random.key(1), steps=300, batch_size=256, lr=3e-3,
        policy=MLPPolicy(use_bf16=False),
    )
    obs_f, act_f = bc.flatten_dataset(data)
    mean, _ = apply_bc(params_bc, jnp.asarray(obs_f))
    mse = float(jnp.mean((mean - jnp.asarray(act_f)) ** 2))
    var = float(np.var(act_f))
    assert mse < 0.35 * var, f"clone mse {mse:.5f} vs action var {var:.5f}"


def test_dataset_rejects_strided_recordings(tmp_path, native_lib):
    env = VisionEnv(
        SimConfig(n=4, controller="gravity", vision=VisionConfig(width=8))
    )
    path = str(tmp_path / "strided.nentraj")
    rec = native_lib.TrajectoryRecorder(path, 4)
    z = np.zeros((4, 2), np.float32)
    for t in (0, 5, 10):  # stride-5 recording: inverse dynamics ill-posed
        rec.append(t, z, z)
    rec.close()
    with pytest.raises(ValueError, match="log-every 1"):
        bc.dataset_from_trajectory(path, env)
