"""On-device distillation (rl.bc.distill): teacher -> student with no host
export between generation and training (NEXT #8 device-resident shards)."""

import jax
import jax.numpy as jnp
import numpy as np

from nenbody_tpu.config import SimConfig, VisionConfig
from nenbody_tpu.rl import scripted
from nenbody_tpu.rl.bc import distill
from nenbody_tpu.rl.env import VisionEnv
from nenbody_tpu.rl.policy import MLPPolicy


def _tiny_env():
    cfg = SimConfig(
        n=8,
        controller="gravity",
        backend="dense",
        vision=VisionConfig(width=16, far=300.0),
    )
    return VisionEnv(cfg)


def test_distill_learns_teacher():
    env = _tiny_env()
    teacher = lambda obs: scripted.seek_brightest(obs, gain=0.8)
    params, apply_fn, losses = distill(
        env,
        teacher,
        jax.random.key(0),
        iters=16,
        num_envs=4,
        horizon=4,
        bc_steps_per_iter=32,
        batch_size=256,
        lr=3e-3,
        policy=MLPPolicy(hidden=(32, 32)),
    )
    assert losses.shape == (16 * 32,)
    # the log-density objective must actually improve over the run
    first, last = losses[:32].mean(), losses[-32:].mean()
    assert last < first - 1.0, (first, last)

    # student mean should track the teacher on fresh states
    from nenbody_tpu.state import spawn_batch

    states = spawn_batch(jax.random.key(9), env.cfg, 4)
    obs = jax.vmap(env.observe)(states)
    flat = obs.reshape(-1, env.obs_width)
    want = np.asarray(teacher(flat))
    got = np.asarray(apply_fn(params, flat)[0])
    # the ego-frame rotation inside the teacher is hard for a tiny MLP;
    # this is a smoke test of the device-resident pipeline (learning beats
    # the zero predictor decisively), not a capacity benchmark
    resid = np.mean((got - want) ** 2)
    base = np.mean(want**2)
    assert resid < 0.7 * base, (resid, base)


def test_distill_persistent_envs_run():
    env = _tiny_env()
    teacher = lambda obs: scripted.avoid_crowding(obs)
    params, apply_fn, losses = distill(
        env,
        teacher,
        jax.random.key(1),
        iters=2,
        num_envs=2,
        horizon=3,
        bc_steps_per_iter=4,
        batch_size=64,
        policy=MLPPolicy(hidden=(16,)),
        episodic=False,
    )
    assert losses.shape == (8,)
    assert np.isfinite(losses).all()


def test_distill_on_mesh():
    """distill(mesh=...): the fused generate+clone program on a (data,
    agents) mesh — sharded rollouts, time-row BC minibatches. Losses
    finite and improving (same teacher class as the single-device pin)."""
    from nenbody_tpu.parallel import mesh as mesh_lib

    env = _tiny_env()
    mesh = mesh_lib.make_mesh({"data": 2, "agents": 4})
    teacher = lambda obs: scripted.seek_brightest(obs, gain=0.8)
    params, apply_fn, losses = distill(
        env, teacher, jax.random.key(2),
        iters=4, num_envs=2, horizon=4, bc_steps_per_iter=8,
        batch_size=128, lr=3e-3, policy=MLPPolicy(hidden=(16,), use_bf16=False),
        mesh=mesh,
    )
    assert losses.shape == (4 * 8,)
    assert np.isfinite(losses).all()
    first, last = losses[:8].mean(), losses[-8:].mean()
    assert last < first, (first, last)


def test_fit_streaming_device_shards():
    """BC from the DATAGEN collector's device-resident shards
    (rl.bc.fit_streaming, VERDICT r2 #9): the behavior policy is a
    near-deterministic scripted teacher wrapped as a Gaussian apply_fn;
    shards never touch the host and the BC objective must improve."""
    from nenbody_tpu.rl.bc import fit_streaming

    env = _tiny_env()

    def behavior_apply(params, obs):
        mean = scripted.seek_brightest(obs, gain=0.8)
        return mean, jnp.full_like(mean, -4.0)  # tiny exploration noise

    params, apply_fn, losses = fit_streaming(
        env,
        jax.random.key(1),
        total_steps=64,
        num_envs=4,
        horizon=8,
        behavior_params=None,
        behavior_apply=behavior_apply,
        bc_steps_per_shard=32,
        batch_size=256,
        lr=3e-3,
        policy=MLPPolicy(hidden=(32, 32)),
    )
    assert losses.shape == (8 * 32,)
    first, last = losses[:32].mean(), losses[-32:].mean()
    assert last < first - 1.0, (first, last)
