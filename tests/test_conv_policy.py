"""ConvPolicy — 1D convs over the eye line (the reference's observation IS
a 1D image: one 1024x1 texture row per agent, src/main.rs:693-704, so a
translation-equivariant net is the natural function family for it)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nenbody_tpu import SimConfig, VisionConfig
from nenbody_tpu.rl import policy as policy_lib
from nenbody_tpu.rl import train as train_lib
from nenbody_tpu.rl.env import VisionEnv

W = 16


def _pol():
    return policy_lib.ConvPolicy(
        vision_width=W, channels=(4, 8), hidden=16, use_bf16=False
    )


def test_conv_policy_batch_dims_agree():
    """Arbitrary leading batch dims (the trainers pass [B,N,*] rollouts and
    [T*B*N,*] flat minibatches) must produce the same per-row outputs as the
    flattened call — pins the conv's reshape plumbing."""
    pol = _pol()
    obs = jax.random.normal(jax.random.key(0), (3, 5, W + 2))
    params = pol.init(jax.random.key(1), obs[:1, :1])
    mean_b, ls_b = pol.apply(params, obs)
    mean_f, ls_f = pol.apply(params, obs.reshape(15, W + 2))
    np.testing.assert_allclose(
        np.asarray(mean_b).reshape(15, 2), np.asarray(mean_f), rtol=1e-6
    )
    # single unbatched row too
    mean_1, _ = pol.apply(params, obs[0, 0])
    np.testing.assert_allclose(np.asarray(mean_1), np.asarray(mean_f[0]),
                               rtol=1e-6)
    assert ls_b.shape == (2,) and np.allclose(ls_b, ls_f)


def test_conv_policy_uses_spatial_structure():
    """Grad flows into the conv kernels, and shifting the eye line shifts
    features (outputs differ across a translation while the ego features
    stay fixed) — i.e. the line actually routes through the convs."""
    pol = _pol()
    obs = jnp.zeros((1, W + 2)).at[0, 3].set(1.0)
    params = pol.init(jax.random.key(0), obs)

    def loss(p, o):
        mean, _ = pol.apply(p, o)
        return jnp.sum(mean**2)

    g = jax.grad(loss)(params, obs)
    leaves = [np.abs(np.asarray(x)).sum() for x in jax.tree.leaves(g)]
    assert sum(v > 0 for v in leaves) >= len(leaves) - 1  # log_std may be 0
    shifted = jnp.zeros((1, W + 2)).at[0, 9].set(1.0)
    m0, _ = pol.apply(params, obs)
    m1, _ = pol.apply(params, shifted)
    assert not np.allclose(np.asarray(m0), np.asarray(m1))


def test_conv_policy_trains_reinforce():
    env = VisionEnv(
        SimConfig(n=4, controller="gravity", vision=VisionConfig(width=W))
    )
    opt = optax.adam(1e-3)
    ts, apply_fn, _ = train_lib.init_train_state(
        env, num_envs=2, key=jax.random.key(0), optimizer=opt, policy=_pol()
    )
    step = jax.jit(train_lib.make_train_step(env, apply_fn, opt, horizon=2))
    before = jax.tree.leaves(ts.params)[0]
    ts, metrics = step(ts)
    assert np.isfinite(float(metrics["loss"]))
    after = jax.tree.leaves(ts.params)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_conv_cli_rejects_recurrent_combo(capsys):
    from nenbody_tpu.cli import main

    rc = main([
        "train", "--algo", "reinforce-gru", "--net", "conv", "--envs", "2",
        "--agents", "4", "--vision-width", "16", "--horizon", "2",
        "--iters", "1",
    ])
    assert rc == 2
    assert "feedforward" in capsys.readouterr().err
