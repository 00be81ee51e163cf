"""Gaussian MLP policy over per-agent 1D vision observations.

One weight set is shared by all agents (the per-agent forward is a batched
matmul over the agent axis — MXU work, bf16-friendly). Actions are 2D
control accelerations sampled from a diagonal Gaussian with learned state-
independent log-std, the standard continuous-control REINFORCE setup.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class MLPPolicy(nn.Module):
    hidden: Sequence[int] = (128, 128)
    act_dim: int = 2
    # compute-heavy layers in bf16 on the MXU, params + logits in fp32
    use_bf16: bool = True

    @nn.compact
    def __call__(self, obs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """obs: [..., W] -> (mean [..., act_dim], log_std [act_dim])."""
        x = obs
        if self.use_bf16:
            x = x.astype(jnp.bfloat16)
        dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        for h in self.hidden:
            x = nn.Dense(h, dtype=dtype)(x)
            x = nn.tanh(x)
        mean = nn.Dense(self.act_dim, dtype=jnp.float32)(x.astype(jnp.float32))
        log_std = self.param(
            "log_std", nn.initializers.constant(-1.0), (self.act_dim,)
        )
        return mean, log_std


class ValueMLP(nn.Module):
    """Per-agent state-value head V(obs) for baseline/critic trainers."""

    hidden: Sequence[int] = (128, 128)
    use_bf16: bool = True

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        """obs: [..., W] -> V [...]."""
        x = obs
        dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        if self.use_bf16:
            x = x.astype(jnp.bfloat16)
        for h in self.hidden:
            x = nn.Dense(h, dtype=dtype)(x)
            x = nn.tanh(x)
        v = nn.Dense(1, dtype=jnp.float32)(x.astype(jnp.float32))
        return v[..., 0]


class CentralValueMLP(nn.Module):
    """Centralized critic V(s) over ALL agents' observations (the MAPPO
    baseline for shared/team rewards): per-agent embedding -> mean pool
    over the agent axis (permutation-invariant, any N) -> value head. The
    output broadcasts back over agents, so it drops in anywhere ValueMLP
    fits — but inputs must KEEP the [..., N, W] agent axis (PPO's
    central_critic flag preserves it through minibatching)."""

    embed: Sequence[int] = (128,)
    head: Sequence[int] = (128,)
    use_bf16: bool = True

    @nn.compact
    def __call__(self, obs: jax.Array) -> jax.Array:
        """obs: [..., N, W] -> V [..., N] (same value for every agent)."""
        x = obs
        dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        if self.use_bf16:
            x = x.astype(jnp.bfloat16)
        for h in self.embed:
            x = nn.Dense(h, dtype=dtype)(x)
            x = nn.tanh(x)
        g = jnp.mean(x, axis=-2)  # pool the agent axis
        for h in self.head:
            g = nn.Dense(h, dtype=dtype)(g)
            g = nn.tanh(g)
        v = nn.Dense(1, dtype=jnp.float32)(g.astype(jnp.float32))[..., 0]
        return jnp.broadcast_to(v[..., None], obs.shape[:-1])


def value_init_obs(value_net, n: int, obs_width: int) -> jax.Array:
    """Zeros probe with the input rank `value_net` expects: CentralValueMLP
    pools an agent axis ([1, N, W]); per-agent heads take flat rows
    ([1, W]). Shared by the PPO/AC inits — flax params depend on shapes
    only, so zeros are exact."""
    if isinstance(value_net, CentralValueMLP):
        return jnp.zeros((1, n, obs_width), jnp.float32)
    return jnp.zeros((1, obs_width), jnp.float32)


class ConvPolicy(nn.Module):
    """1D-conv Gaussian policy over the eye line.

    The observation's leading W entries are a 1D image (the reference
    renders them as one — a 1024x1 texture row per agent,
    src/main.rs:693-704): a target's screen column shifts with relative
    bearing, so translation-equivariant features are the right prior,
    which an MLP must relearn per pixel. On TPU `lax.conv_general_dilated`
    lowers onto the MXU, so the conv stack is bf16 matmul work exactly like
    MLPPolicy's Dense layers. The trailing ego features (obs[..., W:], the
    raw velocity) carry no spatial structure and skip the convs, joining at
    the head.

    Drop-in for MLPPolicy — `apply(params, obs) -> (mean, log_std)` — so it
    slots into REINFORCE/AC/PPO/ES/BC unchanged via
    `policy=ConvPolicy(vision_width=cfg.vision.width)`.
    """

    vision_width: int
    channels: Sequence[int] = (16, 32)
    kernel_size: int = 5
    stride: int = 2
    hidden: int = 128
    act_dim: int = 2
    use_bf16: bool = True

    @nn.compact
    def __call__(self, obs: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """obs: [..., W + E] -> (mean [..., act_dim], log_std [act_dim])."""
        w = self.vision_width
        if obs.shape[-1] < w:
            raise ValueError(
                f"obs width {obs.shape[-1]} < vision_width {w}: ConvPolicy "
                f"splits obs[..., :vision_width] as the eye line"
            )
        dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        line, ego = obs[..., :w], obs[..., w:]
        batch_shape = line.shape[:-1]
        # conv needs exactly one batch dim; trainers pass arbitrary leading
        # dims ([B, N] envs x agents, [T*B*N] flattened minibatches, ...)
        x = line.reshape((-1, w, 1)).astype(dtype)
        for ch in self.channels:
            x = nn.Conv(
                ch, (self.kernel_size,), strides=(self.stride,), dtype=dtype
            )(x)
            x = nn.tanh(x)
        x = x.reshape(batch_shape + (x.shape[-2] * x.shape[-1],))
        x = jnp.concatenate([x, ego.astype(dtype)], axis=-1)
        x = nn.tanh(nn.Dense(self.hidden, dtype=dtype)(x))
        mean = nn.Dense(self.act_dim, dtype=jnp.float32)(x.astype(jnp.float32))
        log_std = self.param(
            "log_std", nn.initializers.constant(-1.0), (self.act_dim,)
        )
        return mean, log_std


class GRUPolicy(nn.Module):
    """Recurrent Gaussian policy: Dense encoder -> GRU -> action head.

    The 1D eye line (the reference's per-agent vision texture,
    src/main.rs:693-704) is a PARTIAL observation — an agent cannot see
    behind itself and depth cues are monocular — so a scan-carried GRU
    hidden state lets the policy integrate evidence across steps. The
    encoder matmul runs in bf16 on the MXU; the GRU cell and action head
    stay fp32 (the carry accumulates across the whole rollout — bf16
    round-off compounds there).

    Apply signature differs from MLPPolicy:
        carry', (mean, log_std) = apply(params, carry, obs)
    with carry from `initial_carry(batch_shape)`. Use
    rl.train.make_recurrent_train_step / init_recurrent_train_state.
    """

    hidden: int = 128
    act_dim: int = 2
    use_bf16: bool = True

    @nn.compact
    def __call__(
        self, carry: jax.Array, obs: jax.Array
    ) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
        """(carry [..., hidden], obs [..., W]) ->
        (carry', (mean [..., act_dim], log_std [act_dim]))."""
        dtype = jnp.bfloat16 if self.use_bf16 else jnp.float32
        x = obs.astype(dtype)
        x = nn.tanh(nn.Dense(self.hidden, dtype=dtype)(x))
        carry, y = nn.GRUCell(self.hidden, dtype=jnp.float32)(
            carry, x.astype(jnp.float32)
        )
        mean = nn.Dense(self.act_dim, dtype=jnp.float32)(y)
        log_std = self.param(
            "log_std", nn.initializers.constant(-1.0), (self.act_dim,)
        )
        return carry, (mean, log_std)

    def initial_carry(self, batch_shape: Sequence[int]) -> jax.Array:
        """Zero hidden state, shape [*batch_shape, hidden]."""
        return jnp.zeros((*batch_shape, self.hidden), jnp.float32)


def sample_action(params, apply_fn, obs, key):
    """Sample a[..., 2] ~ N(mean, exp(log_std)); returns (action, log_prob)."""
    mean, log_std = apply_fn(params, obs)
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape, dtype=mean.dtype)
    action = mean + std * eps
    logp = gaussian_log_prob(action, mean, log_std)
    return action, logp


def gaussian_log_prob(action, mean, log_std):
    """Sum over the action dim: [..., act_dim] -> [...]."""
    std = jnp.exp(log_std)
    z = (action - mean) / std
    return jnp.sum(-0.5 * z * z - log_std - 0.5 * jnp.log(2 * jnp.pi), axis=-1)
