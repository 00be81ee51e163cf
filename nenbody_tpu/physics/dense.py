"""Dense O(N^2) jnp physics — the reference-semantics oracle.

These are pure functions `state -> state` implementing exactly the update
rules of the reference controllers (src/main.rs:381-526), vectorized over the
agent axis instead of rayon `par_iter_mut`. The reference's explicit
`old_positions`/`old_velocities` double buffer (src/main.rs:414-416, 458-460)
is unnecessary here: every update reads only the input state, so order
independence holds by construction.

The dense path materializes the full [N, N] interaction tensors; it is the
forever-oracle for the tiled Pallas kernels (nenbody_tpu/ops) and the ring
backend (nenbody_tpu/parallel), and is itself fast enough to N~8k on one
chip. All math is float32, matching the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import BoidsConfig, GravityConfig, RandomWalkConfig, SimConfig
from ..state import SceneState


def gravity_forces(pos: jax.Array, cfg: GravityConfig) -> jax.Array:
    """Per-agent accumulated gravity, reference force law (src/main.rs:425-432).

    g_i = sum_j (x_j - x_i) * g / (|x_j - x_i|^2 + bias), self-pair included
    (zero numerator; `bias` keeps the denominator finite). Note this is a
    1/r law — the denominator is the SQUARED distance plus an additive
    softening, not the r^3 Plummer form.

    pos: [..., N, 2] -> [..., N, 2]
    """
    diff = pos[..., None, :, :] - pos[..., :, None, :]  # [..., i, j, 2]
    d2 = jnp.sum(diff * diff, axis=-1) + cfg.bias  # [..., i, j]
    return cfg.g * jnp.sum(diff / d2[..., None], axis=-2)


def gravity_step(state: SceneState, cfg: SimConfig) -> SceneState:
    """Semi-implicit Euler with the reference's quirk: dt applies to the
    velocity update only; the position integrates one full velocity per step
    (src/main.rs:434-436)."""
    g = gravity_forces(state.pos, cfg.gravity)
    vel = state.vel + g * cfg.gravity.dt
    pos = state.pos + vel
    return state.replace(pos=pos, vel=vel, t=state.t + 1)


def boids_accels(
    pos: jax.Array, vel: jax.Array, cfg: BoidsConfig
) -> jax.Array:
    """The three flocking rules, reference semantics (src/main.rs:465-514).

    Returns the REPLACEMENT velocity (the reference overwrites v rather than
    accumulating, src/main.rs:514), before the speed clamp.

    pos, vel: [..., N, 2] -> new_vel [..., N, 2]
    """
    n = pos.shape[-2]
    eye = jnp.eye(n, dtype=bool)
    not_self = ~eye

    diff = pos[..., None, :, :] - pos[..., :, None, :]  # x_j - x_i, [..., i, j, 2]
    d2 = jnp.sum(diff * diff, axis=-1)  # [..., i, j]

    # Rule 1 — cohesion: mean position of neighbors with d^2 < threshold
    # (squared-distance threshold, src/main.rs:474; raw mean position, not
    # an offset from x_i, src/main.rs:514 uses flock_center directly).
    m1 = (d2 < cfg.cohesion_dist_sq) & not_self
    cnt1 = jnp.sum(m1, axis=-1).astype(pos.dtype)  # [..., i]
    sum1 = jnp.sum(
        jnp.where(m1[..., None], pos[..., None, :, :], 0.0), axis=-2
    )  # [..., i, 2]
    center = jnp.where(cnt1[..., None] > 0, sum1 / jnp.maximum(cnt1, 1.0)[..., None], sum1)

    # Rule 2 — separation: -sum (x_j - x_i) for d < threshold (UNsquared
    # distance threshold, src/main.rs:485; compare d^2 < thr^2 instead —
    # exactly equivalent for non-negative d and threshold).
    m2 = (d2 < cfg.separation_dist * cfg.separation_dist) & not_self
    repel = -jnp.sum(jnp.where(m2[..., None], diff, 0.0), axis=-2)

    # Rule 3 — alignment: mean v_j for |v_j - v_i| < threshold, measured in
    # VELOCITY space (src/main.rs:497).
    vdiff = vel[..., None, :, :] - vel[..., :, None, :]
    vd2 = jnp.sum(vdiff * vdiff, axis=-1)
    m3 = (vd2 < cfg.alignment_dist * cfg.alignment_dist) & not_self
    cnt3 = jnp.sum(m3, axis=-1).astype(vel.dtype)
    sum3 = jnp.sum(
        jnp.where(m3[..., None], vel[..., None, :, :], 0.0), axis=-2
    )
    vmatch = jnp.where(cnt3[..., None] > 0, sum3 / jnp.maximum(cnt3, 1.0)[..., None], sum3)

    return (
        center * cfg.cohesion_scale
        + repel * cfg.separation_scale
        + vmatch * cfg.alignment_scale
    )


def clamp_speed(vel: jax.Array, max_speed: float) -> jax.Array:
    """`normalize_to(max_speed)` when |v| exceeds it (src/main.rs:516-518)."""
    mag = jnp.sqrt(jnp.sum(vel * vel, axis=-1, keepdims=True))
    scale = jnp.where(mag > max_speed, max_speed / jnp.maximum(mag, 1e-30), 1.0)
    return vel * scale


def boids_step(state: SceneState, cfg: SimConfig) -> SceneState:
    """Flocking step: replace velocity, clamp speed, x += v * dt
    (src/main.rs:514-523 — note boids DOES apply dt to position, unlike
    gravity)."""
    new_vel = boids_accels(state.pos, state.vel, cfg.boids)
    new_vel = clamp_speed(new_vel, cfg.boids.max_speed)
    pos = state.pos + new_vel * cfg.boids.dt
    return state.replace(pos=pos, vel=new_vel, t=state.t + 1)


def random_step(state: SceneState, cfg: SimConfig) -> SceneState:
    """Random walk: v += U(-accel, accel) per axis; x += v
    (src/main.rs:381-402). Seeded from the state's PRNG key rather than the
    reference's unseeded thread_rng."""
    key, sub = jax.random.split(state.key)
    kick = jax.random.uniform(
        sub,
        state.vel.shape,
        dtype=state.vel.dtype,
        minval=-cfg.random_walk.accel,
        maxval=cfg.random_walk.accel,
    )
    vel = state.vel + kick
    pos = state.pos + vel
    return state.replace(pos=pos, vel=vel, key=key, t=state.t + 1)


STEPPERS = {
    "gravity": gravity_step,
    "boids": boids_step,
    "random": random_step,
}
