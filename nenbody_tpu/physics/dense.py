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


def gravity_forces_cross(
    pos_i: jax.Array, pos_j: jax.Array, cfg: GravityConfig
) -> jax.Array:
    """Gravity exerted BY the set pos_j ON the set pos_i (pre-summed).

    The cross-block form is the primitive the multi-chip ring streams remote
    position blocks through (SURVEY.md §5.7). pos_i: [..., N, 2],
    pos_j: [..., M, 2] -> [..., N, 2]. Coincident pairs (including i == j
    when the blocks alias) contribute zero numerator with a bias-softened
    denominator, exactly the reference self-pair behavior.
    """
    diff = pos_j[..., None, :, :] - pos_i[..., :, None, :]  # [..., i, j, 2]
    d2 = jnp.sum(diff * diff, axis=-1) + cfg.bias  # [..., i, j]
    return cfg.g * jnp.sum(diff / d2[..., None], axis=-2)


def gravity_forces(pos: jax.Array, cfg: GravityConfig) -> jax.Array:
    """Per-agent accumulated gravity, reference force law (src/main.rs:425-432).

    g_i = sum_j (x_j - x_i) * g / (|x_j - x_i|^2 + bias), self-pair included
    (zero numerator; `bias` keeps the denominator finite). Note this is a
    1/r law — the denominator is the SQUARED distance plus an additive
    softening, not the r^3 Plummer form.

    pos: [..., N, 2] -> [..., N, 2]
    """
    return gravity_forces_cross(pos, pos, cfg)


def gravity_integrate(state: SceneState, g: jax.Array, cfg: SimConfig) -> SceneState:
    """Shared semi-implicit Euler tail. Reference mode (default): dt applies
    to the velocity update only, the position integrates one full velocity
    per step (src/main.rs:434-436); `dt_on_position=True` is the corrected
    standard integrator."""
    vel = state.vel + g * cfg.gravity.dt
    pos = state.pos + vel * (cfg.gravity.dt if cfg.gravity.dt_on_position else 1.0)
    return state.replace(pos=pos, vel=vel, t=state.t + 1)


def gravity_step(state: SceneState, cfg: SimConfig) -> SceneState:
    return gravity_integrate(state, gravity_forces(state.pos, cfg.gravity), cfg)


def boids_partials_cross(
    pos_i: jax.Array,
    vel_i: jax.Array,
    pos_j: jax.Array,
    vel_j: jax.Array,
    cfg: BoidsConfig,
    exclude_diagonal: bool | jax.Array = True,
):
    """Raw flocking-rule accumulators of the j-set against the i-set.

    Returns a pytree of partial sums — (sum1 [...,N,2], cnt1 [...,N],
    repel [...,N,2], sum3 [...,N,2], cnt3 [...,N]) — which are ADDITIVE
    across j-blocks: the ring backend merges one partial per circulating
    block, then applies `boids_finalize` once. `exclude_diagonal` masks the
    aligned i==j pairs (only correct when pos_j aliases pos_i; the ring sets
    it on the step where a device meets its own block).
    """
    diff = pos_j[..., None, :, :] - pos_i[..., :, None, :]  # [..., i, j, 2]
    d2 = jnp.sum(diff * diff, axis=-1)  # [..., i, j]

    n = pos_i.shape[-2]
    m = pos_j.shape[-2]
    diag = jnp.eye(n, m, dtype=bool)
    not_self = jnp.where(exclude_diagonal, ~diag, True)

    # Rule 1 — cohesion: neighbor positions with d^2 < threshold
    # (squared-distance threshold, src/main.rs:474).
    m1 = (d2 < cfg.cohesion_dist_sq) & not_self
    cnt1 = jnp.sum(m1, axis=-1).astype(pos_i.dtype)
    sum1 = jnp.sum(jnp.where(m1[..., None], pos_j[..., None, :, :], 0.0), axis=-2)

    # Rule 2 — separation: -sum (x_j - x_i) for d < threshold (UNsquared
    # threshold, src/main.rs:485 — compare d^2 < thr^2, equivalent for
    # non-negative d).
    m2 = (d2 < cfg.separation_dist * cfg.separation_dist) & not_self
    repel = -jnp.sum(jnp.where(m2[..., None], diff, 0.0), axis=-2)

    # Rule 3 — alignment: v_j for |v_j - v_i| < threshold, measured in
    # VELOCITY space (src/main.rs:497).
    vdiff = vel_j[..., None, :, :] - vel_i[..., :, None, :]
    vd2 = jnp.sum(vdiff * vdiff, axis=-1)
    m3 = (vd2 < cfg.alignment_dist * cfg.alignment_dist) & not_self
    cnt3 = jnp.sum(m3, axis=-1).astype(vel_i.dtype)
    sum3 = jnp.sum(jnp.where(m3[..., None], vel_j[..., None, :, :], 0.0), axis=-2)

    return sum1, cnt1, repel, sum3, cnt3


def boids_finalize(partials, cfg: BoidsConfig) -> jax.Array:
    """Combine accumulated rule partials into the replacement velocity
    (guarded count divisions src/main.rs:506-512, weighted sum main.rs:514),
    before the speed clamp."""
    sum1, cnt1, repel, sum3, cnt3 = partials
    center = jnp.where(
        cnt1[..., None] > 0, sum1 / jnp.maximum(cnt1, 1.0)[..., None], sum1
    )
    vmatch = jnp.where(
        cnt3[..., None] > 0, sum3 / jnp.maximum(cnt3, 1.0)[..., None], sum3
    )
    return (
        center * cfg.cohesion_scale
        + repel * cfg.separation_scale
        + vmatch * cfg.alignment_scale
    )


def boids_accels(
    pos: jax.Array, vel: jax.Array, cfg: BoidsConfig
) -> jax.Array:
    """The three flocking rules, reference semantics (src/main.rs:465-514).

    Returns the REPLACEMENT velocity (the reference overwrites v rather than
    accumulating, src/main.rs:514), before the speed clamp.

    pos, vel: [..., N, 2] -> new_vel [..., N, 2]
    """
    return boids_finalize(
        boids_partials_cross(pos, vel, pos, vel, cfg, exclude_diagonal=True), cfg
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
