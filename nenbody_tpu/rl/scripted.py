"""Scripted vision-reactive controllers — "simple control algorithms and
computer vision processing" (the reference's stated purpose, README.md:4),
with zero training: pure functions obs -> action usable anywhere a policy
apply_fn is (datagen experts, BC teachers, baselines for the trainers).

All operate on the VisionEnv observation layout [..., W+2] = eye line ++
ego velocity. Actions are 2D accelerations in the EGO frame of the
observation... no — the env consumes world-frame accelerations, so these
controllers rotate their ego-frame steering into the world frame using the
ego velocity (the eye looks along the velocity, src/main.rs:770/939).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split(obs: jax.Array):
    """obs [..., W+2] -> (lines [..., W], vel [..., 2])."""
    return obs[..., :-2], obs[..., -2:]


def _ego_to_world(forward: jax.Array, lateral: jax.Array, vel: jax.Array):
    """Steering (forward, lateral-right) in the eye frame -> world accel.

    The eye looks along the velocity with right = (dir_y, -dir_x)
    (vision/camera.py); a stopped agent faces +x (atan2(0,0) = 0)."""
    th = jnp.arctan2(vel[..., 1], vel[..., 0])
    c, s = jnp.cos(th), jnp.sin(th)
    ax = forward * c + lateral * s
    ay = forward * s - lateral * c
    return jnp.stack([ax, ay], axis=-1)


def _saliency_offset(lines: jax.Array, background: float):
    """(mass [...], offset [...]) — total above-background brightness and
    its brightness-weighted NDC position, in the renderer's shared
    pixel-center convention so a dead-center target reads offset exactly 0."""
    from ..vision.camera import pixel_centers_for_width

    u = pixel_centers_for_width(lines.shape[-1], dtype=lines.dtype)
    sal = jnp.maximum(lines - background, 0.0)
    mass = jnp.sum(sal, axis=-1)
    offset = jnp.sum(sal * u, axis=-1) / jnp.maximum(mass, 1e-6)
    return mass, offset


def seek_brightest(obs: jax.Array, gain: float = 1.0, background: float = 0.2):
    """Steer toward the brightest thing in view (phototaxis): turn in
    proportion to the brightness-weighted pixel offset from center, push
    forward when anything is visible. Returns accel [..., 2]."""
    lines, vel = _split(obs)
    mass, offset = _saliency_offset(lines, background)
    seen = (mass > 1e-4).astype(lines.dtype)
    return gain * _ego_to_world(0.5 * seen, offset * seen, vel)


def avoid_crowding(obs: jax.Array, gain: float = 1.0, background: float = 0.2):
    """Anti-phototaxis: steer away from the occupied side, brake when the
    view is crowded — a separation rule from pixels alone."""
    lines, vel = _split(obs)
    mass, offset = _saliency_offset(lines, background)
    crowd = jnp.tanh(mass / (0.25 * lines.shape[-1]))
    return gain * _ego_to_world(-0.5 * crowd, -offset * crowd, vel)


def as_apply_fn(controller, **kwargs):
    """Wrap a scripted controller as a (params, obs) -> (mean, log_std)
    policy apply_fn, so it plugs into datagen.collect / sample_action."""

    def apply_fn(params, obs):  # noqa: ARG001 - stateless
        mean = controller(obs, **kwargs)
        return mean, jnp.full((2,), -8.0)  # effectively deterministic

    return apply_fn


SCRIPTED = {
    "seek": seek_brightest,
    "avoid": avoid_crowding,
}
