"""1D pinhole camera math for agent eyes.

The reference builds, per agent, a full 4x4 perspective view-proj matrix
(gfx.rs:358-369: perspective(vfov=90deg/aspect, aspect=W/1, near=1,
far=10000) @ look_at_dir(eye, velocity, up=+z)) and rasterizes through it.
For a 1-pixel-tall image that entire matrix collapses to 2D scalar geometry:

    forward  f = (x_j - x_i) . dir_i          (view-space depth)
    lateral  l = (x_j - x_i) . right_i
    u        = l / (f * tan(hfov/2))          (NDC in [-1, 1] across the line)

with dir_i the unit heading (the reference looks along the velocity,
src/main.rs:770/939) and right_i = (dir_y, -dir_x) (up=+z with a
right-handed look-at means +u is to the right of the heading). An agent is
visible when near < f < far and its splat interval [u - du, u + du]
intersects [-1, 1], where du = sprite_radius / (f * tan(hfov/2)) is the
projected half-width — the same apparent-size-vs-distance law the
rasterizer produces by perspective division.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import VisionConfig


def unit_heading(vel: jax.Array) -> jax.Array:
    """Unit look direction from velocity, [..., 2].

    Uses atan2 like the reference's `rotation_of` (src/main.rs:141-143), so
    a zero velocity deterministically faces +x (atan2(0,0) = 0).
    """
    th = jnp.arctan2(vel[..., 1], vel[..., 0])
    return jnp.stack([jnp.cos(th), jnp.sin(th)], axis=-1)


def tan_half_fov(cfg: VisionConfig) -> float:
    return math.tan(math.radians(cfg.hfov_deg) * 0.5)


def pixel_centers_for_width(w: int, dtype=jnp.float32) -> jax.Array:
    """NDC u-coordinate of each pixel center for a w-pixel line, [w] in
    (-1, 1) — THE pixel convention; renderers, kernels, and scripted
    controllers must all share it."""
    return (2.0 * (jnp.arange(w, dtype=dtype) + 0.5) / w) - 1.0


def pixel_centers(cfg: VisionConfig) -> jax.Array:
    """NDC u-coordinate of each pixel center, [W] in (-1, 1)."""
    return pixel_centers_for_width(cfg.width)


def project(
    rel: jax.Array, direction: jax.Array, cfg: VisionConfig
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Project relative offsets into one agent's 1D camera.

    rel:       [..., M, 2] target positions relative to the eye
    direction: [..., 2] unit heading of the eye

    Returns (u_center, half_width, depth, visible), each [..., M]:
      u_center:   splat center in NDC
      half_width: projected sprite half-width in NDC
      depth:      view-space forward distance f
      visible:    near < f < far and splat overlaps the [-1, 1] frustum
    """
    d = direction
    right = jnp.stack([d[..., 1], -d[..., 0]], axis=-1)
    f = jnp.sum(rel * d[..., None, :], axis=-1)  # [..., M]
    l = jnp.sum(rel * right[..., None, :], axis=-1)
    t = tan_half_fov(cfg)
    in_depth = (f > cfg.near) & (f < cfg.far)
    # guard the division; masked-out lanes never contribute
    fs = jnp.where(in_depth, f, 1.0)
    u = l / (fs * t)
    du = cfg.sprite_radius / (fs * t)
    visible = in_depth & (jnp.abs(u) <= 1.0 + du)
    return u, du, f, visible
