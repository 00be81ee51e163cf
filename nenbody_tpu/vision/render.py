"""Dense jnp eye renderer — the vision oracle.

Observational equivalence contract with the reference rasterizer
(SURVEY.md §7 hard-part 1): same occlusion ordering (nearest agent wins each
pixel, the depth test of src/main.rs:608-632's depth-attached passes), the
same squared-radial vignette shading profile (shaders/scene.frag:15-16:
`mix(tex, 0, mag^2)` with mag the uv distance from sprite center), the same
apparent-size-vs-distance law (perspective division), and the same clear
color for uncovered pixels (src/main.rs:543). Not pixel-exact sRGB: the
wireframe-triangle sprite + skin texture is modeled as a disc of constant
albedo with the vignette profile.

The Pallas kernel in nenbody_tpu/ops/raycast.py must match THIS module
bit-for-bit-ish (fp32 tolerances); this module is validated against a
brute-force Python oracle in tests/test_vision.py.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import VisionConfig
from ..state import SceneState
from . import camera


def _agent_row(
    p_i: jax.Array,  # [2] eye position
    d_i: jax.Array,  # [2] unit heading
    pos: jax.Array,  # [M, 2] all target positions (including self)
    cfg: VisionConfig,
) -> Tuple[jax.Array, jax.Array]:
    """Render one agent's 1D line. Returns (shade [W], depth [W]).

    The self-target is culled for free: rel=0 gives forward depth 0 < near.
    """
    rel = pos - p_i  # [M, 2]
    u_c, du, f, visible = camera.project(rel, d_i, cfg)
    u_p = camera.pixel_centers(cfg)  # [W]

    # Normalized offset of each pixel within each target's splat, [M, W].
    safe_du = jnp.maximum(du, 1e-30)
    off = (u_p[None, :] - u_c[:, None]) / safe_du[:, None]
    if cfg.antialias:
        # pixel half-width in off units; edges cover fractionally
        hp = (1.0 / cfg.width) / safe_du  # [M]
        cover = visible[:, None] & (jnp.abs(off) < 1.0 + hp[:, None])
    else:
        cover = visible[:, None] & (jnp.abs(off) < 1.0)

    # Depth test: nearest covering target wins the pixel.
    depth_field = jnp.where(cover, f[:, None], jnp.inf)  # [M, W]
    winner = jnp.argmin(depth_field, axis=0)  # [W]
    best = jnp.min(depth_field, axis=0)  # [W]
    hit = jnp.isfinite(best)

    # Vignette: uv distance from sprite center is |off|/2 (uv spans [0,1]);
    # frag does mix(tex, 0, mag^2) => shade = albedo * (1 - off^2/4).
    o = jnp.take_along_axis(off, winner[None, :], axis=0)[0]  # [W]
    oc = jnp.clip(o, -1.0, 1.0)
    shade = cfg.sprite_albedo * (1.0 - 0.25 * oc * oc)
    if cfg.antialias:
        # exact 1D box-filter coverage of the splat edge over the pixel
        # footprint (the MSAA analog); interior pixels saturate to 1.
        s_win = jnp.take_along_axis(
            jnp.broadcast_to((0.5 * cfg.width) * safe_du[:, None], off.shape),
            winner[None, :],
            axis=0,
        )[0]
        covf = jnp.clip((1.0 - jnp.abs(o)) * s_win + 0.5, 0.0, 1.0)
        shade = cfg.background + covf * (shade - cfg.background)

    shade = jnp.where(hit, shade, cfg.background)
    depth = jnp.where(hit, best, cfg.far)
    return shade.astype(jnp.float32), depth.astype(jnp.float32)


def render_rows(
    pos: jax.Array,
    vel: jax.Array,
    cfg: VisionConfig,
    chunk: int = 128,
    targets: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Render every agent's eye line. pos, vel: [N, 2].

    Returns (shade [N, W], depth [N, W]). Work is O(N^2 * W); `chunk` bounds
    the materialized [chunk, N, W] intermediates (the dense analog of the
    reference's GRANULARITY=100 command-buffer batching, src/main.rs:584).

    `targets` (default: pos itself) renders the eyes against a different
    position set — the cross-block primitive the multi-chip vision ring
    streams remote blocks through; partial rows merge with `merge_rows`.
    """
    dirs = camera.unit_heading(vel)
    tgt = pos if targets is None else targets
    fn = lambda args: _agent_row(args[0], args[1], tgt, cfg)
    n = pos.shape[0]
    return jax.lax.map(fn, (pos, dirs), batch_size=min(chunk, n))


BACKGROUND_RGB = (0.1, 0.2, 0.3)  # clear color, src/main.rs:543
SPRITE_RGB = (0.85, 0.80, 0.70)  # skin-texture mean stand-in


def to_rgb(shade: jax.Array, depth: jax.Array, cfg: VisionConfig) -> jax.Array:
    """Colorize (shade, depth) rows into [..., W, 3] RGB — the reference's
    RGBA eye texture minus alpha (always 1, scene.frag:16): sprite pixels
    take the sprite color scaled by the vignetted shade, misses take the
    clear color chroma."""
    hit = (depth < cfg.far)[..., None]
    bg = jnp.asarray(BACKGROUND_RGB, shade.dtype)
    sprite = jnp.asarray(SPRITE_RGB, shade.dtype)
    norm = shade[..., None] / max(cfg.sprite_albedo, 1e-6)
    return jnp.where(hit, sprite * norm, bg)


def merge_rows(a, b):
    """Depth-min merge of two partial renders (shade, depth) — associative
    and commutative up to depth ties, so partial renders against disjoint
    target blocks compose into the full render."""
    sa, da = a
    sb, db = b
    take_b = db < da
    return jnp.where(take_b, sb, sa), jnp.where(take_b, db, da)


def render_lines(state: SceneState, cfg: VisionConfig) -> jax.Array:
    """`observe()`: the [N, W] float32 observation tensor (SURVEY.md §3.4 —
    the resolved eye texture array, except it lives on device and is
    returned to the caller instead of being locked inside the UI)."""
    return render_rows(state.pos, state.vel, cfg)[0]


def render_lines_with_depth(
    state: SceneState, cfg: VisionConfig
) -> Tuple[jax.Array, jax.Array]:
    """(shade [N, W], depth [N, W]) — depth is the capability the reference's
    depth buffer has but never exposes; useful for controllers."""
    return render_rows(state.pos, state.vel, cfg)
