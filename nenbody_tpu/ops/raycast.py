"""Pallas 1D raycast/rasterize kernel: the TPU eye pipeline.

Replaces the reference's N-render-passes vision path (one Vulkan pass per
agent layer, rayon-parallel command recording, src/main.rs:584-647) with a
single grid launch: each program renders a block of eyes; for each eye, all
target positions stream through VMEM in (TJ, W) tiles where the pixel axis
rides the 128-wide lanes. Per tile the kernel evaluates splat coverage, a
depth test (nearest agent wins, as the rasterizer's depth attachment), and
the squared-radial vignette shade (shaders/scene.frag:15-16).

Must match nenbody_tpu.vision.render (the jnp oracle) at fp32 tolerances —
enforced by tests/test_kernels.py. Tie-break nuance: at EXACTLY equal
depths the oracle takes the lowest agent index while this kernel takes the
brightest shade within the chunk; real configurations never tie.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import VisionConfig
from ..state import SceneState
from ..vision import camera
from .common import col, fit_tile, interpret_mode, pad_axis, round_up

EYES_PER_PROGRAM = 8
TILE_J = 512


def _raycast_kernel(
    ex_ref, ey_ref, dx_ref, dy_ref,  # [TE, 1] eye position / unit heading
    tx_ref, ty_ref,  # [N_pad, 1] target positions (sublane-major)
    m_ref,  # [N_pad, 1] target padding mask
    shade_ref, depth_ref,  # [TE, WB] output blocks
    *,
    cfg: VisionConfig,
    tj: int,
):
    te = ex_ref.shape[0]
    wb = shade_ref.shape[1]  # pixel-block width (grid dim 1 tiles the image)
    n_pad = tx_ref.shape[0]
    num_chunks = n_pad // tj
    t = math.tan(math.radians(cfg.hfov_deg) * 0.5)

    # Pixel centers of THIS block in NDC, one per lane: (1, WB).
    p0 = pl.program_id(1) * wb
    u_p = (
        2.0
        * (
            p0
            + jax.lax.broadcasted_iota(jnp.int32, (1, wb), 1).astype(jnp.float32)
            + 0.5
        )
        / cfg.width
        - 1.0
    )

    for e in range(te):  # static unroll over the eye block
        px, py = ex_ref[e, 0], ey_ref[e, 0]
        hx, hy = dx_ref[e, 0], dy_ref[e, 0]

        def body(k, carry, px=px, py=py, hx=hx, hy=hy):
            best_d, best_s = carry
            j0 = pl.multiple_of(k * tj, tj)
            tx = tx_ref[pl.ds(j0, tj), :]  # (TJ, 1)
            ty = ty_ref[pl.ds(j0, tj), :]
            mj = m_ref[pl.ds(j0, tj), :] > 0.0

            relx = tx - px
            rely = ty - py
            f = relx * hx + rely * hy  # view-space depth, (TJ, 1)
            l = relx * hy - rely * hx  # rel . right, right = (hy, -hx)
            valid = (f > cfg.near) & (f < cfg.far) & mj
            fs = jnp.where(valid, f, 1.0)
            inv = 1.0 / (fs * t)
            u_c = l * inv
            du = cfg.sprite_radius * inv

            off = (u_p - u_c) / jnp.maximum(du, 1e-30)  # (TJ, W)
            if cfg.antialias:
                # pixel half-width in off units (mul-only forms of 1/(W*du))
                hp = fs * (t / (cfg.width * cfg.sprite_radius))  # (TJ, 1)
                s_cov = (0.5 * cfg.width * cfg.sprite_radius) * inv
                cover = valid & (jnp.abs(off) < 1.0 + hp)
            else:
                cover = valid & (jnp.abs(off) < 1.0)
            dfield = jnp.where(cover, f, cfg.far)  # (TJ, W)
            cmin = jnp.min(dfield, axis=0, keepdims=True)  # (1, W)
            offc = jnp.clip(off, -1.0, 1.0)
            val = cfg.sprite_albedo * (1.0 - 0.25 * offc * offc)
            if cfg.antialias:
                covf = jnp.clip((1.0 - jnp.abs(off)) * s_cov + 0.5, 0.0, 1.0)
                val = cfg.background + covf * (val - cfg.background)
            sh = jnp.where(cover & (dfield == cmin), val, -1.0)
            csh = jnp.max(sh, axis=0, keepdims=True)  # (1, W)

            better = cmin < best_d
            best_s = jnp.where(better, csh, best_s)
            best_d = jnp.minimum(best_d, cmin)
            return best_d, best_s

        init = (
            jnp.full((1, wb), cfg.far, jnp.float32),
            jnp.full((1, wb), cfg.background, jnp.float32),
        )
        best_d, best_s = jax.lax.fori_loop(0, num_chunks, body, init)
        shade_ref[e : e + 1, :] = best_s
        depth_ref[e : e + 1, :] = best_d


def _raster_kernel(
    uc_ref, inv_ref, f_ref,  # [TE, N_pad] precomputed projections
    shade_ref, depth_ref,  # [TE, WB] output blocks
    *,
    cfg: VisionConfig,
    tj: int,
):
    """Rasterize-only kernel over XLA-precomputed projections.

    The streaming kernel (_raycast_kernel) computes per-target projections
    in (TJ, 1) columns at 1/128 lane utilization — ~2/3 of its runtime for
    narrow images. Here XLA precomputes u_c / 1/du / depth for all
    (eye, target) pairs as fused, fully-vectorized [N_e, N_t] tensors
    (invalid targets encoded as u_c = 1e9 so they never cover a pixel), and
    the kernel only evaluates (WB, TJ) coverage/depth/shade tiles at full
    lane packing. Used when the [N_e, N_t] tensors fit HBM comfortably.
    """
    te = uc_ref.shape[0]
    wb = shade_ref.shape[1]
    n_pad = uc_ref.shape[1]
    num_chunks = n_pad // tj

    p0 = pl.program_id(1) * wb
    u_p = (
        2.0
        * (
            p0
            + jax.lax.broadcasted_iota(jnp.int32, (wb, 1), 0).astype(jnp.float32)
            + 0.5
        )
        / cfg.width
        - 1.0
    )  # (WB, 1): pixels on sublanes

    for e in range(te):  # static unroll; row slices are static sublane picks
        def body(k, carry, e=e):
            best_d, best_s = carry
            j0 = pl.multiple_of(k * tj, tj)
            uc = uc_ref[e : e + 1, pl.ds(j0, tj)]  # (1, TJ)
            inv = inv_ref[e : e + 1, pl.ds(j0, tj)]
            f = f_ref[e : e + 1, pl.ds(j0, tj)]

            off = (u_p - uc) * inv  # (WB, TJ)
            if cfg.antialias:
                hp = inv * (1.0 / cfg.width)  # (1, TJ): (1/W)/du
                s_cov = (0.5 * cfg.width) / inv
                cover = jnp.abs(off) < 1.0 + hp
            else:
                cover = jnp.abs(off) < 1.0
            dfield = jnp.where(cover, f, cfg.far)
            cmin = jnp.min(dfield, axis=1, keepdims=True)  # (WB, 1)
            offc = jnp.clip(off, -1.0, 1.0)
            val = cfg.sprite_albedo * (1.0 - 0.25 * offc * offc)
            if cfg.antialias:
                covf = jnp.clip((1.0 - jnp.abs(off)) * s_cov + 0.5, 0.0, 1.0)
                val = cfg.background + covf * (val - cfg.background)
            sh = jnp.where(cover & (dfield == cmin), val, -1.0)
            csh = jnp.max(sh, axis=1, keepdims=True)

            better = cmin < best_d
            best_s = jnp.where(better, csh, best_s)
            best_d = jnp.minimum(best_d, cmin)
            return best_d, best_s

        init = (
            jnp.full((wb, 1), cfg.far, jnp.float32),
            jnp.full((wb, 1), cfg.background, jnp.float32),
        )
        best_d, best_s = jax.lax.fori_loop(0, num_chunks, body, init)
        shade_ref[e : e + 1, :] = jnp.transpose(best_s)
        depth_ref[e : e + 1, :] = jnp.transpose(best_d)


def _project_all(pos, dirs, tgt, cfg: VisionConfig, n_pad_t: int):
    """Fused XLA projection of every target into every eye.

    Returns (u_c', 1/du', f') each [N_e, N_t_pad] with invalid/padded
    targets pushed out of the frustum (u_c = 1e9)."""
    t = math.tan(math.radians(cfg.hfov_deg) * 0.5)
    rel = tgt[None, :, :] - pos[:, None, :]  # [N_e, N_t, 2]
    right = jnp.stack([dirs[:, 1], -dirs[:, 0]], axis=-1)
    f = jnp.einsum("etk,ek->et", rel, dirs)
    l = jnp.einsum("etk,ek->et", rel, right)
    valid = (f > cfg.near) & (f < cfg.far)
    fs = jnp.where(valid, f, 1.0)
    inv_f = (1.0 / t) / fs
    uc = jnp.where(valid, l * inv_f, 1e9)
    inv_du = jnp.where(valid, fs * (t / cfg.sprite_radius), 1.0)
    pad = n_pad_t - tgt.shape[0]
    if pad:
        uc = jnp.pad(uc, ((0, 0), (0, pad)), constant_values=1e9)
        inv_du = jnp.pad(inv_du, ((0, 0), (0, pad)), constant_values=1.0)
        f = jnp.pad(f, ((0, 0), (0, pad)), constant_values=cfg.far)
    return uc, inv_du, f


# [N_e, N_t] projection tensors above this element count would strain HBM;
# fall back to the streaming kernel (which never materializes them).
_PRECOMPUTE_MAX_ELEMS = 1 << 24


def _render_precomputed(pos, dirs, tgt, cfg, te, tj, wb, n_pad_e, n_pad_t):
    uc, inv_du, f = _project_all(pos, dirs, tgt, cfg, n_pad_t)
    if n_pad_e != pos.shape[0]:
        pad = ((0, n_pad_e - pos.shape[0]), (0, 0))
        uc = jnp.pad(uc, pad, constant_values=1e9)
        inv_du = jnp.pad(inv_du, pad, constant_values=1.0)
        f = jnp.pad(f, pad, constant_values=cfg.far)

    grid = (n_pad_e // te, cfg.width // wb)
    kernel = functools.partial(_raster_kernel, cfg=cfg, tj=tj)
    pspec = lambda: pl.BlockSpec(
        (te, n_pad_t), lambda i, p: (i, 0), memory_space=pltpu.VMEM
    )
    ospec = lambda: pl.BlockSpec(
        (te, wb), lambda i, p: (i, p), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pspec(), pspec(), pspec()],
        out_specs=[ospec(), ospec()],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad_e, cfg.width), jnp.float32),
            jax.ShapeDtypeStruct((n_pad_e, cfg.width), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * n_pad_e * n_pad_t * cfg.width,
            bytes_accessed=(3 * n_pad_e * n_pad_t + 2 * n_pad_e * cfg.width) * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(uc, inv_du, f)


@functools.partial(jax.jit, static_argnames=("cfg", "te", "tj"))
def render_rows_tiled(
    pos: jax.Array,
    vel: jax.Array,
    cfg: VisionConfig,
    te: int = EYES_PER_PROGRAM,
    tj: int = TILE_J,
    targets: jax.Array | None = None,
):
    """Pallas counterpart of vision.render.render_rows.

    pos, vel: [N, 2] -> (shade [N, W], depth [N, W]) float32.
    `targets` [M, 2] renders the eyes against a different position set (the
    vision ring's per-hop primitive); partial rows depth-merge with
    vision.render.merge_rows.
    """
    tgt = pos if targets is None else targets
    n = pos.shape[0]
    m = tgt.shape[0]
    tj = fit_tile(tj, m, 8)
    n_pad_t = round_up(m, tj)  # target padding
    n_pad_e = round_up(n, te)  # eye padding
    # wide images are tiled into pixel blocks so the (TJ, WB) temporaries of
    # the te-way unrolled eye loop stay inside the VMEM budget
    if cfg.width <= 256:
        wb = cfg.width
    elif cfg.width % 256 == 0:
        wb = 256
    elif cfg.width % 128 == 0:
        wb = 128
    else:
        raise ValueError(
            f"the Pallas render path needs vision width <= 256 or a multiple "
            f"of 128, got {cfg.width}; use backend='dense' for odd widths"
        )
    dirs = camera.unit_heading(vel)

    # precompute path: also bound the (te, n_pad_t) projection input blocks
    # (3 resident) to ~6 MB of VMEM — asymmetric few-eyes/many-targets calls
    # can pass the element gate yet blow the block budget
    te_p = fit_tile(32, n, 8)
    if (
        n_pad_e * n_pad_t <= _PRECOMPUTE_MAX_ELEMS
        and 3 * te_p * round_up(m, 128) * 4 <= (6 << 20)
    ):
        # lane-major projections want 128-multiple chunks; widest chunk the
        # (WB, TJ) temporaries allow minimizes per-eye loop trips (swept on
        # v5e: +20% over TJ=512 at W=64), and 32 eyes/program amortizes
        # program-switch overhead
        n_pad_e_p = round_up(n, te_p)
        tj_p = fit_tile(min(1024, max(128, (1 << 17) // cfg.width)), m, 128)
        n_pad_t_p = round_up(m, tj_p)
        shade, depth = _render_precomputed(
            pos, dirs, tgt, cfg, te_p, tj_p, wb, n_pad_e_p, n_pad_t_p
        )
        return shade[:n], depth[:n]

    ex = pad_axis(pos[:, 0], n_pad_e)
    ey = pad_axis(pos[:, 1], n_pad_e)
    dx = pad_axis(dirs[:, 0], n_pad_e)
    dy = pad_axis(dirs[:, 1], n_pad_e)
    tx = pad_axis(tgt[:, 0], n_pad_t)
    ty = pad_axis(tgt[:, 1], n_pad_t)
    mask = pad_axis(jnp.ones((m,), jnp.float32), n_pad_t)

    grid = (n_pad_e // te, cfg.width // wb)
    kernel = functools.partial(_raycast_kernel, cfg=cfg, tj=tj)
    espec = lambda: pl.BlockSpec(
        (te, 1), lambda i, p: (i, 0), memory_space=pltpu.VMEM
    )
    tspec = lambda: pl.BlockSpec(
        (n_pad_t, 1), lambda i, p: (0, 0), memory_space=pltpu.VMEM
    )
    ospec = lambda: pl.BlockSpec(
        (te, wb), lambda i, p: (i, p), memory_space=pltpu.VMEM
    )
    shade, depth = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[espec(), espec(), espec(), espec(), tspec(), tspec(), tspec()],
        out_specs=[ospec(), ospec()],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad_e, cfg.width), jnp.float32),
            jax.ShapeDtypeStruct((n_pad_e, cfg.width), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * n_pad_e * n_pad_t * cfg.width // tj * tj,
            bytes_accessed=(4 * n_pad_e + 3 * n_pad_t + 2 * n_pad_e * cfg.width) * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(col(ex), col(ey), col(dx), col(dy), col(tx), col(ty), col(mask))

    return shade[:n], depth[:n]


def render_lines(state: SceneState, cfg: VisionConfig) -> jax.Array:
    """`observe()` through the Pallas path: [N, W] shade rows."""
    return render_rows_tiled(state.pos, state.vel, cfg)[0]


def render_lines_with_depth(state: SceneState, cfg: VisionConfig):
    return render_rows_tiled(state.pos, state.vel, cfg)
