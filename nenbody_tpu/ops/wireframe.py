"""Pallas wireframe-sprite raycast: the exact reference sprite, fast.

The dense `vision.render._agent_row_wireframe` is the parity oracle for the
reference's actual sprite — a LineStrip triangle (verts/uvs
src/main.rs:130-139, index buffer [0,1,2,0] at main.rs:249) oriented to each
target's heading, scanline-intersected per edge with the uv-interpolated
squared-radial vignette of shaders/scene.frag:15-16. Round 2 left that mode
dense-only (NEXT #3); this kernel makes `sprite_mode="wireframe"` a
throughput mode too.

Two TPU-specific simplifications keep the inner loop near the disc kernel's
structure (ops/raycast.py):

1. The uv vignette is a STATIC QUADRATIC in the edge parameter tau. The
   sprite uvs are compile-time constants, so along edge (a, b)
       mag2(tau) = |uv_a - .5 + tau*(uv_b - uv_a)|^2 = c0 + c1*tau + c2*tau^2
   with python-float c's — no uv interpolation or 2D norm in the kernel.
2. The three edges merge ELEMENTWISE (depth-min keeps the nearer fragment)
   before any cross-target reduction, so each (target-chunk, pixel-block)
   tile still pays exactly one depth min-reduce + one winner-select pass —
   the same reduce count as the disc kernel, ~3x its elementwise ops.

Both disc variants are mirrored: a rasterize-only kernel over XLA-
precomputed per-(eye, target, vert) view coordinates (6 [N_e, N_t] tensors;
pixels ride the sublanes) for shapes where those fit HBM, and a streaming
kernel that projects the 3 sprite verts per target chunk in (TJ, 1) columns
for huge N. Must match vision.render's wireframe path at fp32 tolerances —
enforced by tests/test_wireframe_kernel.py.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import VisionConfig
from ..vision import camera
from ..vision.render import SPRITE_EDGES, SPRITE_UVS, SPRITE_VERTS
from .common import (
    col, fit_tile, interpret_mode, pad_axis, round_up, row, run_eyes_unrolled,
)

EYES_PER_PROGRAM = 8
TILE_J = 256
# sweep override for the raster kernel's manual eye unroll (None = the
# r2-swept _unroll_cap rule); see WF_RASTER_TE below
WF_RASTER_UNROLL = None


def _unroll_cap(streaming: bool = False, aa: bool = False) -> int:
    """Unroll cap for the per-edge kernels (see common.run_eyes_unrolled
    for the scoped-vmem rationale). Swept on v5e: the raster kernel gains
    ~11% up to 16 unrolled eyes with no scoped-vmem OOM at any shape
    (Mosaic reuses the per-edge temporaries across the static edge loop);
    the STREAMING kernel regresses ~3x past 4 — its per-eye (TJ, 1)
    projection columns multiply with the unroll and crowd the stack. The
    AA variants carry the coverage stream plus the per-edge interval
    temporaries (~2x the live set), so their caps halve (verified
    no-scoped-vmem-OOM on v5e at W=1024/TJ=1024)."""
    if streaming:
        return 2 if aa else 4
    return 8 if aa else 16

# Per-edge vignette quadratic mag2(tau) = C0 + C1*tau + C2*tau^2 (see module
# docstring). Computed once from the static sprite uvs.
_EDGE_QUAD = tuple(
    (
        (SPRITE_UVS[a][0] - 0.5) ** 2 + (SPRITE_UVS[a][1] - 0.5) ** 2,
        2.0
        * (
            (SPRITE_UVS[a][0] - 0.5) * (SPRITE_UVS[b][0] - SPRITE_UVS[a][0])
            + (SPRITE_UVS[a][1] - 0.5) * (SPRITE_UVS[b][1] - SPRITE_UVS[a][1])
        ),
        (SPRITE_UVS[b][0] - SPRITE_UVS[a][0]) ** 2
        + (SPRITE_UVS[b][1] - SPRITE_UVS[a][1]) ** 2,
    )
    for a, b in SPRITE_EDGES
)


# uv(tau) = uv_a + tau * (uv_b - uv_a): static per-edge line in uv space,
# tracked by the raw (texture) winner mode.
_EDGE_UV = tuple(
    (
        (SPRITE_UVS[a][0], SPRITE_UVS[a][1]),
        (SPRITE_UVS[b][0] - SPRITE_UVS[a][0], SPRITE_UVS[b][1] - SPRITE_UVS[a][1]),
    )
    for a, b in SPRITE_EDGES
)


def _edge_depth_tau(ut, fa, la, fb, lb, cfg: VisionConfig):
    """One edge's (depth, tau) fragment fields over a (pixel, target) tile.

    ut: pixel ray slopes u*tan(hfov/2), broadcast against the per-vert view
    coords fa/la/fb/lb (projected edge endpoints). Closed-form segment
    intersection: tau = (ut*fa - la) / (dl - ut*df); depth f(tau) linear.
    Misses get depth=far."""
    df = fb - fa
    dl = lb - la
    num = ut * fa - la
    den = dl - ut * df
    ok = jnp.abs(den) > 1e-12  # edge parallel to the ray: no crossing
    tau = num / jnp.where(ok, den, 1.0)
    fk = fa + tau * df
    hit = ok & (tau >= 0.0) & (tau <= 1.0) & (fk > cfg.near) & (fk < cfg.far)
    return jnp.where(hit, fk, cfg.far), tau


def _edge_depth_tau_aa(u_p, t, hp, fa, la, fb, lb, cfg: VisionConfig):
    """AA variant (must mirror vision.render._agent_row_wireframe's aa
    branch bit-for-bit-ish): the edge's tau range is clipped to the
    [near, far] depth slab, its covered u-interval read off the clipped
    endpoints (u is monotone in tau there), the fragment evaluated at the
    pixel center CLAMPED into that interval, and the per-edge interval
    returned for the caller's per-sprite union coverage.

    Returns (depth_field, tau, e_lo, e_hi) — depth far on miss; e_lo/e_hi
    carry off-screen sentinels (+-4) when the edge is invalid."""
    df = fb - fa
    dl = lb - la
    valid, e_lo_v, e_hi_v, tau_lo, tau_hi = _edge_slab_interval(
        fa, la, fb, lb, t, cfg
    )
    big = jnp.float32(4.0)
    e_lo = jnp.where(valid, e_lo_v, big)
    e_hi = jnp.where(valid, e_hi_v, -big)
    u_c = jnp.clip(u_p, e_lo_v, e_hi_v)
    utc = u_c * t
    num = utc * fa - la
    den = dl - utc * df
    ok = jnp.abs(den) > 1e-12
    tau = num / jnp.where(ok, den, 1.0)
    tau = jnp.clip(tau, tau_lo, tau_hi)
    fk = fa + tau * df
    # fk < far mirrors the dense oracle: a slab-clipped fragment can land
    # at exactly far in fp32 and must stay a miss on every path
    cov_e = (e_hi_v > u_p - hp) & (e_lo_v < u_p + hp)
    hit = ok & valid & cov_e & (fk < cfg.far)
    return jnp.where(hit, fk, cfg.far), tau, e_lo, e_hi


def _merge_edges(
    ut, f_v, l_v, alb, cfg: VisionConfig, track_uv: bool = False,
    aa_ctx=None,
):
    """Elementwise depth-min across the 3 sprite edges -> (depth, payloads)
    with one value per (pixel, target) element. The dense oracle's argmin
    over the flattened [3M] axis factors into this elementwise merge + the
    caller's cross-target reduce because depth-min is associative (ties
    broken toward the lower edge index, as argmin).

    Payloads: (shade,) normally — the static uv-quadratic vignette times
    alb — or (uvx, uvy[, alb]) in raw/texture mode, where uv is linear in
    tau with static per-edge constants and alb rides along as its own
    stream when per-target.

    aa_ctx = (u_p, t, hp) switches the per-edge core to the clamped AA
    evaluation and appends the sprite's pixel-coverage fraction (box filter
    of the union of the 3 edge intervals — contiguous by convexity) as the
    LAST payload stream; the caller blends the winner's shade with it."""
    d_m = None
    pays = None
    sp_lo = sp_hi = None
    for (a, b), quad, (uva, duv) in zip(SPRITE_EDGES, _EDGE_QUAD, _EDGE_UV):
        if aa_ctx is not None:
            u_p, t, hp = aa_ctx
            d_e, tau, e_lo, e_hi = _edge_depth_tau_aa(
                u_p, t, hp, f_v[a], l_v[a], f_v[b], l_v[b], cfg
            )
            sp_lo = e_lo if sp_lo is None else jnp.minimum(sp_lo, e_lo)
            sp_hi = e_hi if sp_hi is None else jnp.maximum(sp_hi, e_hi)
        else:
            d_e, tau = _edge_depth_tau(ut, f_v[a], l_v[a], f_v[b], l_v[b], cfg)
        if track_uv:
            p_e = [uva[0] + tau * duv[0], uva[1] + tau * duv[1]]
            if not isinstance(alb, float):
                p_e.append(jnp.broadcast_to(alb, tau.shape))
            p_e = tuple(p_e)
        else:
            c0, c1, c2 = quad
            p_e = (alb * (1.0 - (c0 + tau * (c1 + c2 * tau))),)
        if d_m is None:
            d_m, pays = d_e, p_e
        else:
            take = d_e < d_m
            pays = tuple(
                jnp.where(take, pe, pm) for pe, pm in zip(p_e, pays)
            )
            d_m = jnp.minimum(d_m, d_e)
    if aa_ctx is not None:
        u_p, t, hp = aa_ctx
        cov = jnp.clip(
            (jnp.minimum(sp_hi, u_p + hp) - jnp.maximum(sp_lo, u_p - hp))
            / (2.0 * hp),
            0.0,
            1.0,
        )
        pays = pays + (jnp.broadcast_to(cov, d_m.shape),)
    return d_m, pays


def _reduce_chunk(d_m, pays, best_d, best_pays, axis: int, cfg: VisionConfig):
    """Cross-target winner reduction for one chunk: depth min + the winning
    fragment's payloads (min-tie-break, same structure as the disc kernel),
    folded into the running per-pixel best."""
    cmin = jnp.min(d_m, axis=axis, keepdims=True)
    covered = cmin < cfg.far
    win = (d_m == cmin) & covered
    pays_win = tuple(
        jnp.min(jnp.where(win, p, jnp.inf), axis=axis, keepdims=True)
        for p in pays
    )
    better = cmin < best_d
    best_pays = tuple(
        jnp.where(better, pw, bp) for pw, bp in zip(pays_win, best_pays)
    )
    best_d = jnp.minimum(best_d, cmin)
    return best_d, best_pays


def _finish(best_d, best_s, cfg: VisionConfig, cov=None):
    hit = best_d < cfg.far
    if cov is not None:
        best_s = cfg.background + cov * (best_s - cfg.background)
    shade = jnp.where(hit, best_s, cfg.background)
    return shade, best_d


def _pay_init(shape, cfg: VisionConfig, raw: bool, has_alb: bool, aa: bool,
              track_idx: bool = False):
    """Initial per-pixel payload carry: (shade,) or (uvx, uvy[, alb]),
    plus the coverage stream in AA mode, plus (always last) the winner
    target-index stream when track_idx — +inf marks 'no winner yet', so
    background pixels come out +inf and the min-reduce tie-break picks the
    LOWEST index among equal-depth winners (the same tie the streaming
    backward breaks with first-chunk/lowest-row wins)."""
    if not raw:
        init = [jnp.full(shape, cfg.background, jnp.float32)]
    else:
        init = [
            jnp.full(shape, 0.5, jnp.float32),
            jnp.full(shape, 0.5, jnp.float32),
        ]
        if has_alb:
            init.append(jnp.full(shape, cfg.sprite_albedo, jnp.float32))
    if aa:
        init.append(jnp.zeros(shape, jnp.float32))
    if track_idx:
        init.append(jnp.full(shape, jnp.inf, jnp.float32))
    return tuple(init)


def _decode_textured_wf(outs, cfg: VisionConfig, texture, has_alb: bool,
                        aa: bool = False):
    """XLA epilogue for the wireframe raw mode: sample the texture at the
    winner's interpolated edge uv (scene.frag:11-14), then the uv vignette
    (frag:15-16) — matches vision.render._agent_row_wireframe with texture.
    O(N*W), outside the kernel. In AA mode the winner's coverage stream
    box-filters the textured shade against the background."""
    from ..vision.render import sample_texture_auto as sample_texture

    uvx, uvy = outs[0], outs[1]
    i = 2
    albw = None
    if has_alb:
        albw = outs[i]
        i += 1
    cov = outs[i] if aa else None
    d = outs[-1]
    hit = d < cfg.far
    mag2 = (uvx - 0.5) ** 2 + (uvy - 0.5) ** 2
    alb = cfg.sprite_albedo if albw is None else albw
    alb = alb * sample_texture(texture, jnp.stack([uvx, uvy], axis=-1))
    val = alb * (1.0 - mag2)
    if cov is not None:
        val = cfg.background + cov * (val - cfg.background)
    shade = jnp.where(hit, val, cfg.background)
    return shade, d


def _wireframe_raster_kernel(
    # [TE, N_pad] per-vert view coords (f0, l0, f1, l1, f2, l2)
    f0_ref, l0_ref, f1_ref, l1_ref, f2_ref, l2_ref,
    *rest,  # [alb_ref ([1, N_pad]) when has_alb,] output refs
    cfg: VisionConfig,
    tj: int,
    has_alb: bool = False,
    raw: bool = False,
    track_idx: bool = False,
):
    """Rasterize-only wireframe kernel over XLA-precomputed projections —
    the wireframe mirror of raycast._raster_kernel (pixels on sublanes,
    targets on lanes, full lane packing). track_idx appends the winning
    target's global index as one more min-reduced payload stream and one
    more output row (LAST) — the residual the winner-index backward needs
    (f32 indices are exact to 2^24, far past any kernel-tiled N)."""
    from .raycast import _unpack_rest

    aa = cfg.antialias
    alb_ref, out_refs = _unpack_rest(rest, has_alb)
    f_refs = (f0_ref, f1_ref, f2_ref)
    l_refs = (l0_ref, l1_ref, l2_ref)
    te = f0_ref.shape[0]
    wb = out_refs[0].shape[1]
    n_pad = f0_ref.shape[1]
    num_chunks = n_pad // tj
    t = math.tan(math.radians(cfg.hfov_deg) * 0.5)
    hp = 1.0 / cfg.width

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
    ut = u_p * t
    aa_ctx = (u_p, t, hp) if aa else None

    def eye_body(e, _):
        # dynamic eye loop — see raycast._raycast_kernel for the scoped-vmem
        # rationale (Mosaic allocates the body's stack once per loop)
        def body(k, carry, e=e):
            best_d, best_p = carry
            j0 = pl.multiple_of(k * tj, tj)
            f_v = [r[pl.ds(e, 1), pl.ds(j0, tj)] for r in f_refs]  # (1, TJ)
            l_v = [r[pl.ds(e, 1), pl.ds(j0, tj)] for r in l_refs]
            alb = (
                alb_ref[0:1, pl.ds(j0, tj)] if has_alb else cfg.sprite_albedo
            )
            d_m, p_m = _merge_edges(
                ut, f_v, l_v, alb, cfg, track_uv=raw, aa_ctx=aa_ctx
            )
            if track_idx:
                idx = jnp.float32(j0) + jax.lax.broadcasted_iota(
                    jnp.int32, (1, tj), 1
                ).astype(jnp.float32)
                p_m = p_m + (jnp.broadcast_to(idx, d_m.shape),)
            return _reduce_chunk(d_m, p_m, best_d, best_p, 1, cfg)

        init = (
            jnp.full((wb, 1), cfg.far, jnp.float32),
            _pay_init((wb, 1), cfg, raw, has_alb, aa, track_idx=track_idx),
        )
        best_d, best_p = jax.lax.fori_loop(0, num_chunks, body, init)
        o_refs = out_refs
        if track_idx:
            o_refs[-1][pl.ds(e, 1), :] = jnp.transpose(best_p[-1])
            best_p, o_refs = best_p[:-1], o_refs[:-1]
        if raw:
            for ref, val in zip(o_refs, (*best_p, best_d)):
                ref[pl.ds(e, 1), :] = jnp.transpose(val)
            return 0
        shade, depth = _finish(
            best_d, best_p[0], cfg, cov=best_p[-1] if aa else None
        )
        o_refs[0][pl.ds(e, 1), :] = jnp.transpose(shade)
        o_refs[1][pl.ds(e, 1), :] = jnp.transpose(depth)
        return 0

    cap = WF_RASTER_UNROLL or _unroll_cap(aa=aa)
    run_eyes_unrolled(eye_body, te, cap)


def _wireframe_rasterq_kernel(
    # [TE, N_pad] per-vert view coords (f0, l0, f1, l1, f2, l2)
    f0_ref, l0_ref, f1_ref, l1_ref, f2_ref, l2_ref,
    *rest,  # [alb_ref ([1, N_pad]) when has_alb,] output refs
    cfg: VisionConfig,
    tj: int,
    has_alb: bool = False,
    raw: bool = False,
    track_idx: bool = False,
):
    """Inverse-depth raster kernel (r5, VERDICT r4 #4): the raster layout
    (pixels on sublanes, targets on lanes, the XLA per-vert precompute —
    the N=1024/W=64 RL-shape default) with the COMPACT kernel's per-pixel
    core. The per-edge inverse-depth constants are computed IN-kernel per
    (eye, target-chunk) on (1, TJ) rows — _wf_edge_field_rows, the same op
    sequence as the compact prologue, its handful of divisions amortized
    over the WB sublane pixels — and the per-element evaluation is
    _compact_group_eval verbatim: 2 FMAs + compares per edge, ZERO
    per-pixel divisions, payloads q-homogenized with one divide per
    (eye, pixel) in the epilogue. That roughly halves the per-element op
    count of _wireframe_raster_kernel's division-route core
    (_edge_depth_tau: ~26 ops + a divide per (pixel, target, edge)) on a
    shape that is pure VPU-issue-bound (DESIGN 4g). Output-parity with the
    dense oracle at fp32 tolerances; near-tie winners may flip vs the
    division route (the same route-inherent tie behavior the compact
    kernel has, tests/test_wireframe_kernel.py)."""
    from .raycast import _unpack_rest

    aa = cfg.antialias
    skip_iv = not (aa or _interval_hit(aa))
    alb_ref, out_refs = _unpack_rest(rest, has_alb)
    f_refs = (f0_ref, f1_ref, f2_ref)
    l_refs = (l0_ref, l1_ref, l2_ref)
    te = f0_ref.shape[0]
    wb = out_refs[0].shape[1]
    n_pad = f0_ref.shape[1]
    num_chunks = n_pad // tj
    t = math.tan(math.radians(cfg.hfov_deg) * 0.5)
    hp = 1.0 / cfg.width
    qfar = 1.0 / cfg.far

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
    u_lo_px = u_p - hp
    u_hi_px = u_p + hp
    # payload stream count (mirrors _compact_group_eval's returns)
    n_pay = (2 if raw else 1) + (1 if has_alb else 0) + (1 if aa else 0)

    def eye_body(e, _):
        def body(k, carry, e=e):
            best_q, best_p = carry
            j0 = pl.multiple_of(k * tj, tj)
            f_v = [r[pl.ds(e, 1), pl.ds(j0, tj)] for r in f_refs]  # (1, TJ)
            l_v = [r[pl.ds(e, 1), pl.ds(j0, tj)] for r in l_refs]
            alb_col = alb_ref[0:1, pl.ds(j0, tj)] if has_alb else None
            fields, _, _, _ = _wf_edge_field_rows(
                f_v, l_v, alb_col, cfg, t, skip_intervals=skip_iv
            )
            q_m, pays = _compact_group_eval(
                lambda fi: fields[fi], u_p, u_lo_px, u_hi_px, cfg, raw,
                has_alb,
            )  # (WB, TJ)
            if track_idx:
                idx = jnp.float32(j0) + jax.lax.broadcasted_iota(
                    jnp.int32, (1, tj), 1
                ).astype(jnp.float32)
                pays = pays + (jnp.broadcast_to(idx, q_m.shape),)
            # per-chunk cross-target (lane) reduce, folded into the
            # (WB, 1) running best — the chunk count is tiny here (usually
            # 1), so a deferred full-tile accumulator would only grow the
            # scoped-vmem live set. The idx stream's min-over-win +
            # strictly-greater chunk merge selects the LOWEST index among
            # equal-depth winners, the division-route kernels' tie rule.
            q_c = jnp.max(q_m, axis=1, keepdims=True)  # (WB, 1)
            win = (q_m == q_c) & (q_c > qfar)
            pays_c = tuple(
                jnp.min(jnp.where(win, pv, jnp.inf), axis=1, keepdims=True)
                for pv in pays
            )
            better = q_c > best_q
            best_p = tuple(
                jnp.where(better, pc, bp) for pc, bp in zip(pays_c, best_p)
            )
            return jnp.maximum(best_q, q_c), best_p

        init_p = [jnp.zeros((wb, 1), jnp.float32) for _ in range(n_pay)]
        if track_idx:
            init_p.append(jnp.full((wb, 1), jnp.inf, jnp.float32))
        init = (jnp.zeros((wb, 1), jnp.float32), tuple(init_p))
        best_q, best_p = jax.lax.fori_loop(0, num_chunks, body, init)
        o_refs = out_refs
        if track_idx:
            o_refs[-1][pl.ds(e, 1), :] = jnp.transpose(best_p[-1])
            best_p, o_refs = best_p[:-1], o_refs[:-1]

        # epilogue: undo the q-homogenization once per (eye, pixel) —
        # mirrors _wireframe_compact_kernel's epilogue exactly
        hit = best_q > qfar
        f = 1.0 / jnp.where(hit, best_q, 1.0)
        depth = jnp.where(hit, f, cfg.far)
        if raw:
            uvx = jnp.where(hit, best_p[0] * f, 0.5)
            uvy = jnp.where(hit, best_p[1] * f, 0.5)
            k = 2
            outs = [uvx, uvy]
            if has_alb:
                outs.append(jnp.where(hit, best_p[k], 1.0))
                k += 1
            if aa:
                outs.append(jnp.where(hit, best_p[k], 0.0))
            outs.append(depth)
        else:
            mag2 = best_p[0] * f * f
            alb = best_p[1] if has_alb else cfg.sprite_albedo
            val = alb * (1.0 - mag2)
            if aa:
                cov = best_p[-1]
                val = cfg.background + cov * (val - cfg.background)
            shade = jnp.where(hit, val, cfg.background)
            outs = [shade, depth]
        for ref, v in zip(o_refs, outs):
            ref[pl.ds(e, 1), :] = jnp.transpose(v)
        return 0

    # the in-kernel field rows + interval temporaries grow the per-eye
    # live set past the division-route kernel's, so the unroll cap halves
    # on wide pixel blocks; narrow blocks (wb <= 128 — the RL observation
    # class this kernel exists for) keep the full cap (swept on v5e at
    # N=1024/W=64: cap 8 -> 1.05e6, cap 16 -> 1.10e6 af/s, cap 32 flat;
    # re-check on silicon per CLAUDE.md's scoped-vmem invariant before
    # deepening — interpret mode will NOT catch an OOM; interpret runs
    # ue=1 via run_eyes_unrolled's global rule)
    cap = WF_RASTER_UNROLL or (
        _unroll_cap(aa=aa) if wb <= 128 else max(1, _unroll_cap(aa=aa) // 2)
    )
    run_eyes_unrolled(eye_body, te, cap)


def _project_chunk_verts(px, py, hx, hy, tx, ty, cth, sth, mj, verts):
    """Rotate the 3 sprite verts to each target's heading and project into
    the eye's view frame as (TJ, 1) columns; masked targets (padding +
    coincident-self) collapse to the degenerate behind-the-eye point
    (f = -1, l = 0: every edge invalid/degenerate). ONE fp route, shared
    by the forward streaming kernel and the backward kernel's tile
    function — the backward identifies winners by an EXACT match against
    a min recomputed through this code, so any reassociation here must
    happen in exactly one place."""
    f_v, l_v = [], []
    for vx, vy in verts:
        wxr = vx * cth - vy * sth
        wyr = vx * sth + vy * cth
        relx = tx + wxr - px
        rely = ty + wyr - py
        fv = relx * hx + rely * hy
        lv = relx * hy - rely * hx
        f_v.append(jnp.where(mj, fv, -1.0))
        l_v.append(jnp.where(mj, lv, 0.0))
    return f_v, l_v


def _wireframe_stream_kernel(
    ex_ref, ey_ref, dx_ref, dy_ref,  # [TE, 1] eye position / unit heading
    tx_ref, ty_ref,  # [N_pad, 1] target positions (sublane-major)
    cx_ref, cy_ref,  # [N_pad, 1] target heading cos/sin (sprite orientation)
    m_ref,  # [N_pad, 1] target padding mask
    *rest,  # [alb_ref ([N_pad, 1]) when has_alb,] output refs
    cfg: VisionConfig,
    tj: int,
    has_alb: bool = False,
    raw: bool = False,
    track_idx: bool = False,
):
    """Streaming wireframe kernel: per target chunk the 3 sprite verts are
    rotated to the target heading and projected into the eye frame as
    (TJ, 1) columns (amortized over the pixel block), then the per-edge
    pixel core runs on (TJ, WB) tiles — the wireframe mirror of
    raycast._raycast_kernel, for N too large for the precompute tensors."""
    from .raycast import _unpack_rest

    aa = cfg.antialias
    alb_ref, out_refs = _unpack_rest(rest, has_alb)
    te = ex_ref.shape[0]
    wb = out_refs[0].shape[1]
    n_pad = tx_ref.shape[0]
    num_chunks = n_pad // tj
    t = math.tan(math.radians(cfg.hfov_deg) * 0.5)
    hp = 1.0 / cfg.width
    r = cfg.sprite_radius
    verts = [(vx * r, vy * r) for vx, vy in SPRITE_VERTS]

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
    )  # (1, WB): pixels on lanes
    ut = u_p * t
    aa_ctx = (u_p, t, hp) if aa else None

    def eye_body(e, _):
        px, py = ex_ref[e, 0], ey_ref[e, 0]
        hx, hy = dx_ref[e, 0], dy_ref[e, 0]

        def body(k, carry, px=px, py=py, hx=hx, hy=hy):
            best_d, best_p = carry
            j0 = pl.multiple_of(k * tj, tj)
            tx = tx_ref[pl.ds(j0, tj), :]  # (TJ, 1)
            ty = ty_ref[pl.ds(j0, tj), :]
            cth = cx_ref[pl.ds(j0, tj), :]
            sth = cy_ref[pl.ds(j0, tj), :]
            # padded targets out; coincident targets out (the dense
            # oracle's explicit self-sprite cull)
            mj = (m_ref[pl.ds(j0, tj), :] > 0.0) & (
                (tx != px) | (ty != py)
            )

            f_v, l_v = _project_chunk_verts(
                px, py, hx, hy, tx, ty, cth, sth, mj, verts
            )

            alb = alb_ref[pl.ds(j0, tj), :] if has_alb else cfg.sprite_albedo
            d_m, p_m = _merge_edges(
                ut, f_v, l_v, alb, cfg, track_uv=raw, aa_ctx=aa_ctx
            )
            if track_idx:
                idx = jnp.float32(j0) + jax.lax.broadcasted_iota(
                    jnp.int32, (tj, 1), 0
                ).astype(jnp.float32)
                p_m = p_m + (jnp.broadcast_to(idx, d_m.shape),)
            return _reduce_chunk(d_m, p_m, best_d, best_p, 0, cfg)

        init = (
            jnp.full((1, wb), cfg.far, jnp.float32),
            _pay_init((1, wb), cfg, raw, has_alb, aa, track_idx=track_idx),
        )
        best_d, best_p = jax.lax.fori_loop(0, num_chunks, body, init)
        o_refs = out_refs
        if track_idx:
            o_refs[-1][pl.ds(e, 1), :] = best_p[-1]
            best_p, o_refs = best_p[:-1], o_refs[:-1]
        if raw:
            for ref, val in zip(o_refs, (*best_p, best_d)):
                ref[pl.ds(e, 1), :] = val
            return 0
        shade, depth = _finish(
            best_d, best_p[0], cfg, cov=best_p[-1] if aa else None
        )
        o_refs[0][pl.ds(e, 1), :] = shade
        o_refs[1][pl.ds(e, 1), :] = depth
        return 0

    # wide-pixel-block shapes (small-m wide-row routing) additionally bound
    # unroll x live-(TJ, WB)-temporaries; the per-edge live set is ~10
    # (TJ, WB) f32 streams (~16 with the AA coverage/interval extras; +2
    # when the winner-index stream rides along)
    cap = _unroll_cap(streaming=True, aa=aa)
    per_eye_bytes = wb * tj * 4 * ((16 if aa else 10) + (2 if track_idx else 0))
    cap = max(1, min(cap, (6 << 20) // max(per_eye_bytes, 1)))
    run_eyes_unrolled(eye_body, te, cap)


def _edge_slab_interval(fa, la, fb, lb, t, cfg: VisionConfig):
    """Per-target slab clip of one edge (the [near, far] x tau-in-[0,1]
    feasible sub-segment) and its screen extent — the per-TARGET half of
    _edge_depth_tau_aa (which CALLS this, so the compact prologue's culling
    bounds can never diverge from the kernels' fragment evaluation).
    Returns (valid, e_lo_v, e_hi_v, tau_lo, tau_hi): raw clipped-endpoint
    screen coords + tau bounds (garbage when ~valid — callers sentinel or
    gate)."""
    df = fb - fa
    dl = lb - la
    safe_df = jnp.where(jnp.abs(df) > 1e-30, df, 1e-30)
    t_near = (cfg.near - fa) / safe_df
    t_far = (cfg.far - fa) / safe_df
    t_in = jnp.minimum(t_near, t_far)
    t_out = jnp.maximum(t_near, t_far)
    flat_edge = jnp.abs(df) <= 1e-30
    tau_lo = jnp.where(flat_edge, 0.0, jnp.maximum(0.0, t_in))
    tau_hi = jnp.where(flat_edge, 1.0, jnp.minimum(1.0, t_out))
    in_slab = (fa > cfg.near) & (fa < cfg.far)
    # boolean select as logic ops: Mosaic cannot lower select_n on i1
    # vectors ("Unsupported target bitwidth for truncation")
    valid = (flat_edge & in_slab) | (~flat_edge & (tau_lo < tau_hi))
    f_lo = jnp.where(valid, fa + tau_lo * df, 1.0)
    f_hi = jnp.where(valid, fa + tau_hi * df, 1.0)
    u_a = (la + tau_lo * dl) / (t * jnp.maximum(f_lo, 1e-30))
    u_b = (la + tau_hi * dl) / (t * jnp.maximum(f_hi, 1e-30))
    return (valid, jnp.minimum(u_a, u_b), jnp.maximum(u_a, u_b),
            tau_lo, tau_hi)


COMPACT_WB = 512  # preferred pixel-block width; swept on v5e (128/256/512/1024)
COMPACT_SUB = 8
COMPACT_UNROLL = 8
# above COMPACT_SORT_MIN_M targets, the prologue compacts with one stable
# multi-operand co-sort instead of the comparison-count rank + one-hot
# contraction; COMPACT_SORT_MAX_M bounds the kernel's all-candidates VMEM
# block (te*K per field column). The sort edition was built to scale past
# the rank's O(n m^2) / the one-hot's O(n m K F), but the r4 silicon
# decomposition (_wf_prolog_quick.py) measured it 2.5x FASTER at m=100 too
# (AA prologue 36.5 -> 14.2 us/step: the rank edition lowers to ~20 small
# launch-bound fused kernels, the variadic lax.sort to a handful), which is
# what finally put the full reference-parity AA eye over the BASELINE 1e6
# line (107.0 -> 90.4 us/step). Default 0 = always sort; the rank edition
# stays as the bit-identical cross-check (pinned by
# tests/test_wireframe_kernel.py::test_compact_sort_prologue_bit_identical).
COMPACT_SORT_MIN_M = 0
# 1024: te=8 x K=1024 field blocks are 2 x 4 MB double-buffered = 8.4 MB
# VMEM in the FORWARD (measured working, r4); K=2048 would be 16.8 MB and
# die in the Mosaic compile helper exactly like the un-chunked backward
# did. Routing m > 1024 wide rows falls back to streaming until the
# forward grows the same candidate-chunking the backward has.
COMPACT_SORT_MAX_M = 1024
# operand layout A/B (hardware sweep via _wf_quick.py):
# PACKED_FIELDS=True feeds the kernel ONE [TE*K, F] candidate-major operand
# instead of F per-field [TE*K, 1] columns. WHOLE_BLOCK=True additionally
# loads one (sub, F) block per group iteration and extracts fields with
# STATIC lane slices; False keeps per-field dynamic (sub, 1) loads.
# History: packed won under the r3 RANK prologue (unpacked added ~20
# per-field slice-copy fusions — the measured ~30 us XLA launch floor).
# r4 re-tested unpacked under the sort prologue (the co-sort's outputs ARE
# per-field columns, zero packing work) and it LOST anyway: the kernel-side
# per-field [TE*K, 1] operand DMAs cost far more than the packed stack
# (measured 145 vs 90 us/step at the reference AA shape). Packed stays.
COMPACT_PACKED_FIELDS = True
COMPACT_WHOLE_BLOCK = True
# op-diet A/B (hardware sweep via _wf_quick.py): INTERVAL_HIT=True swaps the
# in-kernel hit tests for the prologue's slab-clipped screen intervals —
# they are EXACTLY the {tau in [0,1]} x {f in [near, far]} region (u is
# monotone in tau along the clipped segment), already computed for culling:
#   plain: (q>qfar)&(q<qnear)&(tq>=0)&(tq<=q) -> (u>=e_lo)&(u<=e_hi)&(q<qnear)
#          (7 ops -> 5 per edge; plain rows then carry the 6 interval lanes.
#          q<qnear stays as a conditioning guard — see the kernel comment)
#   AA:    drop `& (q > qfar)` — q at the interval-clamped u_c is in
#          [qfar, qnear] by construction and the epilogue re-tests hit, so
#          a sub-qfar winner decodes to background either way; the 3-edge
#          sprite-union min/max (4 ops) loads precompacted instead (2 lanes).
#          (AA's exposure to ill-conditioned 1/Kc edges is UNCHANGED from
#          the default route, which also has no qnear/tq cross-check.)
# Output-equal at fp tolerances, NOT bit-identical: interval endpoints ride
# a division fp route, the per-pixel tests an FMA route, so a pixel sitting
# within ~1 ulp of an edge boundary may flip (tests pin vs the dense oracle
# at the route's usual tolerances).
# Measured on v5e (r3 _wf_quick sweep, n100/w1024 + unroll 2): IH wins AA
# decisively (139.8 -> 106.2 us/step with unroll; the precompacted union +
# dropped far test) but COSTS the plain row ~5 us (100.9 vs 95.5 — plain's
# 7->3 op diet is outweighed by the 6 extra operand lanes it loads), so the
# default is PER-MODE: None routes AA rows through interval-hit and plain
# rows through the FMA hit test; True/False force one route for both modes
# (the A/B switch the flag tests pin).
COMPACT_INTERVAL_HIT = None
# groups evaluated per dynamic-loop iteration (the loop boundary costs ~50
# cycles; at ~4 in-range groups per (eye, block) that rivals the eval work).
# BIT-identical to 1 at any value — duplicate tail groups merge as no-ops
# (see the unroll comment in _wireframe_compact_kernel). Swept on v5e
# (r3 _wf_quick): 2 wins every shape (plain 105.7 -> 95.5 us, AA+IH
# 116.0 -> 106.2); 4 only pays without IH's shorter bodies; 8 regresses
# everywhere (duplicate-tail waste at ~4 in-range groups per block).
COMPACT_GROUP_UNROLL = 2
# many-target (G >= COMPACT_MANY_G groups) forward launches unroll deeper:
# long group ranges amortize the ~50-cycle dynamic loop boundary (r4 v5e
# sweep at N=1024/W=1024 AA: R=2 1.64e5, R=4 1.82e5, R=6 1.88e5, R=8
# 1.88e5 — the plateau says the boundary is amortized by 6; R at the
# few-target reference shapes stays COMPACT_GROUP_UNROLL)
COMPACT_GROUP_UNROLL_MANY = 6
COMPACT_MANY_G = 64


def _interval_hit(aa: bool) -> bool:
    """Resolve the tri-state COMPACT_INTERVAL_HIT for a sprite row mode.
    Every layout/kernel/prologue site MUST resolve through this one
    function — the operand lane count, the kernel's hit test, and the
    backward's recompute have to agree."""
    ih = COMPACT_INTERVAL_HIT
    return aa if ih is None else ih


def _compact_field_count(aa: bool, has_alb: bool) -> int:
    """Lane count of the compacted constant array: 4 inverse-depth
    constants (A, Bu, C, Du) per edge, the per-edge screen intervals
    (e_lo, e_hi) in AA mode (and in plain mode under COMPACT_INTERVAL_HIT),
    then albedo, then the sprite-union interval (AA + INTERVAL_HIT only).
    The kernel indexes lanes with the same 4*ei / 12+2*ei /
    _compact_alb_idx arithmetic."""
    ih = _interval_hit(aa)
    return (12 + (6 if (aa or ih) else 0) + (1 if has_alb else 0)
            + (2 if (aa and ih) else 0))


def _compact_alb_idx(aa: bool) -> int:
    return 12 + (6 if (aa or _interval_hit(aa)) else 0)


def _compact_group_eval(fld, u_p, u_lo_px, u_hi_px, cfg: VisionConfig,
                        raw: bool, has_alb: bool, q_only: bool = False):
    """Per-candidate fragment evaluation over one 8-candidate group — the
    compact kernel's inner loop body, shared by the forward kernel and the
    backward kernel (which pulls it back with jax.vjp and must recompute
    the SAME fp route for exact winner matching). `fld(fi) -> (sub, 1)`
    abstracts the operand layout. Returns (q_m (sub, WB) merged homogenized
    depth, pays tuple of (sub, WB) winner payloads); `q_only` skips the
    payload selects (the backward's cheap pass-1 winner recompute)."""
    aa = cfg.antialias
    ih = _interval_hit(aa)
    qfar = 1.0 / cfg.far
    qnear = 1.0 / cfg.near
    hp = 1.0 / cfg.width
    q_m = p_m = None
    sp_lo = sp_hi = None
    for ei, (quad, (uva, duv)) in enumerate(zip(_EDGE_QUAD, _EDGE_UV)):
        av = fld(4 * ei + 0)
        bu = fld(4 * ei + 1)
        cv = fld(4 * ei + 2)
        du = fld(4 * ei + 3)
        if aa:
            elv = fld(12 + 2 * ei + 0)
            ehv = fld(12 + 2 * ei + 1)
            u_c = jnp.clip(u_p, elv, ehv)  # (sub, WB)
            q = av + bu * u_c
            tq = cv + du * u_c
            cov_e = (ehv > u_lo_px) & (elv < u_hi_px)
            if ih:
                # q at the clamped u_c is >= qfar by slab-clip construction
                # (see COMPACT_INTERVAL_HIT); the epilogue re-tests hit
                qg = jnp.where(cov_e, q, 0.0)
            else:
                qg = jnp.where(cov_e & (q > qfar), q, 0.0)
                sp_lo = elv if sp_lo is None else jnp.minimum(sp_lo, elv)
                sp_hi = ehv if sp_hi is None else jnp.maximum(sp_hi, ehv)
        elif ih:
            # the slab-clipped screen interval IS the plain hit region; the
            # q < qnear bound stays as a conditioning guard — near eye-edge
            # collinearity (|Kc| small) q rides 1/Kc and cancellation can
            # produce garbage q at interval-passing pixels, and this at
            # least bounds a garbage winner's depth to > near (the sub-qfar
            # side needs no guard: the epilogue re-tests hit = q > qfar)
            elv = fld(12 + 2 * ei + 0)
            ehv = fld(12 + 2 * ei + 1)
            q = av + bu * u_p  # (sub, WB)
            tq = cv + du * u_p
            hit = (u_p >= elv) & (u_p <= ehv) & (q < qnear)
            qg = jnp.where(hit, q, 0.0)
        else:
            q = av + bu * u_p  # (sub, WB)
            tq = cv + du * u_p
            hit = (q > qfar) & (q < qnear) & (tq >= 0.0) & (tq <= q)
            qg = jnp.where(hit, q, 0.0)
        if q_only:
            q_m = qg if q_m is None else jnp.maximum(q_m, qg)
            continue
        if raw:
            p_e = (uva[0] * q + tq * duv[0], uva[1] * q + tq * duv[1])
        else:
            c0, c1, c2 = quad
            p_e = ((c0 * q + c1 * tq) * q + c2 * tq * tq,)
        if q_m is None:
            q_m, p_m = qg, p_e
        else:
            take = qg > q_m
            p_m = tuple(
                jnp.where(take, pe, pm) for pe, pm in zip(p_e, p_m)
            )
            q_m = jnp.maximum(q_m, qg)
    if q_only:
        return q_m, ()
    pays = p_m
    if has_alb:
        pays = pays + (fld(_compact_alb_idx(aa)),)  # (sub, 1): broadcasts
    if aa and ih:
        # precompacted 3-edge union interval (2 lane loads for 4 min/max)
        sp0 = _compact_alb_idx(aa) + (1 if has_alb else 0)
        sp_lo = fld(sp0)
        sp_hi = fld(sp0 + 1)
    if aa:
        cov = jnp.clip(
            (
                jnp.minimum(sp_hi, u_hi_px)
                - jnp.maximum(sp_lo, u_lo_px)
            )
            * (0.5 / hp),
            0.0,
            1.0,
        )
        pays = pays + (cov,)
    return q_m, pays


def _wireframe_compact_kernel(
    ks_ref, ke_ref,  # [TE, P] SMEM: per-(eye, pixel-block) group range
    *rest,  # F field refs ([TE*K, 1] eye-major constant columns) + out refs
    cfg: VisionConfig,
    n_fields: int,
    K: int,
    has_alb: bool = False,
    raw: bool = False,
    group_unroll: int | None = None,
):
    """Compacted-candidate inverse-depth wireframe kernel for few-target
    wide rows (the reference's own N=100 x W=1024 eye, src/main.rs:654+694).

    Three structural changes vs _wireframe_stream_kernel buy the ~4x it
    needs to clear the 1e6 agent-frames/s line (VERDICT r2 #1):

    1. INVERSE DEPTH: along an edge, 1/f and tau/f are affine in the screen
       coordinate (classic perspective-correct interpolation): with
       Kc = fa*dl - la*df (constant per edge-target),
           q(u)    = 1/f   = (dl - u*t*df) / Kc = A + Bu*u
           (tau*q)(u)      = (fa*u*t - la) / Kc = C + Du*u
       so the per-pixel core is 2 FMAs + compares — ZERO per-pixel
       divisions. Depth compares flip to max-q; payloads ride q-homogenized
       (m2q2 = mag2*q^2, uv*q) and divide by the winner's q once per
       (eye, pixel) in the epilogue. The handful of per-target divisions
       (slab clip + 1/Kc) moved to the XLA prologue entirely.
    2. SCREEN-SORTED CANDIDATE COMPACTION (the XLA prologue,
       _compact_candidates): per eye, only screen-visible sprites survive,
       ranked by their interval's left edge and compacted into K slots via
       a gather-free one-hot contraction. Sorting makes 8-candidate groups
       screen-local, so each 128-pixel block genuinely overlaps only ~1-2
       groups — with random target order any group's union interval spans
       most of the row and interval culling never engages (measured: a
       raw-order lax.cond tile-skip variant ran at the FULL-work rate).
    3. DYNAMIC GROUP RANGES: the prologue also computes, per (eye,
       pixel-block), the [ks, ke) range of candidate groups whose union
       screen interval overlaps the block; the kernel loops exactly that
       range with a dynamic-bound fori_loop over full-VREG (8, WB) tiles —
       no per-tile branching at all.

    Empty slots compact to all-zero constants (q = 0: never a hit) with
    +-4 off-screen interval sentinels; K = round_up(m, 8), so every
    visible sprite always has a slot and no fallback is needed. Same
    observable semantics as the streaming kernel (plain + AA + raw
    texture + albedo), tolerance-level fp differences only."""
    aa = cfg.antialias
    if COMPACT_PACKED_FIELDS:
        fld_refs = rest[:1]
        out_refs = rest[1:]
        assert fld_refs[0].shape[1] == n_fields, "packed-field operand mismatch"
    else:
        fld_refs = rest[:n_fields]
        out_refs = rest[n_fields:]
    te = fld_refs[0].shape[0] // K
    wb = out_refs[0].shape[1]
    hp = 1.0 / cfg.width
    qfar = 1.0 / cfg.far
    sub = COMPACT_SUB
    n_pay = (2 if raw else 1) + (1 if has_alb else 0) + (1 if aa else 0)
    p = pl.program_id(1)

    p0 = p * wb
    u_p = (
        2.0
        * (
            p0
            + jax.lax.broadcasted_iota(jnp.int32, (1, wb), 1).astype(jnp.float32)
            + 0.5
        )
        / cfg.width
        - 1.0
    )  # (1, WB): pixels on lanes
    u_lo_px = u_p - hp
    u_hi_px = u_p + hp

    def eye_body(e, _):
        def grp(g, carry):
            best_q, best_p = carry
            g0 = pl.multiple_of(g * sub, sub)
            # every load pattern keeps the (sub, 1)-per-field value shape at
            # a dynamic 8-aligned sublane offset; only the FETCH differs:
            off = pl.multiple_of(e * K + g0, sub)
            if COMPACT_PACKED_FIELDS and COMPACT_WHOLE_BLOCK:
                # one dynamic-sublane load of the whole (sub, F) constant
                # block per group iteration; per-field extraction is a
                # STATIC lane slice on the loaded value
                blk = fld_refs[0][pl.ds(off, sub), :]

                def fld(fi):
                    return jax.lax.slice_in_dim(blk, fi, fi + 1, axis=1)

            elif COMPACT_PACKED_FIELDS:
                # per-field dynamic (sub, 1) loads from the packed operand
                # (the sweep fallback if the block load lowers worse)
                def fld(fi):
                    return fld_refs[0][pl.ds(off, sub), pl.ds(fi, 1)]

            else:
                # separate eye-major field columns — the exact load pattern
                # the streaming kernel's target chunks use
                def fld(fi):
                    return fld_refs[fi][pl.ds(off, sub), :]

            q_m, pays = _compact_group_eval(
                fld, u_p, u_lo_px, u_hi_px, cfg, raw, has_alb
            )
            # DEFERRED winner reduce: groups merge elementwise into a
            # (sub, WB) accumulator (depth-max is associative across any
            # candidate partition) and the cross-sublane reduce runs ONCE
            # per (eye, block) after the loop — saves ~18 ops per tile on
            # the single-issue-bound VPU
            better = q_m > best_q
            best_p = tuple(
                jnp.where(better, pv, bp) for pv, bp in zip(pays, best_p)
            )
            return jnp.maximum(best_q, q_m), best_p

        init = (
            jnp.zeros((sub, wb), jnp.float32),
            tuple(jnp.zeros((sub, wb), jnp.float32) for _ in range(n_pay)),
        )
        ks = ks_ref[e, p]
        ke = ke_ref[e, p]
        R_cfg = COMPACT_GROUP_UNROLL if group_unroll is None else group_unroll
        if R_cfg <= 1:
            acc_q, acc_p = jax.lax.fori_loop(ks, ke, grp, init)
        else:
            # unrolled group loop: the dynamic-bound loop boundary costs
            # ~50 cycles per iteration — a meaningful slice of the kernel
            # at ~4 groups per (eye, block). Processing R groups per
            # iteration is BIT-identical: group ranges are a performance
            # cut only (out-of-range candidates fail every per-pixel
            # interval/hit test by construction), ties keep group order,
            # and the tail clamps to the LAST in-range group, whose
            # duplicate max/strict-greater merges are no-ops. Clamping to
            # ke-1 (not G-1) keeps the loop inside this eye's slots.
            R = R_cfg
            last = jnp.maximum(ks, ke - 1)  # ks==ke: empty loop, unused

            def grp_r(i, carry):
                g0 = ks + R * i
                for r in range(R):
                    carry = grp(jnp.minimum(g0 + r, last), carry)
                return carry

            n_it = (ke - ks + (R - 1)) // R
            acc_q, acc_p = jax.lax.fori_loop(0, n_it, grp_r, init)
        best_q = jnp.max(acc_q, axis=0, keepdims=True)  # (1, WB)
        win = (acc_q == best_q) & (best_q > qfar)
        best_p = tuple(
            jnp.min(jnp.where(win, pv, jnp.inf), axis=0, keepdims=True)
            for pv in acc_p
        )

        # epilogue: undo the q-homogenization once per (eye, pixel)
        hit = best_q > qfar
        f = 1.0 / jnp.where(hit, best_q, 1.0)
        depth = jnp.where(hit, f, cfg.far)
        if raw:
            uvx = jnp.where(hit, best_p[0] * f, 0.5)
            uvy = jnp.where(hit, best_p[1] * f, 0.5)
            k = 2
            outs = [uvx, uvy]
            if has_alb:
                outs.append(jnp.where(hit, best_p[k], 1.0))
                k += 1
            if aa:
                outs.append(jnp.where(hit, best_p[k], 0.0))
            outs.append(depth)
        else:
            mag2 = best_p[0] * f * f
            alb = best_p[1] if has_alb else cfg.sprite_albedo
            val = alb * (1.0 - mag2)
            if aa:
                cov = best_p[-1]
                val = cfg.background + cov * (val - cfg.background)
            shade = jnp.where(hit, val, cfg.background)
            outs = [shade, depth]
        for ref, v in zip(out_refs, outs):
            ref[pl.ds(e, 1), :] = v
        return 0

    run_eyes_unrolled(eye_body, te, COMPACT_UNROLL)


def _project_verts_all(pos, dirs, tgt, hdg, cfg: VisionConfig, n_pad_t: int):
    """Fused XLA projection of every target's 3 sprite verts into every eye:
    6 tensors (f_v, l_v per vert), each [N_e, N_t_pad]. Padded targets AND
    targets coincident with the eye (the explicit self-sprite cull of the
    dense oracle, vision.render._agent_row_wireframe) get the degenerate
    behind-the-eye encoding (f=-1, l=0: no edge crossing)."""
    r = cfg.sprite_radius
    verts = jnp.asarray(SPRITE_VERTS, jnp.float32) * r  # [3, 2]
    cth, sth = hdg[:, 0], hdg[:, 1]
    vx = verts[None, :, 0] * cth[:, None] - verts[None, :, 1] * sth[:, None]
    vy = verts[None, :, 0] * sth[:, None] + verts[None, :, 1] * cth[:, None]
    wx = tgt[:, 0:1] + vx  # [N_t, 3]
    wy = tgt[:, 1:2] + vy
    relx = wx[None, :, :] - pos[:, None, 0:1]  # [N_e, N_t, 3]
    rely = wy[None, :, :] - pos[:, None, 1:2]
    f = relx * dirs[:, None, 0:1] + rely * dirs[:, None, 1:2]
    l = relx * dirs[:, None, 1:2] - rely * dirs[:, None, 0:1]
    coincident = (
        (tgt[None, :, 0:1] == pos[:, None, 0:1])
        & (tgt[None, :, 1:2] == pos[:, None, 1:2])
    )  # [N_e, N_t, 1]
    f = jnp.where(coincident, -1.0, f)
    l = jnp.where(coincident, 0.0, l)
    pad = n_pad_t - tgt.shape[0]
    if pad:
        f = jnp.pad(f, ((0, 0), (0, pad), (0, 0)), constant_values=-1.0)
        l = jnp.pad(l, ((0, 0), (0, pad), (0, 0)), constant_values=0.0)
    return [f[:, :, v] for v in range(3)], [l[:, :, v] for v in range(3)]


# 6 [N_e, N_t] tensors (vs the disc path's 3) — halve the element gate so the
# HBM footprint matches raycast._PRECOMPUTE_MAX_ELEMS.
_PRECOMPUTE_MAX_ELEMS = 1 << 23

# raster-launcher tile knobs (r5, for the n=1024/W=64 single-env sweep —
# VERDICT r4 #4): eyes per program and the per-(eye-block) temp element
# budget that sets tj_p. Defaults reproduce the r2-swept launcher
# behavior exactly; sweep on silicon with _wf_n1024_sweep.py.
WF_RASTER_TE = 32
WF_RASTER_TEMP_ELEMS = 1 << 16
# route the raster branch through the inverse-depth rasterq kernel (r5;
# measured on v5e at N=1024/W=64 — see DESIGN 4g). track_idx launches ride
# it too: the winner residual is an index and the pullback re-evaluates
# the fragment independently, so the diff forward needs no fp-route
# matching (near-tie index flips route the cotangent to the other tied
# fragment — a valid subgradient, the documented winner-route tie rule).
WF_RASTERQ = True


def _wf_num_outputs(raw: bool, has_alb: bool, aa: bool,
                    track_idx: bool = False) -> int:
    """(shade, depth) normally — AA coverage is blended in-kernel; raw mode
    emits (uvx, uvy[, alb][, cov], depth) for the XLA texture epilogue;
    track_idx appends the winner-index row LAST in either mode."""
    if not raw:
        return 2 + (1 if track_idx else 0)
    return 3 + (1 if has_alb else 0) + (1 if aa else 0) + (
        1 if track_idx else 0
    )


def _compact_small_m_wide(cfg: VisionConfig, m: int) -> bool:
    """Few-target wide rows (the reference's own N=100 x W=1024 eye): the
    r3-swept rule shared with the disc kernel (ops/raycast.py)."""
    return (
        cfg.width >= 512
        and cfg.width % 128 == 0
        and round_up(m, 8) * min(cfg.width, 1024) <= (1 << 18)
    )


def _compact_route_ok(cfg: VisionConfig, m: int) -> bool:
    """THE compact-route predicate — render_rows_wireframe_tiled's router,
    the diff path's fwd/bwd pair, and the ring's per-hop routing all call
    this one function (fwd and bwd must agree on the route: the backward
    recomputes the winner on the compact fp route). Covers both the
    small-m and the sorted-prologue many-target editions;
    COMPACT_SORT_MAX_M bounds the kernel's all-candidates VMEM block."""
    wide_ok = cfg.width >= 512 and cfg.width % 128 == 0
    return _compact_small_m_wide(cfg, m) or (
        wide_ok and round_up(m, 8) <= COMPACT_SORT_MAX_M
    )


# narrow-row compact DIFF route (r3): the streaming backward costs
# ~constant-per-(eye, target-chunk) FULL n x m vjp work at ANY width, so at
# the RL observation shape (N=1024 agents, W=64 rows) the diff path
# measured only ~1.2e4 agent-frames/s while the FORWARD is fine. The
# compact backward inherits group-range culling and the cheap inverse-depth
# winner recompute; the cycle model said ~10x.
#
# MEASURED NEGATIVE (r4, v5e) — stays False:
# - perf: 1.32e4 vs 1.14e4 af/s at N=1024/W=64 — +16%, not 10x. W=64 is ONE
#   pixel block, so the per-(eye, block) group ranges cover every visible
#   candidate and the culling that pays at wide rows never engages; what
#   remains is the op-diet win minus the sort-prologue cost.
# - parity: at cluttered scenes (n=256, spread 100) the compact fp route
#   flips near-tie winners vs dense autodiff on whole pixels: 4.1% of vel
#   grad entries off at 2e-4 tolerance ON SILICON, 4.7% on CPU interpret —
#   route-inherent (NOT a Mosaic lowering bug; the r3 n=64 clean-scene pin
#   passed because clutter drives tie density). The streaming backward's
#   trusted-depth route (bit-identical winner recompute) is exact by
#   construction and is the shipped default instead (+18%, same order).
COMPACT_DIFF_NARROW = False
COMPACT_DIFF_NARROW_MIN_M = 32  # below: tiny scenes, streaming bwd is fine


def _compact_diff_route_ok(cfg: VisionConfig, m: int) -> bool:
    """Route predicate for the DIFF paths only (fwd and bwd must agree)."""
    if _compact_route_ok(cfg, m):
        return True
    return (
        COMPACT_DIFF_NARROW
        and cfg.width % 8 == 0
        and cfg.width <= 1024
        and m >= COMPACT_DIFF_NARROW_MIN_M
        and round_up(m, 8) <= COMPACT_SORT_MAX_M
    )


# the BACKWARD's prologue recompute runs under jax.vjp, and the two
# compaction editions transpose very differently: the sort edition pulls
# cotangents back through lax.sort (JAX lowers that to a scatter by the
# inverse permutation — serial on TPU) plus a SECOND build_fields pass,
# while the rank edition's one-hot contraction transposes to another
# einsum (MXU work). The r4 switch to always-sort (COMPACT_SORT_MIN_M=0)
# silently HALVED the n=100/W=1024 diff rate (BENCH_r03 2.17e5 ->
# BENCH_r04 1.06e5) because the three bwd builds inherited the forward's
# threshold. The editions are bit-identical (pinned), so the backward may
# recompute with EITHER — keep rank in the backward at any m the rank's
# O(n*m^2) comparison count tolerates, independent of the forward's route.
COMPACT_BWD_SORT_MIN_M = 256

# the backward chunks its candidate axis so the (te*K_c, F) field block +
# the dfld accumulator fit VMEM: VMEM tiles are (8, 128) f32, so each block
# occupies te*K_c*128*4 bytes REGARDLESS of F (~20 lanes used of 128), and
# Mosaic double-buffers both. Found on silicon (r4): the un-chunked
# backward at te=8, K=1024 is 2 x 4 MB x 2 = 16 MB and the Mosaic compile
# helper dies; te=8, K_c=512 is 8.4 MB and compiles. Chunks are
# independent because the kernel's local-winner-vs-final-depth gate (built
# for the ring's cross-block hops) already rejects pixels whose global
# winner lives in another chunk.
COMPACT_BWD_K_CHUNK = 512


def _compact_wb(cfg: VisionConfig) -> int:
    """Pixel-block width ladder, shared by the compact forward launcher,
    the compact backward launcher, and the prologue group-range builders —
    ks/ke bake in P = width // wb, so every site must agree. The sub-128
    rungs serve the narrow-row DIFF route (one lane-padded block per row;
    the wide routes always hit 512/256/128 first)."""
    return next(d for d in (COMPACT_WB, 256, 128, 64, 32, 16, 8)
                if cfg.width % d == 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "te", "tj", "force_streaming", "force_compact", "track_idx",
    ),
)
def render_rows_wireframe_tiled(
    pos: jax.Array,
    vel: jax.Array,
    cfg: VisionConfig,
    te: int = EYES_PER_PROGRAM,
    tj: int = TILE_J,
    targets: jax.Array | None = None,
    target_vel: jax.Array | None = None,
    albedo: jax.Array | None = None,
    texture: jax.Array | None = None,
    force_streaming: bool = False,
    force_compact: bool = False,
    track_idx: bool = False,
):
    """Pallas counterpart of vision.render.render_rows with
    sprite_mode='wireframe'. pos, vel: [N, 2] -> (shade [N, W], depth [N, W]).

    `targets`/`target_vel` render the eyes against a different position set
    (partial rows depth-merge with vision.render.merge_rows); `albedo` [M]
    gives each target its own base brightness. `texture` [Ht, Wt] samples
    the skin at the winner's interpolated edge uv (scene.frag:11-14): the
    kernels track (uvx, uvy) winner streams and the bilinear lookup runs in
    an XLA epilogue outside Mosaic.

    `track_idx=True` appends the winner's global target index [N, W] as a
    LAST return (f32; +inf at background pixels) — the winner-index
    backward's residual. Routes to raster/streaming only (the compact
    kernel's candidates are permuted; its own backward covers it).
    """
    if cfg.sprite_mode != "wireframe":
        raise ValueError("render_rows_wireframe_tiled needs sprite_mode='wireframe'")
    raw = texture is not None
    if targets is None:
        tgt, tvel = pos, vel
    else:
        if target_vel is None:
            raise ValueError("wireframe sprites need target_vel with targets")
        tgt, tvel = targets, target_vel
    n = pos.shape[0]
    m = tgt.shape[0]
    dirs = camera.unit_heading(vel)
    hdg = camera.unit_heading(tvel)

    if cfg.width <= 128:
        wb = cfg.width
    elif cfg.width % 128 == 0:
        wb = 128
    elif cfg.width <= 256:
        wb = cfg.width
    else:
        raise ValueError(
            f"the Pallas render path needs vision width <= 256 or a multiple "
            f"of 128, got {cfg.width}; use backend='dense' for odd widths"
        )

    n_pad_e = round_up(n, te)
    has_alb = albedo is not None

    # wide-row shapes (few-target small-m AND sorted-prologue many-target
    # editions) route to the compacted-candidate inverse-depth kernel;
    # force_streaming (the narrow-shape diff path) stays on the streaming
    # kernel, whose op order its backward recomputes; force_compact is the
    # narrow-row DIFF route (its culled backward only speaks compact)
    small_m_wide = _compact_small_m_wide(cfg, m)
    if (
        (force_compact or _compact_route_ok(cfg, m))
        and not force_streaming
        and not track_idx
    ):
        return _render_compact(
            pos, dirs, tgt, hdg, cfg, te, albedo, texture, n, m
        )
    if small_m_wide:
        tj = round_up(m, 8)
        wb = next(d for d in (1024, 512, 256, 128) if cfg.width % d == 0)

    # precompute path (same gates as the disc kernel, halved for 6 tensors).
    # force_streaming skips it: the diff path's backward kernel recomputes
    # projections with the streaming op order, and the forward must follow
    # the SAME fp route so winner/coverage decisions agree bit-for-bit
    te_p = fit_tile(WF_RASTER_TE, n, 8)
    if (
        not force_streaming
        and not small_m_wide
        and n_pad_e * round_up(m, 128) <= _PRECOMPUTE_MAX_ELEMS
        and 6 * te_p * round_up(m, 128) * 4 <= (6 << 20)
    ):
        if round_up(m, 128) <= 128 and cfg.width % 128 == 0 and cfg.width > 128:
            wb = next(d for d in (512, 256, 128) if cfg.width % d == 0)
            te_p = fit_tile(16, n, 8)
        n_pad_e_p = round_up(n, te_p)
        tj_p = fit_tile(
            min(1024, max(128, WF_RASTER_TEMP_ELEMS // wb)), m, 128
        )
        n_pad_t_p = round_up(m, tj_p)
        f_v, l_v = _project_verts_all(pos, dirs, tgt, hdg, cfg, n_pad_t_p)
        if n_pad_e_p != n:
            padw = ((0, n_pad_e_p - n), (0, 0))
            f_v = [jnp.pad(x, padw, constant_values=-1.0) for x in f_v]
            l_v = [jnp.pad(x, padw, constant_values=0.0) for x in l_v]

        grid = (n_pad_e_p // te_p, cfg.width // wb)
        if WF_RASTERQ:
            # track_idx rides rasterq too (r5): the winner residual is an
            # INDEX and the pullback re-evaluates the fragment
            # independently (_winner_fragment_rows), so no fp-route
            # matching is needed — near-tie index flips vs the division
            # route hand the cotangent to the other tied fragment, a valid
            # subgradient (DESIGN 4d winner-index notes)
            kernel = functools.partial(
                _wireframe_rasterq_kernel, cfg=cfg, tj=tj_p,
                has_alb=has_alb, raw=raw, track_idx=track_idx,
            )
        else:
            kernel = functools.partial(
                _wireframe_raster_kernel, cfg=cfg, tj=tj_p, has_alb=has_alb,
                raw=raw, track_idx=track_idx,
            )
        pspec = lambda: pl.BlockSpec(
            (te_p, n_pad_t_p), lambda i, p: (i, 0), memory_space=pltpu.VMEM
        )
        ospec = lambda: pl.BlockSpec(
            (te_p, wb), lambda i, p: (i, p), memory_space=pltpu.VMEM
        )
        in_specs = [pspec() for _ in range(6)]
        args = [f_v[0], l_v[0], f_v[1], l_v[1], f_v[2], l_v[2]]
        if has_alb:
            in_specs.append(
                pl.BlockSpec(
                    (1, n_pad_t_p), lambda i, p: (0, 0), memory_space=pltpu.VMEM
                )
            )
            args.append(row(pad_axis(albedo, n_pad_t_p)))
        n_out = _wf_num_outputs(raw, has_alb, cfg.antialias, track_idx)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[ospec() for _ in range(n_out)],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad_e_p, cfg.width), jnp.float32)
                for _ in range(n_out)
            ],
            cost_estimate=pl.CostEstimate(
                flops=60 * n_pad_e_p * n_pad_t_p * cfg.width,
                bytes_accessed=(
                    6 * n_pad_e_p * n_pad_t_p + 2 * n_pad_e_p * cfg.width
                )
                * 4,
                transcendentals=0,
            ),
            interpret=interpret_mode(),
        )(*args)
        outs = [o[:n] for o in outs]
        return _wf_finish_outs(outs, cfg, texture, has_alb, raw, track_idx)

    # streaming path
    tj = fit_tile(tj, m, 8)
    outs = _stream_outs(
        pos, dirs, tgt, hdg, cfg, te, tj, wb, albedo, n, m, n_pad_e, raw,
        track_idx=track_idx,
    )
    outs = [o[:n] for o in outs]
    return _wf_finish_outs(outs, cfg, texture, has_alb, raw, track_idx)


def _wf_finish_outs(outs, cfg: VisionConfig, texture, has_alb: bool,
                    raw: bool, track_idx: bool):
    """Shared launcher epilogue: texture-decode raw streams, and split the
    winner-index row (always the kernels' LAST output) back out."""
    widx = None
    if track_idx:
        widx, outs = outs[-1], outs[:-1]
    if raw:
        shade, depth = _decode_textured_wf(
            outs, cfg, texture, has_alb, aa=cfg.antialias
        )
    else:
        shade, depth = outs[0], outs[1]
    if track_idx:
        return shade, depth, widx
    return shade, depth


def _stream_outs(pos, dirs, tgt, hdg, cfg: VisionConfig, te, tj, wb, albedo,
                 n, m, n_pad_e, raw: bool, track_idx: bool = False):
    """The streaming pallas_call: pads inputs, returns the UNSLICED
    [n_pad_e, W] output list (callers slice and texture-decode)."""
    has_alb = albedo is not None
    n_pad_t = round_up(m, tj)
    ex = pad_axis(pos[:, 0], n_pad_e)
    ey = pad_axis(pos[:, 1], n_pad_e)
    dx = pad_axis(dirs[:, 0], n_pad_e)
    dy = pad_axis(dirs[:, 1], n_pad_e)
    tx = pad_axis(tgt[:, 0], n_pad_t)
    ty = pad_axis(tgt[:, 1], n_pad_t)
    cx = pad_axis(hdg[:, 0], n_pad_t)
    cy = pad_axis(hdg[:, 1], n_pad_t)
    mask = pad_axis(jnp.ones((m,), jnp.float32), n_pad_t)

    grid = (n_pad_e // te, cfg.width // wb)
    kernel = functools.partial(
        _wireframe_stream_kernel, cfg=cfg, tj=tj, has_alb=has_alb, raw=raw,
        track_idx=track_idx,
    )
    espec = lambda: pl.BlockSpec(
        (te, 1), lambda i, p: (i, 0), memory_space=pltpu.VMEM
    )
    tspec = lambda: pl.BlockSpec(
        (n_pad_t, 1), lambda i, p: (0, 0), memory_space=pltpu.VMEM
    )
    ospec = lambda: pl.BlockSpec(
        (te, wb), lambda i, p: (i, p), memory_space=pltpu.VMEM
    )
    in_specs = [espec()] * 4 + [tspec()] * 5
    args = [
        col(ex), col(ey), col(dx), col(dy),
        col(tx), col(ty), col(cx), col(cy), col(mask),
    ]
    if has_alb:
        in_specs.append(tspec())
        args.append(col(pad_axis(albedo, n_pad_t)))
    n_out = _wf_num_outputs(raw, has_alb, cfg.antialias, track_idx)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[ospec() for _ in range(n_out)],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad_e, cfg.width), jnp.float32)
            for _ in range(n_out)
        ],
        cost_estimate=pl.CostEstimate(
            flops=70 * n_pad_e * n_pad_t * cfg.width,
            bytes_accessed=(4 * n_pad_e + 5 * n_pad_t + 2 * n_pad_e * cfg.width)
            * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(*args)
    return list(outs)


# batched routing: per-field f32 element budget for letting the vmapped
# raster path materialize its 6 [B, n_pad, m_pad] projection tensors
# (1 << 26 elems = 256 MB/field, ~1.6 GB total — comfortable in 16 GB HBM
# alongside RL trajectories). Above it, the env axis folds into the
# streaming kernel's grid instead (HBM stays at [B*N] position columns).
BATCHED_RASTER_MAX_ELEMS = 1 << 26


def _batched_raster_elems(b: int, n: int, cfg: VisionConfig) -> int:
    """Per-field f32 element count of the vmapped raster route's projection
    tensors, computed with the LAUNCHER's actual padding — te_p/tj_p rules
    mirrored from render_rows_wireframe_tiled's precompute branch (advisor
    r4: the old round_up(n,8)*round_up(n,128) estimate undercounted the
    real HBM footprint by up to ~2x at awkward n near the budget)."""
    if cfg.width <= 128 or cfg.width % 128 != 0:
        wb = cfg.width if cfg.width <= 256 else 128
    else:
        wb = 128
    te_p = fit_tile(32, n, 8)
    if round_up(n, 128) <= 128 and cfg.width % 128 == 0 and cfg.width > 128:
        wb = next(d for d in (512, 256, 128) if cfg.width % d == 0)
        te_p = fit_tile(16, n, 8)
    tj_p = fit_tile(min(1024, max(128, (1 << 16) // wb)), n, 128)
    return b * round_up(n, te_p) * round_up(n, tj_p)


def render_rows_wireframe_batched(
    pos: jax.Array,
    vel: jax.Array,
    cfg: VisionConfig,
    te: int = EYES_PER_PROGRAM,
    tj: int = TILE_J,
    albedo: jax.Array | None = None,
    texture: jax.Array | None = None,
    force_streaming: bool = False,
    track_idx: bool = False,
):
    """Batched-env exact-sprite rendering: pos, vel [B, N, 2] ->
    (shade, depth) [B, N, W], each env self-rendered against its own
    sprites — the RL observation hot path (the reference renders all N
    eyes per frame in one pass, src/main.rs:584-647; batched RL adds the
    env axis on top).

    Two routes, picked by memory footprint (r4, measured on v5e at the
    RL shape class B=1024 x n=256 x W=64):

    - RASTER-VMAP (default while the 6 per-vert projection tensors fit
      BATCHED_RASTER_MAX_ELEMS): jax.vmap over the single-env tiled
      launcher. vmap's pallas batching rule prepends the env axis as a
      leading GRID dimension, so this is already one fused launch over
      all B*N eyes — 2.0e6 af/s, vs 3.2e5 for the hand-folded streaming
      grid below (whose W=64 pixel block uses half a VREG's lanes and
      re-projects every target per eye-tile instead of once per env).
    - STREAMING-GRID (huge N, or force_streaming): program (i, p) renders
      eye tile i against the TARGET BLOCK OF ENV i // (n_pad_e // te) (a
      pure BlockSpec index map — the kernel body is the unmodified
      streaming kernel). HBM cost stays [B*N, 1] position columns where
      the raster tensors would be [B, N, N_pad] — the only batched route
      past ~64M-element scenes.

    NOT differentiable (plain pallas_call): score-function trainers never
    backprop through observations (rl/train._batched_observe_fast); APG
    keeps vmapping render_rows_wireframe_diff.

    `albedo` is per-env per-target [B, N]; `texture` [Ht, Wt] is shared
    (the reference shares one skin.png across agents, main.rs:322-356) and
    decoded in the usual XLA epilogue.
    """
    if cfg.sprite_mode != "wireframe":
        raise ValueError(
            "render_rows_wireframe_batched needs sprite_mode='wireframe'"
        )
    if pos.ndim != 3 or pos.shape[-1] != 2:
        raise ValueError("render_rows_wireframe_batched takes [B, N, 2] inputs")
    b, n = pos.shape[0], pos.shape[1]
    if (
        not force_streaming
        and _batched_raster_elems(b, n, cfg) <= BATCHED_RASTER_MAX_ELEMS
    ):
        if albedo is None:
            fn = lambda p, v: render_rows_wireframe_tiled(
                p, v, cfg, te, tj, texture=texture, track_idx=track_idx
            )
            return jax.vmap(fn)(pos, vel)
        fn = lambda p, v, a: render_rows_wireframe_tiled(
            p, v, cfg, te, tj, albedo=a, texture=texture, track_idx=track_idx
        )
        return jax.vmap(fn)(pos, vel, albedo)
    return _render_rows_wireframe_batched_stream(
        pos, vel, cfg, te, tj, albedo, texture, track_idx=track_idx
    )


@functools.partial(jax.jit, static_argnames=("cfg", "te", "tj", "track_idx"))
def _render_rows_wireframe_batched_stream(
    pos: jax.Array,
    vel: jax.Array,
    cfg: VisionConfig,
    te: int = EYES_PER_PROGRAM,
    tj: int = TILE_J,
    albedo: jax.Array | None = None,
    texture: jax.Array | None = None,
    track_idx: bool = False,
):
    """The streaming-grid route of render_rows_wireframe_batched (see its
    docstring): B*N eyes through one launch, env-indexed target blocks."""
    b, n = pos.shape[0], pos.shape[1]
    raw = texture is not None
    has_alb = albedo is not None

    if cfg.width <= 128:
        wb = cfg.width
    elif cfg.width % 128 == 0:
        wb = 128
    elif cfg.width <= 256:
        wb = cfg.width
    else:
        raise ValueError(
            f"the Pallas render path needs vision width <= 256 or a multiple "
            f"of 128, got {cfg.width}; use backend='dense' for odd widths"
        )

    # self-render: sprite orientation IS the eye heading (tvel == vel)
    dirs = camera.unit_heading(vel.reshape(b * n, 2)).reshape(b, n, 2)
    tj = fit_tile(tj, n, 8)
    n_pad_e = round_up(n, te)
    n_pad_t = round_up(n, tj)

    def flat_e(x):  # [B, N] -> [B*n_pad_e, 1], per-env padding kept aligned
        return col(pad_axis(x, n_pad_e, axis=1).reshape(b * n_pad_e))

    def flat_t(x):  # [B, N] -> [B*n_pad_t, 1]
        return col(pad_axis(x, n_pad_t, axis=1).reshape(b * n_pad_t))

    args = [
        flat_e(pos[..., 0]), flat_e(pos[..., 1]),
        flat_e(dirs[..., 0]), flat_e(dirs[..., 1]),
        flat_t(pos[..., 0]), flat_t(pos[..., 1]),
        flat_t(dirs[..., 0]), flat_t(dirs[..., 1]),
        flat_t(jnp.ones((b, n), jnp.float32)),
    ]

    tiles_per_env = n_pad_e // te  # te | n_pad_e: programs never straddle envs
    grid = (b * tiles_per_env, cfg.width // wb)
    kernel = functools.partial(
        _wireframe_stream_kernel, cfg=cfg, tj=tj, has_alb=has_alb, raw=raw,
        track_idx=track_idx,
    )
    espec = lambda: pl.BlockSpec(
        (te, 1), lambda i, p: (i, 0), memory_space=pltpu.VMEM
    )
    tspec = lambda: pl.BlockSpec(
        (n_pad_t, 1), lambda i, p: (i // tiles_per_env, 0),
        memory_space=pltpu.VMEM,
    )
    ospec = lambda: pl.BlockSpec(
        (te, wb), lambda i, p: (i, p), memory_space=pltpu.VMEM
    )
    in_specs = [espec()] * 4 + [tspec()] * 5
    if has_alb:
        in_specs.append(tspec())
        args.append(flat_t(albedo))
    n_out = _wf_num_outputs(raw, has_alb, cfg.antialias, track_idx)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[ospec() for _ in range(n_out)],
        out_shape=[
            jax.ShapeDtypeStruct((b * n_pad_e, cfg.width), jnp.float32)
            for _ in range(n_out)
        ],
        cost_estimate=pl.CostEstimate(
            flops=70 * b * n_pad_e * n_pad_t * cfg.width,
            bytes_accessed=(
                4 * b * n_pad_e + 5 * b * n_pad_t + 2 * b * n_pad_e * cfg.width
            )
            * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(*args)
    outs = [o.reshape(b, n_pad_e, cfg.width)[:, :n] for o in outs]
    return _wf_finish_outs(outs, cfg, texture, has_alb, raw, track_idx)


def _wf_edge_field_rows(f_v, l_v, alb_col, cfg: VisionConfig, t,
                        skip_intervals: bool = False):
    """Per-edge field columns + sentinel list from per-vert projections.
    ONE function for the compact prologue's pre-sort pass (member/key),
    the sort edition's post-sort recompute — the same op sequence on the
    same (reordered) values is bit-identical, which is what lets the sort
    carry only the 6 vert columns — AND the rasterq kernel, which runs it
    IN-kernel on (1, TJ) target rows (amortized over the pixel sublanes).

    Field layout (indices must match _compact_group_eval's arithmetic):
    12 inverse-depth constants (A, Bu, C, Du per edge), the 6 per-edge
    (e_lo, e_hi) intervals when aa-or-interval-hit, albedo when given,
    then the 3-edge sprite-union pair (always appended unless
    skip_intervals — the prologue uses it for member/key + group bounds
    even when the kernel doesn't load it).

    skip_intervals (rasterq plain/non-interval-hit mode only): drop the
    slab-interval computation entirely — the plain hit test is
    (q>qfar)&(q<qnear)&(tq>=0)&(tq<=q) and nothing past the constants (+
    albedo) is ever indexed. The 12 constants' op sequence is identical
    either way."""
    aa = cfg.antialias
    has_alb = alb_col is not None
    fields = []
    sent = []
    iv_fields = []  # per-edge (e_lo, e_hi), AFTER the 12 constants
    sp_lo = sp_hi = None
    for a, b in SPRITE_EDGES:
        fa, la, fb, lb = f_v[a], l_v[a], f_v[b], l_v[b]
        df = fb - fa
        dl = lb - la
        k_c = fa * dl - la * df
        ok_k = jnp.abs(k_c) > 1e-30
        inv_k = 1.0 / jnp.where(ok_k, k_c, 1.0)
        if skip_intervals:
            assert not (aa or _interval_hit(aa))
            zero = jnp.zeros_like(k_c)
            fields += [
                jnp.where(ok_k, dl * inv_k, zero),  # A
                jnp.where(ok_k, -(df * inv_k) * t, zero),  # Bu
                jnp.where(ok_k, -(la * inv_k), zero),  # C
                jnp.where(ok_k, (fa * inv_k) * t, zero),  # Du
            ]
            sent += [0.0, 0.0, 0.0, 0.0]
            continue
        valid, e_lo_v, e_hi_v, _, _ = _edge_slab_interval(
            fa, la, fb, lb, t, cfg
        )
        gate = (ok_k & valid) if aa else ok_k
        zero = jnp.zeros_like(k_c)
        fields += [
            jnp.where(gate, dl * inv_k, zero),  # A
            jnp.where(gate, -(df * inv_k) * t, zero),  # Bu
            jnp.where(gate, -(la * inv_k), zero),  # C
            jnp.where(gate, (fa * inv_k) * t, zero),  # Du
        ]
        sent += [0.0, 0.0, 0.0, 0.0]
        e_lo = jnp.where(valid, e_lo_v, 4.0)
        e_hi = jnp.where(valid, e_hi_v, -4.0)
        sp_lo = e_lo if sp_lo is None else jnp.minimum(sp_lo, e_lo)
        sp_hi = e_hi if sp_hi is None else jnp.maximum(sp_hi, e_hi)
        if aa or _interval_hit(aa):
            iv_fields += [e_lo, e_hi]
    if aa or _interval_hit(aa):
        fields += iv_fields
        sent += [4.0, -4.0] * 3
    if has_alb:
        fields.append(alb_col)
        sent.append(0.0)
    if not skip_intervals:
        # the last two "fields" are the sprite interval, compacted for the
        # prologue's group-bound computation and (in AA + interval-hit
        # mode) loaded by the kernel as the precompacted union
        fields += [sp_lo, sp_hi]
        sent += [4.0, -4.0]
    return fields, sent, sp_lo, sp_hi


def _compact_candidates(pos, dirs, tgt, hdg, cfg: VisionConfig, albedo,
                        n, m, n_pad_e: int, K: int, P: int, wb: int,
                        use_sort: bool = False, packed: bool | None = None):
    """XLA prologue for _wireframe_compact_kernel (see its docstring).

    Per (eye, target): project the 3 sprite verts (_project_verts_all, the
    same fp route as the precompute path), derive the per-edge inverse-depth
    constants and slab-clipped screen intervals, rank the screen-VISIBLE
    sprites by interval left edge, and compact every per-candidate constant
    into K slots. Two bit-identical compaction editions: a comparison-count
    rank + one-hot contraction (Precision.HIGHEST makes it an EXACT
    selection — the operands' 3-term bf16 splits reconstruct f32 products
    with a 0/1 mask exactly; the measured winner at m <= 256), and
    `use_sort` — one stable multi-operand co-sort (scales past the rank's
    O(n*m^2)). Empty slots are rewritten to the field's sentinel (0 for
    constants — q = 0 never hits — and the +-4 off-screen pair for
    intervals).

    Returns (fld, ks, ke [n_pad_e, P] i32 group ranges); fld is the packed
    candidate-major [n_pad_e*K, F] constant array when COMPACT_PACKED_FIELDS
    (one contiguous reshape — no per-field slice copies) else field-major
    [F, n_pad_e, K] (contiguous leading-dim slices for per-field operands).
    `packed` overrides the global (the diff route forces packed=True — its
    backward kernel only speaks that layout)."""
    if packed is None:
        packed = COMPACT_PACKED_FIELDS
    aa = cfg.antialias
    has_alb = albedo is not None
    sub = COMPACT_SUB
    t = math.tan(math.radians(cfg.hfov_deg) * 0.5)
    # pad TARGET SLOTS to K before the field computation (r4): padded slots
    # project degenerate (f=-1, l=0), fail `member`, carry their sentinels
    # from the pre-sentinel pass below, and stable-sort behind every real
    # entry (ties at the +4 sentinel key break by index) — BIT-identical to
    # the old pad-the-compacted-array-after structure (pinned by the
    # sort-vs-rank and interpret-vs-dense tests) without materializing the
    # [n, K, F] operand twice. Eyes stay UNPADDED here: padding them first
    # was measured slower (the kernel would run real work on pad rows, and
    # the eye-pad of the compacted operand is one small fused copy).
    f_v, l_v = _project_verts_all(pos, dirs, tgt, hdg, cfg, K)

    def build_fields(f_v, l_v, alb_col):
        return _wf_edge_field_rows(f_v, l_v, alb_col, cfg, t)

    alb_col = (
        jnp.broadcast_to(pad_axis(albedo, K)[None, :], (n, K))
        if has_alb else None
    )

    # pre-sort pass: only the sprite union interval, for member/key (the
    # sort edition recomputes the full field set post-sort; the rank
    # edition reuses this pass's fields directly)
    fields, sent, sp_lo, sp_hi = build_fields(f_v, l_v, alb_col)

    # a sprite can only touch pixels whose +-half-pixel box its margin-padded
    # interval overlaps; the margin absorbs the prologue-vs-kernel fp routes
    # (shared here, so only XLA fusion reassociation) plus the AA box
    margin = 1.0 / cfg.width + 1e-3
    member = (sp_lo <= 1.0 + margin) & (sp_hi >= -1.0 - margin)  # [n, K]

    key = jnp.where(member, sp_lo, 4.0)
    if use_sort:
        # one STABLE co-sort moves candidates into screen order without
        # gathers; stable + non-members keyed at the +4 sentinel reproduces
        # the rank path's (key, index) order exactly, so the two prologues
        # are bit-identical (pinned by tests/test_wireframe_kernel.py).
        # Measured faster at EVERY m on silicon (r4 _wf_prolog_quick: the
        # rank edition lowers to ~20 small launch-bound kernels). r4
        # refinement: sort carries only the 6 PER-VERT projection columns
        # (pre-sentineled to the degenerate behind-the-eye encoding for
        # non-members — the same f=-1/l=0 that _project_verts_all gives
        # padded/coincident targets) plus key and albedo, and the per-edge
        # constants/intervals are recomputed from the sorted verts: the
        # identical op sequence on identical (reordered) values is
        # bit-identical, degenerate verts reproduce every field sentinel
        # exactly (k_c=0 -> constants 0; slab-invalid -> +-4 intervals),
        # and the sort — the prologue's dominant cost, linear in operand
        # count — shrinks from F+2 ~ 15-22 columns to 7-8.
        vert_cols = []
        for v in range(3):
            vert_cols.append(jnp.where(member, f_v[v], -1.0))
            vert_cols.append(jnp.where(member, l_v[v], 0.0))
        sort_ops = [key] + vert_cols
        if has_alb:
            sort_ops.append(jnp.where(member, alb_col, 0.0))
        ops = jax.lax.sort(
            sort_ops, dimension=1, is_stable=True, num_keys=1,
        )
        sf_v = [ops[1], ops[3], ops[5]]
        sl_v = [ops[2], ops[4], ops[6]]
        salb = ops[7] if has_alb else None
        fields, _, _, _ = build_fields(sf_v, sl_v, salb)
        if packed:
            comp = jnp.stack(fields, axis=-1)  # [n, K, F+2] ordered
        else:
            comp = jnp.stack(fields, axis=0)  # [F+2, n, K] ordered
    else:
        # rank members by (interval left edge, index) via comparison
        # counting — the bit-identical cross-check edition (the sort wins
        # on silicon at every m, see above)
        idx = jnp.arange(K)
        key_t = key[:, :, None]  # [n_pad_e, t, 1]
        key_j = key[:, None, :]  # [n_pad_e, 1, j]
        rank = jnp.sum(
            (key_j < key_t)
            | ((key_j == key_t) & (idx[None, None, :] < idx[None, :, None])),
            axis=2,
            dtype=jnp.int32,
        )  # [n_pad_e, K]
        onehot = (
            member[:, :, None]
            & (rank[:, :, None] == jnp.arange(K)[None, None, :])
        ).astype(jnp.float32)  # [n_pad_e, K, K]

        fstack = jnp.stack(fields, axis=-1)  # [n_pad_e, K, F+2]
        filled = jnp.sum(onehot, axis=1) > 0.5  # [n_pad_e, K]
        if packed:
            comp = jnp.einsum(
                "etk,etf->ekf", onehot, fstack,
                precision=jax.lax.Precision.HIGHEST,
            )  # [n, K, F+2]: candidate-major — the kernel's single packed
            # operand is ONE contiguous reshape away
            comp = jnp.where(
                filled[:, :, None], comp, jnp.asarray(sent, jnp.float32)
            )
        else:
            comp = jnp.einsum(
                "etk,etf->fek", onehot, fstack,
                precision=jax.lax.Precision.HIGHEST,
            )  # [F+2, n, K]: field-major, so the launcher's per-field
            # kernel operands are CONTIGUOUS leading-dim slices
            comp = jnp.where(
                filled[None, :, :], comp,
                jnp.asarray(sent, jnp.float32)[:, None, None],
            )
    # under AA + INTERVAL_HIT the sprite-union pair doubles as the kernel's
    # last two field lanes (cov loads it instead of re-uniting per edge)
    keep_union = aa and _interval_hit(aa)
    if packed:
        spc_lo, spc_hi = comp[:, :, -2], comp[:, :, -1]
        fld = comp if keep_union else comp[:, :, :-2]  # [n, K, F]
    else:
        spc_lo, spc_hi = comp[-2], comp[-1]
        fld = comp if keep_union else comp[:-2]

    # per-(eye, pixel-block) group ranges: candidate groups are screen-local
    # after sorting, so the overlapping range is ~1-2 groups per block
    G = K // sub
    grp_lo = spc_lo.reshape(n, G, sub).min(axis=2)  # [n, G]
    grp_hi = spc_hi.reshape(n, G, sub).max(axis=2)
    blk_lo = 2.0 * (jnp.arange(P, dtype=jnp.float32) * wb) / cfg.width - 1.0
    blk_hi = blk_lo + 2.0 * wb / cfg.width
    ov = (grp_hi[:, :, None] >= blk_lo[None, None, :] - margin) & (
        grp_lo[:, :, None] <= blk_hi[None, None, :] + margin
    )  # [n, G, P]
    # [min overlapping group, max overlapping group + 1): two plain reduces
    # (gap groups between them run harmlessly; sorting makes gaps rare)
    gi = jnp.arange(G, dtype=jnp.int32)[None, :, None]
    ks = jnp.min(jnp.where(ov, gi, G), axis=1)
    ke = jnp.max(jnp.where(ov, gi + 1, 0), axis=1)

    if n_pad_e != n:
        fld = pad_axis(fld, n_pad_e, axis=0 if packed else 1)
        ks = pad_axis(ks, n_pad_e)  # pad eyes: ks=ke=0 -> empty group loop
        ke = pad_axis(ke, n_pad_e)
    if packed:
        return fld.reshape(n_pad_e * K, fld.shape[-1]), ks, ke
    return fld, ks, ke


def _render_compact(pos, dirs, tgt, hdg, cfg: VisionConfig, te, albedo,
                    texture, n, m):
    """Launcher for _wireframe_compact_kernel: XLA candidate compaction +
    the Pallas call over a (eye-tile, pixel-block) grid.

    K = round_up(m, 8): every visible sprite always gets a slot, so
    compaction never drops anything — its job is screen-SORTING, and the
    work reduction comes from the per-block group ranges. Worst case
    (every sprite visible everywhere, e.g. deep in gravitational
    collapse) degrades gracefully to full streaming-equivalent work."""
    raw = texture is not None
    outs = _render_compact_outs(pos, dirs, tgt, hdg, cfg, te, albedo, n, m,
                                raw)
    if raw:
        return _decode_textured_wf(outs, cfg, texture, albedo is not None,
                                   aa=cfg.antialias)
    return outs[0], outs[1]


def _render_compact_outs(pos, dirs, tgt, hdg, cfg: VisionConfig, te, albedo,
                         n, m, raw):
    """The kernel leg of _render_compact, decode-free: returns the raw
    per-row output list ((shade, depth) or the raw winner streams) so the
    textured diff path can custom-vjp the kernel and leave the texture
    decode to plain XLA autodiff."""
    has_alb = albedo is not None
    aa = cfg.antialias
    wb = _compact_wb(cfg)
    P = cfg.width // wb
    K = round_up(m, COMPACT_SUB)
    n_pad_e = round_up(n, te)
    F = _compact_field_count(aa, has_alb)
    n_out = _wf_num_outputs(raw, has_alb, aa)
    fld, ks, ke = _compact_candidates(
        pos, dirs, tgt, hdg, cfg, albedo, n, m, n_pad_e, K, P, wb,
        use_sort=m > COMPACT_SORT_MIN_M,
    )

    # many-target shapes carry long per-block group ranges, so the dynamic
    # loop boundary amortizes over more groups: R=4 measured 1.82e5 vs
    # 1.64e5 af/s at N=1024/W=1024 AA on v5e (r4 sweep; R=2 stays the
    # few-target default — at G~13 the clamped duplicate tail would grow).
    # Bit-identical at any R (see the kernel's unroll invariance note).
    gu = (COMPACT_GROUP_UNROLL_MANY if K // COMPACT_SUB >= COMPACT_MANY_G
          else None)
    if interpret_mode():
        gu = 1  # pure Mosaic-throughput knob; trace cost only on CPU
    kernel = functools.partial(
        _wireframe_compact_kernel, cfg=cfg, n_fields=F, K=K,
        has_alb=has_alb, raw=raw, group_unroll=gu,
    )
    if COMPACT_PACKED_FIELDS:
        # one packed operand; its F lanes equal the array's lane count
        # (allowed without 128-padding) and sublanes te*K are 8-multiple
        fld_ops = [fld]
        fld_specs = [
            pl.BlockSpec(
                (te * K, F), lambda i, p: (i, 0), memory_space=pltpu.VMEM
            )
        ]
    else:
        fld_ops = [fld[f].reshape(-1, 1) for f in range(F)]
        fld_specs = [
            pl.BlockSpec(
                (te * K, 1), lambda i, p: (i, 0), memory_space=pltpu.VMEM
            )
            for _ in range(F)
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(n_pad_e // te, P),
        in_specs=[
            # blocked SMEM (not whole-array): under vmap a whole-array SMEM
            # operand re-fetches the FULL batched array per program
            pl.BlockSpec(
                (te, P), lambda i, p: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (te, P), lambda i, p: (i, 0), memory_space=pltpu.SMEM
            ),
        ]
        + fld_specs,
        out_specs=[
            pl.BlockSpec(
                (te, wb), lambda i, p: (i, p), memory_space=pltpu.VMEM
            )
            for _ in range(n_out)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad_e, cfg.width), jnp.float32)
            for _ in range(n_out)
        ],
        cost_estimate=pl.CostEstimate(
            flops=60 * n_pad_e * K * wb,
            bytes_accessed=(n_pad_e * K * F + n_out * n_pad_e * cfg.width)
            * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(ks, ke, *fld_ops)
    return [o[:n] for o in outs]


# -- compact-route backward (culled differentiable wide rows) -----------------
#
# The streaming backward (_wf_bwd_kernel below) runs FULL n x m work — every
# chunk's projection + _merge_edges vjp at every pixel — which is why
# fwd+bwd measured ~50x the forward. At the compact-eligible shapes (wide
# rows, the reference's own N=100 x W=1024 eye) the forward already showed
# the work is >97% far-misses; this backward inherits the SAME two cuts:
# the per-(eye, pixel-block) group ranges (only screen-overlapping candidate
# groups are pulled back) and the inverse-depth op diet (2 FMAs per edge, no
# per-pixel divisions in the recompute). Structure: the per-candidate group
# evaluation (_compact_group_eval — shared with the forward kernel, so the
# recomputed q matches the forward bit-for-bit) plus the per-candidate
# epilogue is pulled back with jax.vjp per group tile, seeded only at
# pixels the candidate WON; cotangents accumulate into a packed [TE*K, F]
# dfld output, and the (differentiable) XLA prologue's own vjp carries dfld
# back to (pos, vel) — including the one-hot/sort compaction (linear in the
# field values) and the projection math, with no hand-derived transpose
# anywhere. Residual budget per tile is (sub=8, WB) elements — far under
# the streaming backward's 4096-element ceiling, so no remat is needed.


def _compact_bwd_kernel(
    ks_ref, ke_ref,  # [TE, P] SMEM group ranges
    fld_ref,  # [TE*K, F] packed candidate constants
    dep_ref,  # [TE, WB] forward depth (the winner gate)
    *rest,  # n_cot cotangent rows [TE, WB] (forward-output order), then
    # dfld_ref [TE*K, F] out: field cotangents (accumulated over P)
    cfg: VisionConfig,
    n_fields: int,
    K: int,
    raw: bool = False,
    has_alb: bool = False,
):
    aa = cfg.antialias
    n_cot = _wf_num_outputs(raw, has_alb, aa)
    cot_refs = rest[:n_cot]
    (dfld_ref,) = rest[n_cot:]
    assert fld_ref.shape[1] == n_fields
    te = fld_ref.shape[0] // K
    wb = dep_ref.shape[1]
    hp = 1.0 / cfg.width
    qfar = 1.0 / cfg.far
    sub = COMPACT_SUB
    p = pl.program_id(1)

    @pl.when(p == 0)
    def _init():
        dfld_ref[:] = jnp.zeros_like(dfld_ref)

    p0 = p * wb
    u_p = (
        2.0
        * (
            p0
            + jax.lax.broadcasted_iota(jnp.int32, (1, wb), 1).astype(jnp.float32)
            + 0.5
        )
        / cfg.width
        - 1.0
    )  # (1, WB)
    u_lo_px = u_p - hp
    u_hi_px = u_p + hp

    def eye_body(e, _):
        dpr = dep_ref[pl.ds(e, 1), :]  # (1, WB)
        cot_rows = [c[pl.ds(e, 1), :] for c in cot_refs]
        g_lo = ks_ref[e, p]
        g_hi = ke_ref[e, p]

        def blk_at(g):
            off = pl.multiple_of(e * K + pl.multiple_of(g * sub, sub), sub)
            return off, fld_ref[pl.ds(off, sub), :]

        # pass 1: recompute THIS kernel's per-pixel winner q (q-only diet:
        # 2 FMAs + compares per edge). Matching against it is exact — same
        # helper, same kernel, same lowering — so no tolerance window; the
        # saved forward depth only GATES (a hit must exist on both routes).
        def qmax_body(g, best):
            _, blk = blk_at(g)

            def fld(fi):
                return jax.lax.slice_in_dim(blk, fi, fi + 1, axis=1)

            q_g, _ = _compact_group_eval(
                fld, u_p, u_lo_px, u_hi_px, cfg, False, False, q_only=True
            )
            return jnp.maximum(best, jnp.max(q_g, axis=0, keepdims=True))

        qloc = jax.lax.fori_loop(
            g_lo, g_hi, qmax_body, jnp.zeros((1, wb), jnp.float32)
        )
        # the local winner must BE the global winner: dpr is the FINAL
        # merged depth (single device: equal to 1/qloc modulo the 1/x
        # round trip, absorbed by the tolerance; ring hops: other blocks'
        # targets may have won the pixel — their hops spend the cotangent)
        hit = qloc > qfar
        dloc = 1.0 / jnp.where(hit, qloc, 1.0)
        gate = hit & (dpr < cfg.far) & (dloc <= dpr * (1.0 + 1e-5))

        # pass 2: per-candidate forward + epilogue, pulled back per group,
        # seeded only at won pixels (first-match-wins: lowest row within a
        # group via iota, `taken` carry across groups — coincident sprites
        # tie exactly and would otherwise each receive the full cotangent).
        # Known edge: on an exact q tie between DISTINCT sprites the
        # forward min-reduces each payload stream over the tying rows
        # (possibly mixing candidates) while this seeds the whole cotangent
        # on the first row — measure-zero for fp32 scenes and the same
        # subgradient class as the streaming backward's lowest-row rule
        def body(g, taken):
            off, blk = blk_at(g)

            def tile(blk):
                def fld(fi):
                    return jax.lax.slice_in_dim(blk, fi, fi + 1, axis=1)

                q_m, pays = _compact_group_eval(
                    fld, u_p, u_lo_px, u_hi_px, cfg, raw, has_alb
                )
                # the forward kernel's epilogue, per CANDIDATE: on pixels
                # this candidate won, its own q IS the cross-candidate
                # best, so these equal the forward's outputs there
                hit = q_m > qfar
                f = 1.0 / jnp.where(hit, q_m, 1.0)
                depth_c = jnp.where(hit, f, cfg.far)
                if raw:
                    k = 2
                    outs = [
                        jnp.where(hit, pays[0] * f, 0.5),
                        jnp.where(hit, pays[1] * f, 0.5),
                    ]
                    if has_alb:
                        outs.append(jnp.where(hit, pays[k], 1.0))
                        k += 1
                    if aa:
                        outs.append(jnp.where(hit, pays[k], 0.0))
                    outs.append(depth_c)
                else:
                    mag2 = pays[0] * f * f
                    alb = pays[1] if has_alb else cfg.sprite_albedo
                    val = alb * (1.0 - mag2)
                    if aa:
                        val = cfg.background + pays[-1] * (
                            val - cfg.background
                        )
                    outs = [jnp.where(hit, val, cfg.background), depth_c]
                return (*outs, q_m)

            out_c, pull = jax.vjp(tile, blk)
            q_c = out_c[-1]
            match = gate & (q_c == qloc) & (taken < 0.5)
            ridx = jax.lax.broadcasted_iota(
                jnp.int32, (sub, wb), 0
            ).astype(jnp.float32)
            first = jnp.min(jnp.where(match, ridx, float(sub)), axis=0,
                            keepdims=True)
            win = match & (ridx <= first)
            zero = jnp.zeros_like(q_c)
            (dblk,) = pull(
                tuple(jnp.where(win, cr, zero) for cr in cot_rows) + (zero,)
            )
            dfld_ref[pl.ds(off, sub), :] += dblk
            return jnp.maximum(
                taken,
                jnp.max(jnp.where(win, 1.0, 0.0), axis=0, keepdims=True),
            )

        jax.lax.fori_loop(g_lo, g_hi, body, jnp.zeros((1, wb), jnp.float32))
        return 0

    # the vjp roughly triples the live tile set — no eye unrolling
    run_eyes_unrolled(eye_body, te, 1)


def _compact_bwd_call(fld, ks, ke, depth, cots, cfg: VisionConfig,
                      K: int, te: int, wb: int,
                      raw: bool = False, has_alb: bool = False):
    """Launch _compact_bwd_kernel: (packed fld, group ranges, forward depth,
    cotangent rows in forward-output order) -> dfld [n_pad_e*K, F]. `wb`
    MUST be the pixel-block width the prologue baked into ks/ke (callers
    pass their _compact_wb).

    K > COMPACT_BWD_K_CHUNK splits the CANDIDATE axis across independent
    kernel launches (the VMEM cap — see the chunk constant's comment): each
    chunk's pass-1 recompute finds its chunk-LOCAL winner and the existing
    local-winner-vs-final-depth gate rejects pixels whose global winner
    lives in another chunk — exactly the ring cross-hop semantics, so a
    cross-chunk EXACT depth tie between distinct sprites can double-seed
    (measure-zero for fp32 scenes, the same documented edge as in-kernel
    ties). Found on silicon (r4): without this, the narrow RL diff shape
    (N=1024) could not compile at all."""
    F = _compact_field_count(cfg.antialias, has_alb)
    n_cot = _wf_num_outputs(raw, has_alb, cfg.antialias)
    assert len(cots) == n_cot, (len(cots), n_cot)
    P = cfg.width // wb
    n_pad_e = fld.shape[0] // K
    dep = pad_axis(depth, n_pad_e)
    cotp = [pad_axis(c, n_pad_e) for c in cots]  # zero cots on padded eyes

    if K > COMPACT_BWD_K_CHUNK:
        sub = COMPACT_SUB
        kc = COMPACT_BWD_K_CHUNK
        fld3 = fld.reshape(n_pad_e, K, F)
        parts = []
        for c0 in range(0, K, kc):
            k_c = min(kc, K - c0)
            g0 = c0 // sub
            g1 = (c0 + k_c) // sub
            # clamp-shift the group ranges into this chunk's frame; ranges
            # disjoint from the chunk clamp to an empty [g, g) loop
            ksc = jnp.clip(ks, g0, g1) - g0
            kec = jnp.clip(ke, g0, g1) - g0
            fldc = fld3[:, c0:c0 + k_c].reshape(n_pad_e * k_c, F)
            parts.append(
                _compact_bwd_call(
                    fldc, ksc, kec, depth, cots, cfg, k_c, te, wb,
                    raw=raw, has_alb=has_alb,
                ).reshape(n_pad_e, k_c, F)
            )
        return jnp.concatenate(parts, axis=1).reshape(n_pad_e * K, F)

    kernel = functools.partial(
        _compact_bwd_kernel, cfg=cfg, n_fields=F, K=K, raw=raw,
        has_alb=has_alb,
    )
    rowspec = lambda: pl.BlockSpec(
        (te, wb), lambda i, p: (i, p), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(n_pad_e // te, P),
        in_specs=[
            pl.BlockSpec(
                (te, P), lambda i, p: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (te, P), lambda i, p: (i, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (te * K, F), lambda i, p: (i, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [rowspec() for _ in range(1 + n_cot)],
        out_specs=pl.BlockSpec(
            (te * K, F), lambda i, p: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad_e * K, F), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=240 * n_pad_e * K * cfg.width,
            bytes_accessed=(2 * n_pad_e * K * F
                            + (1 + n_cot) * n_pad_e * cfg.width) * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(ks, ke, fld, dep, *cotp)


def _rrwd_bwd_compact(cfg, pos, vel, depth, us, ud):
    """Compact-route pullback of render_rows_wireframe_diff: the bwd kernel
    produces packed field cotangents; plain jax autodiff through the
    (differentiable) compaction prologue — the one-hot/sort selection is
    linear in the field values, the projection/slab math is guarded
    elementwise — carries them to (pos, vel). No hand-derived transpose."""
    n = pos.shape[0]
    m = n  # self-render: the targets ARE the eyes
    te = fit_tile(BWD_EYES_PER_PROGRAM_WF, n, 8)
    n_pad_e = round_up(n, te)
    K = round_up(m, COMPACT_SUB)
    wb = _compact_wb(cfg)
    P = cfg.width // wb

    def build(pos, vel):
        dirs = camera.unit_heading(vel)
        fld, ks, ke = _compact_candidates(
            pos, dirs, pos, dirs, cfg, None, n, m, n_pad_e, K, P, wb,
            use_sort=m > COMPACT_BWD_SORT_MIN_M, packed=True,
        )
        return fld, (ks, ke)

    fld, pull, (ks, ke) = jax.vjp(build, pos, vel, has_aux=True)
    dfld = _compact_bwd_call(fld, ks, ke, depth, [us, ud], cfg, K, te, wb)
    return pull(dfld)


def render_rows_wireframe_vjp_cross_compact(pos, dirs, depth, us, ud,
                                            cfg: VisionConfig, targets,
                                            target_hdg):
    """Cross-block edition of the compact backward (the ring's per-hop
    pullback at compact-eligible shapes): same signature semantics as
    render_rows_wireframe_vjp_cross — `depth` is the FINAL merged rows,
    and the kernel's local-winner-is-global-winner gate keeps cotangents
    off pixels another block's target won."""
    n = pos.shape[0]
    m = targets.shape[0]
    te = fit_tile(BWD_EYES_PER_PROGRAM_WF, n, 8)
    n_pad_e = round_up(n, te)
    K = round_up(m, COMPACT_SUB)
    wb = _compact_wb(cfg)
    P = cfg.width // wb

    def build(pos, dirs, tgt, hdg):
        fld, ks, ke = _compact_candidates(
            pos, dirs, tgt, hdg, cfg, None, n, m, n_pad_e, K, P, wb,
            use_sort=m > COMPACT_BWD_SORT_MIN_M, packed=True,
        )
        return fld, (ks, ke)

    fld, pull, (ks, ke) = jax.vjp(
        build, pos, dirs, targets, target_hdg, has_aux=True
    )
    dfld = _compact_bwd_call(fld, ks, ke, depth, [us, ud], cfg, K, te, wb)
    return pull(dfld)  # (deye, ddirs, dtgt, dhdg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _compact_raw_rows(pos, vel, albedo, cfg):
    """Raw winner streams ((uvx, uvy[, alb][, cov], depth) rows) of the
    compact self-render, with a compact-backward custom VJP — the kernel
    leg of the textured diff path (the texture decode stays plain XLA
    autodiff OUTSIDE this boundary)."""
    return _crr_primal(pos, vel, albedo, cfg)


def _crr_primal(pos, vel, albedo, cfg):
    n = pos.shape[0]
    dirs = camera.unit_heading(vel)
    return tuple(
        _render_compact_outs(
            pos, dirs, pos, dirs, cfg, EYES_PER_PROGRAM, albedo, n, n,
            raw=True,
        )
    )


def _crr_fwd(pos, vel, albedo, cfg):
    outs = _crr_primal(pos, vel, albedo, cfg)
    return outs, (pos, vel, albedo, outs[-1])


def _crr_bwd(cfg, res, cots):
    pos, vel, albedo, depth = res
    n = pos.shape[0]
    m = n  # self-render: the targets ARE the eyes
    te = fit_tile(BWD_EYES_PER_PROGRAM_WF, n, 8)
    n_pad_e = round_up(n, te)
    K = round_up(m, COMPACT_SUB)
    wb = _compact_wb(cfg)
    P = cfg.width // wb

    def build(pos, vel, albedo):
        dirs = camera.unit_heading(vel)
        fld, ks, ke = _compact_candidates(
            pos, dirs, pos, dirs, cfg, albedo, n, m, n_pad_e, K, P, wb,
            use_sort=m > COMPACT_BWD_SORT_MIN_M, packed=True,
        )
        return fld, (ks, ke)

    fld, pull, (ks, ke) = jax.vjp(build, pos, vel, albedo, has_aux=True)
    dfld = _compact_bwd_call(
        fld, ks, ke, depth, list(cots), cfg, K, te, wb,
        raw=True, has_alb=albedo is not None,
    )
    return pull(dfld)  # (dpos, dvel, dalbedo)


_compact_raw_rows.defvjp(_crr_fwd, _crr_bwd)


def render_rows_wireframe_textured_diff(pos, vel, cfg: VisionConfig,
                                        texture, albedo=None):
    """Differentiable TEXTURE-sampled exact-sprite observations: the raw
    winner streams come from the compact kernel pair (custom VJP), and the
    bilinear texture decode (_decode_textured_wf — gather-free einsum
    sampling) runs under plain XLA autodiff, so gradients flow to pos, vel,
    albedo AND the texture itself. Compact-eligible shapes route the
    compact pair; every other kernel-tileable shape routes the
    winner-index VJP (r5); the dense renderer (vision.render.render_rows
    with texture) stays the differentiable fallback at odd widths."""
    if _wf_diff_route(cfg, pos.shape[0]) != "compact":
        return _winner_rows_textured(pos, vel, albedo, texture, cfg)
    outs = _compact_raw_rows(pos, vel, albedo, cfg)
    return _decode_textured_wf(
        list(outs), cfg, texture, albedo is not None, aa=cfg.antialias
    )


# -- backward kernel (differentiable exact-sprite perception) -----------------
#
# The disc raycast's backward kernel (ops/raycast._raycast_bwd_kernel) is a
# HAND-derived transpose; the wireframe's AA math (slab clips, clamped
# fragment evaluation, interval-union coverage) would multiply that
# derivation's select calculus several-fold. Instead the backward kernel
# differentiates ITSELF: the per-(chunk, pixel) tile function — the same
# projection + _merge_edges + coverage-blend code the forward streaming
# kernel runs — is pulled back with jax.vjp INSIDE the kernel body. Pallas
# kernels are traced JAX programs, so the transpose is derived at trace time
# and lowered by Mosaic like any other elementwise code; eye inputs are
# scalars, so their cotangents arrive pre-reduced, and per-target cotangent
# columns accumulate into grid-shared output refs (TPU grids run
# sequentially). Winner identification is the disc kernel's residual
# matching against the FINAL merged depth (small relative tolerance; a
# strict d < far keeps misses out).

BWD_EYES_PER_PROGRAM_WF = 8
# vjp residual budget: TJ*WBLK element ceiling per tile (v5e-validated 4096;
# 8k OOM'd the 16 MB scoped stack). WF_BWD_REMAT=True wraps the tile in
# jax.checkpoint — residuals shrink to the tile INPUTS (recompute in the
# transpose). MEASURED DEAD on silicon (r4): Mosaic has no lowering for the
# remat2 primitive inside a TPU kernel body (NotImplementedError at every
# tile size tried: 8k/16k/32k), so the ceiling lever only exists in
# interpret mode; 4096 stays the hardware cap.
WF_BWD_TILE_ELEMS = 1 << 12
WF_BWD_REMAT = False
# triage escape hatch (advisor r4): trusted_depth rests on a bit-exact
# depth identity across two separate Mosaic lowerings, verified by a
# hardware canary (tpu_tests test_wireframe_trusted_depth_canary). If
# gradients ever look dead on a new compiler/hardware rev, set
# NENBODY_WF_TRUSTED_DEPTH=0 to force the backward's pass-1 depth
# recompute without a code change.
WF_TRUSTED_DEPTH = os.environ.get("NENBODY_WF_TRUSTED_DEPTH", "1") != "0"


def _wf_bwd_kernel(
    ex_ref, ey_ref, dx_ref, dy_ref,  # [TE, 1] eye position / unit heading
    tx_ref, ty_ref, cx_ref, cy_ref, m_ref,  # [N_pad, 1] targets + heading
    dep_ref, us_ref, ud_ref,  # [TE, W] final depth + cotangents
    gxi_ref, gyi_ref, gdx_ref, gdy_ref,  # [TE, 1] out: eye pos/heading grads
    gtx_ref, gty_ref, gcx_ref, gcy_ref,  # [N_pad, 1] out: target pos/hdg grads
    *,
    cfg: VisionConfig,
    tj: int,
    trusted_depth: bool,
):
    te = ex_ref.shape[0]
    wb = dep_ref.shape[1]
    n_pad = tx_ref.shape[0]
    num_chunks = n_pad // tj
    t = math.tan(math.radians(cfg.hfov_deg) * 0.5)
    hp = 1.0 / cfg.width
    r = cfg.sprite_radius
    verts = [(vx * r, vy * r) for vx, vy in SPRITE_VERTS]
    aa = cfg.antialias
    first_wblock = pl.program_id(1) == 0

    @pl.when((pl.program_id(0) == 0) & first_wblock)
    def _init():
        gtx_ref[:] = jnp.zeros_like(gtx_ref)
        gty_ref[:] = jnp.zeros_like(gty_ref)
        gcx_ref[:] = jnp.zeros_like(gcx_ref)
        gcy_ref[:] = jnp.zeros_like(gcy_ref)

    # the width axis is a second grid dimension: the in-kernel vjp's saved
    # linearization residuals scale with the (TJ, WB) tile, and a full
    # W=32 row at TJ=256 blew Mosaic's 16 MB scoped-vmem stack (23.9 MB
    # observed); eye grads accumulate across the width blocks
    @pl.when(first_wblock)
    def _init_eye():
        gxi_ref[:] = jnp.zeros_like(gxi_ref)
        gyi_ref[:] = jnp.zeros_like(gyi_ref)
        gdx_ref[:] = jnp.zeros_like(gdx_ref)
        gdy_ref[:] = jnp.zeros_like(gdy_ref)

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
    )  # (1, WB)
    ut = u_p * t
    aa_ctx = (u_p, t, hp) if aa else None

    def eye_body(e, _):
        px, py = ex_ref[e, 0], ey_ref[e, 0]
        hx, hy = dx_ref[e, 0], dy_ref[e, 0]
        dpr = dep_ref[pl.ds(e, 1), :]  # (1, W)
        usr = us_ref[pl.ds(e, 1), :]
        udr = ud_ref[pl.ds(e, 1), :]

        def chunk_tile(k, px=px, py=py, hx=hx, hy=hy):
            """This chunk's (TJ,) target columns + mask and the fragment
            function over them — the forward streaming kernel's math,
            verbatim, so the vjp is its exact transpose."""
            j0 = pl.multiple_of(k * tj, tj)
            txv = tx_ref[pl.ds(j0, tj), :]  # (TJ, 1)
            tyv = ty_ref[pl.ds(j0, tj), :]
            cthv = cx_ref[pl.ds(j0, tj), :]
            sthv = cy_ref[pl.ds(j0, tj), :]
            mj = (m_ref[pl.ds(j0, tj), :] > 0.0) & (
                (txv != px) | (tyv != py)
            )  # padding + coincident-self cull, captured (non-diff)

            def tile(px, py, hx, hy, txv, tyv, cthv, sthv):
                f_v, l_v = _project_chunk_verts(
                    px, py, hx, hy, txv, tyv, cthv, sthv, mj, verts
                )
                d_m, pays = _merge_edges(
                    ut, f_v, l_v, cfg.sprite_albedo, cfg, aa_ctx=aa_ctx
                )
                shade = pays[0]
                if aa:
                    shade = cfg.background + pays[-1] * (
                        shade - cfg.background
                    )
                return shade, d_m  # (TJ, W) fragment fields

            return j0, (txv, tyv, cthv, sthv), tile

        if trusted_depth:
            # the saved depth came from the streaming forward kernel (the
            # diff path forces it): per-fragment depth is the same
            # elementwise math on the same values and fp min is exactly
            # associative, so dep_ref IS this kernel's min bit-for-bit —
            # skip the pass-1 recompute entirely. The identity crosses two
            # Mosaic lowerings (forward kernel vs vjp-traced backward); a
            # contraction/reassociation divergence would silently drop the
            # winner's cotangent, so tpu_tests pins trusted == untrusted
            # gradients bit-exactly on hardware as the canary.
            dloc = dpr
            dpr_gate = dloc < cfg.far
        else:
            # Pass 1: recompute THIS kernel's per-pixel min depth. Matching
            # against it is exact (same math, same order, same kernel — bit-
            # identical), so the winner is identified without a tolerance
            # window; matching against the forward's saved depth instead left
            # ~0.2% of pixels at near-ties routed to the wrong fragment (the
            # raster-precompute forward follows a different fp route).
            def dmin_body(k, best):
                j0, args, tile = chunk_tile(k)
                _, dm = tile(px, py, hx, hy, *args)
                return jnp.minimum(best, jnp.min(dm, axis=0, keepdims=True))

            dloc = jax.lax.fori_loop(
                0, num_chunks, dmin_body,
                jnp.full((1, wb), cfg.far, jnp.float32),
            )
            # cross-block gate: this kernel's min must BE the global winner
            # (ring partials depth-merge across blocks; tolerance only here,
            # where different devices' fp routes meet)
            dpr_gate = (dloc < cfg.far) & (dloc <= dpr * (1.0 + 1e-5))

        def body(k, carry, px=px, py=py, hx=hx, hy=hy,
                 usr=usr, udr=udr):
            axi, ayi, adx, ady, taken = carry
            j0, args, tile = chunk_tile(k)
            if WF_BWD_REMAT:
                tile = jax.checkpoint(tile)
            (sh, dm), pull = jax.vjp(tile, px, py, hx, hy, *args)
            # each pixel's cotangent is spent exactly once: exact match to
            # the recomputed min, first-match-wins across chunks (`taken`
            # carries as f32 0/1 — Mosaic cannot legalize boolean vector
            # loop carries), and lowest-row-wins WITHIN the chunk —
            # coincident targets tie exactly and would otherwise each
            # receive the full cotangent (observed: 2x eye gradients)
            match = dpr_gate & (dm <= dloc) & (taken < 0.5)
            # integer iota + cast: Mosaic rejects tpu.iota on float vectors
            ridx = jax.lax.broadcasted_iota(
                jnp.int32, (tj, wb), 0
            ).astype(jnp.float32)
            first = jnp.min(jnp.where(match, ridx, float(tj)), axis=0,
                            keepdims=True)
            win = match & (ridx <= first)
            zero = jnp.zeros_like(dm)
            dpx, dpy, dhx, dhy, dtx, dty, dcx, dcy = pull(
                (jnp.where(win, usr, zero), jnp.where(win, udr, zero))
            )
            gtx_ref[pl.ds(j0, tj), :] += dtx
            gty_ref[pl.ds(j0, tj), :] += dty
            gcx_ref[pl.ds(j0, tj), :] += dcx
            gcy_ref[pl.ds(j0, tj), :] += dcy
            taken2 = jnp.maximum(
                taken,
                jnp.max(jnp.where(win, 1.0, 0.0), axis=0, keepdims=True),
            )
            return (axi + dpx, ayi + dpy, adx + dhx, ady + dhy, taken2)

        zero = jnp.float32(0.0)
        axi, ayi, adx, ady, _ = jax.lax.fori_loop(
            0, num_chunks, body,
            (zero, zero, zero, zero, jnp.zeros((1, wb), jnp.float32)),
        )
        gxi_ref[pl.ds(e, 1), :] += jnp.full((1, 1), axi, jnp.float32)
        gyi_ref[pl.ds(e, 1), :] += jnp.full((1, 1), ayi, jnp.float32)
        gdx_ref[pl.ds(e, 1), :] += jnp.full((1, 1), adx, jnp.float32)
        gdy_ref[pl.ds(e, 1), :] += jnp.full((1, 1), ady, jnp.float32)
        return 0

    # the vjp transpose roughly triples the live tile set vs the forward
    # streaming kernel — no unrolling (cap 1), (TJ, WB) bounded by the caller
    run_eyes_unrolled(eye_body, te, 1)


@functools.partial(jax.jit, static_argnames=("cfg", "te", "trusted_depth"))
def render_rows_wireframe_vjp_cross(
    pos: jax.Array,
    dirs: jax.Array,
    depth: jax.Array,
    us: jax.Array,
    ud: jax.Array,
    cfg: VisionConfig,
    targets: jax.Array | None = None,
    target_hdg: jax.Array | None = None,
    te: int = BWD_EYES_PER_PROGRAM_WF,
    trusted_depth: bool = False,
):
    """Pullback of the (cross-block) wireframe eye render: cotangents
    (us, ud) on (shade, depth) -> (d eye-pos [N,2], d eye-dirs [N,2],
    d target-pos [M,2], d target-hdg [M,2]). `depth` must be the FINAL
    merged rows (residual matching, exactly as the disc's
    raycast.render_rows_vjp_cross). Geometry-only: constant albedo, no
    texture. Sprites orient to their targets' headings, so the heading
    cotangent is a first-class output — pull it back through unit_heading
    to reach velocities.

    `trusted_depth=True` asserts `depth` came from the STREAMING forward
    kernel over the same inputs: bit-identical to the backward's
    recomputation (same elementwise route; fp min is exactly associative
    across any chunking), so the per-chunk pass-1 min-depth recompute is
    skipped. Leave False when depth was merged across devices/blocks (the
    ring's per-hop backward) or rendered by the raster-precompute forward
    — different fp routes need the tolerance gate."""
    tgt = pos if targets is None else targets
    hdg = dirs if target_hdg is None else target_hdg
    n = pos.shape[0]
    m = tgt.shape[0]
    te = fit_tile(te, n, 8)
    n_pad_e = round_up(n, te)
    # the in-kernel vjp saves every forward intermediate of the (TJ, WB)
    # tile (~100 arrays live at once), so both axes are bounded: width
    # blocks of <=128 px on the grid, TJ capped so TJ*WB <= 4096 elements
    # (validated on v5e — TJ=256 x WB=32 = 8k elems OOM'd the 16 MB scoped
    # stack at 23.9 MB; 4k compiles at every tested shape)
    if cfg.width <= 128:
        wblk = cfg.width
    elif cfg.width % 128 == 0:
        wblk = 128
    elif cfg.width <= 256:
        wblk = cfg.width
    else:
        raise ValueError(
            f"the wireframe backward kernel needs vision width <= 256 or a "
            f"multiple of 128, got {cfg.width}"
        )
    tj = fit_tile(max(8, WF_BWD_TILE_ELEMS // wblk), m, 8)
    n_pad_t = round_up(m, tj)

    ex = pad_axis(pos[:, 0], n_pad_e)
    ey = pad_axis(pos[:, 1], n_pad_e)
    dx = pad_axis(dirs[:, 0], n_pad_e)
    dy = pad_axis(dirs[:, 1], n_pad_e)
    tx = pad_axis(tgt[:, 0], n_pad_t)
    ty = pad_axis(tgt[:, 1], n_pad_t)
    cx = pad_axis(hdg[:, 0], n_pad_t)
    cy = pad_axis(hdg[:, 1], n_pad_t)
    mask = pad_axis(jnp.ones((m,), jnp.float32), n_pad_t)
    dep = pad_axis(depth, n_pad_e)
    usp = pad_axis(us, n_pad_e)  # zero cotangents on padded eyes
    udp = pad_axis(ud, n_pad_e)

    grid = (n_pad_e // te, cfg.width // wblk)
    kernel = functools.partial(
        _wf_bwd_kernel, cfg=cfg, tj=tj, trusted_depth=trusted_depth
    )
    espec = lambda: pl.BlockSpec(
        (te, 1), lambda i, p: (i, 0), memory_space=pltpu.VMEM
    )
    tspec = lambda: pl.BlockSpec(
        (n_pad_t, 1), lambda i, p: (0, 0), memory_space=pltpu.VMEM
    )
    rowspec = lambda: pl.BlockSpec(
        (te, wblk), lambda i, p: (i, p), memory_space=pltpu.VMEM
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=(
            [espec()] * 4 + [tspec()] * 5 + [rowspec()] * 3
        ),
        out_specs=[espec()] * 4 + [tspec()] * 4,
        out_shape=(
            [jax.ShapeDtypeStruct((n_pad_e, 1), jnp.float32)] * 4
            + [jax.ShapeDtypeStruct((n_pad_t, 1), jnp.float32)] * 4
        ),
        cost_estimate=pl.CostEstimate(
            flops=200 * n_pad_e * n_pad_t * cfg.width,
            bytes_accessed=(8 * n_pad_e + 8 * n_pad_t
                            + 3 * n_pad_e * cfg.width) * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(
        col(ex), col(ey), col(dx), col(dy),
        col(tx), col(ty), col(cx), col(cy), col(mask),
        dep, usp, udp,
    )
    gxi, gyi, gdx, gdy, gtx, gty, gcx, gcy = outs
    deye = jnp.concatenate([gxi, gyi], axis=1)[:n]
    ddirs = jnp.concatenate([gdx, gdy], axis=1)[:n]
    dtgt = jnp.concatenate([gtx, gty], axis=1)[:m]
    dhdg = jnp.concatenate([gcx, gcy], axis=1)[:m]
    return deye, ddirs, dtgt, dhdg


# -- winner-index backward (r5) ------------------------------------------------
#
# The streaming backward kernel re-renders EVERY (eye, target-chunk) tile
# under an in-kernel jax.vjp — O(N*M*W) transpose work dominated by
# fragments that LOSE the depth race (measured 1.34e4 af/s at N=1024/W=64,
# ~50x under its own forward). But the forward already knows each pixel's
# winner: with track_idx=True the kernels carry the winning target's global
# index as one more min-reduced payload stream (+1 output row, near-zero
# marginal kernel cost), and the backward collapses to O(N*W) ELEMENTWISE
# work in plain XLA — gather the winner's fields per pixel, re-evaluate the
# single winning fragment (the kernels' exact _merge_edges math), pull the
# cotangents back with jax.vjp, and scatter-add the target/heading grads
# with one segment_sum. No Pallas backward kernel, no winner
# re-identification, no fp-route matching (the index IS the forward's
# decision, so the forward may take its FASTEST route — raster — instead of
# being forced onto the streaming fp route). Gradient semantics match the
# streaming backward: each pixel's cotangent is spent on exactly the
# fragment the forward rendered (lowest-global-index tie-break both
# places). And the route batches for free: the forward through the batched
# router (env axis in the grid), the backward is jnp.
#
# Matches /root/reference/shaders/scene.frag:11-16 — the fragment math
# being differentiated — at the reference's instancing ambition
# (main.rs:653).

WF_WINNER_BWD = True
# prefer winner-index over the compact backward on compact-eligible wide
# shapes too. Silicon A/B (r5 session 2, `_wf_diff_r5_sweep.py`, one
# scene, both variants): winner 2.03e5 / textured 1.91e5 af/s vs compact
# 1.85e5 / 1.77e5 at n=100/W=1024 AA — the winner route's ~free one-hot
# pullback beats the compact backward's culled recompute even though its
# forward rides the streaming kernel instead of the compact one. The
# compact pair stays fully tested (forced-route parity pins + the
# silicon gate) as the cross-check edition.
WF_WINNER_OVER_COMPACT = True


def _wf_diff_route(cfg: VisionConfig, m: int) -> str:
    """'compact' | 'winner' | 'streaming' — THE routing decision for the
    single-env diff path, shared by _rrwd_fwd and _rrwd_bwd (they must
    agree on what the third residual means: final depth for the
    kernel-backward routes, winner index for the winner route)."""
    if _compact_diff_route_ok(cfg, m) and not (
        WF_WINNER_BWD and WF_WINNER_OVER_COMPACT
    ):
        return "compact"
    if WF_WINNER_BWD:
        return "winner"
    return "streaming"


def _winner_fragment_rows(px, py, hx, hy, tx, ty, cth, sth, alb, texture,
                          u_p, cfg: VisionConfig):
    """Re-evaluate each pixel's WINNING sprite fragment, elementwise over
    [N, W] streams in plain XLA: the same vert rotation + projection
    (_project_chunk_verts' fp route) and 3-edge merge (_merge_edges) the
    kernels run, at the pixel-center column u_p [1, W]. Texture mode
    mirrors _decode_textured_wf inline so texture/uv gradients flow.
    Returns (shade, depth)."""
    t = math.tan(math.radians(cfg.hfov_deg) * 0.5)
    hp = 1.0 / cfg.width
    r = cfg.sprite_radius
    raw = texture is not None
    f_v, l_v = [], []
    for vx, vy in SPRITE_VERTS:
        wxr = (vx * r) * cth - (vy * r) * sth
        wyr = (vx * r) * sth + (vy * r) * cth
        relx = tx + wxr - px
        rely = ty + wyr - py
        f_v.append(relx * hx + rely * hy)
        l_v.append(relx * hy - rely * hx)
    ut = u_p * t
    aa_ctx = (u_p, t, hp) if cfg.antialias else None
    d_m, pays = _merge_edges(
        ut, f_v, l_v, alb, cfg, track_uv=raw, aa_ctx=aa_ctx
    )
    if not raw:
        return _finish(
            d_m, pays[0], cfg, cov=pays[-1] if cfg.antialias else None
        )
    from ..vision.render import sample_texture_auto as sample_texture

    uvx, uvy = pays[0], pays[1]
    mag2 = (uvx - 0.5) ** 2 + (uvy - 0.5) ** 2
    val = alb * sample_texture(
        texture, jnp.stack([uvx, uvy], axis=-1)
    ) * (1.0 - mag2)
    if cfg.antialias:
        val = cfg.background + pays[-1] * (val - cfg.background)
    shade = jnp.where(d_m < cfg.far, val, cfg.background)
    return shade, d_m


# the winner pullback's index plumbing, two editions (r5): XLA dynamic
# gather/scatter cost ~60-80 cycles PER ELEMENT on TPU — a device trace of
# the batched diff step showed 4 gather fusions at ~890 ms and the
# scatter fusions at ~250 ms of the 1,195 ms total, with the fragment-vjp
# math itself nearly free. WF_WINNER_ONEHOT routes both through ONE
# materialized per-pixel one-hot and two Precision.HIGHEST contractions
# (gathered = oh @ table, dtgt = oh^T @ grads) — exact selection (the
# compact prologue's bf16x3-split argument: f32-by-0/1 products
# reconstruct exactly) and exactly-one-hot rows make the sums
# order-trivial, so gradients are bit-comparable per env. False keeps the
# gather/segment_sum edition for A/B.
WF_WINNER_ONEHOT = True


def _winner_pullback(pos, vel, widx, us, ud, cfg: VisionConfig,
                     albedo=None, texture=None):
    """(d shade, d depth) [N, W] -> (d pos, d vel[, d albedo][, d texture])
    through the winner-index route (self-render: targets ARE the eyes).

    widx is the forward kernels' winner stream (+inf at background pixels,
    whose cotangents are zeroed here — forward shade/depth are constants
    there). Eye grads arrive pre-reduced by vjp broadcasting ([N, 1]
    inputs); target/heading/albedo grads route by winner index — one-hot
    MXU contractions (with a drop bucket for background) or gather +
    segment_sum, WF_WINNER_ONEHOT above."""
    n = pos.shape[0]
    w = cfg.width
    u_p = row(2.0 * (jnp.arange(w, dtype=jnp.float32) + 0.5) / w - 1.0)
    valid = widx < jnp.float32(n)
    j = jnp.where(valid, widx, 0.0).astype(jnp.int32)
    usm = jnp.where(valid, us, 0.0)
    udm = jnp.where(valid, ud, 0.0)

    dirs, pull_dirs = jax.vjp(camera.unit_heading, vel)
    has_alb = albedo is not None
    has_tex = texture is not None
    hi = jax.lax.Precision.HIGHEST
    if WF_WINNER_ONEHOT:
        # [N, W, n+1] exact one-hot; invalid pixels land in the drop
        # bucket, so their gathered fields are 0 (their cotangents are
        # masked anyway) and their grads never reach a real target
        jk = jnp.where(valid, j, n)
        oh = (jk[:, :, None] == jnp.arange(n + 1, dtype=jnp.int32)).astype(
            jnp.float32
        )
        table = [pos[:, 0], pos[:, 1], dirs[:, 0], dirs[:, 1]]
        if has_alb:
            table.append(albedo)
        table = jnp.stack(
            [jnp.pad(tcol, (0, 1)) for tcol in table], axis=0
        )  # [F, n+1]
        gath = jnp.einsum("nwk,fk->fnw", oh, table, precision=hi)
        tgt_fields = [gath[0], gath[1], gath[2], gath[3]]
        alb_field = gath[4] if has_alb else None
    else:
        tgt_fields = [pos[:, 0][j], pos[:, 1][j], dirs[:, 0][j],
                      dirs[:, 1][j]]
        alb_field = albedo[j] if has_alb else None

    diff_args = [
        pos[:, 0:1], pos[:, 1:2], dirs[:, 0:1], dirs[:, 1:2],
        *tgt_fields,
    ]
    if has_alb:
        diff_args.append(alb_field)
    if has_tex:
        diff_args.append(texture)

    def frag(*a):
        alb = a[8] if has_alb else cfg.sprite_albedo
        tex = a[-1] if has_tex else None
        return _winner_fragment_rows(
            a[0], a[1], a[2], a[3], a[4], a[5], a[6], a[7], alb, tex, u_p,
            cfg,
        )

    _, pull = jax.vjp(frag, *diff_args)
    grads = pull((usm, udm))

    if WF_WINNER_ONEHOT:
        gstack = [grads[4], grads[5], grads[6], grads[7]]
        if has_alb:
            gstack.append(grads[8])
        scats = jnp.einsum(
            "nwk,fnw->fk", oh, jnp.stack(gstack, axis=0), precision=hi
        )[:, :n]  # [F, n]: drop bucket discarded
        scat_list = [scats[i] for i in range(len(gstack))]
    else:
        seg = jnp.where(valid, j, n).reshape(-1)
        scat_list = [
            jax.ops.segment_sum(g.reshape(-1), seg, num_segments=n + 1)[:n]
            for g in ([grads[4], grads[5], grads[6], grads[7]]
                      + ([grads[8]] if has_alb else []))
        ]

    deye = jnp.concatenate([grads[0], grads[1]], axis=1)
    ddirs = jnp.concatenate([grads[2], grads[3]], axis=1)
    dtgt = jnp.stack([scat_list[0], scat_list[1]], axis=1)
    dhdg = jnp.stack([scat_list[2], scat_list[3]], axis=1)
    # eyes look along AND sprites orient to the same unit_heading(vel)
    (dvel,) = pull_dirs(ddirs + dhdg)
    out = [deye + dtgt, dvel]
    if has_alb:
        out.append(scat_list[4])
    if has_tex:
        out.append(grads[-1])
    return tuple(out)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _winner_rows_textured(pos, vel, albedo, texture, cfg):
    """Textured exact-sprite rows with the winner-index VJP — the
    any-shape sibling of _compact_raw_rows + decode (which stays the
    compact-eligible route). Gradients flow to pos, vel, albedo AND the
    texture (the per-pixel fragment recompute samples it under autodiff).

    Primal mirrors _wrt_fwd's track_idx launch (custom_vjp semantics —
    see render_rows_wireframe_diff)."""
    shade, depth, _ = render_rows_wireframe_tiled(
        pos, vel, cfg, albedo=albedo, texture=texture, track_idx=True
    )
    return shade, depth


def _wrt_fwd(pos, vel, albedo, texture, cfg):
    shade, depth, widx = render_rows_wireframe_tiled(
        pos, vel, cfg, albedo=albedo, texture=texture, track_idx=True
    )
    return (shade, depth), (pos, vel, albedo, texture, widx)


def _wrt_bwd(cfg, res, cot):
    pos, vel, albedo, texture, widx = res
    us, ud = cot
    grads = _winner_pullback(
        pos, vel, widx, us, ud, cfg, albedo=albedo, texture=texture
    )
    i = 2
    dalb = None
    if albedo is not None:
        dalb = grads[i]
        i += 1
    return grads[0], grads[1], dalb, grads[i]


_winner_rows_textured.defvjp(_wrt_fwd, _wrt_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def render_rows_wireframe_batched_diff(pos, vel, cfg: VisionConfig,
                                       albedo=None, texture=None):
    """Batched-env DIFFERENTIABLE exact-sprite rendering: [B, N, 2] ->
    (shade, depth) [B, N, W] with a winner-index VJP — APG-through-
    perception at batched-training scale (VERDICT r4 #1). The forward is
    the batched router (env axis in the Pallas grid, the same launch that
    measured 2.03e6 af/s non-diff); the backward is the per-env winner
    pullback, vmapped — pure XLA elementwise + segment_sum, so the env
    axis costs nothing extra. `albedo` [B, N]; `texture` [Ht, Wt] shared
    (its cotangent sums over envs).

    The primal runs the SAME track_idx launch as _rrwbd_fwd (custom_vjp
    semantics: f(x) must equal fwd(x)[0]; the plain batched API's rasterq
    route may flip near-tie winners vs the track_idx division route)."""
    shade, depth, _ = render_rows_wireframe_batched(
        pos, vel, cfg, albedo=albedo, texture=texture, track_idx=True
    )
    return shade, depth


def _rrwbd_fwd(pos, vel, cfg, albedo=None, texture=None):
    shade, depth, widx = render_rows_wireframe_batched(
        pos, vel, cfg, albedo=albedo, texture=texture, track_idx=True
    )
    return (shade, depth), (pos, vel, albedo, texture, widx)


# env-chunking budget for the batched winner pullback: the one-hot
# edition materializes [c, N, W, n+1] f32 per chunk (the two contractions
# share it), so the vmap runs in lax.map chunks of the largest divisor of
# B that stays under this element budget (1 << 28 f32 = 1 GB). B under
# the budget runs one plain vmap — bit-identical to vmap(single-env diff),
# which the batched-vs-vmapped test pins.
WF_WINNER_PULL_ELEMS = 1 << 28


def _rrwbd_bwd(cfg, res, cot):
    pos, vel, albedo, texture, widx = res
    us, ud = cot
    has_alb = albedo is not None
    has_tex = texture is not None
    if has_alb:
        pull_v = jax.vmap(
            lambda p, v, w, a, b, al: _winner_pullback(
                p, v, w, a, b, cfg, albedo=al, texture=texture
            )
        )
        args = (pos, vel, widx, us, ud, albedo)
    else:
        pull_v = jax.vmap(
            lambda p, v, w, a, b: _winner_pullback(
                p, v, w, a, b, cfg, texture=texture
            )
        )
        args = (pos, vel, widx, us, ud)
    b, n = pos.shape[0], pos.shape[1]
    per_env = n * cfg.width * (n + 1)
    if WF_WINNER_ONEHOT and b * per_env > WF_WINNER_PULL_ELEMS:
        c = max(1, WF_WINNER_PULL_ELEMS // per_env)
        while b % c:
            c -= 1
        chunked = jax.tree.map(
            lambda x: x.reshape((b // c, c) + x.shape[1:]), args
        )
        grads = jax.lax.map(lambda ch: pull_v(*ch), chunked)
        grads = jax.tree.map(
            lambda x: x.reshape((b,) + x.shape[2:]), grads
        )
    else:
        grads = pull_v(*args)
    i = 2
    dalb = None
    if has_alb:
        dalb = grads[i]
        i += 1
    dtex = jnp.sum(grads[i], axis=0) if has_tex else None
    return grads[0], grads[1], dalb, dtex


render_rows_wireframe_batched_diff.defvjp(_rrwbd_fwd, _rrwbd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def render_rows_wireframe_diff(pos: jax.Array, vel: jax.Array,
                               cfg: VisionConfig):
    """render_rows_wireframe_tiled with a kernel-speed custom VJP —
    differentiable perception with the reference's EXACT sprite (the dense
    wireframe autodiff is the oracle; use cfg.antialias=True for
    meaningful coverage gradients, as with the disc's render_rows_diff).

    The primal mirrors _rrwd_fwd's routing EXACTLY (custom_vjp semantics:
    f(x) must equal fwd(x)[0], or grad/no-grad contexts see different
    renders) — winner-route shapes run the track_idx division-route
    launch here too, NOT the rasterq default the plain API picks."""
    route = _wf_diff_route(cfg, pos.shape[0])
    if route == "winner":
        shade, depth, _ = render_rows_wireframe_tiled(
            pos, vel, cfg, track_idx=True
        )
        return shade, depth
    return render_rows_wireframe_tiled(
        pos, vel, cfg,
        force_streaming=route == "streaming",
        force_compact=route == "compact",
    )


def _rrwd_fwd(pos, vel, cfg):
    # three routes (see _wf_diff_route): compact-eligible shapes run the
    # compact forward and its culled backward (both recompute winners on
    # the compact fp route); the winner-index route lets the launcher pick
    # its FASTEST forward and saves the winner stream instead of matching
    # fp routes; the streaming fallback forces the streaming forward,
    # bit-consistent with the streaming backward kernel's recomputation
    route = _wf_diff_route(cfg, pos.shape[0])
    if route == "winner":
        shade, depth, widx = render_rows_wireframe_tiled(
            pos, vel, cfg, track_idx=True
        )
        return (shade, depth), (pos, vel, widx)
    shade, depth = render_rows_wireframe_tiled(
        pos, vel, cfg,
        force_streaming=route == "streaming",
        force_compact=route == "compact",
    )
    return (shade, depth), (pos, vel, depth)


def _rrwd_bwd(cfg, res, cot):
    pos, vel, res3 = res  # final depth, or the winner route's index stream
    us, ud = cot
    route = _wf_diff_route(cfg, pos.shape[0])
    if route == "winner":
        return _winner_pullback(pos, vel, res3, us, ud, cfg)
    depth = res3
    if route == "compact":
        return _rrwd_bwd_compact(cfg, pos, vel, depth, us, ud)
    dirs, pull_dirs = jax.vjp(camera.unit_heading, vel)
    # trusted_depth=True skips the backward's pass-1 depth recompute:
    # _rrwd_fwd forces the streaming forward, whose depth is bit-identical
    # to the backward's recomputation. The identity crosses two Mosaic
    # lowerings; it was gated off until measured on silicon — r4 v5e:
    # trusted and untrusted gradients are np.array_equal (the canary
    # condition, tpu_tests test_wireframe_trusted_depth_canary) and the
    # RL diff shape N=1024/W=64 runs 1.34e4 vs 1.14e4 af/s (+18%).
    deye, ddirs, dtgt, dhdg = render_rows_wireframe_vjp_cross(
        pos, dirs, depth, us, ud, cfg, trusted_depth=WF_TRUSTED_DEPTH
    )
    # eyes look along AND sprites orient to the same unit_heading(vel)
    (dvel,) = pull_dirs(ddirs + dhdg)
    return deye + dtgt, dvel


render_rows_wireframe_diff.defvjp(_rrwd_fwd, _rrwd_bwd)


def render_lines(state, cfg: VisionConfig) -> jax.Array:
    """`observe()` through the Pallas wireframe path: [N, W] shade rows."""
    return render_rows_wireframe_tiled(state.pos, state.vel, cfg)[0]


def render_lines_with_depth(state, cfg: VisionConfig):
    return render_rows_wireframe_tiled(state.pos, state.vel, cfg)
