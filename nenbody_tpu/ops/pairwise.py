"""Tiled all-pairs gravity force kernel.

The blockwise structure SURVEY.md §5.7 calls for: an i-block of agents stays
resident in VMEM while j-blocks of the full position row stream through the
VPU as (TI, TJ) outer tiles — the flash-attention access pattern applied to
the reference's O(N^2) gravity fold (src/main.rs:425-432):

    g_i = sum_j (x_j - x_i) * g / (|x_j - x_i|^2 + bias)

Self-pair included exactly as in the reference: dx = dy = 0 makes the
numerator zero while `bias` keeps 1/d2 finite, so no special-casing. Padding
lanes are killed through the `mask` row (the pad entries of which are 0), so
arbitrary N works without perturbing the physics.

Layouts: positions enter twice — as columns [N_pad, 1] for the resident
i-block (sublane-major) and as rows [1, N_pad] for the streamed j-blocks
(lane-major) — because a (TI,1)x(1,TJ) broadcast is free on the VPU while an
in-kernel transpose is not. At N=65,536 the full rows are 256 KB each and
live comfortably in VMEM for the whole grid sweep.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import GravityConfig
from .common import col, fit_tile, interpret_mode, pad_axis, round_up, row

# Default tile sizes; (TI, TJ) temporaries are TI*TJ*4 bytes each, and the
# kernel keeps ~3 of them live -> 512x2048 = 4 MB/temp, inside the ~16
# MB/core VMEM budget with room for the resident rows. Swept on v5e:
# (512, 2048) is the fastest of the feasible tilings.
TILE_I = 512
TILE_J = 2048


def _gravity_kernel(
    xc_ref,  # [TI, 1] i-block x
    yc_ref,  # [TI, 1] i-block y
    xr_ref,  # [1, N_pad] all x (lane-major)
    yr_ref,  # [1, N_pad] all y
    m_ref,  # [1, N_pad] 1.0 for real agents, 0.0 for padding
    gx_ref,  # [TI, 1] out: accumulated force x (pre-G)
    gy_ref,  # [TI, 1] out: accumulated force y
    *,
    bias: float,
    tj: int,
    approx: bool,
):
    xi = xc_ref[:]  # (TI, 1)
    yi = yc_ref[:]
    n_pad = xr_ref.shape[1]
    num_chunks = n_pad // tj

    def body(k, acc):
        gx, gy = acc
        j0 = pl.multiple_of(k * tj, tj)
        xj = xr_ref[:, pl.ds(j0, tj)]  # (1, TJ)
        yj = yr_ref[:, pl.ds(j0, tj)]
        mj = m_ref[:, pl.ds(j0, tj)]
        dx = xj - xi  # (TI, TJ)
        dy = yj - yi
        d2 = dx * dx + dy * dy + bias
        if approx:  # ~2^-12 relative error, ~+40% throughput
            w = mj * pl.reciprocal(d2, approx=True)
        else:
            w = mj / d2  # masked inverse squared distance, exact fp32
        gx = gx + jnp.sum(dx * w, axis=1, keepdims=True)
        gy = gy + jnp.sum(dy * w, axis=1, keepdims=True)
        return gx, gy

    zero = jnp.zeros((xi.shape[0], 1), jnp.float32)
    gx, gy = jax.lax.fori_loop(0, num_chunks, body, (zero, zero))
    gx_ref[:] = gx
    gy_ref[:] = gy


@functools.partial(jax.jit, static_argnames=("cfg", "ti", "tj"))
def gravity_forces_tiled(
    pos: jax.Array,
    cfg: GravityConfig,
    ti: int = TILE_I,
    tj: int = TILE_J,
    pos_j: jax.Array | None = None,
) -> jax.Array:
    """Pallas counterpart of physics.dense.gravity_forces. pos: [N, 2].

    With `pos_j` [M, 2] this computes the cross-block force of the j-set on
    the i-set (the ring backend's per-hop primitive); default is the full
    self-interaction.
    """
    src = pos if pos_j is None else pos_j
    n = pos.shape[0]
    m = src.shape[0]
    ti = fit_tile(ti, n, 8)
    tj = fit_tile(tj, m, 128)
    n_pad = round_up(n, ti)
    m_pad = round_up(m, tj)
    xi = pad_axis(pos[:, 0], n_pad)
    yi = pad_axis(pos[:, 1], n_pad)
    xj = pad_axis(src[:, 0], m_pad)
    yj = pad_axis(src[:, 1], m_pad)
    mask = pad_axis(jnp.ones((m,), jnp.float32), m_pad)

    grid = (n_pad // ti,)
    kernel = functools.partial(
        _gravity_kernel, bias=cfg.bias, tj=tj, approx=cfg.approx_reciprocal
    )
    flops_per_pair = 8
    gx, gy = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ti, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ti, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_per_pair * n_pad * m_pad,
            bytes_accessed=(2 * n_pad + 3 * m_pad + 2 * n_pad) * 4,
            transcendentals=0,
        ),
        interpret=interpret_mode(),
    )(col(xi), col(yi), row(xj), row(yj), row(mask))

    g = jnp.concatenate([gx, gy], axis=1)[:n]
    return cfg.g * g
