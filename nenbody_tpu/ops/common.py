"""Shared helpers for the Pallas kernels: padding, layout, interpret mode."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def interpret_mode() -> bool:
    """Pallas kernels compile with Mosaic on TPU and run interpreted
    elsewhere (CPU test rig, SURVEY.md §4.4)."""
    return jax.default_backend() != "tpu"


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def kernel_width_ok(width: int) -> bool:
    """Whether the tiled render kernels can block this vision width: a whole
    row up to 256 lanes, or 128-lane blocks beyond. Routing layers (Scene,
    the ring's partial renderers, rl.env) fall back to the dense renderer
    for other widths instead of raising at observe time."""
    return width <= 256 or width % 128 == 0


def fit_tile(tile: int, n: int, mult: int) -> int:
    """Shrink a power-of-two tile toward the hardware minimum `mult` while it
    overshoots the padded problem size, keeping tile a power-of-two multiple
    of `mult` so padded sizes divide evenly into the grid. Non-pow2 inputs
    are first rounded down to a multiple of `mult` (defensive; all in-tree
    callers pass powers of two)."""
    tile = max(mult, (tile // mult) * mult)
    target = round_up(n, mult)
    while tile > mult and tile // 2 >= target and tile % (2 * mult) == 0:
        tile //= 2
    return tile



def pad_axis(x: jax.Array, n_pad: int, axis: int = 0, value: float = 0.0) -> jax.Array:
    """Pad `axis` of x up to length n_pad with a constant."""
    n = x.shape[axis]
    if n == n_pad:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, n_pad - n)
    return jnp.pad(x, widths, constant_values=value)


def run_eyes_unrolled(eye_body, te: int, cap: int) -> None:
    """Drive `eye_body(e, 0)` over `te` eyes: a dynamic fori_loop over
    groups of `ue` statically-unrolled calls, with ue the largest power of
    two <= min(te, cap) that divides te (so no eye is dropped for any te).

    Why groups — the ONE unroll rule for every per-eye kernel loop: Mosaic
    allocates the loop body's scoped-vmem stack once per loop, so a full
    static unroll multiplies the live (WB, TJ) temporaries past the 16 MB
    scoped-vmem limit on the heavy kernel variants, while a fully dynamic
    eye loop costs ~2.5x in throughput; unroll groups give both. `cap` is
    variant-specific and swept on hardware at each call site (CLAUDE.md:
    re-check caps on REAL hardware whenever a kernel variant adds select
    streams — interpret mode will not catch the scoped-vmem OOM).

    Interpret mode (the CPU suite) always runs ue=1: the unroll is a
    Mosaic-throughput knob whose groups are bit-identical by construction,
    and the statically-duplicated bodies only inflate trace/compile time
    on the XLA-compile-bound CI box (CLAUDE.md)."""
    if interpret_mode():
        cap = 1
    ue = 1
    while ue * 2 <= min(te, cap) and te % (ue * 2) == 0:
        ue *= 2

    def group_body(g, _):
        base = g * ue
        for u in range(ue):
            eye_body(base + u, 0)
        return 0

    jax.lax.fori_loop(0, te // ue, group_body, 0)


def col(x: jax.Array) -> jax.Array:
    """[N] -> [N, 1] (sublane-major layout for i-resident tiles)."""
    return x[:, None]


def row(x: jax.Array) -> jax.Array:
    """[N] -> [1, N] (lane-major layout for streamed j tiles)."""
    return x[None, :]
