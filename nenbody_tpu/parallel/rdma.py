"""Pallas-RDMA ring: the hand-scheduled alternative to the shard_map ring.

`parallel/ring.py` expresses the agent-axis ring with `jax.lax.ppermute` and
lets XLA schedule communication against compute. That is the right default
(DESIGN.md §5: the ring is bandwidth-trivial at reference scales), but past
~16 chips the compiler may under-overlap the hop exchange with the partial
computation. This module is the explicitly-scheduled version: ONE Pallas
kernel per device whose grid dimension is the hop index, with

- double-buffered VMEM comm slots: hop k computes on slot k%2 while
  `pltpu.make_async_remote_copy` streams the block to the right neighbor's
  slot (k+1)%2 over ICI,
- a capacity handshake (a REGULAR semaphore signaled to the LEFT neighbor
  when the landing slot is free, awaited before each send) that makes slot
  reuse race-free without a global barrier: a sender can never run more
  than one hop ahead of its receiver's compute,
- the gravity partial (the reference force law, src/main.rs:425-432, same
  tiled structure as ops/pairwise.py) evaluated between the RDMA's start()
  and wait(), so the interconnect transfer hides under the O(N^2/D^2)
  compute of the hop.

Status: correctness prototype (VERDICT r1 missing #6, widened per r2 #7).
All three hop variants — gravity, boids (a (pos, vel) payload feeding the
three flocking-rule accumulators), and disc vision (a lane-major payload
transposed per hop into column staging for the raycast core, with a
cross-hop depth merge) — are exact against
the dense oracle on the CPU interpret rig (tests/test_rdma_ring.py runs
them on an 8-virtual-device mesh with emulated RDMA), and gravity/boids
accept a leading env-batch dim (batch folds into the comm payload; each
env's all-pairs fold stays within its own block segment). The kernels
compile the same Mosaic programs a real multi-chip slice would run, but
single-chip hardware (D=1) degenerates to no communication, so the
overlap-vs-ppermute question stays open until pod hardware is available
(NEXT #1). The shard_map ring remains the production backend.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..config import BoidsConfig, SimConfig, VisionConfig
from ..ops.common import interpret_mode, round_up
from .mesh import AGENT_AXIS, default_mesh
from .ring import _PAD_SENTINEL, _pad_agents

TILE_I = 256
TILE_J = 256


def _hop_exchange(buf_ref, send_sem, recv_sem, cap_sem, k, d, axis,
                  compute_fn):
    """The shared hop schedule (see module docstring): capacity handshake,
    start the slot-(k+1)%2 RDMA to the right neighbor, run `compute_fn(cur)`
    on slot k%2 while the copy is in flight, then wait. The caller's k==0
    branch must have seeded slot 0 with the local payload."""
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, d)
    left = jax.lax.rem(my + d - 1, d)
    cur = jax.lax.rem(k, 2)
    nxt = jax.lax.rem(k + 1, 2)

    rdma = pltpu.make_async_remote_copy(
        src_ref=buf_ref.at[cur],
        dst_ref=buf_ref.at[nxt],
        send_sem=send_sem.at[cur],
        recv_sem=recv_sem.at[nxt],
        device_id=right,
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )

    @pl.when(k < d - 1)
    def _start():
        pltpu.semaphore_signal(
            cap_sem, inc=1, device_id=left,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        pltpu.semaphore_wait(cap_sem, 1)
        rdma.start()

    compute_fn(cur)

    @pl.when(k < d - 1)
    def _finish():
        rdma.wait()


def _rdma_gravity_kernel(
    xc_ref, yc_ref,  # [NB*Nl, 1] local i-blocks, env-major (sublane-major)
    xr_ref, yr_ref,  # [1, NB*Nl] local blocks, lane-major (hop-0 payload)
    gx_ref, gy_ref,  # [NB*Nl, 1] out: accumulated force (pre-G)
    buf_ref,  # [2, 2, NB*Nl] VMEM comm slots: [slot, x/y, env-major agent]
    send_sem, recv_sem,  # DMA semaphore pairs, one per slot
    cap_sem,  # REGULAR: landing-slot-free tokens from the right neighbor
    *,
    bias: float,
    ti: int,
    tj: int,
    d: int,
    nb: int,
    nl: int,
    axis: str,
):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        gx_ref[:] = jnp.zeros_like(gx_ref)
        gy_ref[:] = jnp.zeros_like(gy_ref)
        buf_ref[0, 0:1, :] = xr_ref[:]
        buf_ref[0, 1:2, :] = yr_ref[:]

    def compute(cur):
        # The hop's compute, overlapped with the in-flight RDMA: the
        # reference force law on (TI, TJ) tiles per env segment (same math
        # as ops/pairwise._gravity_kernel; far-sentinel padding makes masks
        # unnecessary — see ring._PAD_SENTINEL). Each env's fold stays
        # within its own Nl-segment of the payload: envs never interact.
        num_i = nl // ti
        num_j = nl // tj

        def env_body(b, _):
            base = pl.multiple_of(b * nl, max(8, ti))

            def i_body(it, _):
                i0 = base + pl.multiple_of(it * ti, ti)
                xi = xc_ref[pl.ds(i0, ti), :]  # (TI, 1)
                yi = yc_ref[pl.ds(i0, ti), :]

                def j_body(jt, acc):
                    gx, gy = acc
                    j0 = base + pl.multiple_of(jt * tj, tj)
                    xj = buf_ref[cur, 0:1, pl.ds(j0, tj)]  # (1, TJ)
                    yj = buf_ref[cur, 1:2, pl.ds(j0, tj)]
                    dx = xj - xi  # (TI, TJ)
                    dy = yj - yi
                    w = 1.0 / (dx * dx + dy * dy + bias)
                    gx = gx + jnp.sum(dx * w, axis=1, keepdims=True)
                    gy = gy + jnp.sum(dy * w, axis=1, keepdims=True)
                    return gx, gy

                zeros = jnp.zeros((ti, 1), jnp.float32)
                gx, gy = jax.lax.fori_loop(0, num_j, j_body, (zeros, zeros))
                gx_ref[pl.ds(i0, ti), :] += gx
                gy_ref[pl.ds(i0, ti), :] += gy
                return 0

            jax.lax.fori_loop(0, num_i, i_body, 0)
            return 0

        jax.lax.fori_loop(0, nb, env_body, 0)

    _hop_exchange(buf_ref, send_sem, recv_sem, cap_sem, k, d, axis, compute)


def _pad_for_tiles(arrays, n, d, tile):
    """Far-sentinel pad the agent axis so each device block divides into
    `tile`-sized pieces; returns (padded arrays, per-device block size)."""
    padded, _ = _pad_agents(list(arrays), n, d)
    nl = padded[0].shape[-2] // d
    blk = round_up(max(nl, tile), tile)
    if blk != nl:
        padded, _ = _pad_agents(list(arrays), n, d * blk)
        nl = blk
    return padded, nl


def _rdma_pallas_call(kernel, n_in, nrows, nl_total, payload_rows, d,
                      buf_rows=None, extra_scratch=()):
    """Shared pallas_call plumbing for ALL the RDMA ring kernels (gravity,
    boids, vision): `n_in` column inputs [nrows, 1] plus `payload_rows`
    lane-major payload rows [1, nl_total], double-buffered comm scratch +
    semaphore set. `buf_rows` overrides the comm buffer's row count when it
    exceeds the payload inputs (boids pads 5 rows to an 8-sublane buffer);
    `extra_scratch` VMEM shapes slot between the comm buffer and the
    semaphores (the kernel's scratch order). No collective_id: the capacity
    handshake replaces the global barrier, and Mosaic requires the id only
    for barrier semaphores."""
    cspec = lambda r=1: pl.BlockSpec(
        (nrows, r), lambda k: (0, 0), memory_space=pltpu.VMEM
    )
    rspec = lambda: pl.BlockSpec(
        (1, nl_total), lambda k: (0, 0), memory_space=pltpu.VMEM
    )
    pay_specs = [rspec() for _ in range(payload_rows)]
    buf = pltpu.VMEM((2, buf_rows or payload_rows, nl_total), jnp.float32)
    interp = interpret_mode()
    return functools.partial(
        pl.pallas_call,
        kernel,
        grid=(d,),
        in_specs=[cspec() for _ in range(n_in)] + pay_specs,
        scratch_shapes=[
            buf,
            *extra_scratch,
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.REGULAR,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=(
            pltpu.InterpretParams(dma_execution_mode="eager")
            if interp
            else False
        ),
    )


def rdma_ring_gravity_forces(
    pos: jax.Array,
    cfg: SimConfig,
    mesh: Optional[Mesh] = None,
    axis: str = AGENT_AXIS,
    ti: int = TILE_I,
    tj: int = TILE_J,
) -> jax.Array:
    """Gravity forces for globally-sharded pos [(B,) N, 2] through the RDMA
    ring.

    Semantics identical to ring.ring_gravity_forces (and the dense oracle):
    arbitrary N via far-sentinel padding, self-pair included with the
    bias-softened denominator. A leading env-batch dim folds into the comm
    payload env-major; each env's fold stays inside its own segment."""
    if pos.ndim not in (2, 3):
        raise ValueError(f"pos must be [N, 2] or [B, N, 2], got rank {pos.ndim}")
    batched = pos.ndim == 3
    mesh = mesh or default_mesh()
    d = mesh.shape[axis]
    n = pos.shape[-2]
    (pos_p,), nl = _pad_for_tiles([pos], n, d, max(ti, tj))
    nb = pos_p.shape[0] if batched else 1
    g = cfg.gravity
    ti_f, tj_f = min(ti, nl), min(tj, nl)

    kernel = functools.partial(
        _rdma_gravity_kernel,
        bias=g.bias, ti=ti_f, tj=tj_f, d=d, nb=nb, nl=nl, axis=axis,
    )
    nrows = nb * nl

    def local(pos_l):
        # env-major flatten: [B, Nl, 2] -> [B*Nl, 2]
        flat = pos_l.reshape(-1, 2)
        xc, yc = flat[:, 0:1], flat[:, 1:2]
        xr, yr = flat[:, 0][None, :], flat[:, 1][None, :]
        gx, gy = _rdma_pallas_call(
            kernel, n_in=2, nrows=nrows, nl_total=nrows, payload_rows=2, d=d,
        )(
            out_specs=[
                pl.BlockSpec((nrows, 1), lambda k: (0, 0), memory_space=pltpu.VMEM)
            ] * 2,
            out_shape=[jax.ShapeDtypeStruct((nrows, 1), jnp.float32)] * 2,
        )(xc, yc, xr, yr)
        out = jnp.concatenate([gx, gy], axis=1) * g.g
        return out.reshape(pos_l.shape)

    lead = (None,) if batched else ()
    spec = P(*lead, axis, None)
    out = jax.shard_map(
        local, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )(pos_p)
    return out[..., :n, :]


def _rdma_boids_kernel(
    xc_ref, yc_ref, vxc_ref, vyc_ref,  # [NB*Nl, 1] local i-blocks (env-major)
    ic_ref,  # [NB*Nl, 1] local global agent index (diag exclusion)
    xr_ref, yr_ref, vxr_ref, vyr_ref,  # [1, NB*Nl] lane-major hop-0 payload
    ir_ref,  # [1, NB*Nl] global index, lane-major (circulates with the block)
    s1x_ref, s1y_ref, c1_ref,  # [NB*Nl, 1] out: cohesion sum / count
    rpx_ref, rpy_ref,  # [NB*Nl, 1] out: separation repel
    s3x_ref, s3y_ref, c3_ref,  # [NB*Nl, 1] out: alignment sum / count
    buf_ref,  # [2, 8, NB*Nl] comm slots: rows 0-4 = x/y/vx/vy/idx; rows 5-7
    # pad the slot to Mosaic's 8-sublane tile (a 5-row slot slice is not
    # tile-aligned and fails to lower; the 3 pad rows circulate unread)
    send_sem, recv_sem, cap_sem,
    *,
    cfg: BoidsConfig,
    ti: int,
    tj: int,
    d: int,
    nb: int,
    nl: int,
    axis: str,
):
    """Boids hop kernel: circulates (pos, vel, global index) and accumulates
    the three flocking-rule partials (dense.boids_partials_cross semantics:
    squared cohesion threshold, unsquared separation, velocity-space
    alignment, self excluded by GLOBAL INDEX — the circulating index row
    makes hop-0's aligned diagonal a plain elementwise compare)."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        for ref in (s1x_ref, s1y_ref, c1_ref, rpx_ref, rpy_ref,
                    s3x_ref, s3y_ref, c3_ref):
            ref[:] = jnp.zeros_like(ref)
        buf_ref[0, 0:1, :] = xr_ref[:]
        buf_ref[0, 1:2, :] = yr_ref[:]
        buf_ref[0, 2:3, :] = vxr_ref[:]
        buf_ref[0, 3:4, :] = vyr_ref[:]
        buf_ref[0, 4:5, :] = ir_ref[:]

    sep2 = cfg.separation_dist * cfg.separation_dist
    ali2 = cfg.alignment_dist * cfg.alignment_dist

    def compute(cur):
        num_i = nl // ti
        num_j = nl // tj

        def env_body(b, _):
            base = pl.multiple_of(b * nl, max(8, ti))

            def i_body(it, _):
                i0 = base + pl.multiple_of(it * ti, ti)
                xi = xc_ref[pl.ds(i0, ti), :]  # (TI, 1)
                yi = yc_ref[pl.ds(i0, ti), :]
                vxi = vxc_ref[pl.ds(i0, ti), :]
                vyi = vyc_ref[pl.ds(i0, ti), :]
                ii = ic_ref[pl.ds(i0, ti), :]  # (TI, 1)

                def j_body(jt, acc):
                    s1x, s1y, c1, rpx, rpy, s3x, s3y, c3 = acc
                    j0 = base + pl.multiple_of(jt * tj, tj)
                    xj = buf_ref[cur, 0:1, pl.ds(j0, tj)]  # (1, TJ)
                    yj = buf_ref[cur, 1:2, pl.ds(j0, tj)]
                    vxj = buf_ref[cur, 2:3, pl.ds(j0, tj)]
                    vyj = buf_ref[cur, 3:4, pl.ds(j0, tj)]
                    ij = buf_ref[cur, 4:5, pl.ds(j0, tj)]
                    dx = xj - xi  # (TI, TJ)
                    dy = yj - yi
                    d2 = dx * dx + dy * dy
                    ns = ij != ii  # not-self, by global index
                    m1 = (d2 < cfg.cohesion_dist_sq) & ns
                    one = jnp.float32(1.0)
                    c1 = c1 + jnp.sum(
                        jnp.where(m1, one, 0.0), axis=1, keepdims=True
                    )
                    s1x = s1x + jnp.sum(
                        jnp.where(m1, xj, 0.0), axis=1, keepdims=True
                    )
                    s1y = s1y + jnp.sum(
                        jnp.where(m1, yj, 0.0), axis=1, keepdims=True
                    )
                    m2 = (d2 < sep2) & ns
                    rpx = rpx - jnp.sum(
                        jnp.where(m2, dx, 0.0), axis=1, keepdims=True
                    )
                    rpy = rpy - jnp.sum(
                        jnp.where(m2, dy, 0.0), axis=1, keepdims=True
                    )
                    dvx = vxj - vxi
                    dvy = vyj - vyi
                    vd2 = dvx * dvx + dvy * dvy
                    m3 = (vd2 < ali2) & ns
                    c3 = c3 + jnp.sum(
                        jnp.where(m3, one, 0.0), axis=1, keepdims=True
                    )
                    s3x = s3x + jnp.sum(
                        jnp.where(m3, vxj, 0.0), axis=1, keepdims=True
                    )
                    s3y = s3y + jnp.sum(
                        jnp.where(m3, vyj, 0.0), axis=1, keepdims=True
                    )
                    return s1x, s1y, c1, rpx, rpy, s3x, s3y, c3

                zeros = [jnp.zeros((ti, 1), jnp.float32) for _ in range(8)]
                acc = jax.lax.fori_loop(0, num_j, j_body, tuple(zeros))
                for ref, a in zip(
                    (s1x_ref, s1y_ref, c1_ref, rpx_ref, rpy_ref,
                     s3x_ref, s3y_ref, c3_ref),
                    acc,
                ):
                    ref[pl.ds(i0, ti), :] += a
                return 0

            jax.lax.fori_loop(0, num_i, i_body, 0)
            return 0

        jax.lax.fori_loop(0, nb, env_body, 0)

    _hop_exchange(buf_ref, send_sem, recv_sem, cap_sem, k, d, axis, compute)


def rdma_ring_boids_velocity(
    pos: jax.Array,
    vel: jax.Array,
    cfg: SimConfig,
    mesh: Optional[Mesh] = None,
    axis: str = AGENT_AXIS,
    ti: int = TILE_I,
    tj: int = TILE_J,
) -> jax.Array:
    """Replacement velocity (pre-clamp) through the RDMA ring — semantics of
    ring.ring_boids_velocity / dense.boids_accels. The (pos, vel, global
    index) payload circulates; far-sentinel padding keeps pad rows inert in
    all three thresholded rules (sentinel velocities are far in velocity
    space too). Accepts [(B,) N, 2]."""
    if pos.ndim not in (2, 3):
        raise ValueError(f"pos must be [N, 2] or [B, N, 2], got rank {pos.ndim}")
    batched = pos.ndim == 3
    mesh = mesh or default_mesh()
    d = mesh.shape[axis]
    n = pos.shape[-2]
    (pos_p, vel_p), nl = _pad_for_tiles([pos, vel], n, d, max(ti, tj))
    nb = pos_p.shape[0] if batched else 1
    bcfg = cfg.boids
    ti_f, tj_f = min(ti, nl), min(tj, nl)

    kernel = functools.partial(
        _rdma_boids_kernel,
        cfg=bcfg, ti=ti_f, tj=tj_f, d=d, nb=nb, nl=nl, axis=axis,
    )
    nrows = nb * nl
    n_pad_total = nl * d  # agents per env across the ring
    # global agent index (sentinel-safe: padded rows get unique indices too,
    # so they can never alias a real agent's)
    gidx = jnp.arange(n_pad_total, dtype=jnp.float32)

    def local(pos_l, vel_l, idx_l):
        flat_p = pos_l.reshape(-1, 2)
        flat_v = vel_l.reshape(-1, 2)
        if batched:  # repeat the per-env index row env-major
            idx_flat = jnp.broadcast_to(
                idx_l.reshape(1, -1), (nb, idx_l.shape[-1])
            ).reshape(-1)
        else:
            idx_flat = idx_l
        args = (
            flat_p[:, 0:1], flat_p[:, 1:2], flat_v[:, 0:1], flat_v[:, 1:2],
            idx_flat[:, None],
            flat_p[:, 0][None, :], flat_p[:, 1][None, :],
            flat_v[:, 0][None, :], flat_v[:, 1][None, :],
            idx_flat[None, :],
        )
        cspec_out = lambda: pl.BlockSpec(
            (nrows, 1), lambda k: (0, 0), memory_space=pltpu.VMEM
        )
        outs = _rdma_pallas_call(
            kernel, n_in=5, nrows=nrows, nl_total=nrows, payload_rows=5,
            d=d, buf_rows=8,  # 5 payload rows padded to an 8-sublane buffer
        )(
            out_specs=[cspec_out() for _ in range(8)],
            out_shape=[jax.ShapeDtypeStruct((nrows, 1), jnp.float32)] * 8,
        )(*args)
        s1x, s1y, c1, rpx, rpy, s3x, s3y, c3 = outs
        from ..physics import dense

        shape = pos_l.shape
        partials = (
            jnp.concatenate([s1x, s1y], axis=1).reshape(shape),
            c1[:, 0].reshape(shape[:-1]),
            jnp.concatenate([rpx, rpy], axis=1).reshape(shape),
            jnp.concatenate([s3x, s3y], axis=1).reshape(shape),
            c3[:, 0].reshape(shape[:-1]),
        )
        return dense.boids_finalize(partials, bcfg)

    lead = (None,) if batched else ()
    spec = P(*lead, axis, None)
    out = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, P(axis)),
        out_specs=spec, check_vma=False,
    )(pos_p, vel_p, gidx)
    return out[..., :n, :]


def _rdma_vision_kernel(
    ex_ref, ey_ref, dx_ref, dy_ref,  # [NB*Nl, 1] eye pos / unit heading
    xr_ref, yr_ref,  # [1, NB*Nl] local positions, lane-major (hop-0 payload)
    d_ref, o2_ref,  # [NB*Nl, W] out: best depth / winner offset^2
    buf_ref,  # [2, 2, NB*Nl] comm slots: [slot, x/y, agent] (lane-major —
    # the compact tiling; column-major slots pad lanes 2->128 and their
    # slot slices fail Mosaic's lane-tile alignment)
    cmx_ref, cmy_ref,  # [NB*Nl, 1] column-major staging of the current slot
    send_sem, recv_sem, cap_sem,
    *,
    cfg: VisionConfig,
    tj: int,
    d: int,
    nb: int,
    nl: int,
    axis: str,
):
    """Disc-vision hop kernel: local eyes raycast the circulating position
    block (the streaming core of ops/raycast._raycast_kernel, plain disc)
    and depth-merge into the persistent output rows — min-depth across
    disjoint blocks is associative, exactly the shard_map vision ring's
    merge (ring.ring_render_rows). The payload circulates lane-major; each
    hop transposes its slot ONCE into (NB*Nl, 1) column staging so the
    per-chunk target reads stay sublane-major (TJ, 1) slices."""
    import math as _math

    k = pl.program_id(0)
    w = d_ref.shape[1]
    t = _math.tan(_math.radians(cfg.hfov_deg) * 0.5)

    @pl.when(k == 0)
    def _init():
        d_ref[:] = jnp.full_like(d_ref, cfg.far)
        o2_ref[:] = jnp.ones_like(o2_ref)
        buf_ref[0, 0:1, :] = xr_ref[:]
        buf_ref[0, 1:2, :] = yr_ref[:]

    u_p = (
        2.0
        * (
            jax.lax.broadcasted_iota(jnp.int32, (1, w), 1).astype(jnp.float32)
            + 0.5
        )
        / w
        - 1.0
    )  # (1, W)

    def compute(cur):
        num_j = nl // tj
        cmx_ref[:] = jnp.transpose(buf_ref[cur, 0:1, :], (1, 0))
        cmy_ref[:] = jnp.transpose(buf_ref[cur, 1:2, :], (1, 0))

        def env_body(b, _):
            base = pl.multiple_of(b * nl, 8)

            def eye_body(ei, _):
                e = base + ei
                px, py = ex_ref[e, 0], ey_ref[e, 0]
                hx, hy = dx_ref[e, 0], dy_ref[e, 0]

                def j_body(jt, carry, px=px, py=py, hx=hx, hy=hy):
                    best_d, best_o2 = carry
                    j0 = base + pl.multiple_of(jt * tj, tj)
                    tx = cmx_ref[pl.ds(j0, tj), :]  # (TJ, 1)
                    ty = cmy_ref[pl.ds(j0, tj), :]
                    relx = tx - px
                    rely = ty - py
                    f = relx * hx + rely * hy
                    l = relx * hy - rely * hx
                    valid = (f > cfg.near) & (f < cfg.far)
                    fs = jnp.where(valid, f, 1.0)
                    u_c = l / (fs * t)
                    inv_du = fs * (t / cfg.sprite_radius)
                    cov_th = jnp.where(valid, 1.0, 0.0)
                    dsrc = jnp.where(valid, f, cfg.far)
                    off = (u_p - u_c) * inv_du  # (TJ, W)
                    o2 = off * off
                    dfield = jnp.where(o2 < cov_th, dsrc, cfg.far)
                    cmin = jnp.min(dfield, axis=0, keepdims=True)  # (1, W)
                    win = dfield == cmin
                    o2m = jnp.min(
                        jnp.where(win, o2, 1.0), axis=0, keepdims=True
                    )
                    better = cmin < best_d
                    best_o2 = jnp.where(better, o2m, best_o2)
                    best_d = jnp.minimum(best_d, cmin)
                    return best_d, best_o2

                init = (
                    d_ref[pl.ds(e, 1), :],
                    o2_ref[pl.ds(e, 1), :],
                )
                best_d, best_o2 = jax.lax.fori_loop(0, num_j, j_body, init)
                d_ref[pl.ds(e, 1), :] = best_d
                o2_ref[pl.ds(e, 1), :] = best_o2
                return 0

            jax.lax.fori_loop(0, nl, eye_body, 0)
            return 0

        jax.lax.fori_loop(0, nb, env_body, 0)

    _hop_exchange(buf_ref, send_sem, recv_sem, cap_sem, k, d, axis, compute)


def rdma_ring_render_rows(
    pos: jax.Array,
    vel: jax.Array,
    vcfg: VisionConfig,
    mesh: Optional[Mesh] = None,
    axis: str = AGENT_AXIS,
    tj: int = 256,
):
    """(shade, depth) [(B,) N, W] disc-vision rows through the RDMA ring —
    semantics of ring.ring_render_rows (plain disc sprites: no AA, albedo,
    or texture in the prototype). Eye rows stay resident; position blocks
    circulate lane-major; hops depth-merge into the output rows. Accepts
    [(B,) N, 2]; requires a kernel-tileable width (<=256 or 128-multiple)."""
    from ..ops.common import kernel_width_ok
    from ..vision import camera

    if vcfg.sprite_mode != "disc" or vcfg.antialias:
        raise ValueError("the RDMA vision prototype renders plain disc sprites")
    if not kernel_width_ok(vcfg.width) or vcfg.width > 1024:
        raise ValueError(f"width {vcfg.width} not tileable as one block")
    if pos.ndim not in (2, 3):
        raise ValueError(f"pos must be [N, 2] or [B, N, 2], got rank {pos.ndim}")
    batched = pos.ndim == 3
    mesh = mesh or default_mesh()
    d = mesh.shape[axis]
    n = pos.shape[-2]
    # the pad tile and the kernel tile MUST be the same value: padding to a
    # multiple of min(tj, 256) while tiling with an unclamped tj > 256 left
    # nl // tj dropping the trailing targets of every circulating block
    # (e.g. tj=512, nl=768 -> one 512-tile, 256 rows never raycast)
    tj = min(tj, 256)
    (pos_p, vel_p), nl = _pad_for_tiles([pos, vel], n, d, tj)
    nb = pos_p.shape[0] if batched else 1
    tj_f = min(tj, nl)
    w = vcfg.width

    kernel = functools.partial(
        _rdma_vision_kernel, cfg=vcfg, tj=tj_f, d=d, nb=nb, nl=nl, axis=axis,
    )
    nrows = nb * nl

    def local(pos_l, vel_l):
        flat_p = pos_l.reshape(-1, 2)
        dirs = camera.unit_heading(vel_l).reshape(-1, 2)
        wspec = lambda: pl.BlockSpec(
            (nrows, w), lambda k: (0, 0), memory_space=pltpu.VMEM
        )
        best_d, best_o2 = _rdma_pallas_call(
            kernel, n_in=4, nrows=nrows, nl_total=nrows, payload_rows=2,
            d=d,
            extra_scratch=(  # column-major staging of the current slot
                pltpu.VMEM((nrows, 1), jnp.float32),
                pltpu.VMEM((nrows, 1), jnp.float32),
            ),
        )(
            out_specs=[wspec(), wspec()],
            out_shape=[jax.ShapeDtypeStruct((nrows, w), jnp.float32)] * 2,
        )(
            flat_p[:, 0:1], flat_p[:, 1:2], dirs[:, 0:1], dirs[:, 1:2],
            flat_p[:, 0][None, :], flat_p[:, 1][None, :],
        )
        # the disc epilogue (raycast._decode_winner, plain mode)
        hit = best_d < vcfg.far
        oc2 = jnp.minimum(best_o2, 1.0)
        val = vcfg.sprite_albedo * (1.0 - 0.25 * oc2)
        shade = jnp.where(hit, val, vcfg.background)
        out_shape = pos_l.shape[:-1] + (w,)
        return shade.reshape(out_shape), best_d.reshape(out_shape)

    lead = (None,) if batched else ()
    spec = P(*lead, axis, None)
    shade, depth = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec), out_specs=(spec, spec),
        check_vma=False,
    )(pos_p, vel_p)
    return shade[..., :n, :], depth[..., :n, :]
