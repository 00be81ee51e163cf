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

Status: correctness prototype (VERDICT r1 missing #6). It is exact against
the dense oracle on the CPU interpret rig (tests/test_rdma_ring.py runs it
on an 8-virtual-device mesh with emulated RDMA) and compiles the same
Mosaic program a real multi-chip slice would run, but single-chip hardware
(D=1) degenerates to no communication, so the overlap-vs-ppermute question
stays open until pod hardware is available (NEXT #1). The shard_map ring
remains the production backend.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SimConfig
from ..ops.common import interpret_mode, round_up
from .mesh import AGENT_AXIS, default_mesh
from .ring import _PAD_SENTINEL, _pad_agents

TILE_I = 256
TILE_J = 256


def _rdma_gravity_kernel(
    xc_ref, yc_ref,  # [Nl, 1] local i-block (sublane-major)
    xr_ref, yr_ref,  # [1, Nl] local block, lane-major (hop-0 comm payload)
    gx_ref, gy_ref,  # [Nl, 1] out: accumulated force (pre-G)
    buf_ref,  # [2, 2, Nl] VMEM comm slots: [slot, x/y, agent]
    send_sem, recv_sem,  # DMA semaphore pairs, one per slot
    cap_sem,  # REGULAR: landing-slot-free tokens from the right neighbor
    *,
    bias: float,
    ti: int,
    tj: int,
    d: int,
    axis: str,
):
    k = pl.program_id(0)
    nl = xc_ref.shape[0]
    my = jax.lax.axis_index(axis)
    right = jax.lax.rem(my + 1, d)
    left = jax.lax.rem(my + d - 1, d)
    cur = jax.lax.rem(k, 2)
    nxt = jax.lax.rem(k + 1, 2)

    @pl.when(k == 0)
    def _init():
        gx_ref[:] = jnp.zeros_like(gx_ref)
        gy_ref[:] = jnp.zeros_like(gy_ref)
        buf_ref[0, 0:1, :] = xr_ref[:]
        buf_ref[0, 1:2, :] = yr_ref[:]

    # Tell the LEFT neighbor our landing slot for this hop is free: slot
    # (k+1)%2 was the compute slot of hop k-1, which finished (the grid is
    # sequential), or has never been used (k=0). Then wait for the same
    # token from the RIGHT neighbor before writing into their scratch —
    # this also orders hop-0 sends after the receiver's kernel has started,
    # replacing a global start barrier.
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

    # The hop's compute, overlapped with the in-flight RDMA: the reference
    # force law on (TI, TJ) tiles (same math as ops/pairwise._gravity_kernel;
    # far-sentinel padding makes masks unnecessary — see ring._PAD_SENTINEL).
    num_i = nl // ti
    num_j = nl // tj

    def i_body(it, _):
        i0 = pl.multiple_of(it * ti, ti)
        xi = xc_ref[pl.ds(i0, ti), :]  # (TI, 1)
        yi = yc_ref[pl.ds(i0, ti), :]

        def j_body(jt, acc):
            gx, gy = acc
            j0 = pl.multiple_of(jt * tj, tj)
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

    @pl.when(k < d - 1)
    def _finish():
        rdma.wait()


def rdma_ring_gravity_forces(
    pos: jax.Array,
    cfg: SimConfig,
    mesh: Optional[Mesh] = None,
    axis: str = AGENT_AXIS,
    ti: int = TILE_I,
    tj: int = TILE_J,
) -> jax.Array:
    """Gravity forces for globally-sharded pos [N, 2] through the RDMA ring.

    Semantics identical to ring.ring_gravity_forces (and the dense oracle):
    arbitrary N via far-sentinel padding, self-pair included with the
    bias-softened denominator. Unbatched prototype: one agent axis, no env
    batch dim (use the shard_map ring for batched training)."""
    if pos.ndim != 2:
        raise ValueError(
            "rdma_ring_gravity_forces is the unbatched prototype; "
            f"got pos rank {pos.ndim} (use parallel.ring for batched envs)"
        )
    mesh = mesh or default_mesh()
    d = mesh.shape[axis]
    n = pos.shape[0]
    # pad so every device block divides into (ti, tj) tiles
    (pos_p,), _ = _pad_agents([pos], n, d)
    nl = pos_p.shape[0] // d
    blk = round_up(max(nl, max(ti, tj)), max(ti, tj))
    if blk != nl:
        (pos_p,), _ = _pad_agents([pos], n, d * blk)
        nl = blk
    g = cfg.gravity

    kernel = functools.partial(
        _rdma_gravity_kernel,
        bias=g.bias, ti=min(ti, nl), tj=min(tj, nl), d=d, axis=axis,
    )

    def local(pos_l):
        xc = pos_l[:, 0:1]
        yc = pos_l[:, 1:2]
        xr = pos_l[:, 0][None, :]
        yr = pos_l[:, 1][None, :]
        interp = interpret_mode()
        gx, gy = pl.pallas_call(
            kernel,
            grid=(d,),
            in_specs=[
                pl.BlockSpec((nl, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nl, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nl), lambda k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, nl), lambda k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nl, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nl, 1), lambda k: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nl, 1), jnp.float32),
                jax.ShapeDtypeStruct((nl, 1), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 2, nl), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.REGULAR,
            ],
            # no collective_id: the capacity handshake replaces the global
            # barrier, and Mosaic requires the id only for barrier semaphores
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=(
                pltpu.InterpretParams(dma_execution_mode="eager")
                if interp
                else False
            ),
        )(xc, yc, xr, yr)
        return jnp.concatenate([gx, gy], axis=1) * g.g

    spec = P(axis, None)
    out = jax.shard_map(
        local, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
    )(pos_p)
    return out[:n, :]
