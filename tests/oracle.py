"""NumPy oracle: a literal, loop-for-loop transcription of the reference
controller SEMANTICS (Dasch0/nenbody src/main.rs:381-526) used only to
validate the JAX implementations. Float32 throughout, sequential folds in
the same j-order as the reference's iterators, snapshot-then-update
(old_positions/old_velocities, src/main.rs:414-416, 458-460).
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


def gravity_step_np(pos, vel, dt=0.1, g=0.001, bias=1e-7):
    """src/main.rs:404-441. Returns (new_pos, new_vel)."""
    pos = pos.astype(F32).copy()
    vel = vel.astype(F32).copy()
    old = pos.copy()
    n = pos.shape[0]
    for i in range(n):
        grav = np.zeros(2, dtype=F32)
        for j in range(n):
            vec = old[j] - pos[i]
            dist = F32(np.dot(vec, vec)) + F32(bias)
            grav = grav + vec * F32(g) / dist
        vel[i] = vel[i] + grav * F32(dt)
        pos[i] = pos[i] + vel[i]  # no dt on position, src/main.rs:436
    return pos, vel


def boids_step_np(
    pos,
    vel,
    dt=0.04,
    r1_dist=1000.0,
    r2_dist=5.0,
    r3_dist=500.0,
    r1_scale=0.02,
    r2_scale=0.05,
    r3_scale=0.5,
):
    """src/main.rs:443-526. Returns (new_pos, new_vel)."""
    pos = pos.astype(F32).copy()
    vel = vel.astype(F32).copy()
    old_pos = pos.copy()
    old_vel = vel.copy()
    n = pos.shape[0]
    for i in range(n):
        center = np.zeros(2, dtype=F32)
        cnt = 0
        for j in range(n):
            d2 = F32(np.dot(old_pos[j] - pos[i], old_pos[j] - pos[i]))
            if d2 < r1_dist and i != j:  # squared-dist threshold, main.rs:474
                center = center + old_pos[j]
                cnt += 1
        repel = np.zeros(2, dtype=F32)
        for j in range(n):
            d = np.sqrt(F32(np.dot(old_pos[j] - pos[i], old_pos[j] - pos[i])))
            if d < r2_dist and i != j:  # unsquared threshold, main.rs:485
                repel = repel - (old_pos[j] - pos[i])
        match = np.zeros(2, dtype=F32)
        vcnt = 0
        for j in range(n):
            dv = np.sqrt(F32(np.dot(old_vel[j] - vel[i], old_vel[j] - vel[i])))
            if dv < r3_dist and i != j:  # velocity-space metric, main.rs:497
                match = match + old_vel[j]
                vcnt += 1
        if cnt > 0:
            center = center / F32(cnt)
        if vcnt > 0:
            match = match / F32(vcnt)
        v = center * F32(r1_scale) + repel * F32(r2_scale) + match * F32(r3_scale)
        mag = np.sqrt(F32(np.dot(v, v)))
        if mag > 1.0:  # normalize_to(1.0), main.rs:516-518
            v = v / mag
        vel[i] = v
        pos[i] = pos[i] + v * F32(dt)  # boids DOES scale by dt, main.rs:522
    return pos, vel
