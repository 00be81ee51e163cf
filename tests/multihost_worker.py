"""Worker for tests/test_multihost.py: one process of a 2-process CPU mesh.

Run as:  python tests/multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; together they form a 4-device
"agents" ring spanning a process (DCN) boundary. Both processes spawn the
SAME seeded scene, lift their local agent block to a global array
(parallel.mesh.global_state), run the ppermute-ring gravity + boids + eye
render across the process boundary, and check the gathered results against
the local dense oracle. Exit code 0 = parity held.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from nenbody_tpu.parallel import mesh as mesh_lib

mesh_lib.init_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

import numpy as np

from nenbody_tpu.config import SimConfig, VisionConfig
from nenbody_tpu.parallel import ring
from nenbody_tpu.physics import dense
from nenbody_tpu.state import spawn
from nenbody_tpu.vision import render as dense_render

assert jax.process_count() == nproc, jax.process_count()
n_dev = len(jax.devices())
assert n_dev == 2 * nproc, n_dev
mesh = mesh_lib.make_mesh({"agents": n_dev})

cfg = SimConfig(n=64, controller="boids", backend="ring",
                vision=VisionConfig(width=32))
full = spawn(jax.random.key(0), cfg)  # same seed -> same scene on all hosts

# each process contributes its local slice of the agent axis
per_proc = cfg.n // nproc
lo, hi = pid * per_proc, (pid + 1) * per_proc
local = full.replace(pos=full.pos[lo:hi], vel=full.vel[lo:hi])
gstate = mesh_lib.global_state(local, mesh)

# ring gravity + boids + vision across the process boundary
g = ring.ring_gravity_forces(gstate.pos, cfg, mesh=mesh)
bv = ring.ring_boids_velocity(gstate.pos, gstate.vel, cfg, mesh=mesh)
shade, depth = ring.ring_render_rows(gstate.pos, gstate.vel, cfg.vision, mesh=mesh)

from jax.experimental import multihost_utils
from jax.sharding import PartitionSpec as P

def fetch(x):
    return np.asarray(
        multihost_utils.global_array_to_host_local_array(x, mesh, P("agents"))
    )

g_l, bv_l = fetch(g), fetch(bv)
sh_l, dp_l = fetch(shade), fetch(depth)

# local dense oracle over the FULL scene, sliced to this process's block
want_g = np.asarray(dense.gravity_forces(full.pos, cfg.gravity))[lo:hi]
want_bv = np.asarray(dense.boids_accels(full.pos, full.vel, cfg.boids))[lo:hi]
want_sh, want_dp = dense_render.render_rows(full.pos, full.vel, cfg.vision)
want_sh = np.asarray(want_sh)[lo:hi]
want_dp = np.asarray(want_dp)[lo:hi]

np.testing.assert_allclose(g_l, want_g, rtol=3e-5, atol=1e-6)
np.testing.assert_allclose(bv_l, want_bv, rtol=3e-5, atol=1e-6)
np.testing.assert_allclose(sh_l, want_sh, rtol=3e-5, atol=3e-5)
np.testing.assert_allclose(dp_l, want_dp, rtol=3e-5, atol=3e-5)

# round-trip of a full state through global/local helpers
back = mesh_lib.host_local_state(gstate, mesh)
np.testing.assert_array_equal(np.asarray(back.pos), np.asarray(local.pos))

print(f"[p{pid}] multihost parity OK over {n_dev} devices / {nproc} processes",
      flush=True)
