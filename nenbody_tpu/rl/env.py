"""VisionEnv: gym-style reset/step over the actuated sim.

Dynamics are the reference gravity world (src/main.rs:404-441) plus a
per-agent control acceleration: v += (gravity + action)*dt; the position
update follows the config's integrator mode (reference quirk x += v, or
x += v*dt with gravity.dt_on_position). The observation is each agent's 1D
vision line (the reference's eye texture, src/main.rs:693-704) plus the raw
ego velocity. Reward shapes cohesion:
negative mean squared distance to the swarm centroid, scaled — the flocking
objective the reference's boids rules hardcode, here learnable.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..state import SceneState, spawn
from ..physics import dense


def _forces(pos: jax.Array, cfg: SimConfig, backend: str) -> jax.Array:
    if backend == "pallas":
        from ..ops import pairwise

        # custom-VJP wrapper: identical forward, differentiable dynamics
        # (enables the APG trainer and trajectory optimization)
        return pairwise.gravity_forces_diff(pos, cfg.gravity)
    return dense.gravity_forces(pos, cfg.gravity)


def _render(pos: jax.Array, vel: jax.Array, cfg: SimConfig, backend: str):
    if backend == "pallas":
        from ..ops import raycast

        return raycast.render_rows_tiled(pos, vel, cfg.vision)[0]
    from ..vision import render

    return render.render_rows(pos, vel, cfg.vision)[0]


class VisionEnv:
    """Single-env, unbatched API; `jax.vmap` the methods for batched envs
    (see rl.train.make_train_step). All methods are pure and jittable."""

    def __init__(
        self, cfg: SimConfig, max_accel: float = 0.05, speed_penalty: float = 0.0
    ):
        if cfg.vision is None:
            raise ValueError("VisionEnv requires cfg.vision")
        self.cfg = cfg
        self.max_accel = max_accel
        # quadratic speed cost: without it, short-horizon trainers learn to
        # accelerate toward the centroid and never brake, diverging on
        # longer rollouts (classic horizon exploitation)
        self.speed_penalty = speed_penalty
        # honor the config's backend choice (Scene uses the same resolver,
        # so env rollouts and Scene rollouts run identical dynamics)
        from ..scene import _resolve_backend

        self.backend = _resolve_backend(cfg)
        if self.backend not in ("dense", "pallas"):
            # ring/gspmd are mesh-level wrappers; per-env dynamics reduce to
            # the single-chip kernels (trainers add the mesh around them)
            self.backend = "pallas" if jax.default_backend() == "tpu" else "dense"

    @property
    def obs_width(self) -> int:
        return self.cfg.vision.width + 2  # vision line + ego velocity

    def reset(self, key: jax.Array) -> Tuple[SceneState, jax.Array]:
        state = spawn(key, self.cfg)
        return state, self.observe(state)

    def observe(self, state: SceneState) -> jax.Array:
        """[N, W+2]: the eye line plus the raw ego velocity."""
        lines = _render(state.pos, state.vel, self.cfg, self.backend)
        return jnp.concatenate([lines, state.vel], axis=-1)

    def dynamics(self, state: SceneState, action: jax.Array) -> SceneState:
        """Physics-only transition (no observation) — fully differentiable
        on every backend (the Pallas force kernel carries a custom VJP; the
        raycast kernel does not, so trainers that differentiate the rollout
        must call this + observe() on a stop-gradiented state, see rl/apg.py).
        """
        accel = jnp.clip(action, -self.max_accel, self.max_accel)
        g = _forces(state.pos, self.cfg, self.backend)
        gcfg = self.cfg.gravity
        vel = state.vel + (g + accel) * gcfg.dt
        pos = state.pos + vel * (gcfg.dt if gcfg.dt_on_position else 1.0)
        return state.replace(pos=pos, vel=vel, t=state.t + 1)

    def step(
        self, state: SceneState, action: jax.Array
    ) -> Tuple[SceneState, jax.Array, jax.Array]:
        """action: [N, 2] control acceleration, clipped to max_accel.

        Returns (next_state, obs, reward[N]).
        """
        next_state = self.dynamics(state, action)
        return next_state, self.observe(next_state), self.reward(next_state)

    def reward(self, state: SceneState) -> jax.Array:
        """[N]: cohesion shaping — negative mean-square distance to the
        swarm centroid (scaled to O(1) for spawn bounds +-100), minus an
        optional quadratic speed cost."""
        centroid = jnp.mean(state.pos, axis=-2, keepdims=True)
        d2 = jnp.sum((state.pos - centroid) ** 2, axis=-1)
        r = -d2 / 1e4
        if self.speed_penalty:
            r = r - self.speed_penalty * jnp.sum(state.vel**2, axis=-1)
        return r
