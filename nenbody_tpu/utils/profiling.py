"""Profiling & metrics — the TPU analog of the reference's observability
(SURVEY.md §5.1/§5.5: checked-in flamegraph, WGPU_TRACE env hook, in-UI
frametime): step timers with throughput derivation (pair-evals/s,
agent-frames/s as first-class metrics), and a jax.profiler trace context
(Perfetto/XProf) switched by NENBODY_TRACE, mirroring the reference's
WGPU_TRACE env-var hook (gfx.rs:62)."""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Optional

import jax


@contextlib.contextmanager
def device_trace(log_dir: Optional[str] = None):
    """Capture a jax.profiler trace if NENBODY_TRACE (or log_dir) is set."""
    target = log_dir or os.environ.get("NENBODY_TRACE")
    if not target:
        yield
        return
    with jax.profiler.trace(target):
        yield


def scan_throughput(body_fn, carry, steps: int, sync):
    """Canonical throughput measurement: `steps` data-dependent iterations
    of `body_fn` chained under one lax.scan in a single jit, synchronized by
    a host fetch of `sync(result)`. Immune to per-dispatch RPC latency and
    to runtimes whose block_until_ready returns before remote execution
    finishes (see DESIGN.md §7). Returns seconds per step.

    Used by bench.py, tpu_tests, and examples — keep the methodology here
    so it cannot drift between them.
    """
    import jax as _jax
    import jax.numpy as _jnp
    import numpy as _np

    @_jax.jit
    def roll(c):
        c, _ = _jax.lax.scan(lambda c, _: (body_fn(c), ()), c, None, length=steps)
        return c

    _ = _np.asarray(sync(roll(carry)))  # compile + full sync
    # perturb float leaves so the timed dispatch is never bit-identical to
    # the warm-up (guards against dispatch dedup/caching in the runtime)
    carry = _jax.tree.map(
        lambda x: x + _jnp.asarray(1e-6, x.dtype)
        if hasattr(x, "dtype") and _jnp.issubdtype(x.dtype, _jnp.floating)
        else x,
        carry,
    )
    _jax.block_until_ready(carry)
    t0 = time.perf_counter()
    _ = _np.asarray(sync(roll(carry)))
    return (time.perf_counter() - t0) / steps


class StepTimer:
    """Wall-clock step timing with EMA and derived throughput.

    Mirrors the reference's per-frame delta-time readout (src/main.rs:894-897)
    but reports simulation-native rates. Feed it synchronized step times
    (call mark() only after jax.block_until_ready or a host fetch)."""

    def __init__(
        self, n_agents: int, ema_alpha: float = 0.1, skip_samples: int = 1
    ):
        """skip_samples: leading intervals excluded from the EMA — the first
        chunk includes jit compilation and would poison the throughput
        readout for many EMA half-lives."""
        self.n = n_agents
        self.alpha = ema_alpha
        self.skip = skip_samples
        self.ema_s: Optional[float] = None
        self.samples = 0
        self._intervals = 0
        self._last: Optional[float] = None

    def mark(self, steps: int = 1) -> float:
        now = time.perf_counter()
        dt = 0.0
        if self._last is not None:
            dt = (now - self._last) / max(steps, 1)
            self._intervals += 1
            if self._intervals > self.skip:
                self.ema_s = dt if self.ema_s is None else (
                    self.alpha * dt + (1 - self.alpha) * self.ema_s
                )
                self.samples += steps
        self._last = now
        return dt

    @property
    def steps_per_s(self) -> float:
        return 1.0 / self.ema_s if self.ema_s else 0.0

    @property
    def pair_evals_per_s(self) -> float:
        return self.n * self.n * self.steps_per_s

    def report(self, extra: Optional[dict] = None) -> str:
        d = {
            "step_ms": (self.ema_s or 0.0) * 1e3,
            "steps_per_s": self.steps_per_s,
            "pair_evals_per_s": self.pair_evals_per_s,
            "n": self.n,
        }
        if extra:
            d.update(extra)
        return json.dumps(d)
