"""bench.py plumbing: the fail-soft label helper (one broken label must not
zero the whole BENCH artifact — the driver parses bench's single JSON line)."""

import sys

import jax
import jax.numpy as jnp


sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def test_rate_or_zero_reports_zero_on_persistent_failure():
    compile_times = {}

    def broken_roll(c):
        raise RuntimeError("mosaic lowering exploded")

    rate = bench._rate_or_zero(
        broken_roll, (jnp.zeros((4, 2)),), 100, 10, "broken-label", 2,
        compile_times,
    )
    assert rate == 0.0
    assert "broken-label" not in compile_times


def test_rate_or_zero_times_a_working_roll():
    compile_times = {}

    @jax.jit
    def roll(c):
        (x,) = c
        return (x + 1.0,)

    rate = bench._rate_or_zero(
        roll, (jnp.zeros((4, 2)),), 100, 10, "ok-label", 2, compile_times
    )
    assert rate > 0.0
    assert "ok-label" in compile_times
