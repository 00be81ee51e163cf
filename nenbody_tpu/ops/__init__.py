"""Tiled Pallas TPU kernels: all-pairs forces and 1D vision rasterization.

These replace the reference's two hot paths (SURVEY.md §3.2): the rayon
O(N^2) controller folds (src/main.rs:404-526) and the per-agent eye render
passes (src/main.rs:584-647). Off-TPU they run in Pallas interpreter mode so
the full test suite executes on CPU (SURVEY.md §4.4).
"""

from . import boids, common, pairwise, raycast, tiled

__all__ = ["boids", "common", "pairwise", "raycast", "tiled"]
