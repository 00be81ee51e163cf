"""Host-side visualization: the TPU replacement for the winit/wgpu/imgui
viewer (reference ui.rs, src/main.rs:18-119, 649-1014).

The reference couples the sim to a 500 Hz render loop; here the viewer is a
host-side consumer fed by low-rate async snapshots (`jax.device_get`) while
the device loop runs free. `frame` is a pure NumPy compositor (testable,
headless); `viewer` adds file output (PNG/GIF/MP4) — implementing the
reference's advertised-but-never-wired "C: capture" feature
(src/main.rs:111, SURVEY.md §5.4) — and an optional live matplotlib window.
"""

from . import frame, live, viewer

__all__ = ["frame", "live", "viewer"]
