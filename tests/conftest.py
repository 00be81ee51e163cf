"""Test harness config: run everything on 8 virtual CPU devices.

SURVEY.md §4.4: the TPU-native analog of fake backends — multi-chip code
paths (shard_map, ppermute rings) execute on host CPU devices, and Pallas
kernels run in interpreter mode off-TPU (selected inside nenbody_tpu.ops).
Must run before the first jax import anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
