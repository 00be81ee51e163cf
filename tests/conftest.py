"""Test harness config: run everything on 8 virtual CPU devices.

SURVEY.md §4.4: the TPU-native analog of fake backends — multi-chip code
paths (shard_map, ppermute rings) execute on host CPU devices, and Pallas
kernels run in interpreter mode off-TPU (selected inside nenbody_tpu.ops).

jax may already be imported (and pinned to a TPU platform) by a
sitecustomize hook before pytest starts, so environment variables are too
late — use jax.config, which takes effect as long as no backend has been
initialized yet.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
