"""Test harness config: run everything on 8 virtual CPU devices.

SURVEY.md §4.4: the TPU-native analog of fake backends — multi-chip code
paths (shard_map, ppermute rings) execute on host CPU devices, and Pallas
kernels run in interpreter mode off-TPU (selected inside nenbody_tpu.ops).

jax may already be imported (and pinned to a TPU platform) by a
sitecustomize hook before pytest starts, so environment variables are too
late — use jax.config, which takes effect as long as no backend has been
initialized yet.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

# persistent XLA compile cache for the suite: the 1-core CI box is
# XLA-COMPILE-bound (see CLAUDE.md), and warm reruns measure ~2.2x faster
# with cached CPU executables (47 s -> 21 s on test_kernels.py; tracing,
# which the cache cannot skip, is the remainder). Cold first runs are
# unaffected. Keyed on HLO + backend + compiler options, so kernel edits
# miss cleanly. NENBODY_TEST_NOCACHE=1 opts out (e.g. when measuring
# cold-compile behavior).
if not os.environ.get("NENBODY_TEST_NOCACHE"):
    _cache = os.environ.get(
        "NENBODY_TEST_CACHE_DIR",
        os.path.join(
            os.path.expanduser("~"), ".cache", "nenbody_tpu", "xla_cpu_tests"
        ),
    )
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
