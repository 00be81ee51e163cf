"""Runtime utilities: native host bindings, checkpointing, profiling."""

from . import checkpoint, debug, native, profiling

__all__ = ["checkpoint", "debug", "native", "profiling"]
