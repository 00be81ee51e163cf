"""Runtime utilities: native host bindings, checkpointing, profiling."""

from . import checkpoint, native, profiling

__all__ = ["checkpoint", "native", "profiling"]
