"""Checkpoint / resume — the capability the reference lacks entirely
(SURVEY.md §5.4: state is regenerated from an unseeded RNG at startup,
src/main.rs:737-747; the capture path was staged but never wired).

Scene states are plain pytrees, so checkpoints are npz files; RL train
states (policy params + optimizer state + env states + PRNG keys) round-trip
through save_pytree/load_pytree.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..state import SceneState


def _npz_path(path: str) -> str:
    """np.savez appends '.npz' when missing; normalize so the returned path
    is the file that actually exists."""
    return path if path.endswith(".npz") else path + ".npz"


def _is_key(leaf) -> bool:
    return hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jax.dtypes.prng_key)


def save_state(path: str, state: SceneState) -> str:
    """Write a SceneState (batched or not) to an npz file.

    SceneState permits both typed PRNG keys and raw [..., 2] uint32 key
    arrays; `key_typed` records which flavor was stored so load_state can
    round-trip it exactly."""
    path = _npz_path(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    typed = _is_key(state.key)
    key = np.asarray(jax.random.key_data(state.key) if typed else state.key)
    np.savez(
        path,
        pos=np.asarray(state.pos),
        vel=np.asarray(state.vel),
        key=key,
        key_typed=np.asarray(typed),
        t=np.asarray(state.t),
    )
    return path


def load_state(path: str) -> SceneState:
    with np.load(path) as z:
        key = jnp.asarray(z["key"])
        # files written before key_typed existed always held typed-key data
        if "key_typed" not in z or bool(z["key_typed"]):
            key = jax.random.wrap_key_data(key)
        return SceneState(
            pos=jnp.asarray(z["pos"]),
            vel=jnp.asarray(z["vel"]),
            key=key,
            t=jnp.asarray(z["t"]),
        )


def save_pytree(path: str, tree) -> str:
    """Flat npz save of an arbitrary pytree — policy params, optimizer
    state, or a whole rl.train.TrainState. PRNG-key leaves are stored as
    their raw key data and re-wrapped on load."""
    path = _npz_path(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    arrays = {}
    for k, v in flat:
        name = jax.tree_util.keystr(k)
        arrays[name] = (
            np.asarray(jax.random.key_data(v)) if _is_key(v) else np.asarray(v)
        )
    np.savez(path, **arrays)
    return path


def load_pytree(path: str, like):
    """Restore a pytree saved by save_pytree into the structure of `like`
    (which also tells us which leaves are PRNG keys)."""
    with np.load(path) as z:
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for k, ref in flat:
            arr = jnp.asarray(z[jax.tree_util.keystr(k)])
            leaves.append(jax.random.wrap_key_data(arr) if _is_key(ref) else arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_pytree_matching(path: str, like, what: str = "params"):
    """load_pytree that turns the two silent-mismatch failure modes into
    readable ValueErrors: a missing leaf (saved from a DIFFERENT tree, e.g.
    a GRU npz loaded into an MLP template) raises instead of KeyError, and
    a present-but-differently-shaped leaf (same net, different vision width
    or batch) raises instead of loading garbage that later dies as an
    opaque dot-shape error inside jit."""
    with np.load(_npz_path(path)) as z:
        flat, treedef = jax.tree_util.tree_flatten_with_path(like)
        leaves = []
        for k, ref in flat:
            name = jax.tree_util.keystr(k)
            if name not in z:
                raise ValueError(
                    f"{what} at {path} do not contain leaf {name} — saved "
                    f"from a different net family or trainer?"
                )
            arr = jnp.asarray(z[name])
            ref_shape = tuple(np.shape(
                jax.random.key_data(ref) if _is_key(ref) else ref
            ))
            if tuple(arr.shape) != ref_shape:
                raise ValueError(
                    f"{what} leaf {name} at {path} has shape "
                    f"{tuple(arr.shape)}, expected {ref_shape} — saved from "
                    f"a different net family, width, or batch size?"
                )
            leaves.append(jax.random.wrap_key_data(arr) if _is_key(ref) else arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class PeriodicCheckpointer:
    """Save every `every` steps during a host-driven loop; keeps the last
    `keep` files — the periodic-snapshot policy SURVEY.md §5.3/§5.4 calls
    for so long rollouts are resumable under fail-fast error handling."""

    def __init__(self, directory: str, every: int = 1000, keep: int = 3):
        self.directory = directory
        self.every = every
        self.keep = keep
        self._saved: list[str] = []
        self._last_saved_step: Optional[int] = None
        os.makedirs(directory, exist_ok=True)

    def maybe_save(self, state: SceneState) -> Optional[str]:
        """Save when at least `every` steps have elapsed since the last save
        — callers may only check at chunk boundaries (the CLI polls every
        --log-every steps), so an exact `t % every == 0` test would silently
        skip checkpoints whenever the strides don't divide."""
        step = int(np.asarray(state.t).reshape(-1)[0])
        last = self._last_saved_step if self._last_saved_step is not None else 0
        if step - last < self.every:
            return None
        self._last_saved_step = step
        path = os.path.join(self.directory, f"state_{step:09d}.npz")
        save_state(path, state)
        self._saved.append(path)
        while len(self._saved) > self.keep:
            old = self._saved.pop(0)
            try:
                os.remove(old)
            except OSError:
                pass
        return path

    def latest(self) -> Optional[str]:
        if self._saved:
            return self._saved[-1]
        files = sorted(
            f for f in os.listdir(self.directory)
            if f.startswith("state_") and f.endswith(".npz")
        )
        return os.path.join(self.directory, files[-1]) if files else None
