"""Versioned checkpoint / exact resume of the full model state.

The reference has no checkpointing (SURVEY.md §5) — restarts meant re-running
from t=0.  Here the whole ModelState pytree (grid fields + markers + clock)
round-trips through a single .npz per checkpoint, generically over the
marker engine (flat or bucketed): leaves are keyed by their tree path.
Resume is bitwise-exact (tests/test_checkpoint.py)."""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 2

# Leaves added after a format was in the wild: absent in old checkpoints,
# filled from the template (zeros = "recompute") instead of erroring.
_OPTIONAL_LEAVES = {"state.mg_lam"}


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "name"):
            parts.append(str(p.name))
        elif hasattr(p, "key"):
            parts.append(str(p.key))
        else:
            parts.append(str(getattr(p, "idx", p)))
    return ".".join(parts)


def save_checkpoint(path: str, state, extra: dict | None = None):
    payload = {"__format_version__": FORMAT_VERSION}
    leaves = jax.tree_util.tree_flatten_with_path(state)[0]
    for p, leaf in leaves:
        payload[f"state.{_path_str(p)}"] = np.asarray(leaf)
    for k, v in (extra or {}).items():
        payload[f"extra.{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str, template):
    """Fill ``template`` (a ModelState of the right structure, e.g. freshly
    built from the same config) with the checkpointed leaves.

    Returns (state, extra dict)."""
    with np.load(path) as z:
        version = int(z["__format_version__"])
        if version > FORMAT_VERSION:
            raise ValueError(f"checkpoint format {version} is newer than supported")

        paths, treedef = jax.tree_util.tree_flatten_with_path(template)
        leaves = []
        for p, leaf in paths:
            key = f"state.{_path_str(p)}"
            if key not in z and key in _OPTIONAL_LEAVES:
                leaves.append(jnp.asarray(leaf))
                continue
            if key not in z:
                raise KeyError(
                    f"checkpoint is missing leaf {key!r} — was it written with a "
                    f"different marker engine or model configuration?"
                )
            arr = z[key]
            if arr.shape != leaf.shape:
                raise ValueError(
                    f"checkpoint leaf {key!r} has shape {arr.shape}, expected "
                    f"{leaf.shape}"
                )
            leaves.append(jnp.asarray(arr, leaf.dtype))
        extra = {k[len("extra."):]: z[k] for k in z.files if k.startswith("extra.")}
    return jax.tree_util.tree_unflatten(treedef, leaves), extra
