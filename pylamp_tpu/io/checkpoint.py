"""Versioned checkpoint / exact resume of the full model state.

The reference has no checkpointing (SURVEY.md §5) — restarts meant re-running
from t=0.  Here the whole ModelState pytree (grid fields + markers + clock)
round-trips through a single .npz per checkpoint; resume is bitwise-exact
(tested in tests/test_checkpoint.py)."""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from pylamp_tpu.markers.state import MarkerState

FORMAT_VERSION = 1

_MARKER_FIELDS = ("x", "y", "mat", "T")
_GRID_FIELDS = ("vx", "vy", "p", "T", "eta_s", "eta_n", "time", "step", "dt")


def save_checkpoint(path: str, state, extra: dict | None = None):
    payload = {"__format_version__": FORMAT_VERSION}
    for f in _MARKER_FIELDS:
        payload[f"markers.{f}"] = np.asarray(getattr(state.markers, f))
    for f in _GRID_FIELDS:
        payload[f"state.{f}"] = np.asarray(getattr(state, f))
    for k, v in (extra or {}).items():
        payload[f"extra.{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as fh:
        np.savez(fh, **payload)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str):
    """Returns (ModelState, extra dict)."""
    # imported here to avoid a cycle (models.driver imports this module)
    from pylamp_tpu.models.state import ModelState
    with np.load(path) as z:
        version = int(z["__format_version__"])
        if version > FORMAT_VERSION:
            raise ValueError(f"checkpoint format {version} is newer than supported")
        markers = MarkerState(
            **{f: jnp.asarray(z[f"markers.{f}"]) for f in _MARKER_FIELDS}
        )
        fields = {f: jnp.asarray(z[f"state.{f}"]) for f in _GRID_FIELDS}
        extra = {
            k[len("extra."):]: z[k] for k in z.files if k.startswith("extra.")
        }
    return ModelState(markers=markers, **fields), extra
