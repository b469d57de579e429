"""Field/marker output: per-step .npz dumps (the reference saves numpy
arrays / matplotlib figures per step; SURVEY.md §2.1 'Output / plotting').
Plotting is optional and gated on matplotlib availability."""
from __future__ import annotations

import os

import numpy as np

from pylamp_tpu.models.state import ModelState


def save_fields(path: str, state: ModelState, grid, markers: bool = True):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = dict(
        vx=np.asarray(state.vx),
        vy=np.asarray(state.vy),
        p=np.asarray(state.p),
        T=np.asarray(state.T),
        eta_s=np.asarray(state.eta_s),
        eta_n=np.asarray(state.eta_n),
        time=np.asarray(state.time),
        step=np.asarray(state.step),
        x_corner=grid.x_corner,
        y_corner=grid.y_corner,
    )
    if markers:
        m = state.markers
        if hasattr(m, "valid"):  # bucketed engine: emit only live markers
            from pylamp_tpu.markers.bucket import flatten

            fx, fy, fm, fT, fv = (np.asarray(a) for a in flatten(m))
            sel = fv.astype(bool)
            data.update(
                marker_x=fx[sel], marker_y=fy[sel],
                marker_mat=fm[sel], marker_T=fT[sel],
            )
        else:
            data.update(
                marker_x=np.asarray(m.x),
                marker_y=np.asarray(m.y),
                marker_mat=np.asarray(m.mat),
                marker_T=np.asarray(m.T),
            )
    np.savez_compressed(path, **data)


def plot_fields(path: str, state: ModelState, grid):
    """Quick-look figure (T + velocity + viscosity). No-op without
    matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover - matplotlib is optional
        return False
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    im0 = axes[0].imshow(np.asarray(state.T), origin="upper", aspect="auto")
    axes[0].set_title("T")
    fig.colorbar(im0, ax=axes[0])
    sp = np.hypot(
        0.5 * (np.asarray(state.vx)[:, 1:] + np.asarray(state.vx)[:, :-1]),
        0.5 * (np.asarray(state.vy)[1:, :] + np.asarray(state.vy)[:-1, :]),
    )
    im1 = axes[1].imshow(sp, origin="upper", aspect="auto")
    axes[1].set_title("|v|")
    fig.colorbar(im1, ax=axes[1])
    im2 = axes[2].imshow(np.log10(np.asarray(state.eta_n)), origin="upper", aspect="auto")
    axes[2].set_title("log10 eta")
    fig.colorbar(im2, ax=axes[2])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return True
