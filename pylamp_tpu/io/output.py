"""Field/marker output: per-step .npz dumps (the reference saves numpy
arrays / matplotlib figures per step; SURVEY.md §2.1 'Output / plotting').
Plotting is optional and gated on matplotlib availability."""
from __future__ import annotations

import os

import numpy as np


def save_fields(path: str, state, grid, markers: bool = True):
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


def plot_fields(path: str, state, grid):
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


def plot_npz_fields(path: str, npz_path: str):
    """Quick-look figure from a saved fields_*.npz dump (T, |v|, log eta,
    markers colored by material).  No-op without matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover - matplotlib is optional
        return False
    d = np.load(npz_path)
    n = 3 + ("marker_x" in d)
    fig, axes = plt.subplots(1, n, figsize=(4.5 * n, 3.6))
    im0 = axes[0].imshow(d["T"], origin="upper", aspect="auto")
    axes[0].set_title(f"T (step {int(d['step'])})")
    fig.colorbar(im0, ax=axes[0])
    sp = np.hypot(
        0.5 * (d["vx"][:, 1:] + d["vx"][:, :-1]),
        0.5 * (d["vy"][1:, :] + d["vy"][:-1, :]),
    )
    im1 = axes[1].imshow(sp, origin="upper", aspect="auto")
    axes[1].set_title("|v|")
    fig.colorbar(im1, ax=axes[1])
    im2 = axes[2].imshow(np.log10(d["eta_n"]), origin="upper", aspect="auto")
    axes[2].set_title("log10 eta")
    fig.colorbar(im2, ax=axes[2])
    if "marker_x" in d:
        # subsample for plot speed at 10M+ markers
        stride = max(1, d["marker_x"].size // 200_000)
        axes[3].scatter(
            d["marker_x"][::stride], d["marker_y"][::stride],
            c=d["marker_mat"][::stride], s=0.2, cmap="tab10", lw=0,
        )
        axes[3].invert_yaxis()
        axes[3].set_title("markers (material)")
        axes[3].set_aspect("equal")
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return True


def plot_timeseries(path: str, metrics_path: str):
    """Time-series figure (v_rms, dt, Krylov iterations, per-phase wall time
    when present) from a metrics.jsonl written by the driver — the
    post-processing step the reference does with ad-hoc matplotlib scripts
    (SURVEY.md §2.1 'Output / plotting').  No-op without matplotlib."""
    import json

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # pragma: no cover - matplotlib is optional
        return False

    recs = []
    with open(metrics_path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                recs.append(json.loads(line))
    if not recs:
        return False

    t = np.array([r.get("time", i) for i, r in enumerate(recs)])

    def series(key):
        return np.array([r.get(key, np.nan) for r in recs], dtype=float)

    panels = [
        ("v_rms", series("vrms"), "log"),
        ("dt", series("dt"), "log"),
        ("Krylov iters/step", series("stokes_iterations"), "linear"),
        ("step wall [s]", series("step_wall_s"), "linear"),
    ]
    has_phases = any("phase_seconds" in r for r in recs)
    fig, axes = plt.subplots(
        1, len(panels) + has_phases, figsize=(4.2 * (len(panels) + has_phases), 3.2)
    )
    for ax, (title, ys, scale) in zip(axes, panels):
        ax.plot(t, ys, lw=1)
        ax.set_title(title)
        ax.set_xlabel("model time")
        if scale == "log" and np.nanmax(ys) > 0:
            ax.set_yscale("log")
    if has_phases:
        ax = axes[-1]
        names = sorted(
            {k for r in recs for k in r.get("phase_seconds", {})}
        )
        for name in names:
            ys = np.array(
                [r.get("phase_seconds", {}).get(name, np.nan) for r in recs]
            )
            ax.plot(t, ys, lw=1, label=name)
        ax.set_title("phase wall [s]")
        ax.set_xlabel("model time")
        ax.legend(fontsize=7)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return True
