"""Figures for docs/06: recovered Marmousi models + misfit curves from
the round-5 convergence-depth runs (result_r5/)."""
import os
import sys

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from devito_fwi_tpu.models.presets import load_velocity  # noqa: E402
from devito_fwi_tpu.optimize.math import q_factor  # noqa: E402

SHAPE = (300, 106)
EXT = [0, 300 * 0.03, 106 * 0.03, 0]  # km


def panel(ax, v, title, xlabel=True):
    im = ax.imshow(v.T, cmap="jet", vmin=1.5, vmax=4.7, extent=EXT,
                   aspect="auto")
    ax.set_title(title, fontsize=9)
    if xlabel:
        ax.set_xlabel("x (km)", fontsize=8)
    ax.set_ylabel("z (km)", fontsize=8)
    ax.tick_params(labelsize=7)
    return im


def main(w2_dir="result_r5/w2_50", l2_dir="result_r5/l2_200",
         w2_tag="W2-2d (28 iters)", l2_tag="L2 (200 iters)"):
    vt = load_velocity(os.path.join(REPO, "model_data/SMARMN/vp.true"),
                       SHAPE)
    v0 = load_velocity(os.path.join(REPO,
                                    "model_data/SMARMN/vp.smooth_20"),
                       SHAPE)
    w2 = np.fromfile(os.path.join(REPO, w2_dir,
                                  "marmousi_result_misfit_2"),
                     dtype=np.float32).reshape(SHAPE)
    l2 = np.fromfile(os.path.join(REPO, l2_dir,
                                  "marmousi_result_misfit_0"),
                     dtype=np.float32).reshape(SHAPE)

    fig, axes = plt.subplots(2, 2, figsize=(10, 6.0))
    fig.subplots_adjust(hspace=0.45)
    panel(axes[0, 0], vt, "true model (vp.true)", xlabel=False)
    panel(axes[0, 1], v0, "initial model (vp.smooth_20), "
          f"q={q_factor(1/v0**2, 1/vt**2):.1f} dB", xlabel=False)
    panel(axes[1, 0], w2, f"{w2_tag}, "
          f"q={q_factor(1/w2**2, 1/vt**2):.1f} dB")
    im = panel(axes[1, 1], l2, f"{l2_tag}, "
               f"q={q_factor(1/l2**2, 1/vt**2):.1f} dB")
    fig.colorbar(im, ax=axes, shrink=0.8, label="vp (km/s)")
    fig.savefig(os.path.join(REPO, "docs/img/r5_marmousi_models.png"),
                dpi=110, bbox_inches="tight")

    fig2, ax = plt.subplots(1, 2, figsize=(9, 3.2))
    fw = np.loadtxt(os.path.join(REPO, w2_dir, "log2/fval"))
    fl = np.loadtxt(os.path.join(REPO, l2_dir, "log0/fval"))
    ax[0].semilogy(fw / fw[0], "-o", ms=3)
    ax[0].set_title("W2-2d misfit (normalized)", fontsize=9)
    ax[1].semilogy(fl / fl[0], "-o", ms=3)
    ax[1].set_title("L2 misfit (normalized)", fontsize=9)
    for a in ax:
        a.set_xlabel("iteration", fontsize=8)
        a.grid(alpha=0.3)
        a.tick_params(labelsize=7)
    fig2.tight_layout()
    fig2.savefig(os.path.join(REPO, "docs/img/r5_misfit_curves.png"),
                 dpi=110, bbox_inches="tight")
    print("q_factor(m): init %.2f, W2 %.2f, L2 %.2f dB" % (
        q_factor(1/v0**2, 1/vt**2), q_factor(1/w2**2, 1/vt**2),
        q_factor(1/l2**2, 1/vt**2)))


if __name__ == "__main__":
    main(*sys.argv[1:])
