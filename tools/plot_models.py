"""Publication-style model-panel figures from raw float32 binaries.

Equivalent of the reference's ``model_data/plot_models.py`` (a script
with hard-coded SMARMN constants that renders vp/vs/rho panels from raw
little-endian float32 files), redone as a CLI: same data conventions
(files are (nx, ny) column-major slices stored row-major -> transpose +
flipud for display), same figure conventions (extent in km from the
grid spacing, depth axis increasing downward, ticks on top, per-panel
colorbar), parameterized instead of edited-in-place.

Examples::

    python tools/plot_models.py model_data/SMARMN/vp.true \
        --nx 300 --ny 106 --dh 30 --label "Vp [km/s]" -o vp_true.png
    python tools/plot_models.py result/SMARMN/log2/model_est/vp_10 \
        --nx 300 --ny 106 --dh 30 -o vp_inverted.png

Reference: ``model_data/plot_models.py`` (DH/NX/NY constants at :18-21,
load/transpose/flipud at :60-75, ``do_plot`` styling at :122-170).
"""
from __future__ import annotations

import argparse

import numpy as np


def load_model(path, nx, ny, npml=0, free_surface=False):
    """Read a raw little-endian float32 (nx, ny) model and return the
    (ny, nx) display array with the PML frame cropped (reference
    :60-75: reshape(NX, NY) -> transpose -> flipud is equivalent to
    orienting depth downward after the transpose; we keep depth
    increasing with row index and let imshow's default origin show
    z=0 at the top, which renders identically)."""
    data = np.fromfile(path, dtype=np.dtype("float32").newbyteorder("<"))
    if data.size != nx * ny:
        raise ValueError(f"{path}: {data.size} floats != nx*ny = {nx * ny}")
    m = data.reshape(nx, ny).T            # (ny, nx), depth down the rows
    if npml:
        m = m[:ny - npml, npml:nx - npml] if free_surface \
            else m[npml:ny - npml, npml:nx - npml]
    return m


def plot_panels(panels, dh, labels=None, vranges=None, cmap="jet",
                out=None, show=False):
    """Render a column of model panels (each (ny, nx), meters spacing
    ``dh``) in the reference's style; returns the matplotlib figure."""
    import matplotlib
    if out is not None and not show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from mpl_toolkits.axes_grid1 import make_axes_locatable

    n = len(panels)
    fig, axes = plt.subplots(n, 1, figsize=(8, 3 * n), squeeze=False)
    for i, m in enumerate(panels):
        ax = axes[i, 0]
        ny, nx = m.shape
        im = ax.imshow(m, cmap=cmap, interpolation="none",
                       extent=[0.0, nx * dh / 1000.0,
                               ny * dh / 1000.0, 0.0],
                       vmin=None if not vranges else vranges[i][0],
                       vmax=None if not vranges else vranges[i][1])
        ax.set_xlabel("Distance [km]")
        ax.set_ylabel("Depth [km]")
        ax.xaxis.tick_top()
        ax.xaxis.set_label_position("top")
        divider = make_axes_locatable(ax)
        cax = divider.append_axes("right", size="2%", pad=0.05)
        cbar = fig.colorbar(im, cax=cax)
        if labels and labels[i]:
            cbar.set_label(labels[i])
    fig.tight_layout()
    if out:
        fig.savefig(out, dpi=300, bbox_inches="tight")
        print(f"wrote {out}")
    if show:
        plt.show()
    return fig


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("files", nargs="+",
                   help="raw float32 model files (one panel each)")
    p.add_argument("--nx", type=int, required=True)
    p.add_argument("--ny", type=int, required=True)
    p.add_argument("--dh", type=float, default=30.0,
                   help="grid spacing in meters (default 30)")
    p.add_argument("--npml", type=int, default=0,
                   help="PML frame width to crop (default 0)")
    p.add_argument("--free-surface", action="store_true",
                   help="crop the PML from three sides only")
    p.add_argument("--label", action="append", default=None,
                   help="colorbar label per panel (repeatable)")
    p.add_argument("--vmin", type=float, default=None)
    p.add_argument("--vmax", type=float, default=None)
    p.add_argument("--cmap", default="jet")
    p.add_argument("-o", "--out", default=None, help="output figure file")
    p.add_argument("--show", action="store_true")
    args = p.parse_args(argv)

    panels = [load_model(f, args.nx, args.ny, args.npml, args.free_surface)
              for f in args.files]
    for f, m in zip(args.files, panels):
        print(f"{f}: shape {m.shape}, range [{m.min():.3f}, {m.max():.3f}]")
    vr = None
    if args.vmin is not None or args.vmax is not None:
        vr = [(args.vmin, args.vmax)] * len(panels)
    plot_panels(panels, args.dh, labels=args.label, vranges=vr,
                cmap=args.cmap, out=args.out, show=args.show)


if __name__ == "__main__":
    main()
