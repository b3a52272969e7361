"""Plotting utilities (reference ``seismic/plotting.py``).

Same four entry points; matplotlib is optional (import-guarded) so headless
TPU runs never pull in a display stack unless plotting is actually used.
"""
from __future__ import annotations

import numpy as np

try:
    import matplotlib.pyplot as plt
    from matplotlib import cm
except Exception:  # pragma: no cover - headless guard
    plt = None
    cm = None

__all__ = ["plot_perturbation", "plot_velocity", "plot_shotrecord",
           "plot_image"]


def plot_perturbation(model, model1, colorbar=True, show=True):
    """Plot the velocity difference between two models."""
    domain_size = 1.e-3 * np.array(model.domain_size)
    extent = [model.origin[0], model.origin[0] + domain_size[0],
              model.origin[1] + domain_size[1], model.origin[1]]
    dv = np.transpose(model.crop(model1.vp)) - np.transpose(model.crop(model.vp))
    plot = plt.imshow(dv, animated=True, cmap=cm.jet,
                      vmin=min(dv.reshape(-1)), vmax=max(dv.reshape(-1)),
                      extent=extent)
    plt.xlabel("X position (km)")
    plt.ylabel("Depth (km)")
    if colorbar:
        plt.colorbar(plot, shrink=0.5, label="Velocity perturbation (km/s)")
    if show:
        plt.show()


def plot_velocity(model, source=None, receiver=None, colorbar=True,
                  cmap="jet", show=True):
    """Plot a 2-D velocity field with optional source/receiver overlays."""
    domain_size = 1.e-3 * np.array(model.domain_size)
    extent = [model.origin[0], model.origin[0] + domain_size[0],
              model.origin[1] + domain_size[1], model.origin[1]]
    field = model.crop(model.vp) if isinstance(model.vp, np.ndarray) \
        else np.full(model.shape, float(model.vp))
    plot = plt.imshow(np.transpose(field), animated=True, cmap=cmap,
                      vmin=np.min(field), vmax=np.max(field), extent=extent)
    plt.xlabel("X position (km)")
    plt.ylabel("Depth (km)")
    if receiver is not None:
        plt.scatter(1e-3 * receiver[:, 0], 1e-3 * receiver[:, 1],
                    s=25, c="green", marker="D")
    if source is not None:
        plt.scatter(1e-3 * source[:, 0], 1e-3 * source[:, 1],
                    s=25, c="red", marker="o")
    if colorbar:
        plt.colorbar(plot, shrink=0.5, label="Velocity (km/s)")
    if show:
        plt.show()


def plot_shotrecord(rec, model, t0, tn, colorbar=True, show=True, clim=None):
    """Plot a shot record (time vs. receiver position)."""
    scale = np.max(rec) / 10.
    if clim is not None:
        scale = clim
    extent = [model.origin[0], model.origin[0] + 1e-3 * model.domain_size[0],
              1e-3 * tn, t0]
    plot = plt.imshow(rec, vmin=-scale, vmax=scale, cmap=cm.gray,
                      extent=extent, aspect="auto")
    plt.xlabel("X position (km)")
    plt.ylabel("Time (s)")
    if colorbar:
        plt.colorbar(plot, shrink=0.5)
    if show:
        plt.show()


def plot_image(data, vmin=None, vmax=None, colorbar=True, cmap="gray",
               show=True):
    """Plot a 2-D image field (gradient, image, section)."""
    plot = plt.imshow(np.transpose(data),
                      vmin=vmin or 0.9 * np.min(data),
                      vmax=vmax or 1.1 * np.max(data),
                      cmap=cmap)
    if colorbar:
        plt.colorbar(plot, shrink=0.5)
    if show:
        plt.show()
