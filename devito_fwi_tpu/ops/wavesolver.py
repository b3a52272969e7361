"""AcousticWaveSolver: API-parity wrapper over the jitted propagators.

Mirrors the reference solver object (``seismic/acoustic/wavesolver.py:10-246``)
— ``forward`` / ``adjoint`` / ``jacobian`` / ``jacobian_adjoint`` with the
same call conventions — while the compute runs as jitted JAX scans from
``ops.acoustic``. The solver owns the static configuration (orders, kernel,
free surface) and the precomputed source/receiver interpolation tables.
"""
from __future__ import annotations

import time as _time

import numpy as np
import jax.numpy as jnp

from . import acoustic as _ac
from .interp import interp_table
from ..models.sources import PointSource

__all__ = ["AcousticWaveSolver", "Wavefield", "PerfSummary"]


def sync_device(x):
    """Real device sync for timing: ``block_until_ready`` returns EARLY
    through the axon TPU tunnel (CLAUDE.md platform rules), so a
    PerfSummary window closed on it measures dispatch, not execution.
    Fetching one scalar through a tiny jit forces true completion; the
    ~26 ms tunnel fetch latency it adds is a bounded constant, versus an
    unbounded under-measurement."""
    import jax
    global _SYNC_FETCH
    try:
        fn = _SYNC_FETCH
    except NameError:
        fn = None
    if fn is None:
        fn = jax.jit(lambda a: a.ravel()[0])
        globals()["_SYNC_FETCH"] = fn
    float(fn(x))


class Wavefield:
    """Thin wrapper so callers can use ``.data`` like a devito TimeFunction."""

    def __init__(self, data):
        self.data = data


class PerfSummary:
    """Per-operator performance summary (the reference consumes devito's
    ``summary.gflopss/oi/timings``, e.g. acoustic_example.py:40-50)."""

    FLOPS_PER_CELL = 40.0   # nominal so=8 stencil+update flop count
    BYTES_PER_CELL = 24.0   # nominal streamed bytes (u, u_prev, out, m/damp)

    def __init__(self, elapsed, gpoints):
        self.elapsed = elapsed
        self.gpointss = gpoints / elapsed / 1e9 if elapsed > 0 else 0.0
        self.gflopss = self.gpointss * self.FLOPS_PER_CELL
        self.oi = self.FLOPS_PER_CELL / self.BYTES_PER_CELL
        self.timings = {"kernel": elapsed}

    def __repr__(self):
        return f"PerfSummary(elapsed={self.elapsed:.4f}s, " \
               f"gpoints/s={self.gpointss:.3f}, gflops/s~{self.gflopss:.1f})"


class AcousticWaveSolver:
    """
    Parameters
    ----------
    model : SeismicModel
    geometry : AcquisitionGeometry
    kernel : 'OT2' | 'OT4'
    space_order : int — stencil order for the wave equation
    """

    def __init__(self, model, geometry, kernel="OT2", space_order=4, **kwargs):
        self.model = model
        # solvers require the damping (not mask) boundary, like the reference
        # (seismic/acoustic/wavesolver.py:30)
        self.model._initialize_bcs(bcs="damp")
        self.geometry = geometry
        self.space_order = space_order
        self.kernel = kernel
        self._kwargs = kwargs

    # ------------------------------------------------------------------ misc
    @property
    def dt(self):
        if self.kernel == "OT4":
            # OT4 allows a sqrt(3)~1.73x larger dt (reference wavesolver.py:42-46)
            return self.model.dtype(1.73 * self.model.critical_dt)
        return self.model.critical_dt

    @property
    def nt(self):
        return self.geometry.nt

    def _tables(self, coords):
        return interp_table(coords, self.model.origin_pml, self.model.spacing,
                            dtype=self.model.dtype)

    def _static(self):
        return dict(nt=self.nt, spacing=self.model.spacing,
                    space_order=self.space_order, kernel=self.kernel,
                    fs=self.model.fs)

    def _damp(self):
        d = self.model.damp
        return d if isinstance(d, np.ndarray) else self.model.dtype(0.0)

    def _vp(self, vp):
        if vp is None:
            vp = self.model.vp
        if not isinstance(vp, jnp.ndarray):
            vp = np.asarray(vp, dtype=self.model.dtype)
        if vp.ndim == 0:
            vp = np.full(self.model.padded_shape, vp, dtype=self.model.dtype)
        return vp

    # --------------------------------------------------------------- forward
    def forward(self, src=None, rec=None, u=None, vp=None, save=None, **kwargs):
        """Returns (rec, u, summary) — rec is a PointSource (nt, nrec), u the
        wavefield (saved history if save else the last two slices)."""
        src = src or self.geometry.src
        rec = rec or self.geometry.rec
        vp = self._vp(vp)
        dt = kwargs.pop("dt", self.dt)
        # custom FD coefficients (devito coefficients='symbolic' analog,
        # tutorial 07_DRP_schemes) — hashable for the jit cache
        w_override = kwargs.pop("w_override", None)
        if w_override is not None:
            w_override = tuple(float(x) for x in w_override)
        s_idx, s_w = self._tables(src.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)

        tic = _time.perf_counter()
        rec_data, u_out = _ac.forward(vp, self._damp(), src.data, s_idx, s_w,
                                      r_idx, r_w, dt, save=bool(save),
                                      w_override=w_override,
                                      **self._static())
        sync_device(rec_data)
        toc = _time.perf_counter()
        rec.data[:] = np.asarray(rec_data)
        summary = PerfSummary(toc - tic, self.nt * np.prod(vp.shape))
        return rec, Wavefield(u_out), summary

    # --------------------------------------------------------------- adjoint
    def adjoint(self, rec, srca=None, v=None, vp=None, **kwargs):
        srca = srca or self.geometry.new_src(name="srca", src_type=None)
        vp = self._vp(vp)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(srca.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        tic = _time.perf_counter()
        srca_data, v_out = _ac.adjoint(vp, self._damp(), rec.data, r_idx, r_w,
                                       s_idx, s_w, dt, **self._static())
        sync_device(srca_data)
        toc = _time.perf_counter()
        srca.data[:] = np.asarray(srca_data)
        summary = PerfSummary(toc - tic, self.nt * np.prod(vp.shape))
        return srca, Wavefield(v_out), summary

    # ----------------------------------------------------- jacobian adjoint
    def jacobian_adjoint(self, rec, u, v=None, grad=None, vp=None,
                         checkpointing=False, n_checkpoints=16, **kwargs):
        """Gradient w.r.t. squared slowness. `u` is the saved forward
        wavefield (from ``forward(save=True)``) unless checkpointing, in
        which case the forward history is recomputed segment-wise
        (pyrevolve equivalent, reference ``wavesolver.py:188-201``)."""
        vp = self._vp(vp)
        dt = kwargs.pop("dt", self.dt)
        r_idx, r_w = self._tables(rec.coordinates)
        tic = _time.perf_counter()
        if checkpointing:
            src = self.geometry.src
            s_idx, s_w = self._tables(src.coordinates)
            grad_out, _ = _ac.gradient_checkpointed(
                vp, self._damp(), src.data, s_idx, s_w, rec.data, r_idx, r_w,
                dt, n_checkpoints=n_checkpoints, **self._static())
        else:
            u_save = u.data if isinstance(u, Wavefield) else u
            grad_out, _ = _ac.gradient(vp, self._damp(), u_save, rec.data,
                                       r_idx, r_w, dt, **self._static())
        sync_device(grad_out)
        toc = _time.perf_counter()
        if grad is not None:
            grad += np.asarray(grad_out)  # devito Inc semantics: accumulate
            result = grad
        else:
            result = np.asarray(grad_out)
        summary = PerfSummary(toc - tic, 2 * self.nt * np.prod(vp.shape))
        return result, summary

    # --------------------------------------------------------------- born
    def jacobian(self, dmin, src=None, rec=None, vp=None, **kwargs):
        src = src or self.geometry.src
        rec = rec or self.geometry.rec
        vp = self._vp(vp)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(src.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        dm = np.asarray(dmin, dtype=self.model.dtype)
        if dm.shape == self.model.shape:
            from ..utils.fd import pad_edge
            dm = pad_edge(dm, self.model.padsizes)
        tic = _time.perf_counter()
        rec_data = _ac.born(vp, self._damp(), dm, src.data, s_idx, s_w,
                            r_idx, r_w, dt, **self._static())
        sync_device(rec_data)
        toc = _time.perf_counter()
        rec.data[:] = np.asarray(rec_data)
        summary = PerfSummary(toc - tic, 2 * self.nt * np.prod(vp.shape))
        return rec, summary

    # backward compatibility aliases (reference wavesolver.py:244-246)
    born = jacobian
    gradient = jacobian_adjoint
