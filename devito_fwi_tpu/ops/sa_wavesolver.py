"""SaIsoAcousticWaveSolver: API-parity wrapper for the self-adjoint system.

Mirrors the reference solver (``seismic/self_adjoint/wavesolver.py:7-266``):
``forward`` / ``adjoint`` / ``jacobian`` / ``jacobian_adjoint`` with the
same call conventions, plus the ``acoustic_sa_setup`` example builder
(``seismic/self_adjoint/example_iso.py:11-34``). Compute runs as jitted
scans from ``ops.self_adjoint``.
"""
from __future__ import annotations

import time as _time

import numpy as np

from . import self_adjoint as _sa
from .interp import interp_table
from .wavesolver import Wavefield, PerfSummary, sync_device

__all__ = ["SaIsoAcousticWaveSolver", "acoustic_sa_setup"]


class SaIsoAcousticWaveSolver:
    """Solver for the scalar isotropic variable-density visco-acoustic
    self-adjoint wave equation. The model must carry `vp`, `b` and a
    w/Q `damp` field (build it with ``self_adjoint.setup_w_over_q``)."""

    def __init__(self, model, geometry, space_order=8, **kwargs):
        self.model = model
        self.geometry = geometry
        self.space_order = space_order
        # Time step is 0.6x smaller due to Q (reference wavesolver.py:48-49)
        self.model.dt_scale = .6
        self._kwargs = kwargs

    @property
    def dt(self):
        return self.model.critical_dt

    @property
    def nt(self):
        return self.geometry.nt

    def _tables(self, coords):
        return interp_table(coords, self.model.origin_pml, self.model.spacing,
                            dtype=self.model.dtype)

    def _static(self):
        return dict(nt=self.nt, spacing=self.model.spacing,
                    space_order=self.space_order)

    def _params(self, vp=None, b=None, damp=None):
        def full(x, default):
            x = default if x is None else x
            x = np.asarray(x, dtype=self.model.dtype)
            if x.ndim == 0:
                x = np.full(self.model.padded_shape, x,
                            dtype=self.model.dtype)
            return x
        vp = full(vp, self.model.vp)
        b = full(b, getattr(self.model, "b", 1.0))
        damp = full(damp, self.model.damp)
        return vp, b, damp

    # --------------------------------------------------------------- forward
    def forward(self, src=None, rec=None, b=None, vp=None, damp=None, u=None,
                save=None, **kwargs):
        src = src or self.geometry.src
        rec = rec or self.geometry.rec
        vp, b, damp = self._params(vp, b, damp)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(src.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        tic = _time.perf_counter()
        rec_data, u_out = _sa.forward(vp, b, damp, src.data, s_idx, s_w,
                                      r_idx, r_w, dt, save=bool(save),
                                      **self._static())
        sync_device(rec_data)
        toc = _time.perf_counter()
        rec.data[:] = np.asarray(rec_data)
        return rec, Wavefield(u_out), \
            PerfSummary(toc - tic, self.nt * np.prod(vp.shape))

    # --------------------------------------------------------------- adjoint
    def adjoint(self, rec, src=None, b=None, v=None, damp=None, vp=None,
                save=None, **kwargs):
        srca = src or self.geometry.new_src(name="srca", src_type=None)
        vp, b, damp = self._params(vp, b, damp)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(srca.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        tic = _time.perf_counter()
        srca_data, v_out = _sa.adjoint(vp, b, damp, rec.data, r_idx, r_w,
                                       s_idx, s_w, dt, **self._static())
        sync_device(srca_data)
        toc = _time.perf_counter()
        srca.data[:] = np.asarray(srca_data)
        return srca, Wavefield(v_out), \
            PerfSummary(toc - tic, self.nt * np.prod(vp.shape))

    # ------------------------------------------------------------------ born
    def jacobian(self, dm, src=None, rec=None, b=None, vp=None, damp=None,
                 u0=None, du=None, save=None, **kwargs):
        src = src or self.geometry.src
        rec = rec or self.geometry.rec
        vp, b, damp = self._params(vp, b, damp)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(src.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        dmv = np.asarray(dm, dtype=self.model.dtype)
        if dmv.shape == self.model.shape:
            from ..utils.fd import pad_edge
            dmv = pad_edge(dmv, self.model.padsizes)
        tic = _time.perf_counter()
        rec_data, u0_out = _sa.born(vp, b, damp, dmv, src.data, s_idx, s_w,
                                    r_idx, r_w, dt, save=bool(save),
                                    **self._static())
        sync_device(rec_data)
        toc = _time.perf_counter()
        rec.data[:] = np.asarray(rec_data)
        return rec, Wavefield(u0_out), None, \
            PerfSummary(toc - tic, 2 * self.nt * np.prod(vp.shape))

    # ----------------------------------------------------- jacobian adjoint
    def jacobian_adjoint(self, rec, u0, b=None, vp=None, damp=None,
                         dm=None, du=None, **kwargs):
        vp, b, damp = self._params(vp, b, damp)
        dt = kwargs.pop("dt", self.dt)
        r_idx, r_w = self._tables(rec.coordinates)
        u0_save = u0.data if isinstance(u0, Wavefield) else u0
        tic = _time.perf_counter()
        dm_out, _ = _sa.jacobian_adjoint(vp, b, damp, u0_save, rec.data,
                                         r_idx, r_w, dt, **self._static())
        sync_device(dm_out)
        toc = _time.perf_counter()
        if dm is not None:
            dm += np.asarray(dm_out)
            result = dm
        else:
            result = np.asarray(dm_out)
        return result, u0, None, \
            PerfSummary(toc - tic, 2 * self.nt * np.prod(vp.shape))

    # aliases matching the acoustic solver naming
    born = jacobian
    gradient = jacobian_adjoint


def acoustic_sa_setup(shape=(50, 50, 50), spacing=(10.0, 10.0, 10.0),
                      tn=500., space_order=8, nbl=10, dtype=np.float32,
                      fpeak=0.010, qmin=0.1, qmax=1000.0, vp=1.5, b=1.0,
                      **kwargs):
    """Standard self-adjoint test/demo setup (reference
    ``example_iso.py:11-34``): constant vp/b wholespace, w/Q boundary from
    the Ricker peak frequency, source at center, receivers near surface."""
    from ..models.model import SeismicModel
    from ..models.geometry import setup_geometry

    omega = 2.0 * np.pi * fpeak
    shape = tuple(shape)
    spacing = tuple(spacing[:len(shape)])
    origin = tuple(0.0 for _ in shape)
    vp_arr = np.full(shape, vp, dtype=dtype)
    b_arr = np.full(shape, b, dtype=dtype)
    init_damp = lambda model: _sa.setup_w_over_q(
        model.padded_shape, omega, qmin, qmax, model.nbl, dtype=dtype)
    model = SeismicModel(origin=origin, shape=shape, vp=vp_arr, b=b_arr,
                         spacing=spacing, nbl=nbl, space_order=space_order,
                         bcs=init_damp, dtype=dtype, **kwargs)
    geometry = setup_geometry(model, tn, f0=fpeak)
    return SaIsoAcousticWaveSolver(model, geometry, space_order=space_order)
