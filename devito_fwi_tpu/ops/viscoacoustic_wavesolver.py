"""ViscoacousticWaveSolver (API parity with the reference
``seismic/viscoacoustic/wavesolver.py:7-206``): forward + adjoint over the
six kernel variants {sls, ren, deng_mcmechan} x {1st, 2nd order}."""
from __future__ import annotations

import os
import time as _time

import numpy as np

from . import viscoacoustic as _va
from .interp import interp_table
from .wavesolver import Wavefield, PerfSummary, sync_device


def _visco_pallas_ok(model, kernel, time_order, s_idx, r_idx):
    """Gate for the Pallas viscoacoustic fast path (mirrors the elastic
    gate in elastic_wavesolver)."""
    if os.environ.get("DEVITO_FWI_TPU_PALLAS", "1") == "0":
        return False
    import jax
    from .pallas_acoustic import env_interpret
    if jax.default_backend() != "tpu" and not env_interpret():
        return False
    if jax.config.jax_enable_x64 and not env_interpret():
        return False
    from .pallas_staggered import visco_sls2_supported
    return visco_sls2_supported(model, kernel, time_order, s_idx, r_idx)

__all__ = ["ViscoacousticWaveSolver"]


class ViscoacousticWaveSolver:
    def __init__(self, model, geometry, space_order=4, kernel="sls",
                 time_order=2, **kwargs):
        assert (kernel, time_order) in _va.KERNELS
        self.model = model
        self.model._initialize_bcs(bcs="mask")
        self.geometry = geometry
        self.space_order = space_order
        self.kernel = kernel
        self.time_order = time_order
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

    def _field(self, name, override=None, default=None):
        val = override if override is not None else \
            getattr(self.model, name, default)
        if val is None:
            val = default
        val = np.asarray(val, dtype=self.model.dtype)
        if val.ndim == 0:
            val = np.full(self.model.padded_shape, val,
                          dtype=self.model.dtype)
        return val

    def _params(self, vp=None, qp=None, b=None):
        return (self._field("vp", vp), self._field("b", b, 1.0),
                self._field("qp", qp), self._field("damp", None, 1.0))

    def _static(self):
        return dict(kernel=self.kernel, time_order=self.time_order,
                    nt=self.nt, spacing=self.model.spacing,
                    space_order=self.space_order)

    def forward(self, src=None, rec=None, v=None, r=None, p=None, qp=None,
                b=None, vp=None, save=None, **kwargs):
        """Returns (rec, p wavefield, v, summary) like the reference."""
        src = src or self.geometry.src
        rec = rec or self.geometry.rec
        vp_, b_, qp_, damp = self._params(vp, qp, b)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(src.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        tic = _time.perf_counter()
        if not save and _visco_pallas_ok(self.model, self.kernel,
                                         self.time_order, s_idx, r_idx):
            from .pallas_staggered import visco_sls2_forward_pallas
            rec_data, p_out = visco_sls2_forward_pallas(
                vp_, b_, qp_, damp, src.data, s_idx, s_w, r_idx, r_w, dt,
                self.geometry.f0, nt=self.nt, spacing=self.model.spacing,
                space_order=self.space_order)
        else:
            rec_data, p_out = _va.forward(
                vp_, b_, qp_, damp, src.data, s_idx, s_w, r_idx, r_w, dt,
                self.geometry.f0, save=bool(save), **self._static())
        sync_device(rec_data)
        toc = _time.perf_counter()
        rec.data[:] = np.asarray(rec_data)
        summary = PerfSummary(toc - tic, self.nt * np.prod(vp_.shape))
        return rec, Wavefield(p_out) if p_out is not None else None, \
            None, summary

    def adjoint(self, rec, srca=None, va=None, pa=None, vp=None, qp=None,
                b=None, r=None, **kwargs):
        """Returns (srca, pa wavefield, va, summary)."""
        srca = srca or self.geometry.new_src(name="srca", src_type=None)
        vp_, b_, qp_, damp = self._params(vp, qp, b)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(srca.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        tic = _time.perf_counter()
        srca_data, p_out = _va.adjoint(vp_, b_, qp_, damp, rec.data, r_idx,
                                       r_w, s_idx, s_w, dt,
                                       self.geometry.f0, **self._static())
        sync_device(srca_data)
        toc = _time.perf_counter()
        srca.data[:] = np.asarray(srca_data)
        summary = PerfSummary(toc - tic, self.nt * np.prod(vp_.shape))
        return srca, Wavefield(p_out), None, summary
