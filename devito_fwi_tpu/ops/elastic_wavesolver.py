"""Elastic / viscoelastic solver wrappers (API parity with the reference
``seismic/elastic/wavesolver.py`` and ``seismic/viscoelastic/wavesolver.py``:
forward-only solvers returning (rec1, rec2, v, tau, summary))."""
from __future__ import annotations

import os
import time as _time

import numpy as np

from . import staggered as _st
from .interp import interp_table
from .wavesolver import PerfSummary, sync_device


def _elastic_pallas_ok(model, s_idx, r_idx):
    """Gate for the Pallas elastic fast path (mirrors fwi._pallas_z0's
    backend/env checks)."""
    if os.environ.get("DEVITO_FWI_TPU_PALLAS", "1") == "0":
        return False
    import jax
    from .pallas_acoustic import env_interpret
    if jax.default_backend() != "tpu" and not env_interpret():
        return False
    if jax.config.jax_enable_x64 and not env_interpret():
        return False
    from .pallas_staggered import elastic_supported
    return elastic_supported(model, s_idx, r_idx)

__all__ = ["ElasticWaveSolver", "ViscoelasticWaveSolver"]


class _StaggeredSolverBase:
    def __init__(self, model, geometry, space_order=4, **kwargs):
        self.model = model
        # staggered solvers use the mask boundary
        # (reference elastic/wavesolver.py:25, viscoelastic/wavesolver.py:25)
        self.model._initialize_bcs(bcs="mask")
        self.geometry = geometry
        self.space_order = space_order
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

    def _field(self, name, default=None, override=None):
        """Model field (or caller override) normalized to a dtype-cast
        full-grid array — scalars expand, f64 inputs cast, exactly like
        the acoustic solver's _vp handling."""
        val = override if override is not None else \
            getattr(self.model, name, default)
        if val is None:
            val = default
        val = np.asarray(val, dtype=self.model.dtype)
        if val.ndim == 0:
            val = np.full(self.model.padded_shape, val,
                          dtype=self.model.dtype)
        return val

    def _check_rec2(self, rec1, rec2):
        """The staggered kernels sample BOTH outputs at one receiver
        table; a rec2 at different positions would silently get rec1's
        sampling — reject it loudly instead."""
        if not np.array_equal(np.asarray(rec1.coordinates),
                              np.asarray(rec2.coordinates)):
            raise ValueError(
                "rec1/rec2 must share coordinates: the staggered "
                "kernels sample tau_zz and div(v) at one receiver "
                "table (pass matching positions or two forward calls)")


class ElasticWaveSolver(_StaggeredSolverBase):
    """Velocity-stress elastic solver (reference
    ``seismic/elastic/wavesolver.py:7-93``)."""

    def forward(self, src=None, rec1=None, rec2=None, lam=None, mu=None,
                b=None, v=None, tau=None, save=None, **kwargs):
        src = src or self.geometry.src
        rec1 = rec1 or self.geometry.new_rec(name="rec1")
        rec2 = rec2 or self.geometry.new_rec(name="rec2")
        self._check_rec2(rec1, rec2)
        lam = self._field("lam", override=lam)
        mu = self._field("mu", override=mu)
        b = self._field("b", 1.0, override=b)
        damp = self._field("damp", 1.0)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(src.coordinates)
        r_idx, r_w = self._tables(rec1.coordinates)
        tic = _time.perf_counter()
        if _elastic_pallas_ok(self.model, s_idx, r_idx):
            from .pallas_staggered import elastic_forward_pallas
            r1, r2 = elastic_forward_pallas(
                lam, mu, b, damp, src.data, s_idx, s_w, r_idx, r_w, dt,
                nt=self.nt, spacing=self.model.spacing,
                space_order=self.space_order)
        else:
            r1, r2 = _st.elastic_forward(lam, mu, b, damp, src.data, s_idx,
                                         s_w, r_idx, r_w, dt, nt=self.nt,
                                         spacing=self.model.spacing,
                                         space_order=self.space_order)
        sync_device(r1)
        toc = _time.perf_counter()
        rec1.data[:] = np.asarray(r1)
        rec2.data[:] = np.asarray(r2)
        summary = PerfSummary(toc - tic, self.nt * np.prod(lam.shape))
        return rec1, rec2, None, None, summary


class ViscoelasticWaveSolver(_StaggeredSolverBase):
    """SLS viscoelastic solver (reference
    ``seismic/viscoelastic/wavesolver.py:8-112``)."""

    def __init__(self, model, geometry, space_order=4, **kwargs):
        super().__init__(model, geometry, space_order, **kwargs)
        # viscoelastic needs a smaller dt than the elastic CFL
        # (reference viscoelastic/wavesolver.py:33-35)
        self.model.dt_scale = .9

    def forward(self, src=None, rec1=None, rec2=None, lam=None, qp=None,
                mu=None, qs=None, b=None, v=None, tau=None, r=None,
                save=None, **kwargs):
        src = src or self.geometry.src
        rec1 = rec1 or self.geometry.new_rec(name="rec1")
        rec2 = rec2 or self.geometry.new_rec(name="rec2")
        self._check_rec2(rec1, rec2)
        lam = self._field("lam", override=lam)
        mu = self._field("mu", override=mu)
        b = self._field("b", 1.0, override=b)
        qp = self._field("qp", override=qp)
        qs = self._field("qs", override=qs)
        damp = self._field("damp", 1.0)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(src.coordinates)
        r_idx, r_w = self._tables(rec1.coordinates)
        tic = _time.perf_counter()
        r1, r2 = _st.viscoelastic_forward(lam, mu, b, qp, qs, damp,
                                          self.geometry.f0, src.data, s_idx,
                                          s_w, r_idx, r_w, dt, nt=self.nt,
                                          spacing=self.model.spacing,
                                          space_order=self.space_order)
        sync_device(r1)
        toc = _time.perf_counter()
        rec1.data[:] = np.asarray(r1)
        rec2.data[:] = np.asarray(r2)
        summary = PerfSummary(toc - tic, self.nt * np.prod(lam.shape))
        return rec1, rec2, None, None, summary
