"""AnisotropicWaveSolver: TTI solver wrapper (API parity with the reference
``seismic/tti/wavesolver.py:11-357``: forward / adjoint / jacobian /
jacobian_adjoint over the centered kernels)."""
from __future__ import annotations

import time as _time

import numpy as np

from . import tti as _tti
from .interp import interp_table
from .wavesolver import Wavefield, PerfSummary, sync_device

__all__ = ["AnisotropicWaveSolver"]


class AnisotropicWaveSolver:
    def __init__(self, model, geometry, space_order=4, **kwargs):
        self.model = model
        self.model._initialize_bcs(bcs="damp")
        self.geometry = geometry
        self.space_order = space_order
        self._kwargs = kwargs

    @property
    def dt(self):
        # critical_dt includes the Thomsen sqrt(1+2 max(eps)) scale
        # (model.py:339-370)
        return self.model.critical_dt

    @property
    def nt(self):
        return self.geometry.nt

    def _tables(self, coords):
        return interp_table(coords, self.model.origin_pml, self.model.spacing,
                            dtype=self.model.dtype)

    def _field(self, name, override=None, default=0.0):
        val = override if override is not None else \
            getattr(self.model, name, default)
        if val is None:
            return None
        val = np.asarray(val, dtype=self.model.dtype)
        if val.ndim == 0:
            val = np.full(self.model.padded_shape, val,
                          dtype=self.model.dtype)
        return val

    def _params(self, vp=None, epsilon=None, delta=None, theta=None,
                phi=None):
        vp_ = self._field("vp", vp)
        eps = self._field("epsilon", epsilon)
        dlt = self._field("delta", delta)
        th = self._field("theta", theta)
        ph = self._field("phi", phi) if self.model.dim == 3 else None
        damp = self._field("damp", None, 0.0)
        return vp_, damp, eps, dlt, th, ph

    def _static(self):
        return dict(nt=self.nt, spacing=self.model.spacing,
                    space_order=self.space_order)

    def forward(self, src=None, rec=None, u=None, v=None, vp=None,
                epsilon=None, delta=None, theta=None, phi=None, save=False,
                kernel="centered", **kwargs):
        assert kernel in ("centered", "staggered")
        src = src or self.geometry.src
        rec = rec or self.geometry.rec
        params = self._params(vp, epsilon, delta, theta, phi)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(src.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        if kernel == "staggered":
            tic = _time.perf_counter()
            rec_data = _tti.forward_staggered(
                *params, src.data, s_idx, s_w, r_idx, r_w, dt,
                **self._static())
            sync_device(rec_data)
            toc = _time.perf_counter()
            rec.data[:] = np.asarray(rec_data)
            return rec, None, None, \
                PerfSummary(toc - tic, 2 * self.nt * np.prod(params[0].shape))
        tic = _time.perf_counter()
        out = _tti.forward(*params, src.data, s_idx, s_w, r_idx, r_w, dt,
                           save=bool(save), **self._static())
        sync_device(out[0])
        toc = _time.perf_counter()
        rec.data[:] = np.asarray(out[0])
        summary = PerfSummary(toc - tic, 2 * self.nt * np.prod(params[0].shape))
        return rec, Wavefield(out[1]), Wavefield(out[2]), summary

    def adjoint(self, rec, srca=None, p=None, r=None, vp=None, epsilon=None,
                delta=None, theta=None, phi=None, save=None,
                kernel="centered", **kwargs):
        assert kernel == "centered"
        srca = srca or self.geometry.new_src(name="srca", src_type=None)
        params = self._params(vp, epsilon, delta, theta, phi)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(srca.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        tic = _time.perf_counter()
        srca_data, p_fin = _tti.adjoint(*params, rec.data, r_idx, r_w,
                                        s_idx, s_w, dt, **self._static())
        sync_device(srca_data)
        toc = _time.perf_counter()
        srca.data[:] = np.asarray(srca_data)
        summary = PerfSummary(toc - tic, 2 * self.nt * np.prod(params[0].shape))
        # reference arity (srca, p, r, summary) — wavesolver.py:217
        return srca, Wavefield(p_fin), None, summary

    def jacobian(self, dm, src=None, rec=None, vp=None, epsilon=None,
                 delta=None, theta=None, phi=None, **kwargs):
        src = src or self.geometry.src
        rec = rec or self.geometry.rec
        params = self._params(vp, epsilon, delta, theta, phi)
        dt = kwargs.pop("dt", self.dt)
        dmv = np.asarray(dm, dtype=self.model.dtype)
        if dmv.shape == self.model.shape:
            from ..utils.fd import pad_edge
            dmv = pad_edge(dmv, self.model.padsizes)
        s_idx, s_w = self._tables(src.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        tic = _time.perf_counter()
        rec_data = _tti.born(*params, dmv, src.data, s_idx, s_w, r_idx, r_w,
                             dt, **self._static())
        sync_device(rec_data)
        toc = _time.perf_counter()
        rec.data[:] = np.asarray(rec_data)
        summary = PerfSummary(toc - tic, 4 * self.nt * np.prod(params[0].shape))
        # reference arity (rec, u0, v0, du, dv, summary) —
        # wavesolver.py:280; the twin fields are not retained here
        return rec, None, None, None, None, summary

    born = jacobian

    def jacobian_adjoint(self, rec, u0, v0, dm=None, vp=None, epsilon=None,
                         delta=None, theta=None, phi=None, **kwargs):
        """`u0`, `v0` are the saved forward wavefields from
        ``forward(save=True)``."""
        params = self._params(vp, epsilon, delta, theta, phi)
        dt = kwargs.pop("dt", self.dt)
        r_idx, r_w = self._tables(rec.coordinates)
        u0s = u0.data if isinstance(u0, Wavefield) else u0
        v0s = v0.data if isinstance(v0, Wavefield) else v0
        tic = _time.perf_counter()
        dm_out, _ = _tti.jacobian_adjoint(*params, u0s, v0s, rec.data,
                                          r_idx, r_w, dt, **self._static())
        sync_device(dm_out)
        toc = _time.perf_counter()
        if dm is not None:
            dm += np.asarray(dm_out)
            result = dm
        else:
            result = np.asarray(dm_out)
        summary = PerfSummary(toc - tic, 4 * self.nt * np.prod(params[0].shape))
        return result, summary

    gradient = jacobian_adjoint

    def gradient_checkpointed(self, rec, src=None, n_checkpoints=16,
                              dm=None, vp=None, epsilon=None, delta=None,
                              theta=None, phi=None, **kwargs):
        """TTI gradient via segment checkpoint + recompute — no saved
        wavefield histories (the pyrevolve ``checkpointing=True`` analog
        of the reference's gradient examples; same numerics as
        ``jacobian_adjoint`` on ``forward(save=True)`` wavefields, to
        f64 roundoff — ``tests/test_tti.py``). On TPU the saved-history
        path's full (nt, *grid) u0/v0 HBM round trips are ~100x slower
        than recompute (docs/04_performance.md item 6)."""
        src = src or self.geometry.src
        params = self._params(vp, epsilon, delta, theta, phi)
        dt = kwargs.pop("dt", self.dt)
        s_idx, s_w = self._tables(src.coordinates)
        r_idx, r_w = self._tables(rec.coordinates)
        tic = _time.perf_counter()
        from . import pallas_tti as _pt
        use_pallas = _pt.enabled() and \
            _pt.tti_supported(self.model, r_idx, nt=self.nt) and \
            np.asarray(src.coordinates).shape[0] == 1
        if _pt.enabled() and not use_pallas:
            # loud once-per-reason cliff warning, acoustic convention
            # (fwi._pallas_cliff_warn): the XLA pair is ~5x slower
            from ..fwi import _pallas_cliff_warn
            _pallas_cliff_warn(
                "TTI geometry unsupported by the Pallas segment kernels "
                "(need 2-D f32, receivers on <=2 z-planes, single "
                "source, grid fitting VMEM)")
        if use_pallas:
            # Pallas segment-kernel fast path: 5.5x the XLA checkpointed
            # pair on chip (docs/04_performance.md); numerics pinned by
            # tests/test_pallas_tti.py + the on-chip parity suite
            import jax.numpy as _jnp
            dm_out = _pt.tti_gradient_residual_batched_pallas(
                *[_jnp.asarray(p) for p in params[:5]],
                _jnp.asarray(src.data[:, :1]),
                _jnp.asarray(s_idx)[:, None], _jnp.asarray(s_w)[:, None],
                _jnp.asarray(r_idx), _jnp.asarray(r_w),
                _jnp.asarray(rec.data)[None], float(dt),
                n_checkpoints=n_checkpoints, **self._static())[0]
        else:
            _, seg_starts = _tti.forward_ckpt(
                *params, src.data, s_idx, s_w, r_idx, r_w, dt,
                n_checkpoints=n_checkpoints, **self._static())
            dm_out, _ = _tti.jacobian_adjoint_from_ckpt(
                *params, src.data, s_idx, s_w, seg_starts, rec.data,
                r_idx, r_w, dt, n_checkpoints=n_checkpoints,
                **self._static())
        sync_device(dm_out)
        toc = _time.perf_counter()
        if dm is not None:
            dm += np.asarray(dm_out)
            result = dm
        else:
            result = np.asarray(dm_out)
        summary = PerfSummary(toc - tic,
                              12 * self.nt * np.prod(params[0].shape))
        return result, summary
