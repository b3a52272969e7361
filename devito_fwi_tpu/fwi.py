"""FWI objective layer: multi-shot forward modeling + misfit + gradient.

Re-design of the reference root-level ``fwi.py``. The API is preserved
(``fm_single/fm_multi/fm_multi_parallel``, ``fwi_obj_single/multi/
multi_parallel``, ``fwi_loss``, ``Filter``, ``resample``,
``fix_source_illumination``), but the execution model is TPU-native:

* shots are batched into a leading array axis and evaluated in one jitted
  program (``vmap`` over source scatter tables) instead of dask futures
  (reference ``fwi.py:83-102,207-234``);
* ``*_parallel`` variants shard the shot axis over the device mesh with
  ``shard_map`` + ``psum`` (see ``parallel.sharding``) — dask's
  ``client.submit``/``wait``/result-sum loop becomes one collective;
* the illumination preconditioner ``grad /= sqrt(illum + 1e-30)``, bathy
  masks, direct-wave subtraction and source/receiver illumination fixes
  match the reference numerics exactly (``fwi.py:104-129,175-205``).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from scipy import interpolate

from .models.geometry import AcquisitionGeometry
from .models.sources import PointSource
from .ops.wavesolver import AcousticWaveSolver
from .ops import acoustic as _ac
from .ops.interp import interp_table
from .utils.filters import bandpass, lowpass, highpass

__all__ = ["seismic_filter", "Filter", "resample", "fm_single", "fm_multi",
           "fm_multi_parallel", "fix_source_illumination", "fwi_obj_single",
           "fwi_obj_multi", "fwi_obj_multi_parallel", "fwi_loss"]


# ---------------------------------------------------------------------------
# filters / resampling (reference fwi.py:10-57)
# ---------------------------------------------------------------------------

def seismic_filter(data, filter_type, freqmin=None, freqmax=None, df=None,
                   corners=16, zerophase=False, axis=-1):
    filter_type = filter_type.lower()
    assert filter_type in ("bandpass", "lowpass", "highpass")
    if filter_type == "bandpass":
        if freqmin and freqmax and df:
            return bandpass(data, freqmin, freqmax, df, corners, zerophase,
                            axis)
        raise ValueError
    if filter_type == "lowpass":
        if freqmax and df:
            return lowpass(data, freqmax, df, corners, zerophase, axis)
        raise ValueError
    if filter_type == "highpass":
        if freqmin and df:
            return highpass(data, freqmin, df, corners, zerophase, axis)
        raise ValueError


class Filter:
    def __init__(self, filter_type, freqmin=None, freqmax=None, df=None,
                 corners=10, zerophase=False, axis=-1):
        self.filter_type = filter_type
        self.freqmin = freqmin
        self.freqmax = freqmax
        self.df = df
        self.corners = corners
        self.zerophase = zerophase
        self.axis = axis

    def __call__(self, data):
        return seismic_filter(data, self.filter_type, self.freqmin,
                              self.freqmax, self.df, self.corners,
                              self.zerophase, self.axis)


def resample(x, t, t0, order=3):
    """Spline trace resampling from time axis t0 to t
    (reference ``fwi.py:47-57``)."""
    dt = t[1] - t[0]
    dt0 = t0[1] - t0[0]
    if np.isclose(dt, dt0):
        return x
    nsamples, ntraces = x.shape
    new_x = np.zeros((t.size, ntraces), dtype=np.float32)
    for i in range(ntraces):
        tck = interpolate.splrep(t0, x[:, i], k=order)
        new_x[:, i] = interpolate.splev(t, tck)
    return new_x


# ---------------------------------------------------------------------------
# forward modeling (reference fwi.py:59-102)
# ---------------------------------------------------------------------------

def fm_single(geometry, save=False):
    """Model one shot; returns (rec PointSource, wavefield)."""
    solver = AcousticWaveSolver(geometry.model, geometry,
                                space_order=geometry.model.space_order)
    rec, u, _ = solver.forward(vp=geometry.model.vp, save=save)
    return rec, u


def _shot_geometry(geometry, i):
    # NOTE: deliberately NOT carrying a resampled geometry.dt — these
    # geometries feed PROPAGATION, which always steps at the model's
    # critical dt (_solver_dt); trace resampling for the misfit happens
    # downstream via the resample_dt argument. A resampled dt here
    # would stretch the source wavelet against the solver's time axis.
    return AcquisitionGeometry(geometry.model, geometry.rec_positions,
                               geometry.src_positions[i, :], geometry.t0,
                               geometry.tn, f0=geometry.f0,
                               src_type=geometry.src_type,
                               a=geometry._a, t0w=geometry._t0w,
                               src_data=geometry._src_data,
                               filter=geometry._filter)


def _batched_tables(geometry):
    """Per-shot source tables + shared receiver table + wavelet."""
    model = geometry.model
    s_idx, s_w = interp_table(geometry.src_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    # (nsrc, 2^d, d) -> one point per shot -> (nsrc, 1, 2^d, d)
    s_idx = s_idx[:, None]
    s_w = s_w[:, None]
    r_idx, r_w = interp_table(geometry.rec_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    src_wav = _shot_geometry(geometry, 0).src.data  # (nt, 1); same per shot
    return s_idx, s_w, r_idx, r_w, src_wav


def _solver_dt(geometry):
    return geometry.model.critical_dt


def _pads(model):
    """Hashable per-dimension padding, for jit-static physical-domain
    crops (under a free surface the top of the z axis is unpadded —
    ``model.padsizes`` — so a symmetric nbl crop would be wrong)."""
    return tuple(tuple(p) for p in model.padsizes)


def _crop(field, pads, shape):
    """Crop a padded-grid field to the physical domain."""
    slc = tuple(slice(lo, lo + n) for (lo, _), n in zip(pads, shape))
    return field[slc]


@partial(jax.jit, static_argnames=("nt", "spacing", "space_order", "kernel",
                                   "fs"))
def _fm_batch(vp, damp, src_wav, s_idx, s_w, r_idx, r_w, dt, *, nt, spacing,
              space_order, kernel, fs):
    fwd = partial(_ac.forward, nt=nt, spacing=spacing,
                  space_order=space_order, kernel=kernel, fs=fs, save=False)
    recs, _ = jax.vmap(
        lambda a, b: fwd(vp, damp, src_wav, a, b, r_idx, r_w, dt))(s_idx, s_w)
    return recs


def fm_multi(geometry, save=False):
    """Model all shots of `geometry`; returns a list of PointSource shot
    records (API parity with reference ``fwi.py:67-81``). Shots run as one
    vmapped TPU program with a single device->host transfer.

    `save` is accepted for signature parity and does not change the return
    value — the reference's ``fm_multi`` likewise discards the saved
    wavefield (``fwi.py:77-79`` keeps only ``fm_single(...)[0]``), so the
    flag only ever toggled devito's internal buffering.

    On TPU, supported geometries route through the Pallas VMEM-resident
    segment kernel by default (DEVITO_FWI_TPU_PALLAS=0 opts out)."""
    model = geometry.model
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    damp = model.damp if isinstance(model.damp, np.ndarray) \
        else model.dtype(0.0)
    vp = _model_vp_device(model)
    dt = _solver_dt(geometry)
    z0, nck, _, _, _ = _pallas_route(
        geometry, _default_checkpoints(geometry.nt), "OT2",
        calc_grad=False)
    p3 = None
    if z0 is None:
        p3, _ = _pallas3_route(geometry, "OT2", calc_grad=False)
    if z0 is not None:
        rec_all = np.asarray(_fm_batch_pallas(
            vp, jnp.asarray(damp), jnp.asarray(src_wav),
            jnp.asarray(s_idx), jnp.asarray(s_w), jnp.asarray(r_idx),
            jnp.asarray(r_w), float(dt), nt=geometry.nt,
            spacing=model.spacing, space_order=model.space_order,
            n_checkpoints=nck, z0=z0, fs=model.fs))
    elif p3 is not None:
        rec_all = np.asarray(_fm_batch_pallas3(
            vp, jnp.asarray(damp),
            jnp.asarray(src_wav), jnp.asarray(s_idx), jnp.asarray(s_w),
            jnp.asarray(r_idx), jnp.asarray(r_w), float(dt),
            nt=geometry.nt, spacing=model.spacing,
            space_order=model.space_order, z0=p3[0], R=p3[1],
            fs=model.fs))
    else:
        rec_all = np.asarray(_fm_batch(
            vp, damp, jnp.asarray(src_wav), jnp.asarray(s_idx),
            jnp.asarray(s_w), jnp.asarray(r_idx), jnp.asarray(r_w), dt,
            nt=geometry.nt, spacing=model.spacing,
            space_order=model.space_order, kernel="OT2", fs=model.fs))
    shots = []
    for i in range(geometry.nsrc):
        shot = PointSource(name="rec", time_range=geometry.time_axis,
                           coordinates=geometry.rec_positions,
                           dtype=model.dtype)
        shot.data[:] = rec_all[i]
        shots.append(shot)
    return shots


def fm_multi_parallel(client, geometry, save=False):
    """Shot-parallel modeling. `client` is accepted for signature parity with
    the dask-based reference (``fwi.py:83-102``) and ignored — shots run as
    one sharded batch over the device mesh."""
    from .parallel.sharding import fm_multi_sharded
    return fm_multi_sharded(geometry, save=save)


# ---------------------------------------------------------------------------
# illumination fixes (reference fwi.py:104-129)
# ---------------------------------------------------------------------------

def fix_source_illumination(geometry, g):
    """Gaussian-mask damping of the gradient at source/receiver locations.
    Literal port of reference ``fwi.py:104-129`` (including its meshgrid
    axis convention)."""
    if geometry.src_positions.shape[0] > 1:
        raise ValueError("Only single source valid.")
    src_pos = geometry.src_positions
    return np.asarray(_fix_illum_jax(
        jnp.asarray(g), jnp.asarray(src_pos[0]),
        jnp.asarray(geometry.rec_positions),
        geometry.model.spacing, geometry.model.shape))


@partial(jax.jit, static_argnames=("spacing", "shape"))
def _fix_illum_jax(g, src_pos, rec_positions, spacing, shape):
    if len(shape) == 3:
        # 3-D extension (the reference workflow is 2-D-only; same
        # Gaussian-mask formula with sigma = dx + dz kept for
        # 2-D-continuity). Receivers fold via scan so the mask product
        # never materializes an (nrec, nx, ny, nz) buffer.
        dx, dy, dz = spacing
        nx, ny, nz = shape
        xx, yy, zz = jnp.meshgrid(jnp.arange(nx) * dx, jnp.arange(ny) * dy,
                                  jnp.arange(nz) * dz, indexing="ij")
        sigma = dx + dz
        inv2s2 = -.5 / sigma ** 2

        def gauss(p):
            return jnp.exp(((xx - p[0]) ** 2 + (yy - p[1]) ** 2
                            + (zz - p[2]) ** 2) * inv2s2)

        g = g * (1. - gauss(src_pos))

        def fold(acc, p):
            return acc * (1. - gauss(p)), None

        prod, _ = jax.lax.scan(fold, jnp.ones(shape, g.dtype),
                               rec_positions)
        return g * prod
    dx, dz = spacing
    nx, nz = shape
    x = jnp.arange(0, nx) * dx
    z = jnp.arange(0, nz) * dz
    # reference quirk preserved: meshgrid(z, x) -> xx holds z-values
    xx, zz = jnp.meshgrid(z, x)
    sigma = dx + dz
    sx, sz = src_pos[0], src_pos[1]
    mask = jnp.exp(-.5 * ((xx - sx) ** 2 + (zz - sz) ** 2) / sigma ** 2)
    g = g * (1. - mask)
    rx = rec_positions[:, 0][:, None, None]
    rz = rec_positions[:, 1][:, None, None]
    masks = jnp.exp(-.5 * ((xx[None] - rx) ** 2 + (zz[None] - rz) ** 2)
                    / sigma ** 2)
    g = g * jnp.prod(1. - masks, axis=0)
    return g


# ---------------------------------------------------------------------------
# objective + gradient (reference fwi.py:131-234)
# ---------------------------------------------------------------------------

def _misfit_config_key(misfit):
    """Hashable value snapshot of a misfit object's scalar config."""
    items = tuple(sorted(
        (k, v) for k, v in vars(misfit).items()
        if isinstance(v, (bool, int, float, str, bytes, type(None)))))
    extra = ()
    if getattr(misfit, "method", None) == "2d" and \
            getattr(misfit, "bfm_backend", None) != "native":
        # the BFM's env-selected backends are read inside the fused
        # objective's trace; snapshot them here so toggling the
        # DEVITO_FWI_TPU_BFM_* vars between calls retraces (same-process
        # A/B guarantee, see bfm.resolve_backends)
        from .misfit.bfm import resolve_backends
        extra = resolve_backends()
    return (type(misfit).__module__, type(misfit).__qualname__, items,
            extra)


class _TraceableMisfit:
    """Makes a bound misfit method safe as a ``jit`` static argument.

    A bare bound method hashes and compares by instance identity, so
    mutating the misfit's config between objective calls (e.g.
    ``misfit.gamma = 2.0`` in a gamma-continuation loop) would silently
    reuse the stale compiled trace — the jit footgun already fixed in
    ``qWasserstein.__call__``. Equality/hash here key on a value
    snapshot of the instance's scalar attributes taken when the
    objective is entered, so config mutations force a retrace.
    (Non-scalar config — arrays, callables — is not snapshotted; keep
    misfit configuration in scalar attributes.)"""

    __slots__ = ("_fn", "_key")

    def __init__(self, fn):
        self._fn = fn
        func = getattr(fn, "__func__", fn)
        self._key = (func, _misfit_config_key(fn.__self__)) \
            if hasattr(fn, "__self__") else (fn,)

    def __call__(self, *args, **kwargs):
        return self._fn(*args, **kwargs)

    def __eq__(self, other):
        return type(other) is _TraceableMisfit and self._key == other._key

    def __hash__(self):
        return hash(self._key)


def _misfit_jax(misfit_func):
    """Return a traceable (syn, obs) -> (fval, residual) function."""
    from .misfit.w2 import least_square_jax
    from .misfit import least_square
    if misfit_func is least_square or misfit_func is None:
        return least_square_jax
    if hasattr(misfit_func, "jax"):
        return _TraceableMisfit(misfit_func.jax)
    return None


def fwi_obj_single(geometry, obs, misfit_func, direct_wave=None,
                   resample_dt=None, calc_grad=False):
    """Single-shot objective (host path, API parity with reference
    ``fwi.py:131-173``), including trace resampling for the misfit."""
    from copy import deepcopy
    solver = AcousticWaveSolver(geometry.model, geometry,
                                space_order=geometry.model.space_order)
    pred, wfd, _ = solver.forward(vp=geometry.model.vp, save=calc_grad)

    if resample_dt is None:
        resample_dt = geometry.dt
    else:
        obs = deepcopy(obs).resample(resample_dt)
        pred = pred.resample(resample_dt)
        if direct_wave is not None:
            direct_wave = deepcopy(direct_wave).resample(resample_dt)
    syn_data = pred.data
    obs_data = obs.data
    if direct_wave is not None:
        syn_data = syn_data - direct_wave.data
        obs_data = obs_data - direct_wave.data
    fval, residual_data = misfit_func(syn_data, obs_data)

    residual = PointSource(name="rec", time_range=geometry.time_axis,
                           coordinates=geometry.rec_positions,
                           dtype=geometry.model.dtype)
    residual.data[:] = resample(np.asarray(residual_data),
                                geometry.time_axis.time_values,
                                pred.time_values)[:]
    illum, crop_grad = None, None
    if calc_grad:
        grad, _ = solver.jacobian_adjoint(residual, wfd,
                                          vp=geometry.model.vp)
        pads, shp = _pads(geometry.model), geometry.model.shape
        crop_grad = _crop(np.array(grad), pads, shp)
        crop_grad = fix_source_illumination(geometry, crop_grad)
        illum = _crop(np.asarray(
            (wfd.data * wfd.data).sum(axis=0)), pads, shp)
        illum = fix_source_illumination(geometry, illum)
    return fval, crop_grad, residual.data, illum


@partial(jax.jit, static_argnames=("misfit_jax", "misfit_batch",
                                   "calc_grad", "nt",
                                   "spacing", "space_order", "kernel", "fs",
                                   "pads", "shape", "n_checkpoints",
                                   "saved", "save_dtype", "rec_box"))
def _shots_fused(vp, damp, src_wav, s_idx, s_w, r_idx, r_w, obs, dw,
                 src_pos, rec_positions, dt, *, misfit_jax,
                 misfit_batch=None, calc_grad, nt, spacing, space_order,
                 kernel, fs, pads, shape, n_checkpoints, saved=False,
                 save_dtype=None, rec_box=None):
    """All-shot fused objective: one TPU program vmapping the forward and
    gradient sweeps over the shot axis, with the misfit applied at BATCH
    level between them, and reducing on device. Batching shots amortizes
    the per-scan-step dispatch overhead that dominates at 2-D grid sizes
    (measured 7.4x over a python loop of single-shot programs on
    Marmousi: 29 shots in 155 ms vs 1.14 s). ``misfit_batch`` (when the
    misfit provides one, e.g. the batch-native BFM) sees the whole shot
    stack — required for its batch-wide ``lax.cond`` fast path; a
    per-shot vmapped misfit is used otherwise."""
    static = dict(nt=nt, spacing=spacing, space_order=space_order,
                  kernel=kernel, fs=fs)
    mf = misfit_batch if misfit_batch is not None else jax.vmap(misfit_jax)
    if calc_grad and saved:
        # saved-history route (3-D on TPU): forward(save=True) streams
        # the full wavefield to HBM (``save_dtype`` — bf16 by default,
        # halving the stream and doubling the chunk) and the reverse
        # sweep reads it back — 2 sweeps/step instead of the ckpt
        # path's 3, with illumination accumulated from the same reads
        # and the residual injected as a pad-fused static slab
        # (``rec_box``, 3.1x the per-step scatter —
        # tools/bench_3d_fusion.py). The 2-D XLA path keeps ckpt (2-D
        # sweeps are VMEM-fast; the HBM history round-trip loses there
        # — docs/04_performance.md item 6), and 2-D TPU runs the Pallas
        # streamed kernels anyway.
        rec, u_hist = jax.vmap(
            lambda si, sw: _ac.forward(vp, damp, src_wav, si, sw, r_idx,
                                       r_w, dt, save=True,
                                       save_dtype=save_dtype, **static)
        )(s_idx, s_w)
        fvals, res = mf(rec - dw, obs - dw)
        fval = jnp.sum(fvals)

        def grad_one_saved(si, sw, u, r, sp):
            grad, _, ilp = _ac.gradient(vp, damp, u, r, r_idx, r_w, dt,
                                        rec_box=rec_box, with_illum=True,
                                        **static)
            crop = _fix_illum_jax(_crop(grad, pads, shape), sp,
                                  rec_positions, spacing, shape)
            illum = _fix_illum_jax(_crop(ilp, pads, shape), sp,
                                   rec_positions, spacing, shape)
            return crop, illum

        crops, illums = jax.vmap(grad_one_saved)(s_idx, s_w, u_hist, res,
                                                 src_pos)
        return fval, res, jnp.sum(crops, axis=0), jnp.sum(illums, axis=0)
    if calc_grad:
        rec, seg_starts, illum_pad = jax.vmap(
            lambda si, sw: _ac.forward_ckpt(
                vp, damp, src_wav, si, sw, r_idx, r_w, dt,
                n_checkpoints=n_checkpoints, **static))(s_idx, s_w)
    else:
        rec, _ = jax.vmap(
            lambda si, sw: _ac.forward(vp, damp, src_wav, si, sw, r_idx,
                                       r_w, dt, save=False, **static)
        )(s_idx, s_w)
    fvals, res = mf(rec - dw, obs - dw)
    fval = jnp.sum(fvals)
    if not calc_grad:
        return fval, res

    def grad_one(si, sw, segs, r, ilp, sp):
        grad, _ = _ac.gradient_from_ckpt(vp, damp, src_wav, si, sw, segs,
                                         r, r_idx, r_w, dt,
                                         n_checkpoints=n_checkpoints,
                                         **static)
        crop = _fix_illum_jax(_crop(grad, pads, shape), sp, rec_positions,
                              spacing, shape)
        illum = _fix_illum_jax(_crop(ilp, pads, shape), sp, rec_positions,
                               spacing, shape)
        return crop, illum

    crops, illums = jax.vmap(grad_one)(s_idx, s_w, seg_starts, res,
                                       illum_pad, src_pos)
    return fval, res, jnp.sum(crops, axis=0), jnp.sum(illums, axis=0)


def _pallas_cliff_warn(reason):
    """One loud warning per reason when a TPU geometry falls off the
    Pallas fast path onto the ~4x-slower XLA scan path (measured 32 vs 8
    Gcell-steps/s on the Marmousi gradient, docs/04_performance.md)."""
    if reason in _pallas_cliff_warn.seen:
        return
    _pallas_cliff_warn.seen.add(reason)
    import warnings
    warnings.warn(
        f"devito_fwi_tpu: geometry falls off the Pallas fast path "
        f"({reason}); using the ~4x-slower XLA scan kernels. See "
        f"docs/04_performance.md.", stacklevel=3)


_pallas_cliff_warn.seen = set()


def _pallas_z0(geometry):
    """Static receiver z-plane index for the Pallas fast path, or None
    when the geometry/backend is unsupported. Default-ON on TPU; set
    DEVITO_FWI_TPU_PALLAS=0 to force the XLA scan path. Unsupported
    geometries on TPU warn once per reason (the XLA path is ~4x
    slower)."""
    if os.environ.get("DEVITO_FWI_TPU_PALLAS", "1") == "0":
        return None
    from .ops.pallas_acoustic import env_interpret
    if jax.default_backend() != "tpu" and not env_interpret():
        # DEVITO_FWI_TPU_PALLAS_INTERPRET=1 opens the fast path on CPU in
        # interpreter mode (multi-device validation on the virtual mesh)
        return None
    on_tpu = jax.default_backend() == "tpu"
    if jax.config.jax_enable_x64 and not env_interpret():
        # x64 promotion inside the f32 kernels breaks Mosaic tracing
        # (harmless in interpreter mode — no Mosaic involved)
        if on_tpu:
            _pallas_cliff_warn("jax_enable_x64 is on")
        return None
    model = geometry.model
    if model.dtype != np.float32 or model.dim != 2:
        # 3-D geometries are not a cliff here: _pallas3_route owns them
        # (and warns itself if they fall off the streaming kernels)
        if on_tpu and model.dim != 3:
            _pallas_cliff_warn(f"dtype={np.dtype(model.dtype).name}, "
                               f"dim={model.dim}; need float32 2-D")
        return None
    from .ops import pallas_acoustic as _pa
    if not (_pa.available() and _pa.geometry_supported(geometry)):
        if on_tpu:
            _pallas_cliff_warn("receivers not on <=2 z-planes")
        return None
    r_idx, _ = interp_table(geometry.rec_positions, model.origin_pml,
                            model.spacing, dtype=model.dtype)
    return int(np.asarray(r_idx)[..., 1].min())


def _pallas_route(geometry, n_checkpoints, kernel, calc_grad):
    """Shared Pallas fast-path gating for fm_multi and the objective
    paths (this block used to be copy-pasted per call site and had
    started to drift). Returns ``(z0, nck, stream, hist_dtype,
    chunk_cap)``: ``z0 is None`` keeps the geometry on the XLA path;
    ``stream`` selects the streamed-history gradient kernels;
    ``chunk_cap`` (None = unbounded) bounds the shot chunk by the
    streamed history's HBM budget."""
    stream = False
    hist_dtype = "float32"
    chunk_cap = None
    z0 = _pallas_z0(geometry) if kernel == "OT2" else None
    nck = None
    if z0 is not None:
        from .ops.pallas_acoustic import (pick_n_checkpoints,
                                          pick_stream_checkpoints,
                                          stream_max_shots,
                                          stream_hist_dtype)
        nx_p, nz_p = geometry.model.padded_shape
        nck = pick_n_checkpoints(geometry.nt, nx_p, nz_p)
        nck = max(nck, n_checkpoints) if nck is not None else None
        if nck is None:
            z0 = None
        elif calc_grad and \
                os.environ.get("DEVITO_FWI_TPU_STREAM", "1") != "0":
            # streamed-history gradient: 2 stencil sweeps/step instead
            # of 3; the HBM-resident d2u/dt2 history bounds the chunk
            hd = stream_hist_dtype()
            snck = pick_stream_checkpoints(geometry.nt, nx_p, nz_p,
                                           hist_dtype=hd)
            if snck is not None:
                stream = True
                hist_dtype = hd
                nck = max(snck, n_checkpoints)
                chunk_cap = stream_max_shots(geometry.nt, nx_p, nz_p,
                                             hist_dtype=hd)
    return z0, nck, stream, hist_dtype, chunk_cap


def _saved_route(geometry, calc_grad):
    """Saved-history gating for the XLA objective path: 3-D gradients on
    TPU run forward(save=True) + the 2-sweep reverse instead of the
    3-sweep segment recompute — measured 12.1 vs 7.4 Gcell-steps/s on
    the bench 3-D config (tools/bench_3d_variants.py; the per-step
    Pallas leapfrog lost the same A/B and stays opt-in).

    Returns ``(use_saved, chunk_cap, save_dtype, rec_box)``:
    ``chunk_cap`` bounds the live histories to an ~6 GB HBM budget;
    ``save_dtype`` is the history element type (the 2-D kernels'
    ``stream_hist_dtype`` — bf16 by default on TPU, halving the history
    stream and doubling the chunk); ``rec_box`` is the static
    trailing-axis window-start tuple for the pad-fused slab residual
    injection in ``ops.acoustic.gradient`` (3.1x the per-step scatter on
    the reverse sweep, tools/bench_3d_fusion.py), or None when the
    receiver corners don't fit 2-wide windows.
    ``DEVITO_FWI_TPU_SAVED3=0`` opts out."""
    if not calc_grad or geometry.model.dim != 3:
        return False, None, None, None
    if os.environ.get("DEVITO_FWI_TPU_SAVED3", "1") != "1":
        return False, None, None, None
    try:
        if jax.default_backend() != "tpu":
            return False, None, None, None
    except Exception:  # pragma: no cover
        return False, None, None, None
    from .ops.pallas_acoustic import stream_hist_dtype
    save_dtype = stream_hist_dtype()
    itemsize = jnp.dtype(save_dtype).itemsize
    model = geometry.model
    per_shot = geometry.nt * int(np.prod(model.padded_shape)) * itemsize
    # ~6 GB keeps the history chunk + reverse working set well clear of
    # the 16 GB chip; DEVITO_FWI_TPU_SAVED3_BUDGET_GB widens it for
    # batch-scaling A/Bs (the 3-D sweep rate is strongly
    # batch-dependent — docs/04_performance.md)
    budget = int(float(os.environ.get(
        "DEVITO_FWI_TPU_SAVED3_BUDGET_GB", "6")) * (1 << 30))
    if per_shot > budget:
        return False, None, None, None
    # slab-injection gating (the geometry_supported analog): every
    # receiver corner must fit a static 2-wide window in each trailing
    # axis, with the window inside the padded grid.
    # DEVITO_FWI_TPU_SLAB3=0 opts out (per-step scatter fallback).
    box = []
    if os.environ.get("DEVITO_FWI_TPU_SLAB3", "1") == "1":
        r_idx, _ = interp_table(geometry.rec_positions, model.origin_pml,
                                model.spacing, dtype=model.dtype)
        idx = np.asarray(r_idx)
        for d in range(1, model.dim):
            vals = np.unique(idx[..., d])
            lo = int(vals.min())
            if (len(vals) > 2 or vals.max() > lo + 1 or lo < 0
                    or lo + 2 > model.padded_shape[d]):
                box = None
                break
            box.append(lo)
    else:
        box = None
    rec_box = tuple(box) if box is not None else None
    return True, max(1, budget // per_shot), save_dtype, rec_box


def _pallas3_route(geometry, kernel, calc_grad):
    """3-D Pallas streaming-kernel gating (``ops/pallas_acoustic3d``):
    default-ON on TPU for f32 OT2 geometries with one source per shot
    and all receivers between two adjacent z-planes, when the padded
    grid admits a VMEM y-block. ``DEVITO_FWI_TPU_PALLAS3D=0`` opts out.
    Returns ``(info, chunk_cap)`` where ``info`` is ``(z0, R,
    hist_dtype)`` or None (XLA saved-history route)."""
    model = geometry.model
    if model.dim != 3 or kernel != "OT2":
        return None, None
    if os.environ.get("DEVITO_FWI_TPU_PALLAS3D", "1") == "0":
        return None, None
    from .ops.pallas_acoustic import env_interpret, stream_hist_dtype
    if jax.default_backend() != "tpu" and not env_interpret():
        return None, None
    on_tpu = jax.default_backend() == "tpu"
    if jax.config.jax_enable_x64 and not env_interpret():
        if on_tpu:
            _pallas_cliff_warn("jax_enable_x64 is on (3-D)")
        return None, None
    if model.dtype != np.float32:
        if on_tpu:
            _pallas_cliff_warn(f"3-D dtype={np.dtype(model.dtype).name};"
                               " the streaming kernels need float32")
        return None, None
    from .ops import pallas_acoustic3d as _p3d
    if not (_p3d.available() and _p3d.geometry_supported3(geometry)):
        if on_tpu:
            _pallas_cliff_warn(
                "3-D geometry unsupported by the streaming kernels "
                "(receivers must sit between two adjacent z-planes, "
                "sources inside the y grid)")
        return None, None
    hist_dtype = stream_hist_dtype() if calc_grad else "float32"
    nx_p, ny_p, nz_p = model.padded_shape
    R = _p3d.pick_blocks3(ny_p, nz_p, nx_p,
                          jnp.dtype(hist_dtype).itemsize)
    if R is None:
        if on_tpu:
            _pallas_cliff_warn("3-D padded grid too large for the "
                               "streaming kernels' VMEM blocks")
        return None, None
    r_idx, _ = interp_table(geometry.rec_positions, model.origin_pml,
                            model.spacing, dtype=model.dtype)
    z0 = int(np.asarray(r_idx)[..., 2].min())
    cap = _p3d.stream_max_shots3(geometry.nt, ny_p, nz_p, nx_p,
                                 hist_dtype=hist_dtype) \
        if calc_grad else None
    return (z0, R, hist_dtype), cap


def _pallas3_operands(vp, damp, s_idx, s_w, src_wav, dt, nt, R):
    """(m, m3, hd3, injp, iy, wav_pad) for the (ny, nz, nx)-transposed
    3-D streaming kernels; the y axis is padded to whole R-blocks and
    the trailing (z, x) dims to the Mosaic tile (``pad_shape3`` — the
    kernels pin every pad cell to zero each step, preserving the XLA
    zero-fill edge semantics)."""
    from .ops import pallas_acoustic3d as _p3d
    nx, ny, nz = vp.shape
    nyp = -(-ny // R) * R
    nzp, nxp = _p3d.pad_shape3(nz, nx)
    pads = ((0, nyp - ny), (0, nzp - nz), (0, nxp - nx))
    m = 1.0 / (vp * vp)
    m3 = jnp.pad(m.transpose(1, 2, 0), pads, constant_values=1.0)
    hd3 = jnp.pad(jnp.broadcast_to(dt * damp, vp.shape).transpose(1, 2, 0),
                  pads)
    injp, iy = _p3d.source_planes3(s_idx, s_w, m, dt * dt)
    wav_pad = jnp.broadcast_to(src_wav[1:nt - 1, 0],
                               (s_idx.shape[0], nt - 2))
    return m, m3, hd3, injp, iy, wav_pad


@partial(jax.jit, static_argnames=("nt", "spacing", "space_order", "z0",
                                   "R", "dt", "fs"))
def _fm_batch_pallas3(vp, damp, src_wav, s_idx, s_w, r_idx, r_w, dt, *,
                      nt, spacing, space_order, z0, R, fs=False):
    """Pure 3-D forward modeling through the streaming receiver-slab
    kernel (no dt2/illumination writes)."""
    from .ops import pallas_acoustic3d as _p3d
    nx, ny, nz = vp.shape
    m, m3, hd3, injp, iy, wav_pad = _pallas3_operands(
        vp, damp, s_idx, s_w, src_wav, dt, nt, R)
    rec_slab = _p3d.forward_rec3(
        m3, hd3, wav_pad, injp, iy, dt, nt=nt, ny=ny, nz=nz, nx=nx,
        space_order=space_order, spacing=spacing, z0=z0, R=R, fs=fs)
    return _p3d.traces_from_slabs3(rec_slab, r_idx, r_w, m, z0, nt,
                                   nt - 2, vp.dtype)


@partial(jax.jit, static_argnames=("misfit_jax", "misfit_batch",
                                   "calc_grad", "nt", "spacing",
                                   "space_order", "pads", "shape", "z0",
                                   "R", "dt", "fs", "hist_dtype"))
def _shots_fused_pallas3(vp, damp, src_wav, s_idx, s_w, r_idx, r_w, obs,
                         dw, src_pos, rec_positions, dt, *, misfit_jax,
                         misfit_batch=None, calc_grad, nt, spacing,
                         space_order, pads, shape, z0, R, fs=False,
                         hist_dtype="float32"):
    """All-shot fused 3-D objective on the streaming Pallas kernels:
    forward with HBM-streamed d2u/dt2 history, traceable misfit, then
    the reverse-sweep gradient — 2 stencil sweeps per time step, same
    outputs as ``_shots_fused``. Callers bound the shot batch by
    ``stream_max_shots3``."""
    from .ops import pallas_acoustic3d as _p3d
    nx, ny, nz = vp.shape
    nsteps = nt - 2
    m, m3, hd3, injp, iy, wav_pad = _pallas3_operands(
        vp, damp, s_idx, s_w, src_wav, dt, nt, R)
    kw = dict(nt=nt, ny=ny, nz=nz, nx=nx, space_order=space_order,
              spacing=spacing, z0=z0, R=R, fs=fs)
    mf = misfit_batch if misfit_batch is not None else jax.vmap(misfit_jax)
    if not calc_grad:
        rec_slab = _p3d.forward_rec3(m3, hd3, wav_pad, injp, iy, dt, **kw)
        rec = _p3d.traces_from_slabs3(rec_slab, r_idx, r_w, m, z0, nt,
                                      nsteps, vp.dtype)
        fvals, res = mf(rec - dw, obs - dw)
        return jnp.sum(fvals), res
    rec_slab, dt2, illum = _p3d.forward_dt2_stream3(
        m3, hd3, wav_pad, injp, iy, dt, hist_dtype=hist_dtype, **kw)
    rec = _p3d.traces_from_slabs3(rec_slab, r_idx, r_w, m, z0, nt, nsteps,
                                  vp.dtype)
    fvals, res = mf(rec - dw, obs - dw)
    fval = jnp.sum(fvals)
    res_slab = _p3d.residual_slabs3(res, r_idx, r_w, m, dt * dt, z0,
                                    nsteps, m3.shape[0])
    grad = _p3d.gradient_stream3(m3, hd3, dt2, res_slab, dt, **kw)

    def fix(g, il, sp):
        gc = _fix_illum_jax(_crop(g, pads, shape), sp, rec_positions,
                            spacing, shape)
        ic = _fix_illum_jax(_crop(il, pads, shape), sp, rec_positions,
                            spacing, shape)
        return gc, ic

    back = lambda f: f[:, :ny, :nz, :nx].transpose(0, 3, 1, 2)  # noqa: E731
    crops, ilc = jax.vmap(fix)(back(grad), back(illum), src_pos)
    return fval, res, jnp.sum(crops, axis=0), jnp.sum(ilc, axis=0)


def _traces_from_rows(rec_rows, r_idx, r_w, z0, nt, nsteps, dtype):
    """Receiver rows -> traces: rec[1+g] = sum_c w_c * row[g, plane_c,
    x_c]; rows beyond nsteps are layout padding.

    Contracted on the MXU against a small scattered weight matrix
    (2*nx, nrec) — the direct per-point gather costs tens of ms per
    objective at Marmousi scale, the matmul well under one."""
    B = rec_rows.shape[0]
    nx = rec_rows.shape[-1]
    nrec = r_idx.shape[0]
    rows = rec_rows.reshape(B, -1, 2 * nx)[:, :nsteps]
    rxi = r_idx[:, :, 0]
    zc = r_idx[:, :, 1]
    rplane = (zc != z0).astype(jnp.int32)
    # drop OOB corners like the XLA gather's mode='fill' does: an x
    # corner at nx would otherwise alias plane 1, x 0 through the
    # plane*nx fold (interp.py contract: device code drops OOB corners)
    valid = (rxi >= 0) & (rxi < nx) & ((zc == z0) | (zc == z0 + 1))
    rxi = jnp.clip(rxi, 0, nx - 1)
    W = jnp.zeros((2 * nx, nrec), jnp.float32)
    W = W.at[rplane * nx + rxi, jnp.arange(nrec)[:, None]].add(
        jnp.where(valid, r_w, 0.0).astype(jnp.float32))
    # HIGHEST: the DEFAULT matmul precision truncates inputs to bf16 on
    # TPU (and on this stack's CPU lowering) — a 0.4% trace error that a
    # reverberant model amplifies to 3e-3; measured harmless to speed
    # here (the matmul is <1% of an objective)
    tr = jnp.einsum("btq,qr->btr", rows.astype(jnp.float32), W,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    rec = jnp.zeros((B, nt, nrec), dtype)
    return rec.at[:, 1:nsteps + 1].set(tr.astype(dtype))


def _pallas_operands(vp, damp, src_wav, s_idx, s_w, dt, nt, total):
    """(m, mT, hdT, injT, wav_pad) for the transposed segment kernels."""
    from .ops.pallas_acoustic import source_pattern, pad_wavelet
    m = 1.0 / (vp * vp)
    hdT = jnp.broadcast_to(dt * damp, vp.shape).T
    injT = jnp.swapaxes(source_pattern(s_idx, s_w, m, dt * dt), -1, -2)
    wav_pad = pad_wavelet(src_wav, nt, total, vp.dtype)
    return m, m.T, hdT, injT, wav_pad


@partial(jax.jit, static_argnames=("nt", "spacing", "space_order",
                                   "n_checkpoints", "z0", "dt", "fs"))
def _fm_batch_pallas(vp, damp, src_wav, s_idx, s_w, r_idx, r_w, dt, *, nt,
                     spacing, space_order, n_checkpoints, z0, fs=False):
    """Pure forward modeling through the receiver-rows-only segment
    kernel (no dead checkpoint/illumination writes)."""
    from .ops import pallas_acoustic as _pa
    from .ops.acoustic import _ckpt_layout

    nx, nz = vp.shape
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    _, mT, hdT, injT, wav_pad = _pallas_operands(
        vp, damp, src_wav, s_idx, s_w, dt, nt, nseg * seg)
    rec_rows = _pa.forward_rec_segments(
        mT, hdT, wav_pad, injT, dt, nt=nt, nx=nx, nz=nz,
        space_order=space_order, spacing=spacing, z0=z0,
        n_checkpoints=n_checkpoints, fs=fs)
    return _traces_from_rows(rec_rows, r_idx, r_w, z0, nt, nsteps,
                             vp.dtype)


@partial(jax.jit, static_argnames=("misfit_jax", "misfit_batch",
                                   "calc_grad", "nt",
                                   "spacing", "space_order", "pads", "shape",
                                   "n_checkpoints", "z0", "dt", "fs",
                                   "stream", "hist_dtype"))
def _shots_fused_pallas(vp, damp, src_wav, s_idx, s_w, r_idx, r_w, obs, dw,
                        src_pos, rec_positions, dt, *, misfit_jax,
                        misfit_batch=None, calc_grad, nt, spacing,
                        space_order, pads, shape,
                        n_checkpoints, z0, fs=False, stream=False,
                        hist_dtype="float32"):
    """All-shot fused objective on the Pallas VMEM-resident kernels:
    segment-checkpointed forward (receiver rows + seg starts + illum in
    one sweep), traceable misfit, then the reverse-sweep gradient kernel.
    Same outputs as ``_shots_fused``; measured ~2x the XLA scan path on
    the Marmousi bench (the reverse sweep keeps the recomputed d2u/dt2
    history in VMEM instead of round-tripping HBM).

    With ``stream=True`` the forward kernel streams the d2u/dt2 history
    to HBM and the reverse sweep skips the forward recompute — 2 stencil
    sweeps per step instead of 3, same-arithmetic gradients. Callers
    must bound the shot batch by ``stream_max_shots`` (the history is
    ~nsteps x field bytes per shot)."""
    statics = dict(nt=nt, spacing=spacing, space_order=space_order,
                   n_checkpoints=n_checkpoints, z0=z0, fs=fs)
    mf = misfit_batch if misfit_batch is not None else jax.vmap(misfit_jax)

    if not calc_grad:
        # line-search trials: receiver-rows-only kernel (no checkpoint /
        # illumination writes)
        rec, _, _ = _pallas_fwd_core(vp, damp, src_wav, s_idx, s_w, r_idx,
                                     r_w, dt, calc_grad=False,
                                     stream=False, **statics)
        fvals, res = mf(rec - dw, obs - dw)
        return jnp.sum(fvals), res

    rec, hist, illumT = _pallas_fwd_core(
        vp, damp, src_wav, s_idx, s_w, r_idx, r_w, dt, calc_grad=True,
        stream=stream, hist_dtype=hist_dtype, **statics)
    fvals, res = mf(rec - dw, obs - dw)
    fval = jnp.sum(fvals)
    crop, ilc = _pallas_grad_core(
        vp, damp, src_wav, s_idx, s_w, hist, res, r_idx, r_w, illumT,
        src_pos, rec_positions, dt, stream=stream, pads=pads, shape=shape,
        **statics)
    return fval, res, jnp.sum(crop, axis=0), jnp.sum(ilc, axis=0)


def _pallas_fwd_core(vp, damp, src_wav, s_idx, s_w, r_idx, r_w, dt, *,
                     calc_grad, stream, nt, spacing, space_order,
                     n_checkpoints, z0, fs, hist_dtype="float32"):
    """Traced forward core shared by the fused, host-misfit and sharded
    objectives. Returns (rec, hist, illumT): ``hist`` is the streamed dt2
    history (stream=True, stays on device between the forward and the
    reverse call) or the segment-start checkpoints; both are None for
    the receiver-rows-only calc_grad=False path."""
    from .ops import pallas_acoustic as _pa
    from .ops.acoustic import _ckpt_layout

    nx, nz = vp.shape
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    if not calc_grad:
        rec = _fm_batch_pallas(vp, damp, src_wav, s_idx, s_w, r_idx, r_w,
                               dt, nt=nt, spacing=spacing,
                               space_order=space_order,
                               n_checkpoints=n_checkpoints, z0=z0, fs=fs)
        return rec, None, None
    _, mT, hdT, injT, wav_pad = _pallas_operands(
        vp, damp, src_wav, s_idx, s_w, dt, nt, nseg * seg)
    if stream:
        rec_rows, hist, illumT = _pa.forward_dt2_segments(
            mT, hdT, wav_pad, injT, dt, nt=nt, nx=nx, nz=nz,
            space_order=space_order, spacing=spacing, z0=z0,
            n_checkpoints=n_checkpoints, fs=fs, hist_dtype=hist_dtype)
    else:
        rec_rows, hist, illumT = _pa.forward_ckpt_segments(
            mT, hdT, wav_pad, injT, dt, nt=nt, nx=nx, nz=nz,
            space_order=space_order, spacing=spacing, z0=z0,
            n_checkpoints=n_checkpoints, fs=fs)
    rec = _traces_from_rows(rec_rows, r_idx, r_w, z0, nt, nsteps, vp.dtype)
    return rec, hist, illumT


def _pallas_grad_core(vp, damp, src_wav, s_idx, s_w, hist, res_stack,
                      r_idx, r_w, illumT, src_pos, rec_pos, dt, *, stream,
                      nt, spacing, space_order, n_checkpoints, z0, fs,
                      pads, shape):
    """Traced reverse-sweep core shared by the fused, host-misfit and
    sharded objectives: gradient kernel + per-shot crop and illumination
    fix. Returns the PER-SHOT (crop, illum) stacks — callers reduce
    (plain sums here, validity-weighted psums in the sharded path)."""
    from .ops import pallas_acoustic as _pa
    from .ops.acoustic import _ckpt_layout

    nx, nz = vp.shape
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    m, mT, hdT, injT, wav_pad = _pallas_operands(
        vp, damp, src_wav, s_idx, s_w, dt, nt, nseg * seg)
    rows = _pa.residual_rows(res_stack, r_idx, r_w, m, dt * dt, z0,
                             nsteps, seg, nseg)
    if stream:
        gradT = _pa.gradient_stream_segments(
            mT, hdT, hist, rows, dt, nt=nt, nx=nx, nz=nz,
            space_order=space_order, spacing=spacing, z0=z0,
            n_checkpoints=n_checkpoints, fs=fs)
    else:
        gradT = _pa.gradient_segments(
            mT, hdT, wav_pad, injT, hist, rows, dt, nt=nt, nx=nx, nz=nz,
            space_order=space_order, spacing=spacing, z0=z0,
            n_checkpoints=n_checkpoints, fs=fs)
    grad = jnp.swapaxes(gradT, -1, -2)
    illum = jnp.swapaxes(illumT, -1, -2)

    def fix(g, sp):
        return _fix_illum_jax(_crop(g, pads, shape), sp, rec_pos,
                              spacing, shape)

    crop = jax.vmap(fix)(grad, src_pos)
    ilc = jax.vmap(fix)(illum, src_pos)
    return crop, ilc


_pallas_fwd_host = partial(jax.jit, static_argnames=(
    "calc_grad", "stream", "nt", "spacing", "space_order",
    "n_checkpoints", "z0", "dt", "fs", "hist_dtype"))(_pallas_fwd_core)


@partial(jax.jit, static_argnames=("stream", "nt", "spacing", "space_order",
                                   "n_checkpoints", "z0", "dt", "fs",
                                   "pads", "shape"))
def _pallas_grad_host(vp, damp, src_wav, s_idx, s_w, hist, res_stack,
                      r_idx, r_w, illumT, src_pos, rec_pos, dt, *, stream,
                      nt, spacing, space_order, n_checkpoints, z0, fs,
                      pads, shape):
    """Jitted host-misfit entry over ``_pallas_grad_core`` (summed)."""
    crop, ilc = _pallas_grad_core(
        vp, damp, src_wav, s_idx, s_w, hist, res_stack, r_idx, r_w,
        illumT, src_pos, rec_pos, dt, stream=stream, nt=nt,
        spacing=spacing, space_order=space_order,
        n_checkpoints=n_checkpoints, z0=z0, fs=fs, pads=pads, shape=shape)
    return jnp.sum(crop, axis=0), jnp.sum(ilc, axis=0)


@jax.jit
def _sum_scalars(x):
    return jnp.sum(x)


@jax.jit
def _sum_fields(g, il):
    return jnp.sum(g, axis=0), jnp.sum(il, axis=0)


def _default_checkpoints(nt):
    """sqrt(nt) segments: nseg*2 + seg*3 wavefield slices live at once."""
    return max(4, int(np.sqrt(max(nt - 2, 1))))


@partial(jax.jit, static_argnames=("pads",))
def _pad_edge_device(v, pads):
    """Edge-replicate a PHYSICAL-domain parameter into the absorbing
    halo on device — ships ~1/3 of the padded bytes per objective call
    through the slow host->device link (the 3-D bench's padded vp is
    3.5 MB vs 1 MB cropped; measured ~90 ms/call on the axon tunnel).
    Callers guard with an exact host-side pad_edge equality check so
    the padded field is bit-identical to the model's."""
    return jnp.pad(v, pads, mode="edge")


def _model_vp_device(model):
    """model.vp as a device array, shipping only the physical domain
    when the padded field is an exact edge replication of it (always
    true for pad_edge-built models; the guard keeps arbitrary
    user-edited padded fields bit-exact)."""
    vp_host = np.asarray(model.vp)
    pads = _pads(model)
    crop_v = _crop(vp_host, pads, model.shape)
    if np.array_equal(vp_host, np.pad(crop_v, [tuple(p) for p in pads],
                                      mode="edge")):
        return _pad_edge_device(jnp.asarray(crop_v), pads)
    return jnp.asarray(vp_host)


@partial(jax.jit, static_argnames=("precond", "with_mask"))
def _finalize_grad_device(g, il, mask, *, precond, with_mask):
    """Illumination precondition + bathy mask on DEVICE (reference
    ``fwi.py:200-204``), so the objective fetches ONE field instead of
    (grad, illum) — halves the device->host bytes per gradient call."""
    if precond:
        g = g / jnp.sqrt(il + 1e-30)
    if with_mask:
        g = g * mask
    return g


_MASK_DEVICE_CACHE = {}


def _mask_device(mask):
    """Upload the gradient mask once per inversion, revalidated by a
    content digest so in-place edits (e.g. a time-varying water-bottom
    mask reusing one ndarray) are seen — id()-only caching would
    silently keep applying the stale copy. The digest is crc32 of the
    bytes (a real checksum, not Python's process-randomized hash):
    sub-ms even at 3-D grid sizes, vs a ~50 ms tunnel upload."""
    import zlib
    key = id(mask)
    buf = np.ascontiguousarray(np.asarray(mask))
    digest = zlib.crc32(buf.view(np.uint8).reshape(-1))
    entry = _MASK_DEVICE_CACHE.get(key)
    if entry is not None and entry[0] is mask and entry[1] == digest:
        return entry[2]
    dev = jnp.asarray(mask)
    while len(_MASK_DEVICE_CACHE) >= 8:
        del _MASK_DEVICE_CACHE[next(iter(_MASK_DEVICE_CACHE))]
    _MASK_DEVICE_CACHE[key] = (mask, digest, dev)
    return dev


def _shot_objective_batched(geometry, obs_stack, misfit_jax, dw_stack,
                            calc_grad, shot_chunk=32, misfit_batch=None,
                            shot_indices=None):
    """Multi-shot objective: chunked vmap of the fused single-shot body —
    one TPU program per (at most two) chunk shapes, with on-device
    reductions and a single device->host transfer.
    Returns (fval, grad_sum, illum_sum, residuals).

    ``shot_indices`` (int array) restricts the evaluation to a shot
    subset via DEVICE-side gathers of the cached per-shot operands —
    the random-batch FWI path (Hu et al., arXiv:2110.06455): the full
    obs/table uploads happen once, and each iteration ships only a tiny
    index vector."""
    model = geometry.model
    cached = _geom_device(geometry)
    s_idx, s_w = cached["s_idx"], cached["s_w"]
    r_idx, r_w = cached["r_idx"], cached["r_w"]
    src_wav = cached["src_wav"]
    damp = cached["damp"]
    vp = _model_vp_device(model)
    dt = _solver_dt(geometry)
    statics = dict(misfit_jax=misfit_jax, misfit_batch=misfit_batch,
                   calc_grad=calc_grad,
                   nt=geometry.nt, spacing=model.spacing,
                   space_order=model.space_order, kernel="OT2", fs=model.fs,
                   pads=_pads(model), shape=model.shape,
                   n_checkpoints=_default_checkpoints(geometry.nt))

    nsrc = geometry.nsrc
    src_pos_all = cached["src_pos"]
    rec_positions = cached["rec_pos"]
    # dw_stack is (nsrc, nt, nrec) or (nsrc, 1, 1) zeros — either
    # broadcasts against the receiver gather inside the vmapped body
    dw_full = dw_stack
    if shot_indices is not None:
        sel = jnp.asarray(np.asarray(shot_indices, dtype=np.int32))
        nsrc = int(sel.shape[0])
        s_idx, s_w = s_idx[sel], s_w[sel]
        src_pos_all = src_pos_all[sel]
        obs_stack = obs_stack[sel]
        if dw_full.shape[0] > 1:
            dw_full = dw_full[sel]

    # Pallas VMEM-resident fast path (default-on on TPU for supported
    # geometries: 2-D f32 OT2, receivers on two z-planes; fs supported)
    z0, pallas_nck, stream, hist_dtype, cap = _pallas_route(
        geometry, statics["n_checkpoints"], statics["kernel"], calc_grad)
    p3 = None
    if z0 is None:
        # 3-D route order (one-process A/B, tools/bench_3d_saved_ab.py,
        # 96^3 bench config): saved-history with pad-fused slab
        # injection + bf16 history + fused illum 0.264 s < 3-D Pallas
        # streaming kernels 0.291 s < saved with per-step scatter
        # 0.309 s. Gradients therefore prefer the slab-saved route when
        # the receiver box applies; Pallas owns calc_grad=False
        # (streaming forward) and slab-less gradient geometries.
        saved, saved_cap, save_dtype, rec_box = _saved_route(
            geometry, calc_grad)
        if saved and rec_box is not None:
            statics["saved"] = True
            statics["save_dtype"] = save_dtype
            statics["rec_box"] = rec_box
            if saved_cap is not None:
                cap = saved_cap if cap is None else min(cap, saved_cap)
        else:
            p3, p3_cap = _pallas3_route(geometry, statics["kernel"],
                                        calc_grad)
            if p3 is not None:
                if p3_cap is not None:
                    cap = p3_cap if cap is None else min(cap, p3_cap)
            else:
                statics["saved"] = saved
                if saved:
                    statics["save_dtype"] = save_dtype
                    statics["rec_box"] = rec_box
                if saved_cap is not None:
                    cap = saved_cap if cap is None else min(cap, saved_cap)
    chunk = min(nsrc, shot_chunk or nsrc)
    if cap is not None:
        chunk = min(chunk, cap)
    if misfit_batch is not None:
        # the batch-native BFM's HLO temporaries (blocked Legendre
        # scratch + subsample stacks) cost ~400 MB/shot at Marmousi
        # gather size (measured from OOM allocation dumps) and are live
        # while the dt2 history sits in HBM — budget both together.
        # The misfit runs in objective-only (line-search) calls and on
        # the XLA fallback path too, so the cap must not be gated on
        # calc_grad or the Pallas route (hist_ps is 0 when no history
        # streams)
        from .ops.pallas_acoustic import _padded_field_bytes
        import jax.numpy as _jnp
        nrec = geometry.rec_positions.shape[0]
        misfit_ps = 300 * geometry.nt * nrec * 4
        # stream is only ever True for the 2-D Pallas route, so the
        # 2-tuple unpack is safe here (a 3-D model never streams)
        hist_ps = (geometry.nt - 2) * _padded_field_bytes(
            *model.padded_shape, _jnp.dtype(hist_dtype).itemsize) \
            if stream else 0
        chunk = min(chunk,
                    max(1, int((10 << 30) // (hist_ps + misfit_ps))))
    fvals, residuals = [], []
    grads, illums = [], []
    for lo in range(0, nsrc, chunk):
        hi = min(lo + chunk, nsrc)
        if z0 is not None:
            out = _shots_fused_pallas(
                vp, damp, src_wav, s_idx[lo:hi], s_w[lo:hi], r_idx, r_w,
                obs_stack[lo:hi], dw_full[lo:hi], src_pos_all[lo:hi],
                rec_positions, float(dt), misfit_jax=statics["misfit_jax"],
                misfit_batch=statics["misfit_batch"],
                calc_grad=calc_grad, nt=statics["nt"],
                spacing=statics["spacing"],
                space_order=statics["space_order"], pads=statics["pads"],
                shape=statics["shape"],
                n_checkpoints=pallas_nck, z0=z0, fs=statics["fs"],
                stream=stream, hist_dtype=hist_dtype)
        elif p3 is not None:
            out = _shots_fused_pallas3(
                vp, damp, src_wav,
                s_idx[lo:hi], s_w[lo:hi], r_idx, r_w,
                obs_stack[lo:hi], dw_full[lo:hi], src_pos_all[lo:hi],
                rec_positions, float(dt), misfit_jax=statics["misfit_jax"],
                misfit_batch=statics["misfit_batch"],
                calc_grad=calc_grad, nt=statics["nt"],
                spacing=statics["spacing"],
                space_order=statics["space_order"], pads=statics["pads"],
                shape=statics["shape"], z0=p3[0], R=p3[1],
                fs=statics["fs"], hist_dtype=p3[2])
        else:
            out = _shots_fused(vp, damp, src_wav, s_idx[lo:hi],
                               s_w[lo:hi], r_idx, r_w, obs_stack[lo:hi],
                               dw_full[lo:hi], src_pos_all[lo:hi],
                               rec_positions, dt, **statics)
        fvals.append(out[0])
        residuals.append(out[1])
        if calc_grad:
            grads.append(out[2])
            illums.append(out[3])
    # keep the chunk sums ON DEVICE: the caller finalizes (precond,
    # mask) there and fetches one field — per-chunk device_gets through
    # the ~26 ms tunnel were a measured ~35% of the small-3-D objective
    residuals = ResidualStack(residuals)
    if calc_grad:
        f_d = _sum_scalars(jnp.stack(fvals))
        g_d, il_d = _sum_fields(jnp.stack(grads), jnp.stack(illums))
        return f_d, g_d, il_d, residuals
    fval = float(_sum_scalars(jnp.stack(fvals)))
    grad = np.zeros(model.shape, dtype=np.float64)
    illum = np.zeros(model.shape, dtype=np.float64)
    return fval, grad, illum, residuals


class ResidualStack:
    """Lazy list-like view of the per-shot residual gathers. The stacked
    array stays on device; splitting it into 29 per-shot arrays eagerly
    would pay one tunnel dispatch per shot (~0.5 s/objective call). The
    host copy happens once, only if a caller actually indexes it (e.g.
    minimize.save_residual every save_res_freq iterations)."""

    def __init__(self, stacks):
        self._stacks = list(stacks)  # list of (chunk, nt, nrec) arrays
        self._host = None

    def _materialize(self):
        if self._host is None:
            self._host = np.concatenate([np.asarray(s) for s in self._stacks])
        return self._host

    def __len__(self):
        return sum(int(s.shape[0]) for s in self._stacks)

    def __getitem__(self, i):
        return self._materialize()[i]

    def __iter__(self):
        return iter(self._materialize())


_DEVICE_STACK_CACHE = {}
_GEOM_DEVICE_CACHE = {}


def invalidate_device_caches():
    """Drop all cached device uploads (geometry tables, obs/direct-wave
    stacks). Call after mutating obs[i].data in place."""
    _GEOM_DEVICE_CACHE.clear()
    _DEVICE_STACK_CACHE.clear()


def _geom_fingerprint(geometry):
    """Content fingerprint of the geometry fields that feed the device
    tables: positions, time axis, and everything that shapes the source
    wavelet (src_type/f0/a/t0w, custom src_data, the Filter's settings —
    a multiscale loop that swaps geometry._filter between bands must not
    be served the previous band's cached wavelet). All fields are tiny,
    so hashing per call is cheap and catches both in-place edits and
    id() reuse after GC."""
    filt = geometry._filter
    filt_fp = None if filt is None else         (type(filt).__name__, repr(sorted(vars(filt).items())
                                   if hasattr(filt, "__dict__") else filt))
    src_data = getattr(geometry, "_src_data", None)
    src_fp = None if src_data is None else         hash(np.ascontiguousarray(src_data).tobytes())
    return (geometry.nsrc, geometry.nt, geometry.f0, geometry.src_type,
            geometry._a, geometry._t0w, filt_fp, src_fp, geometry.dt,
            hash(np.ascontiguousarray(geometry.src_positions).tobytes()),
            hash(np.ascontiguousarray(geometry.rec_positions).tobytes()))


def _geom_device(geometry):
    """Cache the per-geometry constant device operands: each host->device
    put is a ~50 ms round trip over the TPU tunnel, and an objective call
    needs ~8 of them — only vp changes between iterations. Entries retain
    a strong reference to the geometry (bounded: cache capped at 8) so a
    recycled id() can never alias a freed object, and are revalidated
    against a content fingerprint so in-place position edits are seen."""
    model = geometry.model
    key = id(geometry)
    fp = _geom_fingerprint(geometry)
    entry = _GEOM_DEVICE_CACHE.get(key)
    if entry is not None and entry[0] is geometry and entry[1] == fp:
        return entry[2]
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    cached = dict(
        s_idx=jnp.asarray(s_idx), s_w=jnp.asarray(s_w),
        r_idx=jnp.asarray(r_idx), r_w=jnp.asarray(r_w),
        src_wav=jnp.asarray(src_wav),
        damp=jnp.asarray(model.damp)
        if isinstance(model.damp, np.ndarray) else model.dtype(0.0),
        src_pos=jnp.asarray(geometry.src_positions),
        rec_pos=jnp.asarray(geometry.rec_positions))
    while len(_GEOM_DEVICE_CACHE) >= 8:
        # evict the oldest entry only — clearing everything would force
        # a full re-upload (~8 x 50 ms tunnel round trips) of every hot
        # geometry in workflows cycling among many of them
        del _GEOM_DEVICE_CACHE[next(iter(_GEOM_DEVICE_CACHE))]
    _GEOM_DEVICE_CACHE[key] = (geometry, fp, cached)
    return cached


def _device_stack(objs):
    """Upload a list of shot records once and reuse the device copy across
    objective calls (obs/direct-wave data is constant through an inversion;
    host->device transfers over the TPU tunnel are expensive). Entries
    retain strong references to the records, so a recycled id() cannot
    alias freed objects. The gathers themselves are large, so they are not
    content-hashed: do not mutate obs[i].data in place between objective
    calls — build new PointSources or call invalidate_device_caches()."""
    key = tuple(id(o) for o in objs)
    entry = _DEVICE_STACK_CACHE.get(key)
    if entry is not None and all(a is b for a, b in zip(entry[0], objs)):
        return entry[1]
    st = jnp.stack([jnp.asarray(o.data) for o in objs])
    while len(_DEVICE_STACK_CACHE) >= 8:
        del _DEVICE_STACK_CACHE[next(iter(_DEVICE_STACK_CACHE))]
    _DEVICE_STACK_CACHE[key] = (tuple(objs), st)
    return st


@partial(jax.jit, static_argnames=("calc_grad", "nt", "spacing",
                                   "space_order", "kernel", "fs",
                                   "n_checkpoints"))
def _fwd_batch_ckpt(vp, damp, src_wav, s_idx, s_w, r_idx, r_w, dt, *,
                    calc_grad, nt, spacing, space_order, kernel, fs,
                    n_checkpoints):
    static = dict(nt=nt, spacing=spacing, space_order=space_order,
                  kernel=kernel, fs=fs)
    if calc_grad:
        return jax.vmap(lambda a, b: _ac.forward_ckpt(
            vp, damp, src_wav, a, b, r_idx, r_w, dt,
            n_checkpoints=n_checkpoints, **static))(s_idx, s_w)
    recs, _ = jax.vmap(lambda a, b: _ac.forward(
        vp, damp, src_wav, a, b, r_idx, r_w, dt, save=False,
        **static))(s_idx, s_w)
    return recs, None, None


@partial(jax.jit, static_argnames=("nt", "spacing", "space_order", "kernel",
                                   "fs", "pads", "shape", "n_checkpoints"))
def _grad_batch_from_res(vp, damp, src_wav, s_idx, s_w, seg_starts,
                         res_stack, r_idx, r_w, illum_pad, src_pos, rec_pos,
                         dt, *, nt, spacing, space_order, kernel, fs, pads,
                         shape, n_checkpoints):
    static = dict(nt=nt, spacing=spacing, space_order=space_order,
                  kernel=kernel, fs=fs)

    def per(si, sw, sg, r, il, sp):
        g, _ = _ac.gradient_from_ckpt(vp, damp, src_wav, si, sw, sg, r,
                                      r_idx, r_w, dt,
                                      n_checkpoints=n_checkpoints, **static)
        crop = _fix_illum_jax(_crop(g, pads, shape), sp, rec_pos, spacing,
                              shape)
        il_c = _fix_illum_jax(_crop(il, pads, shape), sp, rec_pos, spacing,
                              shape)
        return crop, il_c

    g, il = jax.vmap(per)(s_idx, s_w, seg_starts, res_stack, illum_pad,
                          src_pos)
    return jnp.sum(g, axis=0), jnp.sum(il, axis=0)


def _host_misfit_batch(misfit_func, syn_batch, obs_batch):
    """Evaluate a host misfit over a (chunk, nt, nrec) batch. Uses the
    misfit's vectorized `batch` entry point when it has one (the native
    BFM's OpenMP batch, the mpibfm2d analog); falls back to a per-shot
    python loop otherwise."""
    batch_fn = getattr(misfit_func, "batch", None)
    if batch_fn is not None:
        losses, res = batch_fn(syn_batch, obs_batch)
        return [float(l) for l in losses], list(res)
    fvals, residuals = [], []
    for syn, ob in zip(syn_batch, obs_batch):
        f_i, res_i = misfit_func(syn, ob)
        fvals.append(float(f_i))
        residuals.append(np.asarray(res_i))
    return fvals, residuals


def _host_misfit_chunk(geometry, rec_host, obs, misfit_func, direct_wave,
                       resample_dt, lo, hi):
    """Host-side misfit for shots [lo, hi): direct-wave subtraction +
    optional trace resampling + (batched) misfit. `rec_host` holds the
    synthetic gathers for the chunk (hi-lo, nt, nrec). Returns
    (fval_sum, [residuals at geometry dt])."""
    model = geometry.model
    tvals = geometry.time_axis.time_values
    syn_b, obs_b = [], []
    t_m = tvals
    for i in range(lo, hi):
        syn = rec_host[i - lo]
        ob = np.asarray(obs[i].data)
        t_m = tvals
        if resample_dt is not None and \
                not np.isclose(resample_dt, geometry.dt):
            n_new = int(round((tvals[-1] - tvals[0]) / resample_dt)) + 1
            t_m = np.linspace(tvals[0], tvals[0]
                              + (n_new - 1) * resample_dt, n_new)
            syn = resample(syn, t_m, tvals)
            ob = resample(ob, t_m, tvals)
        if direct_wave is not None:
            dw = np.asarray(direct_wave[i].data)
            if t_m is not tvals:
                dw = resample(dw, t_m, tvals)
            syn = syn - dw
            ob = ob - dw
        syn_b.append(syn)
        obs_b.append(ob)
    fvals_c, res_c = _host_misfit_batch(misfit_func, np.stack(syn_b),
                                        np.stack(obs_b))
    residuals = []
    for res_i in res_c:
        res_i = np.asarray(res_i)
        if t_m is not tvals:
            res_i = resample(res_i, tvals, t_m)
        residuals.append(res_i.astype(model.dtype))
    return sum(fvals_c), residuals


def _shot_objective_host_misfit(geometry, obs, misfit_func, direct_wave,
                                calc_grad, resample_dt, shot_chunk=32):
    """Objective for host-side misfits (custom numpy callables, the native
    C++ BFM, trace resampling): the propagation stays device-batched; only
    the gathers make one round trip to the host for the misfit. Shots run
    in chunks of `shot_chunk` so the checkpoint buffer
    (chunk x n_checkpoints x 2 x grid) stays bounded for large surveys."""
    model = geometry.model
    c = _geom_device(geometry)
    vp = _model_vp_device(model)
    dt = _solver_dt(geometry)
    statics = dict(nt=geometry.nt, spacing=model.spacing,
                   space_order=model.space_order, kernel="OT2", fs=model.fs,
                   n_checkpoints=_default_checkpoints(geometry.nt))

    nsrc = geometry.nsrc
    chunk = min(nsrc, shot_chunk or nsrc)

    # Pallas fast path (same gating as _shot_objective_batched): the
    # propagation sweeps run in the VMEM segment kernels; only the
    # gathers/residuals cross the host boundary for the misfit
    z0, pallas_nck, stream, hist_dtype, cap = _pallas_route(
        geometry, statics["n_checkpoints"], statics["kernel"], calc_grad)
    if cap is not None:
        chunk = min(chunk, cap)

    pallas_statics = dict(nt=statics["nt"], spacing=statics["spacing"],
                          space_order=statics["space_order"],
                          n_checkpoints=pallas_nck, z0=z0,
                          fs=statics["fs"]) if z0 is not None else None

    fval = 0.0
    residuals = []
    grad = np.zeros(model.shape, dtype=np.float64)
    illum = np.zeros(model.shape, dtype=np.float64)
    for lo in range(0, nsrc, chunk):
        hi = min(lo + chunk, nsrc)
        if z0 is not None:
            recs, hist, illum_t = _pallas_fwd_host(
                vp, c["damp"], c["src_wav"], c["s_idx"][lo:hi],
                c["s_w"][lo:hi], c["r_idx"], c["r_w"], float(dt),
                calc_grad=calc_grad, stream=stream,
                hist_dtype=hist_dtype, **pallas_statics)
        else:
            recs, seg_starts, illum_pad = _fwd_batch_ckpt(
                vp, c["damp"], c["src_wav"], c["s_idx"][lo:hi],
                c["s_w"][lo:hi], c["r_idx"], c["r_w"], dt,
                calc_grad=calc_grad, **statics)
        rec_host = np.asarray(recs)

        fval_c, res_chunk = _host_misfit_chunk(
            geometry, rec_host, obs, misfit_func, direct_wave, resample_dt,
            lo, hi)
        fval += fval_c
        residuals.extend(res_chunk)

        if calc_grad:
            res_stack = jnp.asarray(np.stack(residuals[lo:hi]))
            if z0 is not None:
                g, il = _pallas_grad_host(
                    vp, c["damp"], c["src_wav"], c["s_idx"][lo:hi],
                    c["s_w"][lo:hi], hist, res_stack, c["r_idx"],
                    c["r_w"], illum_t, c["src_pos"][lo:hi], c["rec_pos"],
                    float(dt), stream=stream, pads=_pads(model),
                    shape=model.shape, **pallas_statics)
            else:
                g, il = _grad_batch_from_res(
                    vp, c["damp"], c["src_wav"], c["s_idx"][lo:hi],
                    c["s_w"][lo:hi], seg_starts, res_stack, c["r_idx"],
                    c["r_w"], illum_pad, c["src_pos"][lo:hi], c["rec_pos"],
                    dt, pads=_pads(model), shape=model.shape, **statics)
            grad += np.asarray(g, dtype=np.float64)
            illum += np.asarray(il, dtype=np.float64)
        # keep at most ONE streamed dt2 history alive (CLAUDE.md): drop
        # this chunk's device buffers NOW — rebinding at the next
        # iteration's forward call would only release them after that
        # forward has already allocated the next history (two ~8 GB
        # histories OOM the 16 GB chip)
        if z0 is not None:
            recs = hist = illum_t = None
        else:
            recs = seg_starts = illum_pad = None
    return fval, grad, illum, residuals


def fwi_obj_multi(geometry, obs, misfit_func, direct_wave=None, mask=None,
                  precond=True, calc_grad=False, resample_dt=None,
                  shot_chunk=32, shot_indices=None):
    """Multi-shot objective/gradient (reference ``fwi.py:175-205``).

    ``shot_indices`` (optional int sequence) evaluates only that shot
    subset — the random-batch FWI hook (``minimize(batch_size=...)``).
    On the fused device path the subset is gathered ON DEVICE from the
    cached full stacks, so per-iteration resampling costs one small
    index upload, not a re-upload of the gathers."""
    misfit_jax = None if resample_dt not in (None, geometry.dt) \
        else _misfit_jax(misfit_func)
    misfit_batch = None
    if getattr(misfit_func, "method", None) == "2d" and \
            getattr(misfit_func, "bfm_backend", None) == "native":
        # the native BFM runs on the host (pure_callback is unsupported on
        # some TPU runtimes); use the batched host-misfit path
        misfit_jax = None
    elif getattr(misfit_func, "method", None) == "2d":
        misfit_batch = getattr(misfit_func, "jax_batch", None)
        if misfit_batch is not None:
            # static-arg safety: key the trace cache on the misfit's
            # config values, not the instance (see _TraceableMisfit)
            misfit_batch = _TraceableMisfit(misfit_batch)
        if misfit_batch is None:
            # the BFM's scatter-heavy pushforward faults the TPU worker
            # at large vmap widths; chunk the fused program conservatively
            # (the batch-native BFM has no such scatter and runs the
            # full shot stack)
            shot_chunk = min(shot_chunk or 8, 8)

    if misfit_jax is not None:
        obs_stack = _device_stack(obs)
        if obs_stack.shape[1] != geometry.nt:
            # e.g. obs modeled on a geometry with a different critical
            # dt; the per-trace misfits would quietly mis-pair samples
            raise ValueError(
                "observed data has %d time samples but the geometry's "
                "time axis has %d — resample the traces or rebuild the "
                "geometry with a matching dt" %
                (obs_stack.shape[1], geometry.nt))
        if direct_wave is not None:
            dw_stack = _device_stack(direct_wave)
        else:
            dw_stack = jnp.zeros_like(obs_stack[:, :1, :1])
        fval, grad, illum, residuals = _shot_objective_batched(
            geometry, obs_stack, misfit_jax, dw_stack, calc_grad,
            shot_chunk, misfit_batch, shot_indices=shot_indices)
        if calc_grad:
            # device-side finalize + ONE device_get of (fval, grad)
            mask_dev = _mask_device(mask) if mask is not None else \
                jnp.zeros((), grad.dtype)
            g_final = _finalize_grad_device(grad, illum, mask_dev,
                                            precond=bool(precond),
                                            with_mask=mask is not None)
            f_h, g_h = jax.device_get((fval, g_final))
            return (float(f_h),
                    np.asarray(g_h).reshape(-1).astype(np.float64),
                    residuals)
    else:
        # host-misfit path (custom numpy misfits, native BFM, resampling):
        # device-batched propagation with a single gather round trip.
        # Shot subsets select on the host here (the gathers cross the
        # host boundary anyway).
        if shot_indices is not None:
            sub = _subset_geometry(geometry, shot_indices)
            obs = [obs[int(i)] for i in shot_indices]
            if direct_wave is not None:
                direct_wave = [direct_wave[int(i)] for i in shot_indices]
            geometry = sub
        fval, grad, illum, residuals = _shot_objective_host_misfit(
            geometry, obs, misfit_func, direct_wave, calc_grad, resample_dt,
            shot_chunk)

    if calc_grad:
        if precond:
            grad /= np.sqrt(illum + 1e-30)
        if mask is not None:
            grad *= mask
    return fval, grad.reshape(-1).astype(np.float64), residuals


def fwi_obj_multi_parallel(client, geometry, obs, misfit_func,
                           direct_wave=None, mask=None, precond=True,
                           calc_grad=False):
    """Mesh-sharded variant (reference dask path, ``fwi.py:207-234``). The
    `client` argument is accepted for parity and ignored; shots shard over
    the JAX device mesh with gradients summed by psum."""
    from .parallel.sharding import fwi_obj_sharded
    fval, grad = fwi_obj_sharded(geometry, obs, misfit_func, direct_wave,
                                 mask, precond, calc_grad)
    return fval, grad


def _subset_geometry(geometry, shot_indices):
    """Geometry restricted to a shot subset (host-misfit random-batch
    path)."""
    idx = np.asarray(shot_indices, dtype=np.int64)
    # dt deliberately not carried — see _shot_geometry
    return AcquisitionGeometry(
        geometry.model, geometry.rec_positions,
        np.asarray(geometry.src_positions)[idx], geometry.t0, geometry.tn,
        f0=geometry.f0, src_type=geometry.src_type,
        a=geometry._a, t0w=geometry._t0w, src_data=geometry._src_data,
        filter=geometry._filter)


def fwi_loss(x, geometry, obs, misfit_func, direct_wave=None, mask=None,
             precond=True, calc_grad=True, shot_indices=None):
    """Objective in squared-slowness parameterization
    (reference ``fwi.py:236-246``)."""
    v = 1.0 / np.sqrt(x.reshape(geometry.model.shape))
    geometry.model.update("vp", v.reshape(geometry.model.shape))
    fval, grad, residuals = fwi_obj_multi(geometry, obs, misfit_func,
                                          direct_wave, mask, precond,
                                          calc_grad,
                                          shot_indices=shot_indices)
    return fval, grad, residuals
