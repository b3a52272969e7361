"""Viscoacoustic FWI objective: misfit + (vp, qp) gradients through the
SLS/Ren/Deng-McMechan propagators.

Beyond the reference, whose viscoacoustic stack stops at forward +
adjoint operators with no gradient
(``/root/reference/seismic/viscoacoustic/wavesolver.py:60-206``): here
``jax.vjp`` through the two-level-rematted scan
(``ops.viscoacoustic.forward_seg``) gives the exact discrete adjoint
gradient with respect to BOTH velocity and attenuation — Q-compensated
FWI (simultaneous vp/qp inversion) out of the box. Conventions match
the elastic objective (``elastic_fwi.py``): physical-domain parameters
padded inside the AD graph (pad-transpose exact), per-shot crop +
source/receiver illumination fix before the sum, 1/sqrt(illum)
preconditioning, bathy mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fwi import _batched_tables, _crop, _fix_illum_jax, _misfit_jax, _pads
from .models.sources import PointSource
from .ops import viscoacoustic as _va

__all__ = ["visco_fm_multi", "visco_fwi_obj_multi", "ViscoFwiLoss"]


def _field(model, name, default=None):
    val = getattr(model, name, default)
    if val is None:
        val = default
    val = np.asarray(val, dtype=model.dtype)
    if val.ndim == 0:
        val = np.full(model.padded_shape, val, dtype=model.dtype)
    return val


@partial(jax.jit, static_argnames=("kernel", "time_order", "nt",
                                   "spacing", "space_order"))
def _visco_fm_batch(vp, b, qp, damp, src_wav, s_idx, s_w, r_idx, r_w, dt,
                    f0, *, kernel, time_order, nt, spacing, space_order):
    # module-level jit with array ARGUMENTS — a per-call closure would
    # recompile every invocation and bake the grid-sized fields in as
    # program constants (CLAUDE.md: constants round-trip the tunnel at
    # compile time)
    fwd = partial(_va.forward, kernel=kernel, time_order=time_order,
                  nt=nt, spacing=spacing, space_order=space_order,
                  save=False)
    return jax.vmap(lambda a, c: fwd(vp, b, qp, damp, src_wav, a, c,
                                     r_idx, r_w, dt, f0)[0])(s_idx, s_w)


def visco_fm_multi(geometry, kernel="sls", time_order=2):
    """Model all shots through the viscoacoustic propagator; returns a
    list of PointSource gathers (one batched program)."""
    model = geometry.model
    model._initialize_bcs(bcs="mask")
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    rec = _visco_fm_batch(
        jnp.asarray(_field(model, "vp")),
        jnp.asarray(_field(model, "b", 1.0)),
        jnp.asarray(_field(model, "qp")),
        jnp.asarray(_field(model, "damp", 1.0)),
        jnp.asarray(src_wav), jnp.asarray(s_idx), jnp.asarray(s_w),
        jnp.asarray(r_idx), jnp.asarray(r_w),
        float(model.critical_dt), geometry.f0, kernel=kernel,
        time_order=time_order, nt=geometry.nt, spacing=model.spacing,
        space_order=model.space_order)
    rec = np.asarray(rec)
    shots = []
    for i in range(geometry.nsrc):
        shot = PointSource(name="rec", time_range=geometry.time_axis,
                           coordinates=geometry.rec_positions,
                           dtype=model.dtype)
        shot.data[:] = rec[i]
        shots.append(shot)
    return shots


@partial(jax.jit, static_argnames=("kernel", "time_order", "nt",
                                   "spacing", "space_order",
                                   "n_checkpoints", "misfit_jax",
                                   "calc_grad", "pads", "shape",
                                   "illum_fix", "grad_route",
                                   "hist_dtype"))
def _visco_shots_obj(vp, qp, b, damp, src_wav, s_idx, s_w, r_idx, r_w,
                     obs, dw, src_pos, rec_pos, dt, f0, *, kernel,
                     time_order, nt, spacing, space_order, n_checkpoints,
                     misfit_jax, calc_grad, pads, shape, illum_fix=True,
                     grad_route="vjp", hist_dtype=None):
    """Fused chunk objective: per-shot forward + misfit + (when
    calc_grad) the (vp, qp) gradient; per-shot crop/illum-fix before
    the sum, like the acoustic convention. ``grad_route`` — "saved"
    runs the hand-written sls/2 adjoint over a saved (L, rn) history
    (``ops/visco_grad.py``, 2 sweeps); "vjp" keeps the two-level-
    rematted autodiff twin (any kernel)."""

    def fix(g, sp):
        if not illum_fix:
            return g
        return _fix_illum_jax(g, sp, rec_pos, spacing, shape)

    def one_saved(si, sw, obs_i, dw_i, sp):
        from .ops import visco_grad as _vg
        vpp = jnp.pad(vp, pads, mode="edge")
        qpp = jnp.pad(qp, pads, mode="edge")
        f, (g_vp, g_qp), illum, res = _vg.visco_sls2_value_and_grad(
            vpp, b, qpp, damp, src_wav, si, sw, r_idx, r_w, obs_i,
            dw_i, dt, f0, misfit_jax, nt=nt, spacing=spacing,
            space_order=space_order, hist_dtype=hist_dtype)
        from .ops.staggered_grad import pad_fold
        grads = (pad_fold(g_vp, pads), pad_fold(g_qp, pads))
        illum = _crop(illum, pads, shape)
        return (f, tuple(fix(g, sp) for g in grads), fix(illum, sp), res)

    def one(si, sw, obs_i, dw_i, sp):
        if calc_grad and grad_route == "saved":
            return one_saved(si, sw, obs_i, dw_i, sp)

        def fwd(vp_, qp_):
            vpp = jnp.pad(vp_, pads, mode="edge")
            qpp = jnp.pad(qp_, pads, mode="edge")
            rec, illum = _va.forward_seg(
                vpp, b, qpp, damp, src_wav, si, sw, r_idx, r_w, dt, f0,
                kernel=kernel, time_order=time_order, nt=nt,
                spacing=spacing, space_order=space_order,
                n_checkpoints=n_checkpoints)
            return rec, _crop(illum, pads, shape)

        if calc_grad:
            (rec, illum), vjp = jax.vjp(fwd, vp, qp)
        else:
            rec, illum = fwd(vp, qp)
        f, res = misfit_jax(rec - dw_i, obs_i - dw_i)
        if not calc_grad:
            z = jnp.zeros(shape, vp.dtype)
            return f, (z, z), z, res
        grads = vjp((res.astype(vp.dtype), jnp.zeros_like(illum)))
        return (f, tuple(fix(g, sp) for g in grads), fix(illum, sp), res)

    fvals, grads, illum, res = jax.vmap(one)(s_idx, s_w, obs, dw, src_pos)
    return (jnp.sum(fvals), tuple(g.sum(axis=0) for g in grads),
            illum.sum(axis=0), res)


def visco_fwi_obj_multi(geometry, obs, misfit_func=None, direct_wave=None,
                        mask=None, precond=True, calc_grad=False,
                        vp=None, qp=None, kernel="sls", time_order=2,
                        shot_chunk=4, n_checkpoints=0, shot_indices=None,
                        illum_fix=True, grad_route=None):
    """Multi-shot viscoacoustic objective/gradient. Returns
    (fval, {"vp": g, "qp": g}, residuals) with gradients cropped to the
    physical domain (grads None when not calc_grad). `vp`/`qp` override
    the model fields — physical-domain arrays; None reads the model.

    `grad_route` — "saved" (hand-written sls/2 adjoint over a saved
    history, the fast path) or "vjp" (rematted autodiff, any kernel);
    None reads ``DEVITO_FWI_TPU_VISCO_GRAD`` (default "auto" = saved
    for the sls/2 kernel, vjp otherwise), resolved at call time."""
    model = geometry.model
    model._initialize_bcs(bcs="mask")
    mj = _misfit_jax(misfit_func)
    if mj is None:
        raise NotImplementedError(
            "viscoacoustic FWI needs a jittable misfit")
    pads = _pads(model)
    crop_slc = tuple(slice(lo, lo + n)
                     for (lo, _), n in zip(model.padsizes, model.shape))

    def param(user, fallback):
        if user is None:
            return np.asarray(fallback)[crop_slc]
        user = np.asarray(user, dtype=model.dtype)
        return user if user.shape == model.shape else user[crop_slc]

    vp = jnp.asarray(param(vp, _field(model, "vp")))
    qp = jnp.asarray(param(qp, _field(model, "qp")))
    b = jnp.asarray(_field(model, "b", 1.0))
    damp = jnp.asarray(_field(model, "damp", 1.0))
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    src_pos = np.asarray(geometry.src_positions, dtype=model.dtype)
    rec_pos = np.asarray(geometry.rec_positions, dtype=model.dtype)
    # gathers upload once and stay on device across objective calls
    # (elastic_fwi r5 note: re-uploading them was ~0.7 s/call)
    from .fwi import _device_stack
    obs_stack = _device_stack(obs)
    if direct_wave is not None:
        dw_stack = _device_stack(direct_wave)
    else:
        dw_stack = jnp.zeros(obs_stack.shape, dtype=model.dtype)
    if shot_indices is not None:
        sel = np.asarray(shot_indices, dtype=np.int64)
        s_idx, s_w, src_pos = s_idx[sel], s_w[sel], src_pos[sel]
        sel_d = jnp.asarray(sel)
        obs_stack = obs_stack[sel_d]
        dw_stack = dw_stack[sel_d]
    nshots = s_idx.shape[0]
    if grad_route is None:
        import os
        grad_route = os.environ.get("DEVITO_FWI_TPU_VISCO_GRAD",
                                    "auto").strip().lower()
    if grad_route not in ("auto", "saved", "vjp"):
        raise ValueError(f"grad_route={grad_route!r}: expected 'auto', "
                         f"'saved' or 'vjp'")
    if grad_route == "auto":
        grad_route = "saved" if (kernel, time_order) == ("sls", 2) \
            else "vjp"
    if grad_route == "saved" and (kernel, time_order) != ("sls", 2):
        raise ValueError("the saved-history visco adjoint covers the "
                         "sls/2 kernel only")
    if model.dtype == np.float32:
        from .ops.pallas_acoustic import stream_hist_dtype
        hist_dtype = stream_hist_dtype()
    else:
        hist_dtype = None
    kw = dict(kernel=kernel, time_order=time_order, nt=geometry.nt,
              spacing=model.spacing, space_order=model.space_order,
              n_checkpoints=n_checkpoints, misfit_jax=mj,
              calc_grad=calc_grad, pads=pads, shape=model.shape,
              illum_fix=illum_fix, grad_route=grad_route,
              hist_dtype=hist_dtype)

    # device-side accumulation, ONE fetch (see elastic_fwi — per-chunk
    # round trips are the measured tunnel tax)
    f_parts, g_parts, il_parts, res_parts = [], [], [], []
    for lo in range(0, nshots, shot_chunk):
        hi = min(lo + shot_chunk, nshots)
        f, grads, illum, res = _visco_shots_obj(
            vp, qp, b, damp, jnp.asarray(src_wav),
            jnp.asarray(s_idx[lo:hi]), jnp.asarray(s_w[lo:hi]),
            jnp.asarray(r_idx), jnp.asarray(r_w),
            jnp.asarray(obs_stack[lo:hi]), jnp.asarray(dw_stack[lo:hi]),
            jnp.asarray(src_pos[lo:hi]), jnp.asarray(rec_pos),
            float(model.critical_dt), geometry.f0, **kw)
        f_parts.append(f)
        res_parts.append(res)
        if calc_grad:
            g_parts.append(grads)
            il_parts.append(illum)
    from .fwi import ResidualStack, _mask_device
    fval_d = f_parts[0]
    for f in f_parts[1:]:
        fval_d = fval_d + f
    residuals = ResidualStack(res_parts)
    if not calc_grad:
        return float(jax.device_get(fval_d)), None, residuals
    gsum = g_parts[0]
    ilsum = il_parts[0]
    for grads, illum in zip(g_parts[1:], il_parts[1:]):
        gsum = tuple(a + c for a, c in zip(gsum, grads))
        ilsum = ilsum + illum
    # device-side finalize + ONE small fetch (see elastic_fwi)
    if precond:
        scale = 1.0 / jnp.sqrt(ilsum + 1e-30)
        gsum = tuple(g * scale for g in gsum)
    if mask is not None:
        mdev = _mask_device(mask)
        gsum = tuple(g * mdev for g in gsum)
    fval, gsum = jax.device_get((fval_d, gsum))
    out = {}
    for name, g in zip(("vp", "qp"), gsum):
        out[name] = np.asarray(g, np.float64)
    return float(fval), out, residuals


class ViscoFwiLoss:
    """fwi_loss-signature adapter: inverts vp in squared slowness
    (x = 1/vp^2) with qp held fixed, through minimize(loss_fn=...)."""

    def __init__(self, kernel="sls", time_order=2, shot_chunk=4,
                 n_checkpoints=0):
        self.kernel = kernel
        self.time_order = time_order
        self.shot_chunk = shot_chunk
        self.n_checkpoints = n_checkpoints

    def __call__(self, x, geometry, obs, misfit_func, direct_wave=None,
                 mask=None, precond=True, calc_grad=True,
                 shot_indices=None):
        shape = geometry.model.shape
        vp = 1.0 / np.sqrt(x.reshape(shape))
        fval, grads, residuals = visco_fwi_obj_multi(
            geometry, obs, misfit_func, direct_wave, mask, precond,
            calc_grad, vp=vp.astype(geometry.model.dtype),
            kernel=self.kernel, time_order=self.time_order,
            shot_chunk=self.shot_chunk,
            n_checkpoints=self.n_checkpoints, shot_indices=shot_indices)
        if not calc_grad:
            return fval, None, residuals
        g = grads["vp"] * (-0.5 * vp ** 3)
        return fval, g.reshape(-1).astype(np.float64), residuals
