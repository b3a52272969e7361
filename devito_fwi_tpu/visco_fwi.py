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


@partial(jax.jit, static_argnames=("dt", "f0", "nt", "spacing",
                                   "space_order", "misfit_jax", "pads",
                                   "shape", "illum_fix", "hist_dtype",
                                   "z0", "seg", "interpret"))
def _visco_shots_obj_pallas(vp, qp, b, damp, src_wav, s_idx, s_w, r_idx,
                            r_w, obs, dw, src_pos, rec_pos, *, dt, f0,
                            nt, spacing, space_order, misfit_jax, pads,
                            shape, illum_fix, hist_dtype, z0, seg,
                            interpret=False):
    """Streamed-history Pallas sls/2 chunk objective: batched forward
    kernel (VMEM (p, p_prev, r) carries, (L, rn) history as pipelined
    bf16 blocks), vmapped misfit, batched adjoint kernel, then the
    coefficient-map chain rule / pad-fold / illum-fix finish on the XLA
    side. Gate with ``pallas_staggered.visco_grad_stream_supported``."""
    from .ops import pallas_staggered as ps
    from .ops.acoustic import _gather, _scatter_add
    from .ops.staggered_grad import pad_fold

    B = s_idx.shape[0]
    nx = shape[0] + pads[0][0] + pads[0][1]
    nz = shape[1] + pads[1][0] + pads[1][1]
    dtype = jnp.float32
    s = jnp.asarray(dt, dtype)
    f0c = jnp.asarray(f0, dtype)
    vpp = jnp.pad(vp, pads, mode="edge")
    qpp = jnp.pad(qp, pads, mode="edge")

    def coeff_map(vp_, qp_):
        # byte-identical associations to viscoacoustic._common /
        # _forward_step's sls/2 branch
        rho = 1.0 / b
        bm = rho * vp_ * vp_
        t_s = (jnp.sqrt(1. + 1. / qp_ ** 2) - 1. / qp_) / f0c
        t_ep = 1. / (f0c ** 2 * t_s)
        tt = t_ep / t_s - 1.
        A = s * (tt / t_s) * rho
        Bc = s / t_s
        C = s * s * bm * (1. + tt)
        D = s * s * vp_ * vp_
        return A, Bc, C, D, vp_ * vp_

    A, Bc, C, D, vp2 = coeff_map(vpp, qpp)
    inj = jax.vmap(lambda si, sw: _scatter_add(
        jnp.zeros((nx, nz), dtype), si,
        sw * s * s * _gather(vp2, si)))(s_idx, s_w)
    injw = jax.vmap(lambda si, sw: _scatter_add(
        jnp.zeros((nx, nz), dtype), si, sw))(s_idx, s_w)
    nsteps = nt - 2
    nseg = -(-nsteps // seg)
    total = nseg * seg
    wav_pad = jnp.zeros((total,), dtype).at[:nsteps].set(
        src_wav[1:nt - 1, 0])
    wavs2 = wav_pad * (s * s)

    kw = dict(nt=nt, nx=nx, nz=nz, space_order=space_order,
              spacing=spacing, z0=z0, seg=seg, interpret=interpret)
    rec_rows, hist, illum_t = ps.visco_fwd_hist_segments(
        damp.T, b.T, A.T, Bc.T, C.T, D.T,
        jnp.transpose(inj, (0, 2, 1)), wav_pad, dt,
        hist_dtype=hist_dtype, **kw)

    nrec = r_idx.shape[0]
    W = ps.zplane_weight_matrix(r_idx, r_w, nx, z0)
    flat = rec_rows.reshape(B, total, 2 * nx)[:, :nsteps]
    tr = jnp.einsum("btq,qr->btr", flat, W,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    rec = jnp.zeros((B, nt, nrec), dtype).at[:, 1:nsteps + 1].set(tr)

    f, res = jax.vmap(misfit_jax)(rec - dw, obs - dw)
    fval = jnp.sum(f)

    res_q = jnp.einsum("btr,qr->btq",
                       res.astype(dtype)[:, 1:nt - 1], W,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    res_rows = jnp.zeros((B, total, 2, nx), dtype).at[
        :, :nsteps].set(res_q.reshape(B, nsteps, 2, nx))
    res_rows = res_rows.reshape(B, nseg, seg, 2, nx)

    ga1_t, ga2_t, ga3_t, ga4_t, gsrc_t = ps.visco_grad_stream_segments(
        damp.T, b.T, A.T, Bc.T, C.T, D.T,
        jnp.transpose(injw, (0, 2, 1)), hist, res_rows, wavs2, dt, **kw)
    tT = lambda a: jnp.transpose(a, (0, 2, 1))  # noqa: E731
    _, coeff_vjp = jax.vjp(coeff_map, vpp, qpp)
    g_vp, g_qp = jax.vmap(lambda g1, g2, g3, g4, g5:
                          coeff_vjp((g1, g2, g3, g4, g5)))(
        tT(ga1_t), tT(ga2_t), tT(ga3_t), tT(ga4_t), tT(gsrc_t))
    fold = jax.vmap(lambda g: pad_fold(g, pads))
    g_vp, g_qp = fold(g_vp), fold(g_qp)
    illum = jax.vmap(lambda il: _crop(il.T, pads, shape))(illum_t)

    def fix(g, sp):
        if not illum_fix:
            return g
        return _fix_illum_jax(g, sp, rec_pos, spacing, shape)

    fixv = jax.vmap(fix)
    g_vp = fixv(g_vp, src_pos).sum(axis=0)
    g_qp = fixv(g_qp, src_pos).sum(axis=0)
    illum = fixv(illum, src_pos).sum(axis=0)
    return fval, (g_vp, g_qp), illum, res


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
    if grad_route not in ("auto", "pallas", "saved", "vjp"):
        raise ValueError(f"grad_route={grad_route!r}: expected 'auto', "
                         f"'pallas', 'saved' or 'vjp'")
    if grad_route in ("saved", "pallas") and \
            (kernel, time_order) != ("sls", 2):
        raise ValueError("the saved-history visco adjoints cover the "
                         "sls/2 kernel only")
    if model.dtype == np.float32:
        from .ops.pallas_acoustic import stream_hist_dtype
        hist_dtype = stream_hist_dtype()
    else:
        hist_dtype = None
    if grad_route in ("auto", "pallas"):
        from .ops import pallas_acoustic as _pa
        from .ops import pallas_staggered as _ps
        supported = (kernel, time_order) == ("sls", 2) and \
            _ps.visco_grad_stream_supported(model, s_idx, r_idx, src_wav)
        on_tpu = jax.default_backend() == "tpu" or _pa.env_interpret(False)
        if grad_route == "pallas" and not supported:
            raise ValueError("grad_route='pallas' requested but the "
                             "streamed sls/2 kernels do not support "
                             "this geometry/dtype")
        if supported and (on_tpu or grad_route == "pallas"):
            grad_route = "pallas"
        elif (kernel, time_order) == ("sls", 2):
            grad_route = "saved"
        else:
            grad_route = "vjp"
    kw = dict(kernel=kernel, time_order=time_order, nt=geometry.nt,
              spacing=model.spacing, space_order=model.space_order,
              n_checkpoints=n_checkpoints, misfit_jax=mj,
              calc_grad=calc_grad, pads=pads, shape=model.shape,
              illum_fix=illum_fix,
              grad_route=("saved" if grad_route == "pallas" else
                          grad_route),
              hist_dtype=hist_dtype)
    if grad_route == "pallas":
        from .ops import pallas_staggered as _ps
        kw_p = dict(dt=float(model.critical_dt), f0=float(geometry.f0),
                    nt=geometry.nt, spacing=model.spacing,
                    space_order=model.space_order, misfit_jax=mj,
                    pads=pads, shape=model.shape, illum_fix=illum_fix,
                    hist_dtype=hist_dtype or "float32",
                    z0=int(np.asarray(r_idx)[..., 1].min()),
                    seg=_ps.pick_visco_stream_seg(
                        model.padded_shape[0], model.padded_shape[1],
                        hist_dtype or "float32"),
                    interpret=(jax.default_backend() != "tpu"))
    if grad_route in ("pallas", "saved") and calc_grad and \
            model.dtype == np.float32 and model.dim == 2:
        # 2-field bf16 history ~0.6 GB/shot at Marmousi scale: clamp
        # the chunk to a 6 GB history budget like the elastic path
        # (applies to the XLA saved fallback too — it vmaps the same
        # per-shot histories)
        from .ops.pallas_staggered import _stream_field_bytes
        fh = _stream_field_bytes(
            model.padded_shape[0], model.padded_shape[1],
            jnp.dtype(hist_dtype or "float32").itemsize)
        per_shot = (geometry.nt - 2) * 2 * fh
        shot_chunk = max(1, min(shot_chunk,
                                int((6 << 30) // max(per_shot, 1))))

    # device-side accumulation, ONE fetch (see elastic_fwi — per-chunk
    # round trips are the measured tunnel tax)
    f_parts, g_parts, il_parts, res_parts = [], [], [], []
    for lo in range(0, nshots, shot_chunk):
        hi = min(lo + shot_chunk, nshots)
        if grad_route == "pallas" and calc_grad:
            f, grads, illum, res = _visco_shots_obj_pallas(
                vp, qp, b, damp, jnp.asarray(src_wav),
                jnp.asarray(s_idx[lo:hi]), jnp.asarray(s_w[lo:hi]),
                jnp.asarray(r_idx), jnp.asarray(r_w),
                jnp.asarray(obs_stack[lo:hi]),
                jnp.asarray(dw_stack[lo:hi]),
                jnp.asarray(src_pos[lo:hi]), jnp.asarray(rec_pos),
                **kw_p)
        else:
            f, grads, illum, res = _visco_shots_obj(
                vp, qp, b, damp, jnp.asarray(src_wav),
                jnp.asarray(s_idx[lo:hi]), jnp.asarray(s_w[lo:hi]),
                jnp.asarray(r_idx), jnp.asarray(r_w),
                jnp.asarray(obs_stack[lo:hi]),
                jnp.asarray(dw_stack[lo:hi]),
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
