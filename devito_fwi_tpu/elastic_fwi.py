"""Elastic FWI objective: misfit + (vp, vs, rho) gradients through the
staggered-grid velocity-stress propagator.

This goes BEYOND the reference, whose elastic solver is forward-only
(``/root/reference/seismic/elastic/wavesolver.py:25`` — no adjoint, no
gradient operator), while its own north-star workload list names
"Marmousi2 elastic FWI (staggered-grid Vp/Vs/rho propagator)". The
TPU-native design: the forward is a two-level-rematted ``lax.scan``
(``ops.staggered.elastic_forward_seg``) and the parameter gradient is
``jax.vjp`` through it — the exact discrete adjoint of the velocity-
stress system, with the (lam, mu, b) <- (vp, vs, rho) chain rule
(reference ``seismic/model.py:300-305`` parametrization) handled by the
same vjp. Shots batch via ``vmap`` and chunk to bound the remat
working set; illumination (sum_t |v|^2, the elastic analog of the
acoustic sum_t u^2 preconditioner of reference ``fwi.py:170``)
accumulates outside the AD graph.

Conventions match the acoustic objective (``fwi.py``): observed data is
the rec1 (tau_zz) gather, misfits are the same (syn, obs) -> (fval,
residual) jittable functions, per-shot gradients are cropped to the
physical domain and source/receiver-illumination-fixed at that shot's
source position before summing, preconditioned by 1/sqrt(illum),
masked.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .fwi import _batched_tables, _crop, _fix_illum_jax, _misfit_jax, _pads
from .models.sources import PointSource
from .ops import staggered as _st

__all__ = ["elastic_fm_multi", "elastic_fwi_obj_multi", "ElasticFwiLoss",
           "model_vp_vs_rho"]


def model_vp_vs_rho(model):
    """Recover padded (vp, vs, rho) from a Lame-parametrized model
    (lam = (vp^2 - 2 vs^2)/b, mu = vs^2/b, b = 1/rho)."""
    lam = np.asarray(model.lam, dtype=model.dtype)
    mu = np.asarray(model.mu, dtype=model.dtype)
    b = model.b if isinstance(model.b, np.ndarray) \
        else np.full(model.padded_shape, model.b, dtype=model.dtype)
    b = np.asarray(b, dtype=model.dtype)
    vs = np.sqrt(mu * b)
    vp = np.sqrt((lam + 2.0 * mu) * b)
    rho = 1.0 / b
    return vp, vs, rho


def _damp_field(model):
    damp = model.damp
    if not isinstance(damp, np.ndarray):
        damp = np.full(model.padded_shape, damp, dtype=model.dtype)
    return np.asarray(damp, dtype=model.dtype)


@partial(jax.jit, static_argnames=("nt", "spacing", "space_order"))
def _elastic_fm_batch(lam, mu, b, damp, src_wav, s_idx, s_w, r_idx, r_w,
                      dt, *, nt, spacing, space_order):
    fwd = partial(_st.elastic_forward, nt=nt, spacing=spacing,
                  space_order=space_order)
    return jax.vmap(lambda a, c: fwd(lam, mu, b, damp, src_wav, a, c,
                                     r_idx, r_w, dt))(s_idx, s_w)


def elastic_fm_multi(geometry):
    """Model all shots through the elastic propagator; returns
    (rec1 list, rec2 list) of PointSource gathers (one batched TPU
    program, like the acoustic ``fm_multi``)."""
    model = geometry.model
    model._initialize_bcs(bcs="mask")
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    vp, vs, rho = model_vp_vs_rho(model)
    lam = jnp.asarray(rho * (vp * vp - 2.0 * vs * vs))
    mu = jnp.asarray(rho * vs * vs)
    b = jnp.asarray(1.0 / rho)
    r1, r2 = _elastic_fm_batch(
        lam, mu, b, jnp.asarray(_damp_field(model)), jnp.asarray(src_wav),
        jnp.asarray(s_idx), jnp.asarray(s_w), jnp.asarray(r_idx),
        jnp.asarray(r_w), float(model.critical_dt), nt=geometry.nt,
        spacing=model.spacing, space_order=model.space_order)
    r1, r2 = np.asarray(r1), np.asarray(r2)
    outs = ([], [])
    for i in range(geometry.nsrc):
        for rec_all, lst in zip((r1, r2), outs):
            shot = PointSource(name="rec", time_range=geometry.time_axis,
                               coordinates=geometry.rec_positions,
                               dtype=model.dtype)
            shot.data[:] = rec_all[i]
            lst.append(shot)
    return outs


def _elastic_fwd_factory(damp, src_wav, r_idx, r_w, dt, *, nt, spacing,
                         space_order, n_checkpoints, pads, shape):
    """Per-shot elastic forward closure shared by the single-chip chunk
    objective AND the sharded per-shot body (one place for the per-shot
    convention). Physical-domain params are edge-replicated into the
    absorbing halo INSIDE the AD graph — the vjp then carries the
    pad-transpose (halo cotangents fold back onto edge cells), so
    gradients are exact w.r.t. the physical parameters (FD-consistent;
    tests/test_elastic_grad.py::test_obj_multi_fd_consistency)."""

    def factory(si, sw):
        def fwd(vp_, vs_, rho_):
            vpp = jnp.pad(vp_, pads, mode="edge")
            vsp = jnp.pad(vs_, pads, mode="edge")
            rhp = jnp.pad(rho_, pads, mode="edge")
            lam = rhp * (vpp * vpp - 2.0 * vsp * vsp)
            mu = rhp * vsp * vsp
            rec1, _, illum = _st.elastic_forward_seg(
                lam, mu, 1.0 / rhp, damp, src_wav, si, sw, r_idx, r_w,
                dt, nt=nt, spacing=spacing, space_order=space_order,
                n_checkpoints=n_checkpoints)
            return rec1, _crop(illum, pads, shape)
        return fwd

    return factory


@partial(jax.jit, static_argnames=("nt", "spacing", "space_order",
                                   "n_checkpoints", "misfit_jax",
                                   "calc_grad", "pads", "shape",
                                   "illum_fix", "grad_route",
                                   "hist_dtype"))
def _elastic_shots_obj(vp, vs, rho, damp, src_wav, s_idx, s_w, r_idx, r_w,
                       obs1, dw, src_pos, rec_pos, dt, *, nt, spacing,
                       space_order, n_checkpoints, misfit_jax, calc_grad,
                       pads, shape, illum_fix=True, grad_route="saved",
                       hist_dtype=None):
    """Fused chunk objective: per-shot forward + misfit on rec1 + (when
    calc_grad) the (vp, vs, rho) gradient, with each shot's gradient and
    illumination cropped to the physical domain and source/receiver-
    illumination-fixed at THAT shot's source position before the sum —
    the acoustic convention (reference ``fwi.py:166-171``). Returns
    (fval, (gvp, gvs, grho) summed, illum summed, residual stack).

    ``grad_route`` picks the gradient machinery: "saved" (default) runs
    the hand-written adjoint sweep over a saved per-step history
    (``ops.staggered_grad``, 2 sweeps; history in ``hist_dtype``,
    bf16-on-TPU by default via the caller); "vjp" keeps the
    two-level-rematted ``jax.vjp`` route (exact twin, ~2-3 extra
    recompute sweeps) for A/Bs and as the parity anchor."""

    def fix(g, sp):
        if not illum_fix:
            return g
        return _fix_illum_jax(g, sp, rec_pos, spacing, shape)

    fwd_factory = _elastic_fwd_factory(
        damp, src_wav, r_idx, r_w, dt, nt=nt, spacing=spacing,
        space_order=space_order, n_checkpoints=n_checkpoints, pads=pads,
        shape=shape)

    def one_saved(si, sw, obs_i, dw_i, sp):
        from .ops import staggered_grad as _sg
        vpp = jnp.pad(vp, pads, mode="edge")
        vsp = jnp.pad(vs, pads, mode="edge")
        rhp = jnp.pad(rho, pads, mode="edge")
        lam = rhp * (vpp * vpp - 2.0 * vsp * vsp)
        mu = rhp * vsp * vsp
        kw = dict(nt=nt, spacing=spacing, space_order=space_order)
        rec1, illum_pad, hist = _sg.elastic_forward_hist(
            lam, mu, 1.0 / rhp, damp, src_wav, si, sw, r_idx, r_w, dt,
            hist_dtype=hist_dtype, **kw)
        syn = rec1 - dw_i
        obsd = obs_i - dw_i
        f, res = misfit_jax(syn, obsd)
        glam, gmu, gb = _sg.elastic_adjoint_from_hist(
            lam, mu, 1.0 / rhp, damp, r_idx, r_w, res.astype(vp.dtype),
            hist, dt, **kw)
        # chain rule lam = rho (vp^2 - 2 vs^2), mu = rho vs^2,
        # b = 1/rho — pointwise on the padded grid, then the
        # edge-pad transpose folds halo cotangents onto edge cells
        gvp = 2.0 * rhp * vpp * glam
        gvs = -4.0 * rhp * vsp * glam + 2.0 * rhp * vsp * gmu
        grho = (vpp * vpp - 2.0 * vsp * vsp) * glam + vsp * vsp * gmu \
            - gb / (rhp * rhp)
        grads = tuple(_sg.pad_fold(g, pads) for g in (gvp, gvs, grho))
        illum = _crop(illum_pad, pads, shape)
        return (f, tuple(fix(g, sp) for g in grads), fix(illum, sp), res)

    def one(si, sw, obs_i, dw_i, sp):
        if calc_grad and grad_route == "saved":
            return one_saved(si, sw, obs_i, dw_i, sp)
        fwd = fwd_factory(si, sw)

        if calc_grad:
            (rec1, illum), vjp = jax.vjp(fwd, vp, vs, rho)
        else:
            rec1, illum = fwd(vp, vs, rho)
        syn = rec1 - dw_i
        obsd = obs_i - dw_i
        f, res = misfit_jax(syn, obsd)
        if not calc_grad:
            z = jnp.zeros(shape, vp.dtype)
            return f, (z, z, z), z, res
        # dF/drec1 == the misfit residual (syn enters rec1 linearly);
        # illum is stop_gradient'd so its zero cotangent is exact
        grads = vjp((res.astype(vp.dtype), jnp.zeros_like(illum)))
        return (f, tuple(fix(g, sp) for g in grads), fix(illum, sp), res)

    fvals, grads, illum, res = jax.vmap(one)(s_idx, s_w, obs1, dw, src_pos)
    return (jnp.sum(fvals), tuple(g.sum(axis=0) for g in grads),
            illum.sum(axis=0), res)


@partial(jax.jit, static_argnames=("dt", "nt", "spacing", "space_order",
                                   "misfit_jax", "pads", "shape",
                                   "illum_fix", "hist_dtype", "z0",
                                   "seg", "interpret"))
def _elastic_shots_obj_pallas(vp, vs, rho, damp, src_wav, s_idx, s_w,
                              r_idx, r_w, obs1, dw, src_pos, rec_pos,
                              *, dt, nt, spacing, space_order,
                              misfit_jax, pads, shape, illum_fix,
                              hist_dtype, z0, seg, interpret=False):
    """Streamed-history Pallas chunk objective: one batched forward
    kernel (VMEM-resident carries, history as pipelined output blocks),
    vmapped misfit, one batched reverse kernel, then the same
    avg/chain-rule/pad-fold/illum-fix finish as the XLA saved route.
    Gate with ``pallas_staggered.elastic_grad_stream_supported``."""
    from .ops import pallas_staggered as ps
    from .ops import staggered_grad as _sg
    from .ops.staggered import avg_to

    B = s_idx.shape[0]
    nx, nz = shape[0] + pads[0][0] + pads[0][1], \
        shape[1] + pads[1][0] + pads[1][1]
    vpp = jnp.pad(vp, pads, mode="edge")
    vsp = jnp.pad(vs, pads, mode="edge")
    rhp = jnp.pad(rho, pads, mode="edge")
    lam = rhp * (vpp * vpp - 2.0 * vsp * vsp)
    mu = rhp * vsp * vsp
    binv = 1.0 / rhp
    b0 = avg_to(binv, (0,), 2)
    b1 = avg_to(binv, (1,), 2)
    d0 = avg_to(damp, (0,), 2)
    d1 = avg_to(damp, (1,), 2)
    mu01 = avg_to(mu, (0, 1), 2)
    d01 = avg_to(damp, (0, 1), 2)

    s = jnp.asarray(dt, jnp.float32)
    from .ops.acoustic import _scatter_add
    inj = jax.vmap(lambda si, sw: _scatter_add(
        jnp.zeros((nx, nz), jnp.float32), si, sw * s))(s_idx, s_w)
    nsteps = nt - 1
    nseg = -(-nsteps // seg)
    total = nseg * seg
    wav_pad = jnp.zeros((total,), jnp.float32).at[:nsteps].set(
        src_wav[0:nsteps, 0])

    kw = dict(nt=nt, nx=nx, nz=nz, space_order=space_order,
              spacing=spacing, z0=z0, seg=seg, interpret=interpret)
    rec_rows, hist, illum_t = ps.elastic_fwd_hist_segments(
        lam.T, mu.T, b0.T, b1.T, damp.T, d0.T, d1.T, mu01.T, d01.T,
        jnp.transpose(inj, (0, 2, 1)), wav_pad, dt,
        hist_dtype=hist_dtype, **kw)

    nrec = r_idx.shape[0]
    W = ps.zplane_weight_matrix(r_idx, r_w, nx, z0)
    flat = rec_rows.reshape(B, total, 2 * nx)[:, :nsteps]
    tr = jnp.einsum("btq,qr->btr", flat, W,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    rec1 = jnp.zeros((B, nt, nrec), jnp.float32).at[:, 0:nsteps].set(tr)

    syn = rec1 - dw
    obsd = obs1 - dw
    f, res = jax.vmap(misfit_jax)(syn, obsd)
    fval = jnp.sum(f)

    # residual -> the two z-plane rows (exact transpose of the
    # trace assembly above)
    res_q = jnp.einsum("btr,qr->btq", res.astype(jnp.float32)[:, :nsteps],
                       W, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    res_rows = jnp.zeros((B, total, 2, nx), jnp.float32).at[
        :, :nsteps].set(res_q.reshape(B, nsteps, 2, nx))
    res_rows = res_rows.reshape(B, nseg, seg, 2, nx)

    glam_t, gmun_t, gmup_t, gb0_t, gb1_t = ps.elastic_grad_stream_segments(
        lam.T, mu.T, b0.T, b1.T, damp.T, d0.T, d1.T, mu01.T, d01.T,
        hist, res_rows, dt, **kw)
    tT = lambda a: jnp.transpose(a, (0, 2, 1))
    glam, gmun = tT(glam_t), tT(gmun_t)
    g_mu = gmun + _sg.avg_to_T(tT(gmup_t), (0, 1), 2)
    g_b = _sg.avg_to_T(tT(gb0_t), (0,), 2) + \
        _sg.avg_to_T(tT(gb1_t), (1,), 2)

    gvp = 2.0 * rhp * vpp * glam
    gvs = -4.0 * rhp * vsp * glam + 2.0 * rhp * vsp * g_mu
    grho = (vpp * vpp - 2.0 * vsp * vsp) * glam + vsp * vsp * g_mu \
        - g_b * (binv * binv)
    fold = jax.vmap(lambda g: _sg.pad_fold(g, pads))
    gvp, gvs, grho = fold(gvp), fold(gvs), fold(grho)
    illum = jax.vmap(lambda il: _crop(il.T, pads, shape))(illum_t)

    def fix(g, sp):
        if not illum_fix:
            return g
        return _fix_illum_jax(g, sp, rec_pos, spacing, shape)

    fixv = jax.vmap(fix)
    gvp = fixv(gvp, src_pos).sum(axis=0)
    gvs = fixv(gvs, src_pos).sum(axis=0)
    grho = fixv(grho, src_pos).sum(axis=0)
    illum = fixv(illum, src_pos).sum(axis=0)
    return fval, (gvp, gvs, grho), illum, res


def elastic_fwi_obj_multi(geometry, obs, misfit_func=None, direct_wave=None,
                          mask=None, precond=True, calc_grad=False,
                          vp=None, vs=None, rho=None, shot_chunk=4,
                          n_checkpoints=0, shot_indices=None,
                          illum_fix=True, grad_route=None):
    """Multi-shot elastic objective/gradient.

    Parameters mirror the acoustic ``fwi_obj_multi``; `obs` is the rec1
    (tau_zz) gather list (e.g. from ``elastic_fm_multi(...)[0]``).
    `vp`/`vs`/`rho` override the model's padded parameter fields —
    PHYSICAL-domain arrays are padded here; None reads the model.
    Returns (fval, {"vp": g, "vs": g, "rho": g}, residuals) with each
    gradient cropped to the physical domain (grads None when not
    calc_grad).

    `grad_route` — "pallas" (streamed-history VMEM kernels, the fast
    path), "saved" (hand-written XLA adjoint over a saved history) or
    "vjp" (rematted autodiff twin); None reads
    ``DEVITO_FWI_TPU_ELASTIC_GRAD`` (default "auto" = pallas on TPU
    when the geometry qualifies, else saved). Resolved HERE,
    at call time, and passed as a static argument — never inside the
    trace (the ANCHOR_A/W stale-trace footgun). The saved history is
    stored in ``stream_hist_dtype()`` (bf16 on TPU) when the model is
    f32; f64 runs keep an f64 history so the exactness gates hold.
    """
    model = geometry.model
    model._initialize_bcs(bcs="mask")
    mj = _misfit_jax(misfit_func)
    if mj is None:
        raise NotImplementedError(
            "elastic FWI needs a jittable misfit (least_square or a "
            "misfit exposing .jax); host-callback misfits are not wired "
            "for the elastic path")
    mvp, mvs, mrho = model_vp_vs_rho(model)
    crop_slc = tuple(slice(lo, lo + n)
                     for (lo, _), n in zip(model.padsizes, model.shape))

    def param(user, fallback):
        """Normalize to the PHYSICAL domain — the objective re-pads
        inside the AD graph (model fields are pad_edge-built, so
        crop->re-pad is the identity on them)."""
        if user is None:
            return np.asarray(fallback)[crop_slc]
        user = np.asarray(user, dtype=model.dtype)
        if user.shape != model.shape:
            user = user[crop_slc]
        return user

    vp = jnp.asarray(param(vp, mvp))
    vs = jnp.asarray(param(vs, mvs))
    rho = jnp.asarray(param(rho, mrho))
    damp = jnp.asarray(_damp_field(model))
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    src_pos = np.asarray(geometry.src_positions, dtype=model.dtype)
    rec_pos = np.asarray(geometry.rec_positions, dtype=model.dtype)
    # upload the (inversion-constant) gathers ONCE and reuse the device
    # copies across objective calls — re-uploading the obs/dw stacks
    # through the tunnel was ~0.7 s/call at Marmousi2 scale, dwarfing
    # the kernels (the acoustic path's _device_stack discipline)
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
    dt = float(model.critical_dt)
    if grad_route is None:
        import os
        grad_route = os.environ.get("DEVITO_FWI_TPU_ELASTIC_GRAD",
                                    "auto").strip().lower()
    if grad_route not in ("auto", "pallas", "saved", "vjp"):
        raise ValueError(f"grad_route={grad_route!r}: expected 'auto', "
                         f"'pallas', 'saved' or 'vjp'")
    if model.dtype == np.float32:
        from .ops.pallas_acoustic import stream_hist_dtype
        hist_dtype = stream_hist_dtype()
    else:
        hist_dtype = None
    if grad_route in ("auto", "pallas"):
        from .ops import pallas_acoustic as _pa
        from .ops import pallas_staggered as _ps
        supported = _ps.elastic_grad_stream_supported(
            model, s_idx, r_idx, src_wav)
        on_tpu = jax.default_backend() == "tpu" or \
            _pa.env_interpret(False)
        if grad_route == "pallas" and not supported:
            raise ValueError("grad_route='pallas' requested but the "
                             "streamed elastic kernels do not support "
                             "this geometry/dtype")
        grad_route = "pallas" if (supported and
                                  (on_tpu or grad_route == "pallas")) \
            else "saved"
    kw = dict(nt=geometry.nt, spacing=model.spacing,
              space_order=model.space_order, n_checkpoints=n_checkpoints,
              misfit_jax=mj, calc_grad=calc_grad, pads=_pads(model),
              shape=model.shape, illum_fix=illum_fix,
              grad_route=("saved" if grad_route == "pallas" else
                          grad_route),
              hist_dtype=hist_dtype)
    if grad_route == "pallas":
        from .ops import pallas_staggered as _ps
        kw_p = dict(nt=geometry.nt, spacing=model.spacing,
                    space_order=model.space_order, misfit_jax=mj,
                    pads=_pads(model), shape=model.shape,
                    illum_fix=illum_fix,
                    hist_dtype=hist_dtype or "float32",
                    z0=int(np.asarray(r_idx)[..., 1].min()),
                    seg=_ps.pick_elastic_stream_seg(
                        model.padded_shape[0], model.padded_shape[1],
                        hist_dtype or "float32"),
                    # compiled on the chip, interpreter mode anywhere
                    # else (CPU parity tests, virtual meshes)
                    interpret=(jax.default_backend() != "tpu"))
    if grad_route in ("pallas", "saved") and calc_grad and \
            model.dtype == np.float32 and model.dim == 2:
        # the 4-field streamed history is ~1.2 GB/shot (bf16) at
        # Marmousi2 scale; past ~6 GB the chip thrashes (measured:
        # chunk 8 = 9.3 GB ran 2x slower than chunk 2/4). The clamp
        # applies to BOTH history routes — the XLA saved fallback
        # vmaps the same per-shot histories (review r5)
        from .ops.pallas_staggered import _stream_field_bytes
        fh = _stream_field_bytes(
            model.padded_shape[0], model.padded_shape[1],
            jnp.dtype(hist_dtype or "float32").itemsize)
        per_shot = (geometry.nt - 1) * 2 * model.dim * fh
        shot_chunk = max(1, min(shot_chunk,
                                int((6 << 30) // max(per_shot, 1))))

    # accumulate chunk results ON DEVICE and fetch once at the end —
    # per-chunk float()/np.asarray fetches were a measured ~35% of the
    # small-3-D acoustic objective on the tunnel (fwi.py r4 note)
    f_parts, g_parts, il_parts, res_parts = [], [], [], []
    for lo in range(0, nshots, shot_chunk):
        hi = min(lo + shot_chunk, nshots)
        if grad_route == "pallas" and calc_grad:
            f, grads, illum, res = _elastic_shots_obj_pallas(
                vp, vs, rho, damp, jnp.asarray(src_wav),
                jnp.asarray(s_idx[lo:hi]), jnp.asarray(s_w[lo:hi]),
                jnp.asarray(r_idx), jnp.asarray(r_w),
                jnp.asarray(obs_stack[lo:hi]),
                jnp.asarray(dw_stack[lo:hi]),
                jnp.asarray(src_pos[lo:hi]), jnp.asarray(rec_pos),
                dt=dt, **kw_p)
        else:
            f, grads, illum, res = _elastic_shots_obj(
                vp, vs, rho, damp, jnp.asarray(src_wav),
                jnp.asarray(s_idx[lo:hi]), jnp.asarray(s_w[lo:hi]),
                jnp.asarray(r_idx), jnp.asarray(r_w),
                jnp.asarray(obs_stack[lo:hi]),
                jnp.asarray(dw_stack[lo:hi]),
                jnp.asarray(src_pos[lo:hi]), jnp.asarray(rec_pos), dt,
                **kw)
        f_parts.append(f)
        res_parts.append(res)
        if calc_grad:
            g_parts.append(grads)
            il_parts.append(illum)
    from .fwi import ResidualStack, _mask_device
    fval_d = f_parts[0]
    for f in f_parts[1:]:
        fval_d = fval_d + f
    # residuals stay on device; ResidualStack materializes them only if
    # a caller actually indexes (minimize.save_residual every N iters)
    residuals = ResidualStack(res_parts)
    if not calc_grad:
        return float(jax.device_get(fval_d)), None, residuals
    gsum = g_parts[0]
    ilsum = il_parts[0]
    for grads, illum in zip(g_parts[1:], il_parts[1:]):
        gsum = tuple(a + b for a, b in zip(gsum, grads))
        ilsum = ilsum + illum
    # finalize ON DEVICE, then ONE fetch of (fval, three small fields) —
    # device_get of the residual stack was ~0.35 s/call at Marmousi2
    # scale through the tunnel
    if precond:
        scale = 1.0 / jnp.sqrt(ilsum + 1e-30)
        gsum = tuple(g * scale for g in gsum)
    if mask is not None:
        mdev = _mask_device(mask)
        gsum = tuple(g * mdev for g in gsum)
    fval, gsum = jax.device_get((fval_d, gsum))
    out = {}
    for name, g in zip(("vp", "vs", "rho"), gsum):
        out[name] = np.asarray(g, np.float64)
    return float(fval), out, residuals


class ElasticFwiLoss:
    """Adapter exposing the elastic objective through the acoustic
    ``fwi_loss`` signature so ``optimize.minimize(loss_fn=...)`` drives
    elastic inversions unchanged.

    Inverts vp in the reference's squared-slowness parameterization
    (x = 1/vp^2, the same box bounds as the acoustic drivers) with vs
    and rho held at the supplied fields; the vjp's d(misfit)/d(vp) is
    chain-ruled to x by dvp/dx = -vp^3/2."""

    def __init__(self, vs, rho, shot_chunk=4, n_checkpoints=0):
        self.vs = vs
        self.rho = rho
        self.shot_chunk = shot_chunk
        self.n_checkpoints = n_checkpoints

    def __call__(self, x, geometry, obs, misfit_func, direct_wave=None,
                 mask=None, precond=True, calc_grad=True,
                 shot_indices=None):
        shape = geometry.model.shape
        vp = 1.0 / np.sqrt(x.reshape(shape))
        fval, grads, residuals = elastic_fwi_obj_multi(
            geometry, obs, misfit_func, direct_wave, mask, precond,
            calc_grad, vp=vp.astype(geometry.model.dtype), vs=self.vs,
            rho=self.rho, shot_chunk=self.shot_chunk,
            n_checkpoints=self.n_checkpoints, shot_indices=shot_indices)
        if not calc_grad:
            return fval, None, residuals
        g = grads["vp"] * (-0.5 * vp ** 3)
        return fval, g.reshape(-1).astype(np.float64), residuals
