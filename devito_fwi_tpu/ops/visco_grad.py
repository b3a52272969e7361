"""Hand-written viscoacoustic (SLS, 2nd-order) adjoint on the
saved-history fast path — the visco twin of ``ops/staggered_grad.py``.

The round-4 (vp, qp) gradient went through ``jax.vjp`` over the
two-level-rematted scan (``viscoacoustic.forward_seg``); this module
replaces it for the default sls/2 kernel (reference
``seismic/viscoacoustic/operators.py:120-182``, which the reference can
model but never differentiate) with the explicit discrete adjoint:

* forward sweep saves, per step, ``L = lsa(p)`` and the updated memory
  variable ``rn`` — the only two fields the imaging condition needs;
* reverse sweep propagates the adjoint (p, p_prev, r) recursion — the
  spatial operator ``lsa`` is exactly self-adjoint (``D-^T = -D+``
  pairs), so the transpose reuses it verbatim — and accumulates the
  gradients of the four pointwise coefficient fields

      a1 = s (tt/t_s) rho   (memory feed)     a2 = s / t_s  (decay)
      a3 = s^2 bm (1 + tt)  (stiffness)       a4 = s^2 vp^2 (coupling)

  plus the source-injection scale's vp^2 dependence (2nd-order sources
  inject ``w dt^2 vp^2``);
* the (vp, qp) gradient follows by one cheap pointwise ``jax.vjp`` of
  the coefficient map — analytic chain rules for d(t_s)/d(qp) etc.
  without hand-deriving them.

Exactness vs the autodiff route is pinned in f64 by
``tests/test_visco_grad.py::test_saved_gradient_matches_vjp_visco``.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .staggered import _gather, _scatter_add
from .viscoacoustic import _common, _forward_step

__all__ = ["visco_sls2_forward_hist", "visco_sls2_adjoint_from_hist",
           "visco_sls2_value_and_grad"]


def visco_sls2_forward_hist(vp, b, qp, damp, src_wav, src_idx, src_w,
                            rec_idx, rec_w, dt, f0, *, nt, spacing,
                            space_order=4, avg=True, hist_dtype=None):
    """sls/2 forward sweep emitting the imaging-condition history.
    Receiver numerics byte-identical to ``viscoacoustic.forward`` (same
    step builder). Returns (rec (nt, nrec), illum = sum_t p[t+1]^2,
    (L_hist, rn_hist)) with each history array (nt-2, *grid) in
    ``hist_dtype`` (default compute dtype). NOT jitted — callers jit."""
    dtype = vp.dtype
    if hist_dtype is None:
        hist_dtype = dtype
    step, init, t0, _ = _forward_step(
        vp, b, qp, damp, src_idx, src_w, rec_idx, rec_w, dt, f0, "sls",
        2, spacing, space_order, avg, collect_hist=hist_dtype)

    def body(carry, src_t):
        state, illum = carry
        state, (rec_t, hist_t) = step(state, src_t)
        illum = illum + state[0] * state[0]
        return (state, illum), (rec_t, hist_t)

    illum0 = jnp.zeros_like(vp)
    (_, illum), (recs, hist) = jax.lax.scan(body, (init, illum0),
                                            src_wav[t0:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec = rec.at[t0:nt - 1].set(recs)
    return rec, illum, hist


def visco_sls2_adjoint_from_hist(vp, b, qp, damp, src_wav, src_idx,
                                 src_w, rec_idx, rec_w, res, hist, dt,
                                 f0, *, nt, spacing, space_order=4,
                                 avg=True):
    """Adjoint sls/2 sweep consuming the saved (L, rn) history; ``res``
    is the (nt, nrec) misfit residual (cotangent of the rec gather).
    Returns the padded-grid (g_vp, g_qp) of ``sum_t <res[t], rec[t]>``
    — the exact transpose the ``jax.vjp`` route produces."""
    dtype = vp.dtype
    c = _common(vp, b, qp, damp, f0, dt, spacing, space_order, avg)
    s, rho, bm, t_s, tt = c["s"], c["rho"], c["bm"], c["t_s"], c["tt"]
    lsa = c["lsa"]
    # coefficient fields with the step builder's exact associations
    # (viscoacoustic.py sls/2 branch) so the transposed products round
    # identically to the autodiff backward
    a2 = s / t_s
    a4 = s * s * vp * vp
    z = jnp.zeros_like(vp)
    t0 = 1
    nsteps = nt - 1 - t0
    res_steps = res[t0:nt - 1]
    L_hist, rn_hist = hist

    def rev(carry, xs):
        lp, lpp, lr, ga1, ga2, ga3, ga4, gsrc, pend_R = carry
        L_t, rn_t, res_t, src_t = xs
        L = L_t.astype(dtype)
        rn = rn_t.astype(dtype)
        P = damp * lp
        rbar = lr - a4 * P
        R = damp * rbar
        # imaging condition (coefficients of this step's update)
        ga3 = ga3 + L * P
        ga4 = ga4 - rn * P
        ga1 = ga1 + L * R
        # ga2 needs r^t = rn^{t-1}: defer via pend_R, resolved when the
        # previous step's rn arrives (next reverse iteration)
        ga2 = ga2 - rn * pend_R
        # source scale w dt^2 vp^2: the scatter lands AFTER the damp
        # bracket, so its cotangent samples the raw lambda_p
        gsrc = gsrc + src_t[:, None] * src_w * _gather(lp, src_idx)
        # field transposes: pn = damp(2p - damp p_prev + a3 L - a4 rn)
        # + src;  rn = damp(r + a1 L - a2 r);  rec_t = gather(p)
        lp_new = 2.0 * P + lsa((s * s * bm * (1. + tt)) * P) \
            + lsa((s * (tt / t_s) * rho) * R) + lpp
        lp_new = _scatter_add(lp_new, rec_idx, res_t[:, None] * rec_w)
        lpp_new = -damp * P
        lr_new = R - a2 * R
        return (lp_new, lpp_new, lr_new, ga1, ga2, ga3, ga4, gsrc, R), \
            None

    # src_steps folds the s^2 of the 2nd-order source scale
    # (src_scale = src_w * s^2 * gather(vp^2)) so the rev body only
    # multiplies by src_w and the sampled lambda
    init = (z, z, z, z, z, z, z,
            jnp.zeros(src_w.shape, dtype), z)
    src_steps = src_wav[t0:nt - 1] * (s * s)
    (lp, lpp, lr, ga1, ga2, ga3, ga4, gsrc, pend_R), _ = jax.lax.scan(
        rev, init, (L_hist, rn_hist, res_steps, src_steps), reverse=True)
    # the final pending term pairs with r^{t0} = 0: drops exactly

    def coeff_map(vp_, qp_):
        t_s_ = (jnp.sqrt(1. + 1. / qp_ ** 2) - 1. / qp_) / \
            jnp.asarray(f0, dtype)
        t_ep_ = 1. / (jnp.asarray(f0, dtype) ** 2 * t_s_)
        tt_ = t_ep_ / t_s_ - 1.
        rho_ = 1.0 / b
        bm_ = rho_ * vp_ * vp_
        c1 = s * (tt_ / t_s_) * rho_
        c2 = s / t_s_
        c3 = s * s * bm_ * (1. + tt_)
        c4 = s * s * vp_ * vp_
        vp2 = vp_ * vp_
        return c1, c2, c3, c4, vp2

    # fold the source-corner cotangent back onto the vp^2 field
    g_vp2_src = _scatter_add(jnp.zeros_like(vp), src_idx, gsrc)
    _, vjp_fn = jax.vjp(coeff_map, vp, qp)
    g_vp, g_qp = vjp_fn((ga1, ga2, ga3, ga4, g_vp2_src))
    return g_vp, g_qp


def visco_sls2_value_and_grad(vp, b, qp, damp, src_wav, src_idx, src_w,
                              rec_idx, rec_w, obs, dw, dt, f0,
                              misfit_jax, *, nt, spacing, space_order=4,
                              avg=True, hist_dtype=None):
    """Fused (fval, (g_vp, g_qp), illum, res) through the saved-history
    route — forward + misfit + one adjoint sweep."""
    rec, illum, hist = visco_sls2_forward_hist(
        vp, b, qp, damp, src_wav, src_idx, src_w, rec_idx, rec_w, dt,
        f0, nt=nt, spacing=spacing, space_order=space_order, avg=avg,
        hist_dtype=hist_dtype)
    f, res = misfit_jax(rec - dw, obs - dw)
    g_vp, g_qp = visco_sls2_adjoint_from_hist(
        vp, b, qp, damp, src_wav, src_idx, src_w, rec_idx, rec_w,
        res.astype(vp.dtype), hist, dt, f0, nt=nt, spacing=spacing,
        space_order=space_order, avg=avg)
    return f, (g_vp, g_qp), illum, res


def visco_born(vp, b, qp, dvp, dqp, damp, src_wav, src_idx, src_w,
               rec_idx, rec_w, dt, f0, *, kernel="sls", time_order=2,
               nt, spacing, space_order=4, avg=True):
    """Linearized (Born) viscoacoustic forward for ANY of the six
    kernels: the exact directional derivative of the forward map at
    (vp, qp) in the direction (dvp, dqp) by forward-mode AD through the
    scan — Q-sensitivity Born modeling the reference cannot do (its
    viscoacoustic stack stops at forward+adjoint,
    ``seismic/viscoacoustic/wavesolver.py``). PADDED-grid fields.
    Returns (rec, drec)."""
    from .viscoacoustic import forward

    def fwd(vp_, qp_):
        rec, _ = forward(vp_, b, qp_, damp, src_wav, src_idx, src_w,
                         rec_idx, rec_w, dt, f0, kernel=kernel,
                         time_order=time_order, nt=nt, spacing=spacing,
                         space_order=space_order, avg=avg, save=False)
        return rec

    zeros = jnp.zeros_like(vp)
    tang = (dvp if dvp is not None else zeros,
            dqp if dqp is not None else zeros)
    rec, drec = jax.jvp(fwd, (vp, qp), tang)
    return rec, drec
