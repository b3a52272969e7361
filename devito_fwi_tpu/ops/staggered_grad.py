"""Hand-written elastic adjoint on the saved-history fast path.

The round-4 elastic gradient went through ``jax.vjp`` over the
two-level-rematted scan (``staggered.elastic_forward_seg``) — exact, but
~30x off the acoustic rate (0.9 vs 29 Gcs/s on chip): the remat
recomputes 2-3 extra sweeps and the AD-generated backward scan carries
~9 cotangent accumulators. This module replaces it with the explicit
discrete adjoint, mirroring the saved/streamed-history route already
proven for the acoustic and TTI families:

* forward sweep (no AD) saves, per step, exactly the quantities the
  imaging condition needs — ``vn_i`` (the t+1 velocities) and
  ``dtau_i`` (the stress divergences that multiply ``b``) — 2*ndim
  fields, cast to a compact history dtype (bf16 on TPU by default,
  matching ``pallas_acoustic.stream_hist_dtype``);
* reverse sweep propagates the adjoint velocity-stress fields with the
  exact transposes of the staggered derivatives (``D+^T = -D-`` and
  ``D-^T = -D+`` with the zero-Dirichlet halo — the skew-adjoint pair
  of ``self_adjoint.staggered_weights``), injects the misfit residual
  at the receivers, and accumulates the (lam, mu, b) gradients; the
  staggered parameter *averages* transpose once at the end
  (``avg_to_T``).

The adjoint of the forward update (reference equations
``seismic/elastic/operators.py:62-65``; the reference itself has NO
elastic adjoint — its solver is forward-only,
``seismic/elastic/wavesolver.py:25``) is derived as the literal
transpose of the linear time-stepping map; numerical identity with the
``jax.vjp`` route is pinned in f64 by
``tests/test_elastic_grad.py::test_saved_gradient_matches_vjp``.

Cost: exactly 2 sweeps (forward + adjoint) + one history write/read,
the same structure whose acoustic twin runs at the VPU roofline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .acoustic import _scatter_add
from .staggered import _elastic_step, _pairs, _wgt, avg_to, d_minus, \
    d_plus

__all__ = ["elastic_forward_hist", "elastic_adjoint_from_hist",
           "avg_to_T", "pad_fold"]


def avg_to_T(q, dims, ndim):
    """Exact transpose of :func:`staggered.avg_to` (per-dim
    ``out[k] = 0.5 (p[k] + p[k+1])`` with zero beyond the grid):
    ``p_bar[k] = 0.5 (q[k] + q[k-1])``. The per-dim folds commute, so
    one application order serves every ``dims`` tuple."""
    if not hasattr(q, "ndim") or q.ndim == 0:
        return q
    for d in dims:
        axis = q.ndim - ndim + d
        pad = [(0, 0)] * q.ndim
        pad[axis] = (1, 0)
        qp = jnp.pad(q, pad)
        sl = [slice(None)] * q.ndim
        sl[axis] = slice(0, q.shape[axis])
        q = 0.5 * (q + qp[tuple(sl)])
    return q


def pad_fold(g, pads):
    """Transpose of ``jnp.pad(x, pads, mode='edge')``: fold each halo
    margin's cotangent sum onto the edge cell it replicated from,
    returning the physical-domain gradient. Axis order is immaterial
    (corner halo cells fold to corner cells either way)."""
    for ax, (lo, hi) in enumerate(pads):
        n = g.shape[ax] - lo - hi

        def sl(s):
            out = [slice(None)] * g.ndim
            out[ax] = s
            return tuple(out)

        core = g[sl(slice(lo, lo + n))]
        if lo:
            core = core.at[sl(slice(0, 1))].add(
                g[sl(slice(0, lo))].sum(axis=ax, keepdims=True))
        if hi:
            core = core.at[sl(slice(n - 1, n))].add(
                g[sl(slice(lo + n, lo + n + hi))].sum(axis=ax,
                                                      keepdims=True))
        g = core
    return g


def elastic_forward_hist(lam, mu, b, damp, src_wav, src_idx, src_w,
                         rec_idx, rec_w, dt, *, nt, spacing,
                         space_order=4, avg=True, hist_dtype=None):
    """Elastic forward sweep that additionally returns the imaging-
    condition history. Numerics of the field updates and receivers are
    byte-identical to :func:`staggered.elastic_forward` (same step
    builder). Returns ``(rec1, illum, hist)`` with ``rec1`` the
    (nt, nrec) tau_zz gather, ``illum = sum_t |v[t]|^2``, and ``hist``
    a TUPLE of 2*ndim arrays, each (nt-1, *grid) in ``hist_dtype``
    (default: the compute dtype) — ``vn_0..vn_{d-1},
    dtau_0..dtau_{d-1}`` per step. rec2 is not computed on this path
    (the objective's misfits read rec1 only). NOT jitted — callers jit
    the enclosing objective."""
    dtype = lam.dtype
    if hist_dtype is None:
        hist_dtype = dtype
    step, init = _elastic_step(lam, mu, b, damp, src_idx, src_w, rec_idx,
                               rec_w, dt, spacing, space_order, avg,
                               collect_hist=hist_dtype)

    def body(carry, src_t):
        state, illum = carry
        state, (r1, h) = step(state, src_t)
        illum = illum + sum(x * x for x in state[0])
        return (state, illum), (r1, h)

    illum0 = jnp.zeros_like(lam)
    (_, illum), (r1, hist) = jax.lax.scan(body, (init, illum0),
                                          src_wav[0:nt - 1])
    rec1 = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec1 = rec1.at[0:nt - 1].set(r1)
    return rec1, illum, hist


def elastic_adjoint_from_hist(lam, mu, b, damp, rec_idx, rec_w, res,
                              hist, dt, *, nt, spacing, space_order=4,
                              avg=True):
    """Adjoint velocity-stress sweep consuming the saved history.

    ``res`` is the (nt, nrec) misfit residual — the cotangent of the
    rec1 (tau_zz) gather (row nt-1 is unused: rec1[nt-1] is the
    constant zero row). Returns the padded-grid gradients
    ``(g_lam, g_mu, g_b)`` of ``sum_t <res[t], rec1[t]>`` — i.e. the
    exact transposes the ``jax.vjp`` route produces, at 1 sweep instead
    of the remat route's ~2-3."""
    dtype = lam.dtype
    ndim = len(spacing)
    wgt = _wgt(space_order, dtype)
    inv_h = [jnp.asarray(1.0 / h, dtype=dtype) for h in spacing]
    s = jnp.asarray(dt, dtype=dtype)
    pairs = _pairs(ndim)

    def mavg(p, dims):
        return avg_to(p, dims, ndim) if avg else p

    b_i = [mavg(b, (i,)) for i in range(ndim)]
    damp_i = [mavg(damp, (i,)) for i in range(ndim)]
    mu_ij = {ij: mavg(mu, ij) for ij in pairs}
    damp_ij = {ij: mavg(damp, ij) for ij in pairs}

    nsteps = nt - 1
    res_steps = res[0:nsteps]

    def rev(carry, xs):
        vb, tdb, tob, glam, gmun, gmup, gbi = carry
        h_t, res_t = xs
        vn = [h_t[i].astype(dtype) for i in range(ndim)]
        dtau = [h_t[ndim + i].astype(dtype) for i in range(ndim)]
        # recompute the velocity derivatives the tau-update consumed
        dv = [d_minus(vn[i], wgt, i, inv_h[i]) for i in range(ndim)]
        div_vn = sum(dv)
        gsh = {ij: d_plus(vn[ij[0]], wgt, ij[1], inv_h[ij[1]]) +
               d_plus(vn[ij[1]], wgt, ij[0], inv_h[ij[0]])
               for ij in pairs}

        # tau branch: tdn_i = damp (td_i + s lam div + 2 s mu dv_i)+src,
        # ton_ij = damp_ij (to_ij + s mu_ij g_ij)
        thd = [damp * tdb[i] for i in range(ndim)]
        tho = {ij: damp_ij[ij] * tob[ij] for ij in pairs}
        sthd = sum(thd)

        # imaging condition (parameters of the tau update)
        glam = glam + s * div_vn * sthd
        gmun = gmun + 2.0 * s * sum(dv[i] * thd[i] for i in range(ndim))
        gmup = {ij: gmup[ij] + s * gsh[ij] * tho[ij] for ij in pairs}

        # cotangents into vn through dv/div and g_ij (D-^T = -D+,
        # D+^T = -D-)
        dvb = [s * lam * sthd + 2.0 * s * mu * thd[i]
               for i in range(ndim)]
        gb_ = {ij: s * mu_ij[ij] * tho[ij] for ij in pairs}
        vbt = []
        for i in range(ndim):
            t = vb[i] - d_plus(dvb[i], wgt, i, inv_h[i])
            for (a, c) in pairs:
                if a == i:
                    t = t - d_minus(gb_[(a, c)], wgt, c, inv_h[c])
                elif c == i:
                    t = t - d_minus(gb_[(a, c)], wgt, a, inv_h[a])
            vbt.append(t)
        vhat = [damp_i[i] * vbt[i] for i in range(ndim)]

        # imaging condition (b of the v update) + v/tau carry transposes
        gbi = [gbi[i] + s * dtau[i] * vhat[i] for i in range(ndim)]
        dtb = [s * b_i[i] * vhat[i] for i in range(ndim)]
        td_new = [thd[i] - d_minus(dtb[i], wgt, i, inv_h[i])
                  for i in range(ndim)]
        to_new = {ij: tho[ij] - d_plus(dtb[ij[0]], wgt, ij[1],
                                       inv_h[ij[1]])
                  - d_plus(dtb[ij[1]], wgt, ij[0], inv_h[ij[0]])
                  for ij in pairs}

        # receiver residual lands in lambda^t's tau_zz (rec1 samples
        # the incoming carry at step t)
        td_new[-1] = _scatter_add(td_new[-1], rec_idx,
                                  res_t[:, None] * rec_w)
        return (tuple(vhat), tuple(td_new), to_new, glam, gmun, gmup,
                gbi), None

    z = jnp.zeros_like(lam)
    init = (tuple(z for _ in range(ndim)), tuple(z for _ in range(ndim)),
            {ij: z for ij in pairs}, z, z, {ij: z for ij in pairs},
            [z for _ in range(ndim)])
    (vb, tdb, tob, glam, gmun, gmup, gbi), _ = jax.lax.scan(
        rev, init, (hist, res_steps), reverse=True)

    g_mu = gmun
    g_b = jnp.zeros_like(lam)
    if avg:
        for ij in pairs:
            g_mu = g_mu + avg_to_T(gmup[ij], ij, ndim)
        for i in range(ndim):
            g_b = g_b + avg_to_T(gbi[i], (i,), ndim)
    else:
        for ij in pairs:
            g_mu = g_mu + gmup[ij]
        for i in range(ndim):
            g_b = g_b + gbi[i]
    return glam, g_mu, g_b


def elastic_born(vp, vs, rho, dvp, dvs, drho, damp, src_wav, src_idx,
                 src_w, rec_idx, rec_w, dt, *, nt, spacing,
                 space_order=4, avg=True):
    """Linearized (Born) elastic forward: the exact directional
    derivative of the velocity-stress forward map at (vp, vs, rho) in
    the direction (dvp, dvs, drho), computed by forward-mode AD through
    the scan — O(1) extra memory, one fused program. The reference
    stops at acoustic/TTI/self-adjoint Born operators
    (``seismic/tti/operators.py:529-587``); its elastic solver has no
    linearization at all. Operates on PADDED-grid fields (tangents of
    the halo ride along exactly like the primal edge-pad). Returns
    ((rec1, rec2), (drec1, drec2))."""
    from .staggered import elastic_forward

    def fwd(vp_, vs_, rho_):
        lam = rho_ * (vp_ * vp_ - 2.0 * vs_ * vs_)
        mu = rho_ * vs_ * vs_
        return elastic_forward(lam, mu, 1.0 / rho_, damp, src_wav,
                               src_idx, src_w, rec_idx, rec_w, dt,
                               nt=nt, spacing=spacing,
                               space_order=space_order, avg=avg)

    zeros = jnp.zeros_like(vp)
    tang = (dvp if dvp is not None else zeros,
            dvs if dvs is not None else zeros,
            drho if drho is not None else zeros)
    primals, tangents = jax.jvp(fwd, (vp, vs, rho), tang)
    return primals, tangents


# ---------------------------------------------------------------------------
# viscoelastic (SLS) saved-history adjoint — the memory-variable twin of
# the elastic sweep above. Derivation mirrors staggered.py's
# _viscoelastic_step with node coefficient fields
#   A1 = s/t_s,  B2 = A1 mu (t_es/t_s - 1),  B3 = A1 lam (t_ep/t_s - 1),
#   Kp = lam t_ep/t_s,  Ks = mu t_es/t_s
# and the averaged off-diagonal triple (A1a, B2a, Ksa); the
# (vp, vs, rho, qp, qs) chain rule is one pointwise jax.vjp of the
# coefficient map (no hand-derived d(t_s)/d(qp)).
# ---------------------------------------------------------------------------

def viscoelastic_forward_hist(lam, mu, b, qp, qs, damp, f0, src_wav,
                              src_idx, src_w, rec_idx, rec_w, dt, *, nt,
                              spacing, space_order=4, avg=True,
                              hist_dtype=None):
    """SLS viscoelastic forward sweep emitting the imaging-condition
    history (vn_i, dtau_i, rdn_i, ron_ij per step — 7 fields in 2-D).
    Receiver numerics byte-identical to
    :func:`staggered.viscoelastic_forward`. Returns (rec1, illum,
    hist-tuple). NOT jitted — callers jit."""
    from .staggered import _viscoelastic_step

    dtype = lam.dtype
    if hist_dtype is None:
        hist_dtype = dtype
    step, init = _viscoelastic_step(lam, mu, b, qp, qs, damp, f0,
                                    src_idx, src_w, rec_idx, rec_w, dt,
                                    spacing, space_order, avg,
                                    collect_hist=hist_dtype)

    def body(carry, src_t):
        state, illum = carry
        state, (r1, h) = step(state, src_t)
        illum = illum + sum(x * x for x in state[0])
        return (state, illum), (r1, h)

    illum0 = jnp.zeros_like(lam)
    (_, illum), (r1, hist) = jax.lax.scan(body, (init, illum0),
                                          src_wav[0:nt - 1])
    rec1 = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec1 = rec1.at[0:nt - 1].set(r1)
    return rec1, illum, hist


def viscoelastic_adjoint_from_hist(vp, vs, rho, qp, qs, damp, f0,
                                   rec_idx, rec_w, res, hist, dt, *, nt,
                                   spacing, space_order=4, avg=True):
    """Adjoint SLS viscoelastic sweep consuming the saved history.
    Takes the PHYSICAL parameterization (vp, vs, rho, qp, qs) on the
    padded grid and returns its five padded-grid gradients of
    ``sum_t <res[t], rec1[t]>`` — the exact transposes of the
    ``jax.vjp`` route (pinned in f64 by
    tests/test_visco_grad.py::test_viscoelastic_saved_matches_vjp)."""
    dtype = vp.dtype
    ndim = len(spacing)
    wgt = _wgt(space_order, dtype)
    inv_h = [jnp.asarray(1.0 / h, dtype=dtype) for h in spacing]
    s = jnp.asarray(dt, dtype=dtype)
    f0 = jnp.asarray(f0, dtype=dtype)
    pairs = _pairs(ndim)

    def mavg(p, dims):
        return avg_to(p, dims, ndim) if avg else p

    def relax(qp_, qs_):
        # byte-identical to staggered._viscoelastic_step.relax
        t_s = (jnp.sqrt(1. + 1. / qp_ ** 2) - 1. / qp_) / f0
        t_ep = 1. / (f0 ** 2 * t_s)
        t_es = (1. + f0 * qs_ * t_s) / (f0 * qs_ - f0 ** 2 * t_s)
        return t_s, t_ep, t_es

    def node_coeffs(vp_, vs_, rho_, qp_, qs_):
        lam_ = rho_ * (vp_ * vp_ - 2.0 * vs_ * vs_)
        mu_ = rho_ * vs_ * vs_
        t_s, t_ep, t_es = relax(qp_, qs_)
        A1 = s / t_s
        B2 = A1 * (mu_ * (t_es / t_s - 1.))
        B3 = A1 * (lam_ * (t_ep / t_s - 1.))
        Kp = lam_ * t_ep / t_s
        Ks = mu_ * t_es / t_s
        # mu/qp/qs/b ride along so the off-diagonal (averaged) and
        # buoyancy cotangents chain through the same single vjp
        return A1, B2, B3, Kp, Ks, mu_, qp_, qs_, 1.0 / rho_

    def off_coeffs(mu_a, qp_a, qs_a):
        ts_a, _, tes_a = relax(qp_a, qs_a)
        A1a = s / ts_a
        B2a = A1a * (mu_a * (tes_a / ts_a - 1.))
        Ksa = mu_a * tes_a / ts_a
        return A1a, B2a, Ksa

    lam = rho * (vp * vp - 2.0 * vs * vs)
    mu = rho * vs * vs
    binv = 1.0 / rho
    A1, B2, B3, Kp, Ks, _, _, _, _ = node_coeffs(vp, vs, rho, qp, qs)
    b_i = [mavg(binv, (i,)) for i in range(ndim)]
    damp_i = [mavg(damp, (i,)) for i in range(ndim)]
    mu_a = {ij: mavg(mu, ij) for ij in pairs}
    qp_a = {ij: mavg(qp, ij) for ij in pairs}
    qs_a = {ij: mavg(qs, ij) for ij in pairs}
    damp_a = {ij: mavg(damp, ij) for ij in pairs}
    offc = {ij: off_coeffs(mu_a[ij], qp_a[ij], qs_a[ij]) for ij in pairs}

    nsteps = nt - 1
    res_steps = res[0:nsteps]
    z = jnp.zeros_like(vp)

    def rev(carry, xs):
        (lv, ltd, lto, lrd, lro, acc, pend) = carry
        h_t, res_t = xs
        vn = [h_t[i].astype(dtype) for i in range(ndim)]
        dtau = [h_t[ndim + i].astype(dtype) for i in range(ndim)]
        rdn = [h_t[2 * ndim + i].astype(dtype) for i in range(ndim)]
        ron = {ij: h_t[3 * ndim + k].astype(dtype)
               for k, ij in enumerate(pairs)}
        (gA1, gB2, gB3, gKp, gKs, gbi, goff) = acc
        pend_Rd, pend_Ro = pend

        dv = [d_minus(vn[i], wgt, i, inv_h[i]) for i in range(ndim)]
        div_vn = sum(dv)
        gsh = {ij: d_plus(vn[ij[0]], wgt, ij[1], inv_h[ij[1]]) +
               d_plus(vn[ij[1]], wgt, ij[0], inv_h[ij[0]])
               for ij in pairs}

        T = [damp * ltd[i] for i in range(ndim)]
        O = {ij: damp_a[ij] * lto[ij] for ij in pairs}
        Rd = [damp * (lrd[i] + s * T[i]) for i in range(ndim)]
        Ro = {ij: damp_a[ij] * (lro[ij] + s * O[ij]) for ij in pairs}
        sT = sum(T)
        sRd = sum(Rd)

        # imaging: node coefficients of the tau and memory updates
        gKp = gKp + s * div_vn * sT
        gKs = gKs + 2.0 * s * sum(dv[i] * T[i] for i in range(ndim))
        gB2 = gB2 - 2.0 * sum(dv[i] * Rd[i] for i in range(ndim))
        gB3 = gB3 - div_vn * sRd
        # gA1's rd multiplicand is rdn^{t-1} — defer one iteration
        gA1 = gA1 - sum(rdn[i] * pend_Rd[i] for i in range(ndim))
        goff_new = {}
        for ij in pairs:
            gKsa, gA1a, gB2a = goff[ij]
            gKsa = gKsa + s * gsh[ij] * O[ij]
            gB2a = gB2a - gsh[ij] * Ro[ij]
            gA1a = gA1a - ron[ij] * pend_Ro[ij]
            goff_new[ij] = (gKsa, gA1a, gB2a)

        # cotangents into vn through dv/div/g
        dvb = [2.0 * s * Ks * T[i] - 2.0 * B2 * Rd[i] +
               (s * Kp * sT - B3 * sRd) for i in range(ndim)]
        gb_ = {ij: s * offc[ij][2] * O[ij] - offc[ij][1] * Ro[ij]
               for ij in pairs}
        vbt = []
        for i in range(ndim):
            t = lv[i] - d_plus(dvb[i], wgt, i, inv_h[i])
            for (a, c) in pairs:
                if a == i:
                    t = t - d_minus(gb_[(a, c)], wgt, c, inv_h[c])
                elif c == i:
                    t = t - d_minus(gb_[(a, c)], wgt, a, inv_h[a])
            vbt.append(t)
        vhat = [damp_i[i] * vbt[i] for i in range(ndim)]
        gbi = [gbi[i] + s * dtau[i] * vhat[i] for i in range(ndim)]

        dtb = [s * b_i[i] * vhat[i] for i in range(ndim)]
        ltd_new = [T[i] - d_minus(dtb[i], wgt, i, inv_h[i])
                   for i in range(ndim)]
        lto_new = {ij: O[ij] - d_plus(dtb[ij[0]], wgt, ij[1],
                                      inv_h[ij[1]])
                   - d_plus(dtb[ij[1]], wgt, ij[0], inv_h[ij[0]])
                   for ij in pairs}
        lrd_new = [Rd[i] - A1 * Rd[i] for i in range(ndim)]
        lro_new = {ij: Ro[ij] - offc[ij][0] * Ro[ij] for ij in pairs}

        ltd_new[-1] = _scatter_add(ltd_new[-1], rec_idx,
                                   res_t[:, None] * rec_w)
        acc_new = (gA1, gB2, gB3, gKp, gKs, gbi, goff_new)
        pend_new = (tuple(Rd), {ij: Ro[ij] for ij in pairs})
        return (tuple(vhat), tuple(ltd_new), lto_new, tuple(lrd_new),
                lro_new, acc_new, pend_new), None

    acc0 = (z, z, z, z, z, [z for _ in range(ndim)],
            {ij: (z, z, z) for ij in pairs})
    init = (tuple(z for _ in range(ndim)), tuple(z for _ in range(ndim)),
            {ij: z for ij in pairs}, tuple(z for _ in range(ndim)),
            {ij: z for ij in pairs}, acc0,
            (tuple(z for _ in range(ndim)), {ij: z for ij in pairs}))
    (lv, ltd, lto, lrd, lro, acc, pend), _ = jax.lax.scan(
        rev, init, (hist, res_steps), reverse=True)
    gA1, gB2, gB3, gKp, gKs, gbi, goff = acc
    # final pending terms pair with rd^0 = ro^0 = 0: drop exactly

    # staggered-average transposes
    gb_node = jnp.zeros_like(vp)
    for i in range(ndim):
        gb_node = gb_node + (avg_to_T(gbi[i], (i,), ndim) if avg
                             else gbi[i])
    gmu_off = jnp.zeros_like(vp)
    gqp_off = jnp.zeros_like(vp)
    gqs_off = jnp.zeros_like(vp)
    for ij in pairs:
        gKsa, gA1a, gB2a = goff[ij]
        _, off_vjp = jax.vjp(off_coeffs, mu_a[ij], qp_a[ij], qs_a[ij])
        gm, gq, gs_ = off_vjp((gA1a, gB2a, gKsa))
        if avg:
            gm, gq, gs_ = (avg_to_T(gm, ij, ndim),
                           avg_to_T(gq, ij, ndim),
                           avg_to_T(gs_, ij, ndim))
        gmu_off = gmu_off + gm
        gqp_off = gqp_off + gq
        gqs_off = gqs_off + gs_

    _, node_vjp = jax.vjp(node_coeffs, vp, vs, rho, qp, qs)
    return node_vjp((gA1, gB2, gB3, gKp, gKs, gmu_off, gqp_off,
                     gqs_off, gb_node))


def viscoelastic_value_and_grad(vp, vs, rho, qp, qs, damp, f0, src_wav,
                                src_idx, src_w, rec_idx, rec_w, obs, dw,
                                dt, misfit_jax, *, nt, spacing,
                                space_order=4, avg=True, hist_dtype=None):
    """Fused (fval, (g_vp, g_vs, g_rho, g_qp, g_qs), illum, res)
    through the saved-history route."""
    lam = rho * (vp * vp - 2.0 * vs * vs)
    mu = rho * vs * vs
    rec1, illum, hist = viscoelastic_forward_hist(
        lam, mu, 1.0 / rho, qp, qs, damp, f0, src_wav, src_idx, src_w,
        rec_idx, rec_w, dt, nt=nt, spacing=spacing,
        space_order=space_order, avg=avg, hist_dtype=hist_dtype)
    f, res = misfit_jax(rec1 - dw, obs - dw)
    grads = viscoelastic_adjoint_from_hist(
        vp, vs, rho, qp, qs, damp, f0, rec_idx, rec_w,
        res.astype(vp.dtype), hist, dt, nt=nt, spacing=spacing,
        space_order=space_order, avg=avg)
    return f, grads, illum, res
