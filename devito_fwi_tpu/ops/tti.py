"""TTI (tilted transverse isotropy) propagators — centered kernels.

TPU-native re-design of the reference TTI system
(``seismic/tti/operators.py``): the coupled second-order (u, v) system

    m u.dt2 = (1+2eps) Gxx(u) + sqrt(1+2delta) Gzz(v) - damp u.dt
    m v.dt2 = sqrt(1+2delta) Gxx(u) + Gzz(v)          - damp v.dt

(forward; the adjoint applies the rotated operators to the coupled
combinations, ``operators.py:233-243``), with rotated second derivatives
built from half-order centered first derivatives and their exact discrete
transposes (``Gzz_centered(_2d)``, ``operators.py:54-178``):

    Gz  = -(sin th cos ph D1x + sin th sin ph D1y + cos th D1z) u
    Gzz = -(D1x(sin th cos ph Gz) + D1y(sin th sin ph Gz) + D1z(cos th Gz))
    Gxx(+Gyy) = laplace(u) - Gzz(u)     (rotation invariance)

where D1 is the centered first derivative of order ``space_order//2``
(``fd_order=order1``) and the ``.T`` transpose of a centered antisymmetric
stencil is its negation — which makes the discrete Gzz exactly symmetric
and the forward/adjoint pair an exact transpose (verified by the dot tests
in tests/test_tti.py).

Sources inject ``w_p src[t] dt^2/m`` into BOTH u[t+1] and v[t+1];
receivers record u+v (``operators.py:476-479``). Born drives the twin
system with ``qu = -dm u0.dt2, qv = -dm v0.dt2`` (``operators.py:570-575``)
and the Jacobian adjoint accumulates ``dm -= u0.dt2 du + v0.dt2 dv``
(``operators.py:633``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.fd import fd_weights, second_derivative_weights
from .acoustic import _axis_d2, _scatter_add, _gather, _update

__all__ = ["forward", "adjoint", "born", "jacobian_adjoint",
           "forward_ckpt", "jacobian_adjoint_from_ckpt"]


def _d1(u, w1, axis, inv_h):
    """Centered first derivative (order space_order//2), zero-Dirichlet."""
    r = (len(w1) - 1) // 2
    nd = u.ndim
    pad = [(0, 0)] * nd
    pad[axis] = (r, r)
    up = jnp.pad(u, pad)
    n = u.shape[axis]

    def sl(shift):
        s = [slice(None)] * nd
        s[axis] = slice(r + shift, r + shift + n)
        return tuple(s)

    out = 0.0
    for k in range(-r, r + 1):
        if w1[k + r] != 0.0:
            out = out + w1[k + r] * up[sl(k)]
    return out * inv_h


def _prep_tti(vp, damp, epsilon, delta, theta, phi, dt, spacing, space_order):
    dtype = vp.dtype
    ndim = len(spacing)
    order1 = space_order // 2
    r1 = order1 // 2
    if r1 < 1:
        raise ValueError("TTI centered kernel needs space_order >= 4")
    w1 = np.asarray(fd_weights(1, np.arange(-r1, r1 + 1), 0.0), dtype=dtype)
    w2 = jnp.asarray(
        second_derivative_weights(space_order)[space_order // 2:], dtype=dtype)
    inv_h = [jnp.asarray(1.0 / h, dtype=dtype) for h in spacing]
    inv_h2 = [jnp.asarray(1.0 / (h * h), dtype=dtype) for h in spacing]
    m = 1.0 / (vp * vp)
    s = jnp.asarray(dt, dtype=dtype)
    s2 = s * s
    hd = s * damp
    ehat = 1.0 + 2.0 * epsilon
    dhat = jnp.sqrt(1.0 + 2.0 * delta)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    if ndim == 3:
        cph = jnp.cos(phi) if phi is not None else 1.0
        sph = jnp.sin(phi) if phi is not None else 0.0
        dirs = (sth * cph, sth * sph, cth)
    else:
        dirs = (sth, cth)

    def gzz(u):
        gz = -sum(dirs[d] * _d1(u, w1, d, inv_h[d]) for d in range(ndim))
        return -sum(_d1(dirs[d] * gz, w1, d, inv_h[d]) for d in range(ndim))

    def lap(u):
        out = 0.0
        for d in range(ndim):
            out = out + _axis_d2(u, w2, d) * inv_h2[d]
        return out

    def gxx(u):
        return lap(u) - gzz(u)

    inv_mhd = 1.0 / (m + hd)
    return gzz, gxx, m, ehat, dhat, s, s2, hd, inv_mhd


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing", "save"))
def forward(vp, damp, epsilon, delta, theta, phi, src_wav, src_idx, src_w,
            rec_idx, rec_w, dt, *, nt, spacing, space_order=4, save=False):
    """TTI forward modeling. Returns (rec (nt, nrec), u history, v history)
    if save else (rec, (u,v) final slices)."""
    gzz, gxx, m, ehat, dhat, s, s2, hd, inv_mhd = _prep_tti(
        vp, damp, epsilon, delta, theta, phi, dt, spacing, space_order)
    src_scale = src_w * s2 / _gather(m, src_idx)

    def step(carry, src_t):
        u, u_prev, v, v_prev = carry
        rec_t = jnp.sum(_gather(u + v, rec_idx) * rec_w, axis=-1)
        Gxx_u = gxx(u)
        Gzz_v = gzz(v)
        H0 = ehat * Gxx_u + dhat * Gzz_v
        Hz = dhat * Gxx_u + Gzz_v
        unext = _update(u, u_prev, H0, 0.0, m, hd, s2, inv_mhd)
        vnext = _update(v, v_prev, Hz, 0.0, m, hd, s2, inv_mhd)
        inj = src_t[:, None] * src_scale
        unext = _scatter_add(unext, src_idx, inj)
        vnext = _scatter_add(vnext, src_idx, inj)
        return (unext, u, vnext, v), \
            (rec_t, (unext, vnext) if save else None)

    z = jnp.zeros_like(vp)
    (u_l, u_p, v_l, v_p), (recs, uv) = jax.lax.scan(step, (z, z, z, z),
                                                    src_wav[1:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=vp.dtype)
    rec = rec.at[1:nt - 1].set(recs)
    if save:
        zz = jnp.zeros((2,) + vp.shape, vp.dtype)
        u_full = jnp.concatenate([zz, uv[0]])
        v_full = jnp.concatenate([zz, uv[1]])
        return rec, u_full, v_full
    return rec, jnp.stack([u_l, u_p]), jnp.stack([v_l, v_p])


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing"))
def adjoint(vp, damp, epsilon, delta, theta, phi, rec_data, rec_idx, rec_w,
            src_idx, src_w, dt, *, nt, spacing, space_order=4):
    """TTI adjoint modeling: time-reversed coupled system with
    ``H0 = Gxx(ehat p + dhat r), Hz = Gzz(dhat p + r)``
    (``operators.py:233-243``), receiver data injected into both fields.
    Returns (srca, final p)."""
    gzz, gxx, m, ehat, dhat, s, s2, hd, inv_mhd = _prep_tti(
        vp, damp, epsilon, delta, theta, phi, dt, spacing, space_order)
    rec_scale = rec_w * s2 / _gather(m, rec_idx)

    def step(carry, rec_t):
        p, p_next, r, r_next = carry
        srca_t = jnp.sum(_gather(p + r, src_idx) * src_w, axis=-1)
        H0 = gxx(ehat * p + dhat * r)
        Hz = gzz(dhat * p + r)
        pprev = _update(p, p_next, H0, 0.0, m, hd, s2, inv_mhd)
        rprev = _update(r, r_next, Hz, 0.0, m, hd, s2, inv_mhd)
        inj = rec_t[:, None] * rec_scale
        pprev = _scatter_add(pprev, rec_idx, inj)
        rprev = _scatter_add(rprev, rec_idx, inj)
        return (pprev, p, rprev, r), srca_t

    z = jnp.zeros_like(vp)
    (p_l, _, _, _), srcas = jax.lax.scan(step, (z, z, z, z),
                                         rec_data[1:nt - 1][::-1])
    srca = jnp.zeros((nt, src_idx.shape[0]), dtype=vp.dtype)
    srca = srca.at[1:nt - 1].set(srcas[::-1])
    return srca, p_l


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing"))
def born(vp, damp, epsilon, delta, theta, phi, dm, src_wav, src_idx, src_w,
         rec_idx, rec_w, dt, *, nt, spacing, space_order=4):
    """TTI linearized Born modeling: twin coupled systems, with
    ``qu = -dm u0.dt2, qv = -dm v0.dt2`` (``operators.py:570-575``).
    Returns rec = du + dv traces."""
    gzz, gxx, m, ehat, dhat, s, s2, hd, inv_mhd = _prep_tti(
        vp, damp, epsilon, delta, theta, phi, dt, spacing, space_order)
    src_scale = src_w * s2 / _gather(m, src_idx)

    def step(carry, src_t):
        u0, u0p, v0, v0p, du, dup, dv, dvp = carry
        rec_t = jnp.sum(_gather(du + dv, rec_idx) * rec_w, axis=-1)
        Gxx_u0 = gxx(u0)
        Gzz_v0 = gzz(v0)
        u0n = _update(u0, u0p, ehat * Gxx_u0 + dhat * Gzz_v0, 0.0, m, hd, s2, inv_mhd)
        v0n = _update(v0, v0p, dhat * Gxx_u0 + Gzz_v0, 0.0, m, hd, s2, inv_mhd)
        inj = src_t[:, None] * src_scale
        u0n = _scatter_add(u0n, src_idx, inj)
        v0n = _scatter_add(v0n, src_idx, inj)
        qu = -dm * (u0n - 2.0 * u0 + u0p) / s2
        qv = -dm * (v0n - 2.0 * v0 + v0p) / s2
        Gxx_du = gxx(du)
        Gzz_dv = gzz(dv)
        dun = _update(du, dup, ehat * Gxx_du + dhat * Gzz_dv, qu, m, hd, s2, inv_mhd)
        dvn = _update(dv, dvp, dhat * Gxx_du + Gzz_dv, qv, m, hd, s2, inv_mhd)
        return (u0n, u0, v0n, v0, dun, du, dvn, dv), rec_t

    z = jnp.zeros_like(vp)
    _, recs = jax.lax.scan(step, (z,) * 8, src_wav[1:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=vp.dtype)
    rec = rec.at[1:nt - 1].set(recs)
    return rec


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing"))
def jacobian_adjoint(vp, damp, epsilon, delta, theta, phi, u0_save, v0_save,
                     rec_res, rec_idx, rec_w, dt, *, nt, spacing,
                     space_order=4):
    """TTI gradient: reverse-time coupled adjoint (du, dv) with receiver
    injection into both fields, accumulating
    ``dm -= u0.dt2 du + v0.dt2 dv`` (``operators.py:633``)."""
    gzz, gxx, m, ehat, dhat, s, s2, hd, inv_mhd = _prep_tti(
        vp, damp, epsilon, delta, theta, phi, dt, spacing, space_order)
    rec_scale = rec_w * s2 / _gather(m, rec_idx)

    def step(carry, xs):
        du, dun, dv, dvn, dm = carry
        t, rec_t = xs

        def dt2_of(saved):
            a = jax.lax.dynamic_index_in_dim(saved, t - 1, keepdims=False)
            b_ = jax.lax.dynamic_index_in_dim(saved, t, keepdims=False)
            c = jax.lax.dynamic_index_in_dim(saved, t + 1, keepdims=False)
            return (c - 2.0 * b_ + a) / s2

        dm = dm - (dt2_of(u0_save) * du + dt2_of(v0_save) * dv)
        H0 = gxx(ehat * du + dhat * dv)
        Hz = gzz(dhat * du + dv)
        dup = _update(du, dun, H0, 0.0, m, hd, s2, inv_mhd)
        dvp = _update(dv, dvn, Hz, 0.0, m, hd, s2, inv_mhd)
        inj = rec_t[:, None] * rec_scale
        dup = _scatter_add(dup, rec_idx, inj)
        dvp = _scatter_add(dvp, rec_idx, inj)
        return (dup, du, dvp, dv, dm), None

    z = jnp.zeros_like(vp)
    ts = jnp.arange(nt - 2, 0, -1, dtype=jnp.int32)
    rec_r = rec_res[1:nt - 1][::-1]
    (du_l, _, _, _, dm), _ = jax.lax.scan(
        step, (z, z, z, z, jnp.zeros_like(vp)), (ts, rec_r))
    return dm, du_l


# ---------------------------------------------------------------------------
# segment-checkpointed TTI gradient (the acoustic forward_ckpt /
# gradient_from_ckpt machinery applied to the coupled (u, v) system).
# The save=True + jacobian_adjoint pair stores BOTH full wavefield
# histories in HBM — measured ~100x slower than checkpoint+recompute on
# TPU for the acoustic system (docs/04_performance.md item 6), and twice
# the buffers here. Exact same numerics as the saved path (verified to
# f32/f64 roundoff in tests/test_tti.py).
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nt", "space_order", "spacing",
                                   "n_checkpoints", "with_illum"))
def forward_ckpt(vp, damp, epsilon, delta, theta, phi, src_wav, src_idx,
                 src_w, rec_idx, rec_w, dt, *, nt, spacing, space_order=4,
                 n_checkpoints=16, with_illum=False):
    """TTI forward recording receivers and (u, u_prev, v, v_prev)
    segment-start states for ``jacobian_adjoint_from_ckpt``. Returns
    (rec (nt, nrec), seg_starts (nseg, 4, *grid)); with_illum=True
    appends illum = valid-masked sum_t (u^2 + v^2), the TTI analog of
    the acoustic preconditioner field (reference ``fwi.py:170``)."""
    from .acoustic import _ckpt_layout

    gzz, gxx, m, ehat, dhat, s, s2, hd, inv_mhd = _prep_tti(
        vp, damp, epsilon, delta, theta, phi, dt, spacing, space_order)
    src_scale = src_w * s2 / _gather(m, src_idx)

    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    total = nseg * seg
    src_pad = jnp.zeros((total, src_wav.shape[1]), src_wav.dtype)
    src_pad = src_pad.at[:nsteps].set(src_wav[1:nt - 1])
    valid = (jnp.arange(total) < nsteps).reshape(nseg, seg)

    def fwd_step(carry, xs):
        u, u_prev, v, v_prev, illum = carry
        src_t, valid_t = xs
        rec_t = jnp.sum(_gather(u + v, rec_idx) * rec_w, axis=-1)
        Gxx_u = gxx(u)
        Gzz_v = gzz(v)
        unext = _update(u, u_prev, ehat * Gxx_u + dhat * Gzz_v, 0.0, m,
                        hd, s2, inv_mhd)
        vnext = _update(v, v_prev, dhat * Gxx_u + Gzz_v, 0.0, m, hd, s2,
                        inv_mhd)
        inj = src_t[:, None] * src_scale
        unext = _scatter_add(unext, src_idx, inj)
        vnext = _scatter_add(vnext, src_idx, inj)
        if with_illum:
            illum = illum + jnp.where(valid_t,
                                      unext * unext + vnext * vnext, 0.0)
        return (unext, u, vnext, v, illum), rec_t

    def seg_fwd(carry, xs):
        u, u_prev, v, v_prev, _ = carry
        out, rec_seg = jax.lax.scan(fwd_step, carry, xs)
        return out, (jnp.stack([u, u_prev, v, v_prev]), rec_seg)

    z = jnp.zeros_like(vp)
    (_, _, _, _, illum), (seg_starts, rec_segs) = jax.lax.scan(
        seg_fwd, (z, z, z, z, z), (src_pad.reshape(nseg, seg, -1), valid))
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=vp.dtype)
    rec = rec.at[1:nt - 1].set(rec_segs.reshape(total, -1)[:nsteps])
    if with_illum:
        return rec, seg_starts, illum
    return rec, seg_starts


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing",
                                   "n_checkpoints"))
def jacobian_adjoint_from_ckpt(vp, damp, epsilon, delta, theta, phi,
                               src_wav, src_idx, src_w, seg_starts,
                               rec_res, rec_idx, rec_w, dt, *, nt, spacing,
                               space_order=4, n_checkpoints=16):
    """Checkpointed TTI gradient: recompute each forward segment's (u, v)
    histories from the stored start states, then step the coupled
    adjoint (du, dv) backward through the segment accumulating the
    unscaled ``(u0.dt2 du + v0.dt2 dv)`` (one final -1/s^2 scale, the
    acoustic path's association). Matches ``jacobian_adjoint`` numerics;
    reference semantics ``seismic/tti/operators.py:600-640``."""
    from .acoustic import _ckpt_layout

    gzz, gxx, m, ehat, dhat, s, s2, hd, inv_mhd = _prep_tti(
        vp, damp, epsilon, delta, theta, phi, dt, spacing, space_order)
    src_scale = src_w * s2 / _gather(m, src_idx)
    rec_scale = rec_w * s2 / _gather(m, rec_idx)

    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    total = nseg * seg
    src_pad = jnp.zeros((total, src_wav.shape[1]), src_wav.dtype)
    src_pad = src_pad.at[:nsteps].set(src_wav[1:nt - 1])
    rec_pad = jnp.zeros((total, rec_res.shape[1]), rec_res.dtype)
    rec_pad = rec_pad.at[:nsteps].set(rec_res[1:nt - 1])

    def seg_rev(carry, xs):
        du, dun, dv, dvn, grad = carry
        seg_start, src_seg, rec_seg, seg_idx = xs

        def refwd(c, src_t):
            u, u_prev, v, v_prev = c
            Gxx_u = gxx(u)
            Gzz_v = gzz(v)
            unext = _update(u, u_prev, ehat * Gxx_u + dhat * Gzz_v, 0.0,
                            m, hd, s2, inv_mhd)
            vnext = _update(v, v_prev, dhat * Gxx_u + Gzz_v, 0.0, m, hd,
                            s2, inv_mhd)
            inj = src_t[:, None] * src_scale
            unext = _scatter_add(unext, src_idx, inj)
            vnext = _scatter_add(vnext, src_idx, inj)
            return (unext, u, vnext, v), (unext, vnext)

        _, (u_new, v_new) = jax.lax.scan(
            refwd, (seg_start[0], seg_start[1], seg_start[2],
                    seg_start[3]), src_seg)
        useg = jnp.concatenate([seg_start[1][None], seg_start[0][None],
                                u_new])
        vseg = jnp.concatenate([seg_start[3][None], seg_start[2][None],
                                v_new])

        def rev_step(c, xs_local):
            du, dun, dv, dvn, grad, u_hi, u_mid, v_hi, v_mid = c
            j, rec_t, valid = xs_local
            u_lo = jax.lax.dynamic_index_in_dim(useg, j, keepdims=False)
            v_lo = jax.lax.dynamic_index_in_dim(vseg, j, keepdims=False)
            udt2s = u_hi - 2.0 * u_mid + u_lo
            vdt2s = v_hi - 2.0 * v_mid + v_lo
            grad = grad + jnp.where(valid, udt2s * du + vdt2s * dv, 0.0)
            H0 = gxx(ehat * du + dhat * dv)
            Hz = gzz(dhat * du + dv)
            dup = _update(du, dun, H0, 0.0, m, hd, s2, inv_mhd)
            dvp = _update(dv, dvn, Hz, 0.0, m, hd, s2, inv_mhd)
            inj = rec_t[:, None] * rec_scale
            dup = _scatter_add(dup, rec_idx, inj)
            dvp = _scatter_add(dvp, rec_idx, inj)
            new = [jnp.where(valid, a, b) for a, b in
                   ((dup, du), (du, dun), (dvp, dv), (dv, dvn))]
            return tuple(new) + (grad, u_mid, u_lo, v_mid, v_lo), None

        base = seg_idx * seg
        local = jnp.arange(seg - 1, -1, -1)
        valid = (base + local) < nsteps
        (du, dun, dv, dvn, grad, _, _, _, _), _ = jax.lax.scan(
            rev_step,
            (du, dun, dv, dvn, grad, useg[seg + 1], useg[seg],
             vseg[seg + 1], vseg[seg]),
            (local, rec_seg[::-1], valid))
        return (du, dun, dv, dvn, grad), None

    z = jnp.zeros_like(vp)
    (du, _, _, _, grad), _ = jax.lax.scan(
        seg_rev, (z, z, z, z, jnp.zeros_like(vp)),
        (seg_starts[::-1], src_pad.reshape(nseg, seg, -1)[::-1],
         rec_pad.reshape(nseg, seg, -1)[::-1],
         jnp.arange(nseg - 1, -1, -1)))
    return grad * (-(1.0 / s2)), du


# ---------------------------------------------------------------------------
# staggered TTI forward (reference ``kernel_staggered_2d/3d``,
# operators.py:312-427): first-order coupled system with rotated particle
# velocities; u, v at nodes (time_order=1), vx/vy/vz staggered +h/2 in
# their own dim. Aligned-dim derivatives use the staggered D+/D- stencils,
# off-dim derivatives the centered stencil (devito's .dyc/.dzc). Forward
# only, like the reference; absorbing factor dampl = 1 - damp.
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nt", "space_order", "spacing"))
def forward_staggered(vp, damp, epsilon, delta, theta, phi, src_wav,
                      src_idx, src_w, rec_idx, rec_w, dt, *, nt, spacing,
                      space_order=4):
    from .self_adjoint import staggered_weights, shifted_derivative
    dtype = vp.dtype
    ndim = len(spacing)
    w_p, off_p, w_m, off_m = staggered_weights(space_order)
    w_p = jnp.asarray(w_p, dtype)
    w_m = jnp.asarray(w_m, dtype)
    r1 = space_order // 2 // 2 if space_order >= 4 else 1
    w1 = np.asarray(fd_weights(1, np.arange(-max(r1, 1), max(r1, 1) + 1),
                               0.0), dtype=dtype)
    inv_h = [jnp.asarray(1.0 / h, dtype=dtype) for h in spacing]
    m = 1.0 / (vp * vp)
    s = jnp.asarray(dt, dtype=dtype)
    dampl = 1.0 - damp
    ehat = 1.0 + 2.0 * epsilon
    dhat = jnp.sqrt(1.0 + 2.0 * delta)
    cth, sth = jnp.cos(theta), jnp.sin(theta)
    if ndim == 3:
        cph = jnp.cos(phi) if phi is not None else 1.0
        sph = jnp.sin(phi) if phi is not None else 0.0

    def dplus(f, ax):
        return shifted_derivative(f, w_p, off_p, ax, inv_h[ax])

    def dminus(f, ax):
        return shifted_derivative(f, w_m, off_m, ax, inv_h[ax])

    def dc(f, ax):
        return _d1(f, w1, ax, inv_h[ax])

    def avg_p(f, ax):
        # node -> staggered +h/2 average along ax (devito evaluates the
        # off-dim derivative at the staggered LHS position)
        pad = [(0, 0)] * f.ndim
        pad[ax] = (0, 1)
        fp = jnp.pad(f, pad)
        sl = [slice(None)] * f.ndim
        sl[ax] = slice(1, 1 + f.shape[ax])
        return 0.5 * (f + fp[tuple(sl)])

    def avg_m(f, ax):
        # staggered +h/2 -> node average along ax
        pad = [(0, 0)] * f.ndim
        pad[ax] = (1, 0)
        fp = jnp.pad(f, pad)
        sl = [slice(None)] * f.ndim
        sl[ax] = slice(0, f.shape[ax])
        return 0.5 * (f + fp[tuple(sl)])

    src_scale = src_w * s * s / _gather(m, src_idx)

    if ndim == 2:
        def step(carry, src_t):
            u, v, vx, vz = carry
            rec_t = jnp.sum(_gather(u + v, rec_idx) * rec_w, axis=-1)
            vx_n = dampl * vx - dampl * s * (cth * dplus(u, 0) -
                                             sth * avg_p(dc(u, 1), 0))
            vz_n = dampl * vz - dampl * s * (sth * avg_p(dc(v, 0), 1) +
                                             cth * dplus(v, 1))
            dvx = cth * dminus(vx_n, 0) - sth * avg_m(dc(vx_n, 1), 0)
            dvz = sth * avg_m(dc(vz_n, 0), 1) + cth * dminus(vz_n, 1)
            v_n = dampl * (v - s / m * (dhat * dvx + dvz))
            u_n = dampl * (u - s / m * (ehat * dvx + dhat * dvz))
            inj = src_t[:, None] * src_scale
            u_n = _scatter_add(u_n, src_idx, inj)
            v_n = _scatter_add(v_n, src_idx, inj)
            return (u_n, v_n, vx_n, vz_n), rec_t
        z = jnp.zeros_like(vp)
        init = (z, z, z, z)
    else:
        def step(carry, src_t):
            u, v, vx, vy, vz = carry
            rec_t = jnp.sum(_gather(u + v, rec_idx) * rec_w, axis=-1)
            vx_n = dampl * vx - dampl * s * (cth * cph * dplus(u, 0) +
                                             cth * sph * avg_p(dc(u, 1), 0) -
                                             sth * avg_p(dc(u, 2), 0))
            vy_n = dampl * vy - dampl * s * (-sph * avg_p(dc(u, 0), 1) +
                                             cph * dplus(u, 1))
            vz_n = dampl * vz - dampl * s * (sth * cph * avg_p(dc(v, 0), 2) +
                                             sth * sph * avg_p(dc(v, 1), 2) +
                                             cth * dplus(v, 2))
            dvx = (cth * cph * dminus(vx_n, 0) +
                   cth * sph * avg_m(dc(vx_n, 1), 0) -
                   sth * avg_m(dc(vx_n, 2), 0))
            dvy = -sph * avg_m(dc(vy_n, 0), 1) + cph * dminus(vy_n, 1)
            dvz = (sth * cph * avg_m(dc(vz_n, 0), 2) +
                   sth * sph * avg_m(dc(vz_n, 1), 2) +
                   cth * dminus(vz_n, 2))
            v_n = dampl * (v - s / m * (dhat * (dvx + dvy) + dvz))
            u_n = dampl * (u - s / m * (ehat * (dvx + dvy) + dhat * dvz))
            inj = src_t[:, None] * src_scale
            u_n = _scatter_add(u_n, src_idx, inj)
            v_n = _scatter_add(v_n, src_idx, inj)
            return (u_n, v_n, vx_n, vy_n, vz_n), rec_t
        z = jnp.zeros_like(vp)
        init = (z, z, z, z, z)

    _, recs = jax.lax.scan(step, init, src_wav[0:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec = rec.at[0:nt - 1].set(recs)
    return rec
