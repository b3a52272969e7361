"""Viscoacoustic propagators: SLS / Ren / Deng-McMechan, 1st & 2nd order.

TPU-native re-design of the reference's six viscoacoustic kernels
(``seismic/viscoacoustic/operators.py:45-390``), each a fused
``jax.lax.scan``:

* ``sls`` 1st order (Blanch & Symes 1995 / Dutta & Schuster 2014):
  velocity v + memory variable r + pressure p (``operators.py:45-117``);
* ``sls`` 2nd order (Bai 2014): r + p with the self-adjoint spatial operator
  ``div(b grad(p, +1/2), -1/2)`` (``operators.py:120-182``);
* ``ren`` 1st/2nd order (Ren et al. 2014) (``operators.py:184-290``);
* ``deng_mcmechan`` 1st/2nd order (Deng & McMechan 2007)
  (``operators.py:292-390``).

Relaxation parameters: ``t_s = (sqrt(1+1/qp^2)-1/qp)/f0``,
``t_ep = 1/(f0^2 t_s)``, ``tt = t_ep/t_s - 1``; ``w0 = 2 pi f0``;
``rho = 1/b``; bulk modulus ``bm = rho vp^2``.

Sources inject ``w_p src[t] dt`` (1st order) or ``w_p src[t] dt^2 vp^2``
(2nd order, ``= dt^2/m``) into p[t+1]; receivers sample p[t]
(``operators.py:9-42``). The adjoints are time-reversed recursions in the
reference's backward-kernel form (``operators.py:456-543``) and are exact
discrete transposes of the forward maps: all six kernels pass the f64
dot test ``<F(s), r> = <s, F^T(r)>`` at <=1e-10 relative
(``tests/test_physics_families.py``). Node parameters are averaged to
staggered points like devito (see ``ops.staggered``).

Time loops: t = 0..nt-2 for the 1st-order systems (time_order=1 fields),
t = 1..nt-2 for the 2nd-order ones (p.backward access), matching the
acoustic family.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .staggered import _wgt, d_plus, d_minus, avg_to, _gather, _scatter_add
from .self_adjoint import laplacian_sa

__all__ = ["forward", "adjoint", "KERNELS"]

KERNELS = {("sls", 1), ("sls", 2), ("ren", 1), ("ren", 2),
           ("deng_mcmechan", 1), ("deng_mcmechan", 2)}


def _common(vp, b, qp, damp, f0, dt, spacing, space_order, avg):
    dtype = vp.dtype
    ndim = len(spacing)
    wgt = _wgt(space_order, dtype)
    inv_h = [jnp.asarray(1.0 / h, dtype=dtype) for h in spacing]
    s = jnp.asarray(dt, dtype=dtype)
    f0 = jnp.asarray(f0, dtype=dtype)
    w0 = 2.0 * jnp.pi * f0
    rho = 1.0 / b
    bm = rho * vp * vp
    t_s = (jnp.sqrt(1. + 1. / qp ** 2) - 1. / qp) / f0
    t_ep = 1. / (f0 ** 2 * t_s)
    tt = t_ep / t_s - 1.
    b_i = [avg_to(b, (i,), ndim) if avg else b for i in range(ndim)]
    damp_i = [avg_to(damp, (i,), ndim) if avg else damp
              for i in range(ndim)]
    wp_, op_, wm_, om_ = wgt

    def lsa(p):
        """div(b grad(p, shift=+1/2), shift=-1/2)"""
        return laplacian_sa(p, b, wp_, op_, wm_, om_, inv_h)

    def grad_p(p):
        return [d_plus(p, wgt, i, inv_h[i]) for i in range(ndim)]

    def div_v(v):
        return sum(d_minus(v[i], wgt, i, inv_h[i]) for i in range(ndim))

    return dict(ndim=ndim, wgt=wgt, inv_h=inv_h, s=s, w0=w0, rho=rho,
                bm=bm, t_s=t_s, tt=tt, b_i=b_i, damp_i=damp_i, lsa=lsa,
                grad_p=grad_p, div_v=div_v)


def _forward_step(vp, b, qp, damp, src_idx, src_w, rec_idx, rec_w, dt,
                  f0, kernel, time_order, spacing, space_order, avg,
                  save=False, collect_hist=None):
    """Build the per-timestep viscoacoustic update shared by the plain
    forward and the segment-rematted gradient forward. Returns
    (step, init, t0) with ``step(carry, src_t) -> (carry',
    (rec_t, p_out))`` and t0 the first source sample (0 for 1st-order
    kernels, 1 for 2nd-order). Pure code motion out of ``forward`` —
    the golden norms and f64 dot tests pin the numerics.

    ``collect_hist`` (a dtype, sls/2 only): the step instead emits
    ``(rec_t, (L_t, rn_t))`` — the spatial-operator value and the
    updated memory variable, the two fields the hand-written adjoint
    sweep's imaging condition needs (ops/visco_grad.py). The field
    updates are byte-identical."""
    c = _common(vp, b, qp, damp, f0, dt, spacing, space_order, avg)
    s, w0, rho, bm, t_s, tt = (c["s"], c["w0"], c["rho"], c["bm"],
                               c["t_s"], c["tt"])
    lsa, grad_p, div_v = c["lsa"], c["grad_p"], c["div_v"]
    ndim = c["ndim"]
    dtype = vp.dtype
    z = jnp.zeros_like(vp)
    if collect_hist is not None:
        assert kernel == "sls" and time_order == 2, \
            "history collection is wired for the sls/2 kernel only"

    if time_order == 1:
        src_scale = src_w * s  # src * dt (operators.py:28)

        def v_update(v, p):
            gp = grad_p(p)
            return tuple(c["damp_i"][i] * (v[i] - s * c["b_i"][i] * gp[i])
                         for i in range(ndim))

        if kernel == "sls":
            def step(carry, src_t):
                v, r, p = carry
                rec_t = jnp.sum(_gather(p, rec_idx) * rec_w, axis=-1)
                vn = v_update(v, p)
                dvn = div_v(vn)
                rn = damp * (r - s / t_s * r - s / t_s * tt * bm * dvn)
                pn = damp * (p - s * bm * (tt + 1.) * dvn - s * rn)
                pn = _scatter_add(pn, src_idx, src_t[:, None] * src_scale)
                return (vn, rn, pn), (rec_t, pn if save else None)
            init = (tuple(z for _ in range(ndim)), z, z)
        elif kernel == "ren":
            eta_rho = (vp * vp * rho) / (w0 * qp)

            def step(carry, src_t):
                v, p = carry
                rec_t = jnp.sum(_gather(p, rec_idx) * rec_w, axis=-1)
                vn = v_update(v, p)
                pn = damp * (p - s * bm * div_v(vn) + s * eta_rho * lsa(p))
                pn = _scatter_add(pn, src_idx, src_t[:, None] * src_scale)
                return (vn, pn), (rec_t, pn if save else None)
            init = (tuple(z for _ in range(ndim)), z)
        else:  # deng_mcmechan
            def step(carry, src_t):
                v, p = carry
                rec_t = jnp.sum(_gather(p, rec_idx) * rec_w, axis=-1)
                vn = v_update(v, p)
                pn = damp * (p - s * bm * div_v(vn) - s * (w0 / qp) * p)
                pn = _scatter_add(pn, src_idx, src_t[:, None] * src_scale)
                return (vn, pn), (rec_t, pn if save else None)
            init = (tuple(z for _ in range(ndim)), z)

        return step, init, 0, (lambda carry: carry[-1])

    # ---- 2nd order: p (and r for sls), t = 1..nt-2
    src_scale = src_w * s * s * _gather(vp * vp, src_idx)  # dt^2/m

    if kernel == "sls":
        def step(carry, src_t):
            p, p_prev, r = carry
            rec_t = jnp.sum(_gather(p, rec_idx) * rec_w, axis=-1)
            L = lsa(p)
            rn = damp * (r + s * (tt / t_s) * rho * L - s / t_s * r)
            pn = damp * (2. * p - damp * p_prev +
                         s * s * bm * (1. + tt) * L -
                         s * s * vp * vp * rn)
            pn = _scatter_add(pn, src_idx, src_t[:, None] * src_scale)
            if collect_hist is not None:
                hist_t = (L.astype(collect_hist),
                          rn.astype(collect_hist))
                return (pn, p, rn), (rec_t, hist_t)
            return (pn, p, rn), (rec_t, pn if save else None)
        init = (z, z, z)
    elif kernel == "ren":
        eta_rho = (vp * vp * rho) / (w0 * qp)

        def step(carry, src_t):
            # carry lsa(p_prev): lsa is linear, so lsa(p - p_prev) =
            # lsa(p) - lsa(p_prev), and the previous step already
            # computed lsa(p_prev) — one stencil sweep per step instead
            # of two (XLA cannot CSE across different operands)
            p, p_prev, L_prev = carry
            rec_t = jnp.sum(_gather(p, rec_idx) * rec_w, axis=-1)
            L = lsa(p)
            pn = damp * (2. * p - damp * p_prev + s * s * bm * L +
                         s * eta_rho * (L - L_prev))
            pn = _scatter_add(pn, src_idx, src_t[:, None] * src_scale)
            return (pn, p, L), (rec_t, pn if save else None)
        init = (z, z, z)
    else:  # deng_mcmechan
        def step(carry, src_t):
            p, p_prev = carry
            rec_t = jnp.sum(_gather(p, rec_idx) * rec_w, axis=-1)
            pn = damp * (2. * p - damp * p_prev + s * s * bm * lsa(p) -
                         s * (w0 / qp) * (p - p_prev))
            pn = _scatter_add(pn, src_idx, src_t[:, None] * src_scale)
            return (pn, p), (rec_t, pn if save else None)
        init = (z, z)

    return step, init, 1, (lambda carry: carry[0])


@partial(jax.jit, static_argnames=("kernel", "time_order", "nt",
                                   "space_order", "spacing", "avg", "save"))
def forward(vp, b, qp, damp, src_wav, src_idx, src_w, rec_idx, rec_w, dt,
            f0, *, kernel="sls", time_order=2, nt, spacing, space_order=4,
            avg=True, save=False):
    """Viscoacoustic forward modeling. Returns (rec (nt, nrec), p history
    if save else final slices)."""
    assert (kernel, time_order) in KERNELS, (kernel, time_order)
    dtype = vp.dtype
    step, init, t0, final = _forward_step(
        vp, b, qp, damp, src_idx, src_w, rec_idx, rec_w, dt, f0, kernel,
        time_order, spacing, space_order, avg, save=save)
    (carry, (recs, ps)) = jax.lax.scan(step, init, src_wav[t0:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec = rec.at[t0:nt - 1].set(recs)
    if save:
        p_full = jnp.concatenate([jnp.zeros((t0 + 1,) + vp.shape, dtype),
                                  ps])
        return rec, p_full
    return rec, final(carry)


def forward_seg(vp, b, qp, damp, src_wav, src_idx, src_w, rec_idx, rec_w,
                dt, f0, *, kernel="sls", time_order=2, nt, spacing,
                space_order=4, avg=True, n_checkpoints=0):
    """Differentiation-ready viscoacoustic forward: identical numerics
    to :func:`forward` (same step builder) restructured as two-level
    rematerialization — ``jax.checkpoint`` on the per-step body and on
    the segment scan — so ``jax.vjp`` through it is the exact discrete
    adjoint at O(sqrt(nt)) memory. The reference has no viscoacoustic
    gradient at all (its solver stops at fwd+adjoint operators,
    ``seismic/viscoacoustic/wavesolver.py:60-206``); this enables
    velocity AND attenuation (qp) inversion. Returns
    (rec, illum = valid-masked sum_t p^2). NOT jitted here — callers
    jit the enclosing objective."""
    assert (kernel, time_order) in KERNELS, (kernel, time_order)
    dtype = vp.dtype
    step, init, t0, _ = _forward_step(
        vp, b, qp, damp, src_idx, src_w, rec_idx, rec_w, dt, f0, kernel,
        time_order, spacing, space_order, avg, save=False)
    nsteps = nt - 1 - t0
    if n_checkpoints <= 0:
        n_checkpoints = max(1, int(np.sqrt(nsteps)))
    seg = -(-nsteps // n_checkpoints)
    nseg = -(-nsteps // seg)
    total = nseg * seg
    src_pad = jnp.zeros((total, src_wav.shape[1]), src_wav.dtype)
    src_pad = src_pad.at[:nsteps].set(src_wav[t0:nt - 1])
    valid = (jnp.arange(total) < nsteps).reshape(nseg, seg)

    ckpt_step = jax.checkpoint(step)

    # p sits at a kernel-dependent carry slot: last for 1st-order
    # (v, [r,] p), first for 2nd-order (p, p_prev[, r/L])
    p_slot = -1 if time_order == 1 else 0

    def body(carry, xs):
        state, illum = carry
        src_t, valid_t = xs
        state, (rec_t, _) = ckpt_step(state, src_t)
        p = state[p_slot]
        illum = illum + jax.lax.stop_gradient(
            jnp.where(valid_t, p * p, jnp.zeros_like(p)))
        return (state, illum), rec_t

    @jax.checkpoint
    def seg_body(carry, xs):
        return jax.lax.scan(body, carry, xs)

    illum0 = jnp.zeros_like(vp)
    (_, illum), recs = jax.lax.scan(
        lambda c, xs: seg_body(c, xs), (init, illum0),
        (src_pad.reshape(nseg, seg, -1), valid.reshape(nseg, seg)))
    recs = recs.reshape(total, -1)[:nsteps]
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec = rec.at[t0:nt - 1].set(recs)
    return rec, illum


@partial(jax.jit, static_argnames=("kernel", "time_order", "nt",
                                   "space_order", "spacing", "avg"))
def adjoint(vp, b, qp, damp, rec_data, rec_idx, rec_w, src_idx, src_w, dt,
            f0, *, kernel="sls", time_order=2, nt, spacing, space_order=4,
            avg=True):
    """Viscoacoustic adjoint modeling (reference backward kernels,
    ``operators.py`` forward=False branches): time-reversed recursion with
    receiver injection into p[t-1], sampled at the sources. Returns
    (srca (nt, nsrcpt), final p)."""
    assert (kernel, time_order) in KERNELS, (kernel, time_order)
    c = _common(vp, b, qp, damp, f0, dt, spacing, space_order, avg)
    s, w0, rho, bm, t_s, tt = (c["s"], c["w0"], c["rho"], c["bm"],
                               c["t_s"], c["tt"])
    lsa, grad_p, div_v = c["lsa"], c["grad_p"], c["div_v"]
    ndim = c["ndim"]
    dtype = vp.dtype
    z = jnp.zeros_like(vp)
    wgt, inv_h = c["wgt"], c["inv_h"]

    def grad_of(expr):
        return [d_plus(expr, wgt, i, inv_h[i]) for i in range(ndim)]

    def div_b(v):
        # div(b * v) with staggered b averaging
        return sum(d_minus(c["b_i"][i] * v[i], wgt, i, inv_h[i])
                   for i in range(ndim))

    if time_order == 1:
        rec_scale = rec_w * s

        if kernel == "sls":
            def step(carry, rec_t):
                v, r, p = carry
                srca_t = jnp.sum(_gather(p, src_idx) * src_w, axis=-1)
                rn = damp * (r - s / t_s * r - s * p)
                gv = grad_of(bm * (1. + tt) * p)
                gr = grad_of((1. / t_s) * bm * tt * rn)
                vn = tuple(c["damp_i"][i] * (v[i] + s * gv[i] + s * gr[i])
                           for i in range(ndim))
                pn = damp * (p + s * div_b(vn))
                pn = _scatter_add(pn, rec_idx, rec_t[:, None] * rec_scale)
                return (vn, rn, pn), srca_t
            init = (tuple(z for _ in range(ndim)), z, z)
        elif kernel == "ren":
            eta = (vp * vp) / (w0 * qp)

            def step(carry, rec_t):
                v, p = carry
                srca_t = jnp.sum(_gather(p, src_idx) * src_w, axis=-1)
                gv = grad_of(bm * p)
                vn = tuple(c["damp_i"][i] * (v[i] + s * gv[i])
                           for i in range(ndim))
                pn = damp * (p + s * lsa(rho * eta * p) + s * div_b(vn))
                pn = _scatter_add(pn, rec_idx, rec_t[:, None] * rec_scale)
                return (vn, pn), srca_t
            init = (tuple(z for _ in range(ndim)), z)
        else:  # deng_mcmechan
            def step(carry, rec_t):
                v, p = carry
                srca_t = jnp.sum(_gather(p, src_idx) * src_w, axis=-1)
                gv = grad_of(bm * p)
                vn = tuple(c["damp_i"][i] * (v[i] + s * gv[i])
                           for i in range(ndim))
                pn = damp * (p + s * div_b(vn) - s * (w0 / qp) * p)
                pn = _scatter_add(pn, rec_idx, rec_t[:, None] * rec_scale)
                return (vn, pn), srca_t
            init = (tuple(z for _ in range(ndim)), z)

        carry, srcas = jax.lax.scan(step, init, rec_data[0:nt - 1][::-1])
        srca = jnp.zeros((nt, src_idx.shape[0]), dtype=dtype)
        srca = srca.at[0:nt - 1].set(srcas[::-1])
        return srca, carry[-1]

    rec_scale = rec_w * s * s * _gather(vp * vp, rec_idx)

    if kernel == "sls":
        def step(carry, rec_t):
            p, p_next, r = carry
            srca_t = jnp.sum(_gather(p, src_idx) * src_w, axis=-1)
            rn = damp * (r + s * (tt / t_s) * p - s / t_s * r)
            pn = damp * (2. * p - damp * p_next +
                         s * s * vp * vp * lsa((1. + tt) * rho * p) -
                         s * s * vp * vp * lsa(rho * rn))
            pn = _scatter_add(pn, rec_idx, rec_t[:, None] * rec_scale)
            return (pn, p, rn), srca_t
        init = (z, z, z)
    elif kernel == "ren":
        eta = (vp * vp) / (w0 * qp)

        def step(carry, rec_t):
            p, p_next = carry
            srca_t = jnp.sum(_gather(p, src_idx) * src_w, axis=-1)
            pn = damp * (2. * p - damp * p_next + s * s * lsa(bm * p) -
                         s * lsa((p_next - p) * rho * eta))
            pn = _scatter_add(pn, rec_idx, rec_t[:, None] * rec_scale)
            return (pn, p), srca_t
        init = (z, z)
    else:  # deng_mcmechan
        def step(carry, rec_t):
            p, p_next = carry
            srca_t = jnp.sum(_gather(p, src_idx) * src_w, axis=-1)
            pn = damp * (2. * p - damp * p_next +
                         s * (w0 / qp) * (p_next - p) +
                         s * s * lsa(bm * p))
            pn = _scatter_add(pn, rec_idx, rec_t[:, None] * rec_scale)
            return (pn, p), srca_t
        init = (z, z)

    carry, srcas = jax.lax.scan(step, init, rec_data[1:nt - 1][::-1])
    srca = jnp.zeros((nt, src_idx.shape[0]), dtype=dtype)
    srca = srca.at[1:nt - 1].set(srcas[::-1])
    return srca, carry[0]
