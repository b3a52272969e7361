"""Staggered-grid building blocks + elastic / viscoelastic forward kernels.

TPU-native re-design of the reference's first-order velocity-stress systems
(``seismic/elastic/operators.py``, ``seismic/viscoelastic/operators.py``):
devito's ``VectorTimeFunction``/``TensorTimeFunction`` symbolic machinery
becomes explicit field tuples with known staggering, and the generated C
time loop becomes one ``jax.lax.scan`` over a fused VPU stencil update.

Staggering conventions (matching devito's):

* velocity component ``v[i]`` lives at nodes shifted +h/2 in dim i;
* diagonal stress ``tau_ii`` lives at nodes; off-diagonal ``tau_ij`` is
  shifted +h/2 in both i and j;
* derivative of a node field evaluated at +h/2 uses the staggered D+
  stencil (Fornberg weights at x0=+1/2), of a +h/2-staggered field at a
  node the D- stencil — the exact skew-adjoint pair of
  ``ops.self_adjoint.staggered_weights``;
* node-centered parameters (b, mu, damp, qp, qs) appearing in an equation
  evaluated at a staggered point are arithmetically averaged over the
  staggered dims with zero halo, which is devito's automatic staggered
  averaging behavior.

Update equations (reference ``elastic/operators.py:62-65``):

    v[t+1]   = damp (v + dt b div(tau[t]))
    tau[t+1] = damp (tau + dt lam diag(div v[t+1])
                         + dt mu (grad v[t+1] + grad v[t+1]^T))

with source ``w_p src[t] dt`` injected into the diagonal stresses at t+1
and receivers recording tau_zz (rec1) and div v (rec2) at t
(``elastic/operators.py:6-31``). The rec2 observable follows devito's
expression-interpolation convention for staggered fields, reverse-
engineered against the reference golden 0.627606: each ``v[i].d{i}`` is
evaluated as the *centered* first derivative on the component's own
staggered grid (integer offsets, zero center weight — not the half-node
staggered stencil used inside the update equations), and the interpolation
gathers those values with plain node-index bilinear weights (devito's
index-space substitution applies the node corner weights to the staggered
index grid without an origin correction). This reproduces the reference
rec2 norms to 3e-6 (elastic) where the node D⁻ divergence convention is
2.7% off. The viscoelastic SLS variant adds the
memory tensor r with relaxation times t_s, t_ep, t_es derived from qp/qs/f0
(``viscoelastic/operators.py:30-58``). Both systems are forward-only in
the reference; time loop t = 0..nt-2 (time_order=1 fields).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.fd import fd_weights
from .self_adjoint import staggered_weights, shifted_derivative

__all__ = ["elastic_forward", "elastic_forward_seg", "viscoelastic_forward",
           "viscoelastic_forward_seg", "avg_to", "d_plus", "d_minus",
           "d_centered"]


# ---------------------------------------------------------------------------
# staggered helpers
# ---------------------------------------------------------------------------

def _wgt(space_order, dtype):
    w_p, off_p, w_m, off_m = staggered_weights(space_order)
    return (jnp.asarray(w_p, dtype), off_p, jnp.asarray(w_m, dtype), off_m)


def _cwgt(space_order, dtype):
    r = space_order // 2
    off = np.arange(-r, r + 1)
    return jnp.asarray(fd_weights(1, off, 0.0), dtype), off


def d_centered(u, cwgt, axis, inv_h):
    """Centered first derivative on the field's *own* grid (integer offsets,
    zero center weight) — the evaluation devito produces for a bare ``f.dx``
    of a staggered function with no target stagger, as in the receiver
    expression ``rec2.interpolate(expr=div(v))``."""
    w, off = cwgt
    return shifted_derivative(u, w, off, axis, inv_h)


def d_plus(u, wgt, axis, inv_h):
    """First derivative of a node-centered field evaluated at +h/2."""
    w_p, off_p, _, _ = wgt
    return shifted_derivative(u, w_p, off_p, axis, inv_h)


def d_minus(u, wgt, axis, inv_h):
    """First derivative of a +h/2-staggered field evaluated at the node."""
    _, _, w_m, off_m = wgt
    return shifted_derivative(u, w_m, off_m, axis, inv_h)


def avg_to(p, dims, ndim):
    """Arithmetic average of a node-centered parameter to the grid point
    shifted +h/2 in each dim of `dims` (zero beyond the array, like
    devito's halo)."""
    if not hasattr(p, "ndim") or p.ndim == 0:
        return p
    for d in dims:
        axis = p.ndim - ndim + d
        pad = [(0, 0)] * p.ndim
        pad[axis] = (0, 1)
        pp = jnp.pad(p, pad)
        sl = [slice(None)] * p.ndim
        sl[axis] = slice(1, 1 + p.shape[axis])
        p = 0.5 * (p + pp[tuple(sl)])
    return p


# one canonical sparse gather/scatter pair (OOB-corner drop semantics
# live with the interp_table contract) — do not re-copy per physics file
from .acoustic import _gather, _scatter_add  # noqa: E402


def _pairs(ndim):
    return [(i, j) for i in range(ndim) for j in range(i + 1, ndim)]


# ---------------------------------------------------------------------------
# elastic
# ---------------------------------------------------------------------------

def _elastic_step(lam, mu, b, damp, src_idx, src_w, rec_idx, rec_w, dt,
                  spacing, space_order, avg, hoist=True, collect_hist=None):
    """Build the per-timestep elastic update shared by the plain forward
    and the segment-checkpointed gradient forward. Returns
    (step, init) where ``step(carry, src_t) -> (carry', (rec1_t, rec2_t))``.
    All physics lives here — keep `elastic_forward` numerics byte-stable
    (golden 19.25636 / 0.627606 and the Pallas parity tests pin them).

    ``hoist=False`` recomputes the staggered parameter averages INSIDE
    the step (identical values): under ``jax.checkpoint(step)`` AD the
    backward scan then accumulates cotangents for the 4 base parameters
    instead of ~9 separate averaged arrays — an A/B knob for the
    gradient path (forward cost: a few extra VPU averages per step).

    ``collect_hist`` (a dtype or None): when set, the step instead
    returns ``(carry', (rec1_t, hist_t))`` where ``hist_t`` is the
    TUPLE ``(vn_0..vn_{d-1}, dtau_0..dtau_{d-1})`` cast to that dtype —
    the imaging-condition history the hand-written adjoint sweep needs.
    rec2 (div v with the centered own-grid derivative) is NOT computed
    on this path: the objective's misfit reads rec1 only, and the two
    d_centered stencils + gather per step are pure waste there. The
    field updates are byte-identical either way (the dtau list is
    formed before vn in both paths)."""
    dtype = lam.dtype
    ndim = len(spacing)
    wgt = _wgt(space_order, dtype)
    cwgt = _cwgt(space_order, dtype)
    inv_h = [jnp.asarray(1.0 / h, dtype=dtype) for h in spacing]
    s = jnp.asarray(dt, dtype=dtype)
    pairs = _pairs(ndim)

    def mavg(p, dims):
        return avg_to(p, dims, ndim) if avg else p

    def make_avgs():
        return ([mavg(b, (i,)) for i in range(ndim)],
                [mavg(damp, (i,)) for i in range(ndim)],
                {ij: mavg(mu, ij) for ij in pairs},
                {ij: mavg(damp, ij) for ij in pairs})

    if hoist:
        hoisted = make_avgs()

    src_scale = src_w * s  # inject w_p * src[t] * dt (operators.py:20-25)

    def step(carry, src_t):
        b_i, damp_i, mu_ij, damp_ij = hoisted if hoist else make_avgs()
        v, td, to = carry
        # receivers sample fields at time t; rec2 uses the centered
        # own-grid derivative per component (see module docstring)
        rec1_t = jnp.sum(_gather(td[-1], rec_idx) * rec_w, axis=-1)
        if collect_hist is None:
            div_v = sum(d_centered(v[i], cwgt, i, inv_h[i])
                        for i in range(ndim))
            rec2_t = jnp.sum(_gather(div_v, rec_idx) * rec_w, axis=-1)

        # v[t+1] = damp (v + dt b div(tau))
        dtau = []
        for i in range(ndim):
            dt_i = d_plus(td[i], wgt, i, inv_h[i])
            for (a, c) in pairs:
                if a == i:
                    dt_i = dt_i + d_minus(to[(a, c)], wgt, c, inv_h[c])
                elif c == i:
                    dt_i = dt_i + d_minus(to[(a, c)], wgt, a, inv_h[a])
            dtau.append(dt_i)
        vn = [damp_i[i] * (v[i] + s * b_i[i] * dtau[i])
              for i in range(ndim)]
        dv = [d_minus(vn[i], wgt, i, inv_h[i]) for i in range(ndim)]
        div_vn = sum(dv)

        # tau[t+1] = damp (tau + dt lam diag(div v') + dt mu (grad+grad^T))
        tdn = [damp * (td[i] + s * lam * div_vn + 2.0 * s * mu * dv[i])
               for i in range(ndim)]
        ton = {}
        for (i, j) in pairs:
            g = d_plus(vn[i], wgt, j, inv_h[j]) + \
                d_plus(vn[j], wgt, i, inv_h[i])
            ton[(i, j)] = damp_ij[(i, j)] * (to[(i, j)] +
                                             s * mu_ij[(i, j)] * g)
        # source into the diagonal stresses at t+1
        inj = src_t[:, None] * src_scale
        tdn = [_scatter_add(t_, src_idx, inj) for t_ in tdn]
        if collect_hist is not None:
            # tuple, not a stacked array: jnp.stack materializes an
            # extra copy of all 2*ndim fields per step
            hist_t = tuple(x.astype(collect_hist) for x in vn + dtau)
            return (tuple(vn), tuple(tdn), ton), (rec1_t, hist_t)
        return (tuple(vn), tuple(tdn), ton), (rec1_t, rec2_t)

    z = jnp.zeros_like(lam)
    init = (tuple(z for _ in range(ndim)), tuple(z for _ in range(ndim)),
            {ij: z for ij in pairs})
    return step, init


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing", "avg"))
def elastic_forward(lam, mu, b, damp, src_wav, src_idx, src_w, rec_idx,
                    rec_w, dt, *, nt, spacing, space_order=4, avg=True):
    """Velocity-stress elastic forward modeling. Returns
    (rec1 = tau_zz traces, rec2 = div(v) traces), each (nt, nrec)."""
    dtype = lam.dtype
    step, init = _elastic_step(lam, mu, b, damp, src_idx, src_w, rec_idx,
                               rec_w, dt, spacing, space_order, avg)
    _, (r1, r2) = jax.lax.scan(step, init, src_wav[0:nt - 1])
    rec1 = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec2 = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec1 = rec1.at[0:nt - 1].set(r1)
    rec2 = rec2.at[0:nt - 1].set(r2)
    return rec1, rec2


def elastic_forward_seg(lam, mu, b, damp, src_wav, src_idx, src_w, rec_idx,
                        rec_w, dt, *, nt, spacing, space_order=4, avg=True,
                        n_checkpoints=0, hoist=None):
    """Differentiation-ready elastic forward: identical numerics to
    :func:`elastic_forward` (same step function), but structured as an
    outer scan over time segments with ``jax.checkpoint`` on both the
    per-step body and the segment body, so ``jax.vjp`` through it is the
    exact discrete adjoint at two-level-remat memory: the backward sweep
    stores only the 5-field carry at segment boundaries plus one
    segment's worth of per-step carries (the pyrevolve analog of
    reference ``seismic/acoustic/wavesolver.py:188-201``, for a system
    the reference cannot differentiate at all — its elastic solver is
    forward-only, ``seismic/elastic/wavesolver.py:25``).

    Returns (rec1, rec2, illum) where illum = sum_t |v[t]|^2 (particle-
    velocity energy, the elastic analog of the acoustic sum_t u^2
    preconditioner) accumulated under ``stop_gradient``.

    NOT jitted here — callers jit the enclosing objective. Time loop
    covers t = 0..nt-2 like the plain forward; ``n_checkpoints=0`` picks
    ~sqrt(nt) segments."""
    dtype = lam.dtype
    ndim = len(spacing)
    if hoist is None:
        # deliberate: an env knob here would be read at TRACE time and
        # ignored by the callers' static trace keys (the bfm ANCHOR_A/W
        # footgun this repo already fixed once) — pass hoist explicitly
        # for A/Bs. Hoisted measured a wash vs in-step on chip
        # (0.663 vs 0.671 s, Marmousi2 4-shot vjp gradient).
        hoist = True
    step, init = _elastic_step(lam, mu, b, damp, src_idx, src_w, rec_idx,
                               rec_w, dt, spacing, space_order, avg,
                               hoist=hoist)
    nsteps = nt - 1
    if n_checkpoints <= 0:
        n_checkpoints = max(1, int(np.sqrt(nsteps)))
    seg = -(-nsteps // n_checkpoints)
    nseg = -(-nsteps // seg)
    total = nseg * seg
    src_pad = jnp.zeros((total, src_wav.shape[1]), src_wav.dtype)
    src_pad = src_pad.at[:nsteps].set(src_wav[0:nsteps])
    valid = (jnp.arange(total) < nsteps).reshape(nseg, seg)

    ckpt_step = jax.checkpoint(step)

    def body(carry, src_t_valid):
        (v, td, to), illum = carry
        src_t, valid_t = src_t_valid
        (vn, tdn, ton), recs = ckpt_step((v, td, to), src_t)
        # illumination rides the carry outside the AD graph; invalid
        # (padded) steps must not contribute
        en = sum(x * x for x in vn)
        illum = illum + jax.lax.stop_gradient(
            jnp.where(valid_t, en, jnp.zeros_like(en)))
        return ((vn, tdn, ton), illum), recs

    @jax.checkpoint
    def seg_body(carry, xs):
        return jax.lax.scan(body, carry, xs)

    def outer(carry, xs):
        return seg_body(carry, xs)

    illum0 = jnp.zeros_like(lam)
    src_segs = src_pad.reshape(nseg, seg, -1)
    valid_segs = valid.reshape(nseg, seg)
    (_, illum), (r1, r2) = jax.lax.scan(outer, (init, illum0),
                                        (src_segs, valid_segs))
    r1 = r1.reshape(total, -1)[:nsteps]
    r2 = r2.reshape(total, -1)[:nsteps]
    rec1 = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec2 = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec1 = rec1.at[0:nsteps].set(r1)
    rec2 = rec2.at[0:nsteps].set(r2)
    return rec1, rec2, illum


# ---------------------------------------------------------------------------
# viscoelastic (SLS)
# ---------------------------------------------------------------------------

def _viscoelastic_step(lam, mu, b, qp, qs, damp, f0, src_idx, src_w,
                       rec_idx, rec_w, dt, spacing, space_order, avg,
                       collect_hist=None):
    """Per-timestep SLS viscoelastic update shared by the plain forward
    and the segment-rematted gradient forward (pure code motion out of
    ``viscoelastic_forward`` — golden 12.28040 pins the numerics).
    Returns (step, init).

    ``collect_hist`` (a dtype or None): when set, the step instead
    returns ``(carry', (rec1_t, hist_t))`` with ``hist_t`` the tuple
    ``(vn_0.., dtau_0.., rdn_0.., ron_ij..)`` cast to that dtype — what
    the hand-written adjoint sweep's imaging condition needs
    (ops/staggered_grad.py). rec2 is skipped on that path. Field
    updates are byte-identical either way."""
    dtype = lam.dtype
    ndim = len(spacing)
    wgt = _wgt(space_order, dtype)
    cwgt = _cwgt(space_order, dtype)
    inv_h = [jnp.asarray(1.0 / h, dtype=dtype) for h in spacing]
    s = jnp.asarray(dt, dtype=dtype)
    f0 = jnp.asarray(f0, dtype=dtype)
    pairs = _pairs(ndim)

    def relax(qp_, qs_):
        t_s = (jnp.sqrt(1. + 1. / qp_ ** 2) - 1. / qp_) / f0
        t_ep = 1. / (f0 ** 2 * t_s)
        t_es = (1. + f0 * qs_ * t_s) / (f0 * qs_ - f0 ** 2 * t_s)
        return t_s, t_ep, t_es

    def mavg(p, dims):
        return avg_to(p, dims, ndim) if avg else p

    t_s, t_ep, t_es = relax(qp, qs)
    b_i = [mavg(b, (i,)) for i in range(ndim)]
    damp_i = [mavg(damp, (i,)) for i in range(ndim)]
    off = {}
    for ij in pairs:
        ts_a, _, tes_a = relax(mavg(qp, ij), mavg(qs, ij))
        off[ij] = (mavg(mu, ij), mavg(damp, ij), ts_a, tes_a)

    src_scale = src_w * s

    def step(carry, src_t):
        v, td, to, rd, ro = carry
        rec1_t = jnp.sum(_gather(td[-1], rec_idx) * rec_w, axis=-1)
        if collect_hist is None:
            div_v = sum(d_centered(v[i], cwgt, i, inv_h[i])
                        for i in range(ndim))
            rec2_t = jnp.sum(_gather(div_v, rec_idx) * rec_w, axis=-1)

        dtau = []
        for i in range(ndim):
            dt_i = d_plus(td[i], wgt, i, inv_h[i])
            for (a, c) in pairs:
                if a == i:
                    dt_i = dt_i + d_minus(to[(a, c)], wgt, c, inv_h[c])
                elif c == i:
                    dt_i = dt_i + d_minus(to[(a, c)], wgt, a, inv_h[a])
            dtau.append(dt_i)
        vn = [damp_i[i] * (v[i] + s * b_i[i] * dtau[i])
              for i in range(ndim)]
        dv = [d_minus(vn[i], wgt, i, inv_h[i]) for i in range(ndim)]
        div_vn = sum(dv)

        # memory variable first (tau reads r[t+1]; operators.py:56-58)
        rdn = [damp * (rd[i] - s / t_s * (rd[i] +
                                          mu * (t_es / t_s - 1.) * 2. * dv[i] +
                                          lam * (t_ep / t_s - 1.) * div_vn))
               for i in range(ndim)]
        ron = {}
        for (i, j) in pairs:
            mu_a, damp_a, ts_a, tes_a = off[(i, j)]
            g = d_plus(vn[i], wgt, j, inv_h[j]) + \
                d_plus(vn[j], wgt, i, inv_h[i])
            ron[(i, j)] = damp_a * (ro[(i, j)] - s / ts_a * (
                ro[(i, j)] + mu_a * (tes_a / ts_a - 1.) * g))

        tdn = [damp * (s * rdn[i] + td[i] +
                       s * (lam * t_ep / t_s * div_vn +
                            mu * t_es / t_s * 2. * dv[i]))
               for i in range(ndim)]
        ton = {}
        for (i, j) in pairs:
            mu_a, damp_a, ts_a, tes_a = off[(i, j)]
            g = d_plus(vn[i], wgt, j, inv_h[j]) + \
                d_plus(vn[j], wgt, i, inv_h[i])
            ton[(i, j)] = damp_a * (s * ron[(i, j)] + to[(i, j)] +
                                    s * mu_a * tes_a / ts_a * g)

        inj = src_t[:, None] * src_scale
        tdn = [_scatter_add(t_, src_idx, inj) for t_ in tdn]
        if collect_hist is not None:
            hist_t = tuple(x.astype(collect_hist) for x in
                           vn + dtau + rdn + [ron[ij] for ij in pairs])
            return (tuple(vn), tuple(tdn), ton, tuple(rdn), ron), \
                (rec1_t, hist_t)
        return (tuple(vn), tuple(tdn), ton, tuple(rdn), ron), \
            (rec1_t, rec2_t)

    z = jnp.zeros_like(lam)
    init = (tuple(z for _ in range(ndim)), tuple(z for _ in range(ndim)),
            {ij: z for ij in pairs}, tuple(z for _ in range(ndim)),
            {ij: z for ij in pairs})
    return step, init


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing", "avg"))
def viscoelastic_forward(lam, mu, b, qp, qs, damp, f0, src_wav, src_idx,
                         src_w, rec_idx, rec_w, dt, *, nt, spacing,
                         space_order=4, avg=True):
    """SLS viscoelastic forward modeling with a memory-variable stress
    tensor r (reference ``viscoelastic/operators.py:8-63``). Returns
    (rec1 = tau_zz, rec2 = div v)."""
    dtype = lam.dtype
    step, init = _viscoelastic_step(lam, mu, b, qp, qs, damp, f0, src_idx,
                                    src_w, rec_idx, rec_w, dt, spacing,
                                    space_order, avg)
    _, (r1, r2) = jax.lax.scan(step, init, src_wav[0:nt - 1])
    rec1 = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec2 = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec1 = rec1.at[0:nt - 1].set(r1)
    rec2 = rec2.at[0:nt - 1].set(r2)
    return rec1, rec2


def viscoelastic_forward_seg(lam, mu, b, qp, qs, damp, f0, src_wav,
                             src_idx, src_w, rec_idx, rec_w, dt, *, nt,
                             spacing, space_order=4, avg=True,
                             n_checkpoints=0):
    """Differentiation-ready SLS viscoelastic forward: same step
    function as :func:`viscoelastic_forward`, two-level-rematted like
    :func:`elastic_forward_seg` so ``jax.vjp`` gives the exact discrete
    adjoint — (vp, vs, rho, qp, qs) gradients for a system the
    reference models forward-only. Returns (rec1, rec2,
    illum = valid-masked sum_t |v|^2). NOT jitted — callers jit."""
    dtype = lam.dtype
    step, init = _viscoelastic_step(lam, mu, b, qp, qs, damp, f0, src_idx,
                                    src_w, rec_idx, rec_w, dt, spacing,
                                    space_order, avg)
    nsteps = nt - 1
    if n_checkpoints <= 0:
        n_checkpoints = max(1, int(np.sqrt(nsteps)))
    seg = -(-nsteps // n_checkpoints)
    nseg = -(-nsteps // seg)
    total = nseg * seg
    src_pad = jnp.zeros((total, src_wav.shape[1]), src_wav.dtype)
    src_pad = src_pad.at[:nsteps].set(src_wav[0:nsteps])
    valid = (jnp.arange(total) < nsteps).reshape(nseg, seg)

    ckpt_step = jax.checkpoint(step)

    def body(carry, xs):
        state, illum = carry
        src_t, valid_t = xs
        state, recs = ckpt_step(state, src_t)
        en = sum(x * x for x in state[0])
        illum = illum + jax.lax.stop_gradient(
            jnp.where(valid_t, en, jnp.zeros_like(en)))
        return (state, illum), recs

    @jax.checkpoint
    def seg_body(carry, xs):
        return jax.lax.scan(body, carry, xs)

    illum0 = jnp.zeros_like(lam)
    (_, illum), (r1, r2) = jax.lax.scan(
        lambda c, xs: seg_body(c, xs), (init, illum0),
        (src_pad.reshape(nseg, seg, -1), valid.reshape(nseg, seg)))
    r1 = r1.reshape(total, -1)[:nsteps]
    r2 = r2.reshape(total, -1)[:nsteps]
    rec1 = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec2 = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    rec1 = rec1.at[0:nsteps].set(r1)
    rec2 = rec2.at[0:nsteps].set(r2)
    return rec1, rec2, illum
