"""Self-adjoint variable-density visco-acoustic propagators.

TPU-native re-design of the reference's Chevron-contributed self-adjoint
system (``seismic/self_adjoint/operators.py``, ``wavesolver.py``,
``utils.py``): an energy-conserving scalar wave equation

    b/v^2 [ P.dt2 + (w/Q) P.dt ] = div(b grad P) + s

where the spatial operator is built from half-cell-shifted first
derivatives, ``D-(b D+(P))`` per axis, whose discrete matrices form an
exact skew-symmetric pair (``D-^T = -D+`` with zero-Dirichlet padding) —
this makes forward/adjoint an exact transpose pair and the w/Q absorbing
boundary dissipation-only.

Discretization parity notes (checked against the reference):

* time update (``operators.py:48-66``):
      u[t+1] = (dt^2 v^2/b)(L(u[t]) + q)
               + (2 - dt*woq) u[t] + (dt*woq - 1) u[t-1]
  with ``L(u) = sum_axes D-_ax(b * D+_ax(u)) / h^2`` where D+/D- are the
  order-`so` first-derivative stencils evaluated at x0 = x +- h/2
  (weights from the Fornberg recursion, ``utils.fd.fd_weights``).
* source injection adds ``w_p * src[t] * dt^2 * v[p]^2/b[p]`` into u[t+1]
  (``operators.py:105``); receivers sample u[t] multilinearly; loop
  bounds t = 1..nt-2 as for the acoustic family.
* adjoint = time-reversed recursion with receiver injection into v[t-1]
  (``operators.py:150-153``).
* Born / linearized source (``operators.py:206-208``):
      q = 2 b dm v^-3 (woq * u0.dt(x0=t-dt/2) + u0.dt2)
  with the backward difference ``u0.dt(x0=t-dt/2) = (u0[t]-u0[t-1])/dt``.
* Jacobian adjoint accumulates ``dm += du[t] * 2 b v^-3 (woq*u0.dtbw +
  u0.dt2)[t]`` while stepping du backward (``operators.py:259-261``).
* w/Q absorbing boundary: log-interpolated Q from qmin at the outer edge
  to qmax in the interior over the pad, ``woq = w / exp(log qmin +
  pos*(log qmax - log qmin))`` with pos the min normalized distance to
  any boundary (``seismic/self_adjoint/utils.py:8-63``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.fd import fd_weights

__all__ = ["staggered_weights", "shifted_derivative", "setup_w_over_q",
           "forward", "adjoint", "born", "jacobian_adjoint",
           "laplacian_sa"]


# ---------------------------------------------------------------------------
# half-cell-shifted first derivatives
# ---------------------------------------------------------------------------

def staggered_weights(space_order):
    """FD weights for the first derivative evaluated at x0 = x + h/2 (w_plus,
    on offsets -r+1..r) and x0 = x - h/2 (w_minus, on offsets -r..r-1), with
    r = space_order//2. The two discrete operators (zero-Dirichlet beyond
    the grid) are exact negative transposes of each other."""
    r = space_order // 2
    off_p = np.arange(-r + 1, r + 1)
    off_m = np.arange(-r, r)
    w_p = fd_weights(1, off_p, 0.5)
    w_m = fd_weights(1, off_m, -0.5)
    return w_p, off_p, w_m, off_m


def shifted_derivative(u, w, offsets, axis, inv_h):
    """Apply a shifted first-derivative stencil along `axis` with
    zero-Dirichlet values beyond the array (devito halo semantics)."""
    r = int(max(abs(int(offsets[0])), abs(int(offsets[-1]))))
    nd = u.ndim
    pad = [(0, 0)] * nd
    pad[axis] = (r, r)
    up = jnp.pad(u, pad)
    n = u.shape[axis]

    def sl(shift):
        s = [slice(None)] * nd
        s[axis] = slice(r + shift, r + shift + n)
        return tuple(s)

    out = w[0] * up[sl(int(offsets[0]))]
    for k in range(1, len(w)):
        out = out + w[k] * up[sl(int(offsets[k]))]
    return out * inv_h


def laplacian_sa(u, b, wp, op, wm, om, inv_h):
    """The self-adjoint spatial operator ``sum_d D-_d(b * D+_d(u))``."""
    ndim_sp = len(inv_h)
    offset = u.ndim - ndim_sp
    out = 0.0
    for d in range(ndim_sp):
        axis = offset + d
        g = shifted_derivative(u, wp, op, axis, inv_h[d])
        out = out + shifted_derivative(b * g, wm, om, axis, inv_h[d])
    return out


# ---------------------------------------------------------------------------
# w/Q absorbing boundary field
# ---------------------------------------------------------------------------

def setup_w_over_q(shape_pad, w, qmin, qmax, npad, sigma=0, dtype=np.float32):
    """Numpy build of the w/Q attenuation field on the padded grid
    (reference ``seismic/self_adjoint/utils.py:8-63``): normalized distance
    to the closest boundary (1 in the interior), then
    ``w / exp(log qmin + pos (log qmax - log qmin))``."""
    assert w > 0 and qmin > 0 and qmax > 0 and npad > 0
    for n in shape_pad:
        if n - 2 * npad < 1:
            raise ValueError("2 * npad must not exceed dimension size!")
    val = np.ones(shape_pad, dtype=np.float64)
    for axis, n in enumerate(shape_pad):
        idx = np.arange(n, dtype=np.float64)
        pos = np.minimum(idx, n - 1 - idx) / npad
        pos = np.minimum(pos, 1.0)
        shape = [1] * len(shape_pad)
        shape[axis] = n
        val = np.minimum(val, pos.reshape(shape))
    lqmin, lqmax = np.log(qmin), np.log(qmax)
    woq = w / np.exp(lqmin + val * (lqmax - lqmin))
    if sigma:
        from scipy.ndimage import gaussian_filter
        woq = gaussian_filter(woq, sigma=sigma)
    return woq.astype(dtype)


# ---------------------------------------------------------------------------
# propagators
# ---------------------------------------------------------------------------

def _prep(vp, b, woq, dt, spacing, space_order):
    dtype = vp.dtype
    w_p, off_p, w_m, off_m = staggered_weights(space_order)
    w_p = jnp.asarray(w_p, dtype=dtype)
    w_m = jnp.asarray(w_m, dtype=dtype)
    inv_h = [jnp.asarray(1.0 / h, dtype=dtype) for h in spacing]
    s = jnp.asarray(dt, dtype=dtype)
    s2 = s * s
    vp2_over_b = vp * vp / b
    swoq = s * woq
    return (w_p, off_p, w_m, off_m), inv_h, vp2_over_b, swoq, s, s2


# one canonical sparse gather/scatter pair (OOB-corner drop semantics
# live with the interp_table contract) — do not re-copy per physics file
from .acoustic import _gather, _scatter_add  # noqa: E402


def _update(u, u_prev, L, q, vp2_over_b, swoq, s2):
    """The reference time update (``operators.py:48-66``); the same formula
    serves both directions of the time-reversed recursion."""
    return s2 * vp2_over_b * (L + q) + (2.0 - swoq) * u + (swoq - 1.0) * u_prev


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing", "save"))
def forward(vp, b, woq, src_wav, src_idx, src_w, rec_idx, rec_w, dt, *,
            nt, spacing, space_order=8, save=False):
    """Forward modeling (reference ``IsoFwdOperator``, operators.py:68-114).
    Returns (rec (nt, nrec), u history if save else final two slices)."""
    wgt, inv_h, v2b, swoq, s, s2 = _prep(vp, b, woq, dt, spacing, space_order)
    wp, op, wm, om = wgt
    lap = lambda u: laplacian_sa(u, b, wp, op, wm, om, inv_h)
    src_scale = src_w * s2 * _gather(v2b, src_idx)

    def step(carry, src_t):
        u, u_prev = carry
        rec_t = jnp.sum(_gather(u, rec_idx) * rec_w, axis=-1)
        unext = _update(u, u_prev, lap(u), 0.0, v2b, swoq, s2)
        unext = _scatter_add(unext, src_idx, src_t[:, None] * src_scale)
        return (unext, u), (rec_t, unext if save else None)

    z = jnp.zeros_like(vp)
    (u_last, u_prev), (recs, us) = jax.lax.scan(step, (z, z),
                                                src_wav[1:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=vp.dtype)
    rec = rec.at[1:nt - 1].set(recs)
    if save:
        u_full = jnp.concatenate([jnp.zeros((2,) + vp.shape, vp.dtype), us])
        return rec, u_full
    return rec, jnp.stack([u_last, u_prev])


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing"))
def adjoint(vp, b, woq, rec_data, rec_idx, rec_w, src_idx, src_w, dt, *,
            nt, spacing, space_order=8):
    """Adjoint modeling (reference ``IsoAdjOperator``, operators.py:117-160):
    time-reversed recursion with receiver injection into v[t-1], sampled at
    the source points. Returns (srca (nt, nsrcpt), v final slices)."""
    wgt, inv_h, v2b, swoq, s, s2 = _prep(vp, b, woq, dt, spacing, space_order)
    wp, op, wm, om = wgt
    lap = lambda u: laplacian_sa(u, b, wp, op, wm, om, inv_h)
    rec_scale = rec_w * s2 * _gather(v2b, rec_idx)

    def step(carry, rec_t):
        v, v_next = carry
        srca_t = jnp.sum(_gather(v, src_idx) * src_w, axis=-1)
        vprev = _update(v, v_next, lap(v), 0.0, v2b, swoq, s2)
        vprev = _scatter_add(vprev, rec_idx, rec_t[:, None] * rec_scale)
        return (vprev, v), srca_t

    z = jnp.zeros_like(vp)
    (v_last, v_prev), srcas = jax.lax.scan(step, (z, z),
                                           rec_data[1:nt - 1][::-1])
    srca = jnp.zeros((nt, src_idx.shape[0]), dtype=vp.dtype)
    srca = srca.at[1:nt - 1].set(srcas[::-1])
    return srca, jnp.stack([v_last, v_prev])


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing", "save"))
def born(vp, b, woq, dm, src_wav, src_idx, src_w, rec_idx, rec_w, dt, *,
         nt, spacing, space_order=8, save=False):
    """Linearized Jacobian-forward modeling (reference
    ``IsoJacobianFwdOperator``, operators.py:163-221): twin fields (u0, du)
    with du driven by ``q = 2 b dm v^-3 (woq u0.dtbw + u0.dt2)``, where
    u0.dt2 at t uses the u0[t+1] computed in the same iteration. Returns
    (rec from du, u0 history if save else final slices)."""
    wgt, inv_h, v2b, swoq, s, s2 = _prep(vp, b, woq, dt, spacing, space_order)
    wp, op, wm, om = wgt
    lap = lambda u: laplacian_sa(u, b, wp, op, wm, om, inv_h)
    src_scale = src_w * s2 * _gather(v2b, src_idx)
    coeff = 2.0 * b * dm / (vp * vp * vp)

    def step(carry, src_t):
        u0, u0_prev, du, du_prev = carry
        rec_t = jnp.sum(_gather(du, rec_idx) * rec_w, axis=-1)
        u0next = _update(u0, u0_prev, lap(u0), 0.0, v2b, swoq, s2)
        u0next = _scatter_add(u0next, src_idx, src_t[:, None] * src_scale)
        dtbw = (u0 - u0_prev) / s
        dt2 = (u0next - 2.0 * u0 + u0_prev) / s2
        q = coeff * (woq * dtbw + dt2)
        dunext = _update(du, du_prev, lap(du), q, v2b, swoq, s2)
        return (u0next, u0, dunext, du), \
            (rec_t, u0next if save else None)

    z = jnp.zeros_like(vp)
    (u0_l, u0_p, _, _), (recs, u0s) = jax.lax.scan(step, (z, z, z, z),
                                                   src_wav[1:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=vp.dtype)
    rec = rec.at[1:nt - 1].set(recs)
    if save:
        u0_full = jnp.concatenate([jnp.zeros((2,) + vp.shape, vp.dtype), u0s])
        return rec, u0_full
    return rec, jnp.stack([u0_l, u0_p])


@partial(jax.jit, static_argnames=("nt", "space_order", "spacing"))
def jacobian_adjoint(vp, b, woq, u0_save, rec_res, rec_idx, rec_w, dt, *,
                     nt, spacing, space_order=8):
    """Gradient w.r.t. velocity (reference ``IsoJacobianAdjOperator``,
    operators.py:226-280): reverse-time du with receiver injection,
    accumulating ``dm += du[t] * 2 b v^-3 (woq u0.dtbw + u0.dt2)[t]``.
    `u0_save` is the saved background wavefield (nt, *grid)."""
    wgt, inv_h, v2b, swoq, s, s2 = _prep(vp, b, woq, dt, spacing, space_order)
    wp, op, wm, om = wgt
    lap = lambda u: laplacian_sa(u, b, wp, op, wm, om, inv_h)
    rec_scale = rec_w * s2 * _gather(v2b, rec_idx)
    coeff = 2.0 * b / (vp * vp * vp)

    def step(carry, xs):
        du, du_next, dm = carry
        t, rec_t = xs
        u0_m = jax.lax.dynamic_index_in_dim(u0_save, t - 1, keepdims=False)
        u0_0 = jax.lax.dynamic_index_in_dim(u0_save, t, keepdims=False)
        u0_p = jax.lax.dynamic_index_in_dim(u0_save, t + 1, keepdims=False)
        dtbw = (u0_0 - u0_m) / s
        dt2 = (u0_p - 2.0 * u0_0 + u0_m) / s2
        dm = dm + du * coeff * (woq * dtbw + dt2)
        duprev = _update(du, du_next, lap(du), 0.0, v2b, swoq, s2)
        duprev = _scatter_add(duprev, rec_idx, rec_t[:, None] * rec_scale)
        return (duprev, du, dm), None

    z = jnp.zeros_like(vp)
    ts = jnp.arange(nt - 2, 0, -1, dtype=jnp.int32)
    rec_r = rec_res[1:nt - 1][::-1]
    (du_l, _, dm), _ = jax.lax.scan(step, (z, z, jnp.zeros_like(vp)),
                                    (ts, rec_r))
    return dm, jnp.stack([du_l, z])
