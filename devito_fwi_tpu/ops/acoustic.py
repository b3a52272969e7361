"""Acoustic isotropic propagators: forward / adjoint / gradient / Born.

TPU-native re-design of the reference's devito operators
(``seismic/acoustic/operators.py``): instead of symbolic codegen -> C, the
time loop is a ``jax.lax.scan`` over a fused VPU stencil update; sources are
scatter-adds and receivers gathers from precomputed tables (``ops.interp``).

Discretization parity notes (all checked against the reference):

* update rule = devito ``solve(m*u.dt2 - lap - q + damp*u.dt, u.forward)``
  with first-order forward-difference ``u.dt = (u[t+1]-u[t])/s``:
      u[t+1] = (s^2*(lap+q) + (2m + s*damp)*u[t] - m*u[t-1]) / (m + s*damp)
  (reference ``seismic/acoustic/operators.py:59-95``; the forward-difference
  damping term and the uniform t = 1..nt-2 loop bounds below were validated
  empirically against the reference's camembert regression values
  39113/-821/2442 — see tests/test_regression.py)
* source injection adds ``w_p * src[t] * s^2 / m[p]`` at the 2^ndim corner
  points p of the source location into u[t+1]
  (reference ``operators.py:134``), receivers sample u[t] multilinearly.
* time-loop bounds are t = 1 .. nt-2 for every operator (devito derives
  the iteration space from the time-stencil radius u[t-1]..u[t+1], so the
  bounds do not depend on whether the wavefield is saved or buffered);
  rec[0] = rec[nt-1] = 0.
* free surface = antisymmetric mirror of negative-z accesses with the z=0
  plane zeroed in mirrored accesses (reference ``operators.py:8-35``). Only
  rows 0..r (r = space_order//2) actually differ from the interior stencil.
* OT4 kernel adds ``s^2/12 * lap(1/m * lap(u))``
  (reference ``operators.py:38-56``). **Documented divergence** for the
  OT4 Born/gradient pair: the reference's BornOperator injects only
  ``q = -dm*u.dt2`` (``operators.py:255``), omitting the Frechet term of
  the OT4 correction — its OT4 linearization converges at O(h), not
  O(h^2), and is 3.4% inconsistent with its own GradientOperator term
  ``s^2/12 * u.biharmonic(m^-2)`` (``operators.py:219``) under the dot
  test. Here ``born`` adds the true derivative term
  ``-(s^2/12)*lap(m^-2 * dm * lap(u))`` and the gradient accumulates its
  exact discrete transpose ``(s^2/12)*m^-2*lap(u)*lap(v)``: the pair is
  an exact transpose (dot test 1e-15, like OT2) and the linearization is
  second order (tests/test_acoustic.py).
* gradient accumulates ``-u.dt2[t] * v[t]`` over t = nt-2 .. 1 while
  stepping v backward with receiver-residual injection into v[t-1]
  (reference ``operators.py:183-225``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.fd import second_derivative_weights

__all__ = [
    "forward", "adjoint", "gradient", "born", "gradient_checkpointed",
    "forward_ckpt", "gradient_from_ckpt", "laplacian_parts",
]


# ---------------------------------------------------------------------------
# stencil pieces
# ---------------------------------------------------------------------------

def _axis_d2(u, w, axis):
    """Order-(2r) accurate second derivative along `axis` (unscaled by 1/h^2),
    zero-Dirichlet beyond the padded grid (devito halo semantics)."""
    r = len(w) - 1
    nd = u.ndim
    pad = [(0, 0)] * nd
    pad[axis] = (r, r)
    up = jnp.pad(u, pad)
    n = u.shape[axis]

    def sl(shift):
        s = [slice(None)] * nd
        s[axis] = slice(r + shift, r + shift + n)
        return tuple(s)

    out = w[0] * u
    for k in range(1, r + 1):
        out = out + w[k] * (up[sl(k)] + up[sl(-k)])
    return out


def _fs_fix_last_axis(u, d2_last, w):
    """Replace rows 0..r of the last-axis second derivative with the
    free-surface mirrored stencil (see module docstring)."""
    r = len(w) - 1
    cols = []
    for z in range(r + 1):
        acc = w[0] * u[..., z] if z > 0 else w[0] * u[..., 0]
        for k in range(1, r + 1):
            # positive offset: always the plain value
            acc = acc + w[k] * u[..., z + k]
            # negative offset: odd mirror about z=0, zero at z=0
            i = z - k
            if i > 0:
                acc = acc + w[k] * u[..., i]
            elif i < 0:
                acc = acc - w[k] * u[..., -i]
            # i == 0 contributes nothing
        cols.append(acc)
    fs_block = jnp.stack(cols, axis=-1)
    return jnp.concatenate([fs_block, d2_last[..., r + 1:]], axis=-1)


def laplacian_parts(u, weights, inv_h2, fs):
    """Laplacian as a sum of per-axis second derivatives; the last axis gets
    the free-surface fix when `fs`."""
    ndim_sp = len(inv_h2)
    lap = 0.0
    offset = u.ndim - ndim_sp
    for d in range(ndim_sp):
        axis = offset + d
        d2 = _axis_d2(u, weights, axis)
        if fs and d == ndim_sp - 1:
            d2 = _fs_fix_last_axis(u, d2, weights)
        lap = lap + d2 * inv_h2[d]
    return lap


def _make_lap(m, weights, inv_h2, fs, kernel, s2):
    """Returns lap(u) including the OT4 biharmonic correction."""
    def lap_fn(u):
        lap = laplacian_parts(u, weights, inv_h2, fs)
        if kernel == "OT4":
            # s^2/12 * lap(1/m * lap(u))  (reference operators.py:38-56)
            lap = lap + (s2 / 12.0) * laplacian_parts(lap / m, weights,
                                                      inv_h2, fs)
        return lap
    return lap_fn


def _scatter_add(field, idx, vals):
    """field[idx] += vals with OOB corners dropped. idx: (..., ndim)."""
    coords = tuple(idx[..., d] for d in range(idx.shape[-1]))
    return field.at[coords].add(vals, mode="drop")


def _gather(field, idx):
    coords = tuple(idx[..., d] for d in range(idx.shape[-1]))
    return field.at[coords].get(mode="fill", fill_value=0)


def _update(u, u_prev, lap_u, q, m, hd, s2, inv_mhd):
    """The devito-solved leapfrog update (see module docstring).
    ``hd = s*damp``; the same formula serves forward and backward stepping
    because the transposed damping term ``damp*u.dt.T`` solved for
    ``u.backward`` yields the identical expression with the roles of
    u[t+1]/u[t-1] swapped. ``inv_mhd = 1/(m+hd)`` is precomputed once —
    a multiply beats a per-step VPU divide, and the Pallas kernels mirror
    this exact association so both paths share their rounding."""
    return (s2 * (lap_u + q) + (2.0 * m + hd) * u - m * u_prev) * inv_mhd


def _make_step(m, hd, s2, inv_mhd, lap_fn, *, space_order, spacing, fs,
               kernel, w_override=None):
    """Leapfrog step closure ``step(u, u_prev) -> u_next`` (no source
    term — callers scatter sources/residuals afterwards, as before).
    Default: the XLA lap+update. For 3-D f32 OT2 grids without a free
    surface, ``DEVITO_FWI_TPU_PALLAS3=1`` swaps in the x-blocked Pallas
    per-step kernel (``ops/pallas_acoustic3.py``), which mirrors this
    exact association — the hook is numerically invisible, so every
    caller (forward, adjoint, checkpointed gradient) inherits it."""
    if kernel == "OT2" and not fs and m.ndim == 3 \
            and m.dtype == jnp.float32:
        from . import pallas_acoustic3 as _p3
        if _p3.enabled():
            w_full = second_derivative_weights(space_order) \
                if w_override is None else np.asarray(w_override)
            wt = tuple(float(x) for x in w_full[len(w_full) // 2:])
            XB = _p3.pick_xb(m.shape[0], len(wt) - 1)
            if XB is not None:
                ih = tuple(float(1.0 / (h * h)) for h in spacing)
                return lambda u, up: _p3.step3(u, up, m, hd, s2, w=wt,
                                               inv_h2=ih, XB=XB)
    return lambda u, up: _update(u, up, lap_fn(u), 0.0, m, hd, s2,
                                 inv_mhd)


def _prep(vp, damp, dt, spacing, space_order, w_override=None):
    dtype = vp.dtype
    if w_override is None:
        w_full = second_derivative_weights(space_order)
    else:
        w_full = np.asarray(w_override)  # full symmetric stencil (2r+1,)
    w = jnp.asarray(w_full[len(w_full) // 2:],
                    dtype=dtype)  # [w0, w1, ..., wr] (symmetric)
    inv_h2 = [jnp.asarray(1.0 / (h * h), dtype=dtype) for h in spacing]
    m = 1.0 / (vp * vp)
    s = jnp.asarray(dt, dtype=dtype)
    s2 = s * s
    hd = s * damp
    inv_mhd = 1.0 / (m + hd)
    return w, inv_h2, m, s2, hd, inv_mhd


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nt", "space_order", "kernel", "fs",
                                   "save", "spacing", "w_override",
                                   "save_dtype"))
def forward(vp, damp, src_wav, src_idx, src_w, rec_idx, rec_w, dt, *,
            nt, spacing, space_order=4, kernel="OT2", fs=False, save=False,
            w_override=None, save_dtype=None):
    """Forward acoustic modeling.

    Returns (rec, u) where rec is (nt, nrec) and u is the saved wavefield
    (nt, *grid) if `save` else the final two time slices (2, *grid).

    `w_override` (hashable tuple, full symmetric stencil of width
    2*(space_order//2)+1) substitutes custom second-derivative weights —
    e.g. ``utils.fd.drp_second_derivative_weights`` — the analog of
    devito's ``coefficients='symbolic'`` (tutorial 07_DRP_schemes).

    ``save_dtype`` (static, e.g. "bfloat16") selects the SAVED history's
    element type — the in-scan arithmetic stays in the model dtype; a
    reduced-precision history halves the dominant HBM stream of the
    saved-history gradient route and doubles the shot chunk that fits
    the HBM budget (the streamed 2-D kernels' ``stream_hist_dtype``
    analog). Default None keeps the model dtype.
    """
    w, inv_h2, m, s2, hd, inv_mhd = _prep(vp, damp, dt, spacing, space_order,
                                 w_override)
    lap_fn = _make_lap(m, w, inv_h2, fs, kernel, s2)
    step_fn = _make_step(m, hd, s2, inv_mhd, lap_fn,
                         space_order=space_order, spacing=spacing, fs=fs,
                         kernel=kernel, w_override=w_override)
    m_src = _gather(m, src_idx)
    src_scale = src_w * s2 / m_src          # (nsrcpt, 2**d)
    sdt = jnp.dtype(save_dtype) if save_dtype is not None else vp.dtype

    def step(carry, src_t):
        u, u_prev = carry
        rec_t = jnp.sum(_gather(u, rec_idx) * rec_w, axis=-1)
        unext = step_fn(u, u_prev)
        unext = _scatter_add(unext, src_idx, src_t[:, None] * src_scale)
        return (unext, u), (rec_t, unext.astype(sdt) if save else None)

    z = jnp.zeros_like(vp)
    (u_last, u_prev), (recs, us) = jax.lax.scan(step, (z, z),
                                                src_wav[1:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=vp.dtype)
    rec = rec.at[1:nt - 1].set(recs)
    if save:
        u_full = jnp.concatenate([jnp.zeros((2,) + vp.shape, sdt), us])
        return rec, u_full
    return rec, jnp.stack([u_last, u_prev])


# ---------------------------------------------------------------------------
# adjoint
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nt", "space_order", "kernel", "fs",
                                   "spacing"))
def adjoint(vp, damp, rec_data, rec_idx, rec_w, src_idx, src_w, dt, *,
            nt, spacing, space_order=4, kernel="OT2", fs=False):
    """Adjoint modeling: inject receiver data backward in time, sample at the
    source locations (reference ``operators.py:143-180``). Returns
    (srca (nt, nsrcpt), v final slices)."""
    w, inv_h2, m, s2, hd, inv_mhd = _prep(vp, damp, dt, spacing, space_order)
    lap_fn = _make_lap(m, w, inv_h2, fs, kernel, s2)
    step_fn = _make_step(m, hd, s2, inv_mhd, lap_fn,
                         space_order=space_order, spacing=spacing, fs=fs,
                         kernel=kernel)
    m_rec = _gather(m, rec_idx)
    rec_scale = rec_w * s2 / m_rec

    def step(carry, rec_t):
        v, v_next = carry
        srca_t = jnp.sum(_gather(v, src_idx) * src_w, axis=-1)
        vprev = step_fn(v, v_next)
        vprev = _scatter_add(vprev, rec_idx, rec_t[:, None] * rec_scale)
        return (vprev, v), srca_t

    z = jnp.zeros_like(vp)
    # reverse loop t = nt-2 .. 1
    (v_last, v_prev), srcas = jax.lax.scan(step, (z, z),
                                           rec_data[1:nt - 1][::-1])
    srca = jnp.zeros((nt, src_idx.shape[0]), dtype=vp.dtype)
    srca = srca.at[1:nt - 1].set(srcas[::-1])
    return srca, jnp.stack([v_last, v_prev])


# ---------------------------------------------------------------------------
# gradient (jacobian adjoint)
# ---------------------------------------------------------------------------

def _rec_slabs(rec_res, rec_idx, rec_w, m, s2, rec_box):
    """Receiver residuals folded into dense per-step slabs
    (nt, nx, 2[, 2]) living between the static trailing-axis plane pairs
    ``rec_box`` — one MXU matmul against a small scattered weight matrix
    (the saved-route analog of ``pallas_acoustic.residual_rows``).
    Corners outside the grid or outside the 2-wide windows get zero
    weight, matching the scatter's ``mode='drop'``."""
    nt, nrec = rec_res.shape
    dims = m.shape
    nx = dims[0]
    ndim = len(dims)
    xi = rec_idx[..., 0]
    valid = (xi >= 0) & (xi < nx)
    q = jnp.clip(xi, 0, nx - 1)
    for d in range(1, ndim):
        cd = rec_idx[..., d]
        b = rec_box[d - 1]
        valid &= (cd == b) | (cd == b + 1)
        q = q * 2 + jnp.clip(cd - b, 0, 1)
    mc = m[tuple(jnp.clip(rec_idx[..., d], 0, dims[d] - 1)
                 for d in range(ndim))]
    scale = jnp.where(valid, rec_w * s2 / mc, 0.0).astype(jnp.float32)
    V = jnp.zeros((nrec, nx * 2 ** (ndim - 1)), jnp.float32)
    V = V.at[jnp.arange(nrec)[:, None], q].add(scale)
    slabs = jnp.matmul(rec_res.astype(jnp.float32), V,
                       precision=jax.lax.Precision.HIGHEST)
    return slabs.reshape((nt, nx) + (2,) * (ndim - 1)).astype(m.dtype)


@partial(jax.jit, static_argnames=("nt", "space_order", "kernel", "fs",
                                   "spacing", "rec_box", "with_illum"))
def gradient(vp, damp, u_save, rec_res, rec_idx, rec_w, dt, *,
             nt, spacing, space_order=4, kernel="OT2", fs=False,
             rec_box=None, with_illum=False):
    """Adjoint-state gradient w.r.t. squared slowness m:
    ``grad = sum_t -u.dt2[t] * v[t]`` with v the receiver-residual adjoint
    field (reference ``operators.py:183-225``). Returns grad on the padded
    grid.

    ``u_save`` may be a reduced-precision history from
    ``forward(save=True, save_dtype=...)`` — slices are upcast to the
    model dtype on read.

    ``rec_box`` (static tuple of trailing-axis window starts: ``(z0,)``
    in 2-D, ``(y0, z0)`` in 3-D) replaces the per-step receiver
    scatter-add with a pad-fused static slab add: the residuals are
    bulk-assembled into (nt, nx, 2[, 2]) slabs up front (one MXU
    matmul), and the per-step ``jnp.pad`` is an expression XLA fuses
    into the adjoint update's output write — the ``.at[].add`` scatter
    costs a full-volume copy per step instead. Measured on chip
    (tools/bench_3d_fusion.py, 96^3, so=8): reverse sweep 14.5 vs 4.7
    Gcs/s — 3.1x, at the bare-sweep roofline; identical numerics to the
    scatter (4.6e-5 f32 max-abs on a unit-scale field). Callers gate on
    every receiver corner fitting the 2-wide windows
    (``fwi._saved_route``, the ``geometry_supported`` analog).

    ``with_illum`` additionally accumulates ``sum_t u[t]^2`` from the
    SAME history reads the reverse sweep already does — saving the
    separate full-history read of a standalone ``sum(u*u)`` — and
    returns (grad, v, illum)."""
    w, inv_h2, m, s2, hd, inv_mhd = _prep(vp, damp, dt, spacing, space_order)
    lap_fn = _make_lap(m, w, inv_h2, fs, kernel, s2)
    step_fn = _make_step(m, hd, s2, inv_mhd, lap_fn,
                         space_order=space_order, spacing=spacing, fs=fs,
                         kernel=kernel)
    fdt = vp.dtype
    if kernel == "OT4":
        m2inv = 1.0 / (m * m)

    if rec_box is None:
        m_rec = _gather(m, rec_idx)
        rec_scale = rec_w * s2 / m_rec
        inj_r = rec_res[1:nt - 1][::-1]

        def inject(vprev, rec_t):
            return _scatter_add(vprev, rec_idx,
                                rec_t[:, None] * rec_scale)
    else:
        slabs = _rec_slabs(rec_res, rec_idx, rec_w, m, s2, rec_box)
        inj_r = slabs[1:nt - 1][::-1]
        pad_cfg = ((0, 0),) + tuple(
            (rec_box[d - 1], m.shape[d] - rec_box[d - 1] - 2)
            for d in range(1, len(m.shape)))

        def inject(vprev, sl):
            return vprev + jnp.pad(sl, pad_cfg)

    def step(carry, xs):
        # carry two saved slices and read only u[t-1] each step (1/3 of the
        # wavefield-history read traffic of fetching the full triple)
        v, v_next, grad, illum, u_tp1, u_t = carry
        t, inj_t = xs
        u_tm1 = jax.lax.dynamic_index_in_dim(
            u_save, t - 1, keepdims=False).astype(fdt)
        udt2 = (u_tp1 - 2.0 * u_t + u_tm1) / s2
        grad = grad - udt2 * v
        if with_illum:
            illum = illum + u_t * u_t
        if kernel == "OT4":
            # exact transpose of born's OT4 Frechet term (module
            # docstring; diverges from reference operators.py:219)
            lap_u = laplacian_parts(u_t, w, inv_h2, fs)
            lap_v = laplacian_parts(v, w, inv_h2, fs)
            grad = grad - (s2 / 12.0) * m2inv * lap_u * lap_v
        vprev = step_fn(v, v_next)
        vprev = inject(vprev, inj_t)
        return (vprev, v, grad, illum, u_t, u_tm1), None

    z = jnp.zeros_like(vp)
    ts = jnp.arange(nt - 2, 0, -1, dtype=jnp.int32)
    u_hi0 = u_save[nt - 1].astype(fdt)
    # illum init = u[nt-1]^2: the loop's u_t covers u[nt-2]..u[1] and
    # u[0] is identically zero, so the total equals sum(u_save**2, 0)
    illum0 = u_hi0 * u_hi0 if with_illum else z
    (v_last, _, grad, illum, _, _), _ = jax.lax.scan(
        step, (z, z, jnp.zeros_like(vp), illum0, u_hi0,
               u_save[nt - 2].astype(fdt)),
        (ts, inj_r))
    if with_illum:
        return grad, jnp.stack([v_last, z]), illum
    return grad, jnp.stack([v_last, z])


# ---------------------------------------------------------------------------
# segment-checkpointed forward + reverse (pyrevolve equivalent)
#
# Performance note (measured on TPU v5e, Marmousi 380x186): a single-shot
# scan keeps both wavefield carries in VMEM and runs at ~250 Gcell-steps/s,
# while saving the full (nt, nx, nz) history to HBM is ~100x slower. So the
# production gradient path never materializes the wavefield: the forward
# sweep stores ~n_checkpoints (u[t], u[t-1]) pairs, and the reverse sweep
# recomputes each segment at VMEM speed.
# ---------------------------------------------------------------------------

def _ckpt_layout(nt, n_checkpoints):
    nsteps = nt - 2                      # forward steps t = 1 .. nt-2
    seg = -(-nsteps // n_checkpoints)    # steps per segment (ceil)
    nseg = -(-nsteps // seg)
    return nsteps, seg, nseg


@partial(jax.jit, static_argnames=("nt", "space_order", "kernel", "fs",
                                   "spacing", "n_checkpoints"))
def forward_ckpt(vp, damp, src_wav, src_idx, src_w, rec_idx, rec_w, dt, *,
                 nt, spacing, space_order=4, kernel="OT2", fs=False,
                 n_checkpoints=16):
    """Forward modeling that records receivers, per-cell illumination
    (sum_t u[t]^2, reference ``fwi.py:170``) and segment-start states for a
    later ``gradient_from_ckpt`` reverse sweep. Returns
    (rec (nt, nrec), seg_starts (nseg, 2, *grid), illum (*grid))."""
    w, inv_h2, m, s2, hd, inv_mhd = _prep(vp, damp, dt, spacing, space_order)
    lap_fn = _make_lap(m, w, inv_h2, fs, kernel, s2)
    step_fn = _make_step(m, hd, s2, inv_mhd, lap_fn,
                         space_order=space_order, spacing=spacing, fs=fs,
                         kernel=kernel)
    m_src = _gather(m, src_idx)
    src_scale = src_w * s2 / m_src

    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    total = nseg * seg
    src_pad = jnp.zeros((total, src_wav.shape[1]), src_wav.dtype)
    src_pad = src_pad.at[:nsteps].set(src_wav[1:nt - 1])
    valid = (jnp.arange(total) < nsteps).reshape(nseg, seg)

    def fwd_step(carry, xs):
        u, u_prev, illum = carry
        src_t, valid_t = xs
        rec_t = jnp.sum(_gather(u, rec_idx) * rec_w, axis=-1)
        unext = step_fn(u, u_prev)
        unext = _scatter_add(unext, src_idx, src_t[:, None] * src_scale)
        illum = illum + jnp.where(valid_t, unext * unext, 0.0)
        return (unext, u, illum), rec_t

    def seg_fwd(carry, xs):
        u, u_prev, illum = carry
        out, rec_seg = jax.lax.scan(fwd_step, (u, u_prev, illum), xs)
        return out, (jnp.stack([u, u_prev]), rec_seg)

    z = jnp.zeros_like(vp)
    src_segs = src_pad.reshape(nseg, seg, -1)
    (_, _, illum), (seg_starts, rec_segs) = jax.lax.scan(
        seg_fwd, (z, z, z), (src_segs, valid))
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=vp.dtype)
    rec = rec.at[1:nt - 1].set(rec_segs.reshape(total, -1)[:nsteps])
    return rec, seg_starts, illum


@partial(jax.jit, static_argnames=("nt", "space_order", "kernel", "fs",
                                   "spacing", "n_checkpoints"))
def gradient_from_ckpt(vp, damp, src_wav, src_idx, src_w, seg_starts,
                       rec_res, rec_idx, rec_w, dt, *, nt, spacing,
                       space_order=4, kernel="OT2", fs=False,
                       n_checkpoints=16):
    """Reverse sweep of the checkpointed gradient: recompute each forward
    segment from its stored start state, step the adjoint field backward
    with residual injection, accumulate ``-u.dt2[t] * v[t]``."""
    w, inv_h2, m, s2, hd, inv_mhd = _prep(vp, damp, dt, spacing, space_order)
    lap_fn = _make_lap(m, w, inv_h2, fs, kernel, s2)
    step_fn = _make_step(m, hd, s2, inv_mhd, lap_fn,
                         space_order=space_order, spacing=spacing, fs=fs,
                         kernel=kernel)
    m_src = _gather(m, src_idx)
    src_scale = src_w * s2 / m_src
    m_rec = _gather(m, rec_idx)
    rec_scale = rec_w * s2 / m_rec
    if kernel == "OT4":
        m2inv = 1.0 / (m * m)

    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    total = nseg * seg
    src_pad = jnp.zeros((total, src_wav.shape[1]), src_wav.dtype)
    src_pad = src_pad.at[:nsteps].set(src_wav[1:nt - 1])
    rec_pad = jnp.zeros((total, rec_res.shape[1]), rec_res.dtype)
    rec_pad = rec_pad.at[:nsteps].set(rec_res[1:nt - 1])

    def seg_rev(carry, xs):
        v, v_next, grad = carry
        seg_start, src_seg, rec_seg, seg_idx = xs

        def refwd(c, s):
            u, u_prev = c
            unext = step_fn(u, u_prev)
            unext = _scatter_add(unext, src_idx, s[:, None] * src_scale)
            return (unext, u), unext

        (_, _), u_new = jax.lax.scan(refwd, (seg_start[0], seg_start[1]),
                                     src_seg)
        # useg[j] = u at local time j-1 for j = 0..seg+1 (two seed slices +
        # one recomputed slice per step — storing single slices and
        # carrying the other two of the (t-1, t, t+1) triple saves 2/3 of
        # the recompute-buffer HBM traffic vs emitting stacked triples)
        useg = jnp.concatenate([seg_start[1][None], seg_start[0][None],
                                u_new])

        def rev_step(c, xs_local):
            v, v_next, grad, u_hi, u_mid = c
            j, rec_t, valid = xs_local
            u_lo = jax.lax.dynamic_index_in_dim(useg, j, keepdims=False)
            # accumulate the unscaled (u[t+1] - 2u[t] + u[t-1]) * v and
            # defer the -1/s^2 to one final scale: one multiply per step
            # saved, and the Pallas reverse kernels share this exact
            # association
            acc = (u_hi - 2.0 * u_mid + u_lo) * v
            if kernel == "OT4":
                # the saved-path OT4 gradient adds
                # (s^2/12)*m^-2*lap(u_t)*lap(v_t) (module docstring);
                # this accumulator is the UNSCALED udt2*v (final scale
                # -1/s^2), so the term enters multiplied by s^2
                lap_u = laplacian_parts(u_mid, w, inv_h2, fs)
                lap_v = laplacian_parts(v, w, inv_h2, fs)
                acc = acc + (s2 * s2 / 12.0) * m2inv * lap_u * lap_v
            grad = grad + jnp.where(valid, acc, 0.0)
            vprev = step_fn(v, v_next)
            vprev = _scatter_add(vprev, rec_idx, rec_t[:, None] * rec_scale)
            new_v = jnp.where(valid, vprev, v)
            new_vn = jnp.where(valid, v, v_next)
            return (new_v, new_vn, grad, u_mid, u_lo), None

        base = seg_idx * seg
        local = jnp.arange(seg - 1, -1, -1)
        valid = (base + local) < nsteps
        u_hi0 = useg[seg + 1]
        u_mid0 = useg[seg]
        (v, v_next, grad, _, _), _ = jax.lax.scan(
            rev_step, (v, v_next, grad, u_hi0, u_mid0),
            (local, rec_seg[::-1], valid))
        return (v, v_next, grad), None

    src_segs = src_pad.reshape(nseg, seg, -1)
    rec_segs = rec_pad.reshape(nseg, seg, -1)
    z = jnp.zeros_like(vp)
    (v, _, grad), _ = jax.lax.scan(
        seg_rev, (z, z, jnp.zeros_like(vp)),
        (seg_starts[::-1], src_segs[::-1], rec_segs[::-1],
         jnp.arange(nseg - 1, -1, -1)))
    return grad * (-(1.0 / s2)), jnp.stack([v, z])


# ---------------------------------------------------------------------------
# gradient with segment checkpointing (combined convenience wrapper)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nt", "space_order", "kernel", "fs",
                                   "spacing", "n_checkpoints"))
def gradient_checkpointed(vp, damp, src_wav, src_idx, src_w, rec_res,
                          rec_idx, rec_w, dt, *, nt, spacing, space_order=4,
                          kernel="OT2", fs=False, n_checkpoints=16):
    """Memory-lean gradient: instead of storing the full forward wavefield
    (nt slices), store ~n_checkpoints (u[t], u[t-1]) pairs during a forward
    sweep and recompute each segment during the reverse sweep. This is the
    TPU-native equivalent of the reference's pyrevolve checkpointing
    (``seismic/acoustic/wavesolver.py:188-201``), with uniform rather than
    binomial checkpoint placement (recompute factor ~1x since we keep every
    segment's starting state).
    """
    _, seg_starts, _ = forward_ckpt(
        vp, damp, src_wav, src_idx, src_w, rec_idx, rec_w, dt, nt=nt,
        spacing=spacing, space_order=space_order, kernel=kernel, fs=fs,
        n_checkpoints=n_checkpoints)
    return gradient_from_ckpt(
        vp, damp, src_wav, src_idx, src_w, seg_starts, rec_res, rec_idx,
        rec_w, dt, nt=nt, spacing=spacing, space_order=space_order,
        kernel=kernel, fs=fs, n_checkpoints=n_checkpoints)


# ---------------------------------------------------------------------------
# Born / linearized forward (jacobian)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nt", "space_order", "kernel", "fs",
                                   "spacing"))
def born(vp, damp, dm, src_wav, src_idx, src_w, rec_idx, rec_w, dt, *,
         nt, spacing, space_order=4, kernel="OT2", fs=False):
    """Linearized Born modeling: twin fields (u, U) with
    ``q = -dm * u.dt2`` driving U (reference ``operators.py:228-273``).
    Returns rec sampled from U."""
    w, inv_h2, m, s2, hd, inv_mhd = _prep(vp, damp, dt, spacing, space_order)
    lap_fn = _make_lap(m, w, inv_h2, fs, kernel, s2)
    m_src = _gather(m, src_idx)
    src_scale = src_w * s2 / m_src
    if kernel == "OT4":
        m2inv = 1.0 / (m * m)

    def step(carry, src_t):
        u, u_prev, U, U_prev = carry
        rec_t = jnp.sum(_gather(U, rec_idx) * rec_w, axis=-1)
        unext = _update(u, u_prev, lap_fn(u), 0.0, m, hd, s2, inv_mhd)
        unext = _scatter_add(unext, src_idx, src_t[:, None] * src_scale)
        udt2 = (unext - 2.0 * u + u_prev) / s2
        q = -dm * udt2
        if kernel == "OT4":
            # Frechet derivative of the OT4 correction w.r.t. m (module
            # docstring; the reference's BornOperator omits this term)
            lap_u = laplacian_parts(u, w, inv_h2, fs)
            q = q - (s2 / 12.0) * laplacian_parts(m2inv * dm * lap_u, w,
                                                  inv_h2, fs)
        Unext = _update(U, U_prev, lap_fn(U), q, m, hd, s2, inv_mhd)
        return (unext, u, Unext, U), rec_t

    z = jnp.zeros_like(vp)
    (_, _, _, _), recs = jax.lax.scan(step, (z, z, z, z), src_wav[1:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=vp.dtype)
    rec = rec.at[1:nt - 1].set(recs)
    return rec
