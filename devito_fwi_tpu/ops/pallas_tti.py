"""Pallas VMEM segment kernels for the 2-D TTI coupled system.

The TTI gradient is the heaviest per-cell kernel in the framework
(rotated first-derivative chains: each field update costs ~3x an
acoustic laplacian), and the XLA checkpointed path round-trips every
recomputed slice through HBM like the acoustic one did before its
Pallas rewrite. These kernels apply the same segment-grid design as
``ops/pallas_acoustic.py`` to the coupled (u, v) system: grid =
(shot, segment), carries and the per-shot gradient block persist in
scratch across sequential segment steps, the recomputed d2/dt2
histories of BOTH fields live in VMEM, and residual injection into the
two adjoint fields is a static two-row slice add on the transposed
(nz, nx) layout.

Numerics mirror ``ops.tti`` exactly (same ``_d1``/``_axis_d2``
association, ``sum`` order of the rotated terms, ``_update`` formula
with the reciprocal precomputed once); parity is pinned in
tests/test_pallas_tti.py (interpret mode) against the XLA pair that is
itself pinned to the saved-path ``jacobian_adjoint`` at 1e-12.

Default ON on TPU: the on-chip A/B (tools/onchip_roundup.sh step 5,
bench TTI config, 4 shots vmapped) measured 0.0357 s vs 0.1957 s for
the XLA segment-checkpointed path — 5.5x, 6.49 vs 1.18 Gcell-steps/s —
and the on-chip parity test (test_tti_pallas_matches_xla_on_chip)
passes. ``DEVITO_FWI_TPU_PALLAS_TTI=0`` opts out. Scope: 2-D f32,
phi-less TTI, receivers on <= 2 z-planes (``tti_supported``);
everything else falls back to the XLA pair.

Reference semantics: ``seismic/tti/operators.py`` (kernel_centered_2d,
600-640 for the gradient).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.fd import fd_weights, second_derivative_weights
from .pallas_acoustic import env_interpret

__all__ = ["enabled", "tti_supported", "forward_ckpt_pallas",
           "jacobian_adjoint_pallas"]


def enabled():
    if os.environ.get("DEVITO_FWI_TPU_PALLAS_TTI", "1") != "1":
        return False
    if env_interpret():
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def tti_supported(model, rec_idx):
    if model.dim != 2 or model.dtype != np.float32:
        return False
    zplanes = np.unique(np.asarray(rec_idx)[..., 1])
    if len(zplanes) > 2:
        return False
    # the kernels' static 2-row receiver slice must fit the grid (a
    # z-edge geometry would clamp it to one row and crash the trace)
    z0 = int(zplanes.min())
    return 0 <= z0 and z0 + 2 <= model.padded_shape[1]


def _make_ops_t(w1, r1, w2, ihx, ihz, nx, nz):
    """Rotated-operator factory on the transposed (nz, nx) layout (x =
    lanes = axis 1, z = sublanes = axis 0), zero-Dirichlet shifts via
    zero-fill concatenates. Mirrors ops.tti._d1 / acoustic._axis_d2 and
    the gzz/gxx composition order exactly."""
    def shift(u, o, axis):
        if o == 0:
            return u
        if axis == 0:
            z = jnp.zeros((abs(o), nx), jnp.float32)
            return jnp.concatenate([u[o:, :], z], 0) if o > 0 \
                else jnp.concatenate([z, u[:o, :]], 0)
        z = jnp.zeros((nz, abs(o)), jnp.float32)
        return jnp.concatenate([u[:, o:], z], 1) if o > 0 \
            else jnp.concatenate([z, u[:, :o]], 1)

    def d1(u, axis, inv_h):
        # physical axis: 0 = x (lane shifts), 1 = z (sublane shifts)
        kaxis = 1 if axis == 0 else 0
        out = None
        for k in range(-r1, r1 + 1):
            wk = w1[k + r1]
            if wk == 0.0:
                continue
            t = wk * shift(u, k, kaxis)
            out = t if out is None else out + t
        return out * inv_h

    def d2(u, axis, inv_h2):
        kaxis = 1 if axis == 0 else 0
        out = w2[0] * u
        for k in range(1, len(w2)):
            out = out + w2[k] * (shift(u, k, kaxis) + shift(u, -k, kaxis))
        return out * inv_h2

    def make(sth, cth):
        def gzz(u):
            gz = -(sth * d1(u, 0, ihx) + cth * d1(u, 1, ihz))
            return -(d1(sth * gz, 0, ihx) + d1(cth * gz, 1, ihz))

        def lap(u):
            return d2(u, 0, ihx * ihx) + d2(u, 1, ihz * ihz)

        def gxx(u):
            return lap(u) - gzz(u)
        return gzz, gxx
    return make


def _fwd_kernel(wav_ref, m_ref, hd_ref, eh_ref, dh_ref, st_ref, ct_ref,
                inj_ref, seg_ref, rec_ref, u_ref, up_ref, v_ref, vp_ref, *,
                seg, nx, nz, w1, r1, w2, ihx, ihz, z0):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    base = j * seg
    m = m_ref[:]
    hd = hd_ref[:]
    inv_mhd = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd
    eh = eh_ref[:]
    dh = dh_ref[:]
    inj = inj_ref[:]
    gzz, gxx = _make_ops_t(w1, r1, w2, ihx, ihz, nx, nz)(st_ref[:],
                                                         ct_ref[:])

    @pl.when(j == 0)
    def _():
        for ref in (u_ref, up_ref, v_ref, vp_ref):
            ref[:] = jnp.zeros((nz, nx), jnp.float32)

    seg_ref[0] = u_ref[:]
    seg_ref[1] = up_ref[:]
    seg_ref[2] = v_ref[:]
    seg_ref[3] = vp_ref[:]

    s2 = wav_ref[0]                        # slot 0 holds dt^2

    def body(i, _):
        u = u_ref[:]
        up = up_ref[:]
        v = v_ref[:]
        vp = vp_ref[:]
        # slice before adding: the receivers need two rows, not a
        # full-grid u + v every step
        rec_ref[i] = u[z0:z0 + 2, :] + v[z0:z0 + 2, :]
        Gxx_u = gxx(u)
        Gzz_v = gzz(v)
        H0 = eh * Gxx_u + dh * Gzz_v
        Hz = dh * Gxx_u + Gzz_v
        w_t = wav_ref[base + i + 1]
        un = (s2 * H0 + two_m_hd * u - m * up) * inv_mhd + w_t * inj
        vn = (s2 * Hz + two_m_hd * v - m * vp) * inv_mhd + w_t * inj
        u_ref[:] = un
        up_ref[:] = u
        v_ref[:] = vn
        vp_ref[:] = v
        return 0

    jax.lax.fori_loop(0, seg, body, 0)


def _grad_kernel(wav_ref, m_ref, hd_ref, eh_ref, dh_ref, st_ref, ct_ref,
                 inj_ref, seg_ref, res_ref, grad_ref, udt2_ref, vdt2_ref,
                 du_ref, dun_ref, dv_ref, dvn_ref, u_ref, up_ref, v_ref,
                 vp_ref, *, seg, nsteps, nx, nz, w1, r1, w2, ihx, ihz, z0):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    nseg = pl.num_programs(1)
    k = nseg - 1 - j
    base = k * seg
    m = m_ref[:]
    hd = hd_ref[:]
    inv_mhd = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd
    eh = eh_ref[:]
    dh = dh_ref[:]
    inj = inj_ref[:]
    s2 = wav_ref[0]
    gzz, gxx = _make_ops_t(w1, r1, w2, ihx, ihz, nx, nz)(st_ref[:],
                                                         ct_ref[:])

    @pl.when(j == 0)
    def _():
        for ref in (du_ref, dun_ref, dv_ref, dvn_ref, grad_ref):
            ref[:] = jnp.zeros((nz, nx), jnp.float32)

    # forward recompute through segment k, storing the unscaled dt2 of
    # both fields
    u_ref[:] = seg_ref[0]
    up_ref[:] = seg_ref[1]
    v_ref[:] = seg_ref[2]
    vp_ref[:] = seg_ref[3]

    def fwd_body(i, _):
        u = u_ref[:]
        up = up_ref[:]
        v = v_ref[:]
        vp = vp_ref[:]
        Gxx_u = gxx(u)
        Gzz_v = gzz(v)
        w_t = wav_ref[base + i + 1]
        un = (s2 * (eh * Gxx_u + dh * Gzz_v) + two_m_hd * u - m * up) \
            * inv_mhd + w_t * inj
        vn = (s2 * (dh * Gxx_u + Gzz_v) + two_m_hd * v - m * vp) \
            * inv_mhd + w_t * inj
        udt2_ref[i] = un - 2.0 * u + up
        vdt2_ref[i] = vn - 2.0 * v + vp
        u_ref[:] = un
        up_ref[:] = u
        v_ref[:] = vn
        vp_ref[:] = v
        return 0

    jax.lax.fori_loop(0, seg, fwd_body, 0)

    # adjoint sweep backward through the segment
    def rev_body(i, _):
        jj = seg - 1 - i

        @pl.when(base + jj < nsteps)
        def _():
            du = du_ref[:]
            dv = dv_ref[:]
            grad_ref[:] = grad_ref[:] + udt2_ref[jj] * du \
                + vdt2_ref[jj] * dv
            H0 = gxx(eh * du + dh * dv)
            Hz = gzz(dh * du + dv)
            du_ref[:] = (s2 * H0 + two_m_hd * du - m * dun_ref[:]) \
                * inv_mhd
            dv_ref[:] = (s2 * Hz + two_m_hd * dv - m * dvn_ref[:]) \
                * inv_mhd
            # residual injection into BOTH adjoint fields on the two
            # receiver z-plane rows (static slice RMW, acoustic pattern)
            du_ref[z0:z0 + 2, :] = du_ref[z0:z0 + 2, :] + res_ref[jj]
            dv_ref[z0:z0 + 2, :] = dv_ref[z0:z0 + 2, :] + res_ref[jj]
            dun_ref[:] = du
            dvn_ref[:] = dv
        return 0

    jax.lax.fori_loop(0, seg, rev_body, 0)


def _pack_wav(src_wav, s2, nt, total):
    """Wavelet padded to the segment layout with dt^2 in slot 0 (the
    kernels read steps at base+i+1)."""
    wav = jnp.zeros((total + 1,), jnp.float32)
    wav = wav.at[0].set(jnp.float32(s2))
    return wav.at[1:nt - 1].set(src_wav[1:nt - 1, 0].astype(jnp.float32))


def _statics(space_order, spacing):
    order1 = space_order // 2
    r1 = order1 // 2
    w1 = tuple(float(v) for v in np.asarray(
        fd_weights(1, np.arange(-r1, r1 + 1), 0.0), np.float32))
    w2 = tuple(float(v) for v in np.asarray(
        second_derivative_weights(space_order)[space_order // 2:],
        np.float32))
    ihx = float(np.float32(1.0 / spacing[0]))
    ihz = float(np.float32(1.0 / spacing[1]))
    return w1, r1, w2, ihx, ihz


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "n_checkpoints",
                                   "dt", "interpret"))
def forward_ckpt_pallas(mT, hdT, ehT, dhT, stT, ctT, injT, src_wav, dt, *,
                        nt, nx, nz, space_order, spacing, z0,
                        n_checkpoints, interpret=False):
    """Batched TTI checkpointed forward on the segment grid (transposed
    (.., nz, nx) operands; injT is (B, nz, nx)). Returns
    (rec_rows (B, nseg, seg, 2, nx), seg_starts (B, nseg, 4, nz, nx))."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from .acoustic import _ckpt_layout

    w1, r1, w2, ihx, ihz = _statics(space_order, spacing)
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    B = injT.shape[0]
    wav = _pack_wav(src_wav, float(dt) ** 2, nt, nseg * seg)
    kern = partial(_fwd_kernel, seg=seg, nx=nx, nz=nz, w1=w1, r1=r1,
                   w2=w2, ihx=ihx, ihz=ihz, z0=z0)
    seg_starts, rec_rows = pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 +
                 [pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((None, None, 4, nz, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, seg, 2, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nseg, 4, nz, nx), jnp.float32),
            jax.ShapeDtypeStruct((B, nseg, seg, 2, nx), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32)] * 4,
        interpret=env_interpret(interpret),
    )(wav, mT, hdT, ehT, dhT, stT, ctT, injT)
    return rec_rows, seg_starts


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "n_checkpoints",
                                   "dt", "interpret"))
def jacobian_adjoint_pallas(mT, hdT, ehT, dhT, stT, ctT, injT, src_wav,
                            seg_starts, res_rows, dt, *, nt, nx, nz,
                            space_order, spacing, z0, n_checkpoints,
                            interpret=False):
    """Batched TTI checkpointed gradient (reverse segment grid).
    ``res_rows`` is (B, nseg, seg, 2, nx) with the receiver weights and
    s^2/m folded (``pallas_acoustic.residual_rows``). Returns gradT
    (B, nz, nx) — the UNSCALED accumulation; callers apply -1/s^2 and
    transpose."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from .acoustic import _ckpt_layout

    w1, r1, w2, ihx, ihz = _statics(space_order, spacing)
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    B = injT.shape[0]
    wav = _pack_wav(src_wav, float(dt) ** 2, nt, nseg * seg)
    kern = partial(_grad_kernel, seg=seg, nsteps=nsteps, nx=nx, nz=nz,
                   w1=w1, r1=r1, w2=w2, ihx=ihx, ihz=ihz, z0=z0)
    return pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 +
                 [pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, None, 4, nz, nx),
                               lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, None, seg, 2, nx),
                               lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nz, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((seg, nz, nx), jnp.float32)] * 2 +
                       [pltpu.VMEM((nz, nx), jnp.float32)] * 8,
        interpret=env_interpret(interpret),
    )(wav, mT, hdT, ehT, dhT, stT, ctT, injT, seg_starts, res_rows)


def _tti_operands(vp, damp, epsilon, delta, theta, s_idx, s_w, r_idx, dt,
                  *, nt, spacing, space_order, n_checkpoints, interpret):
    from .acoustic import _ckpt_layout
    from .pallas_acoustic import source_pattern

    m = 1.0 / (vp * vp)
    s2 = float(dt) ** 2
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    nx, nz = vp.shape
    injT = jnp.swapaxes(source_pattern(s_idx, s_w, m, s2), -1, -2)
    mT = m.T
    hdT = jnp.broadcast_to(jnp.float32(dt) * damp, vp.shape).T
    ehT = (1.0 + 2.0 * epsilon).T
    dhT = jnp.sqrt(1.0 + 2.0 * delta).T
    stT = jnp.sin(theta).T
    ctT = jnp.cos(theta).T
    z0 = int(np.asarray(r_idx)[..., 1].min())
    kw = dict(nt=nt, nx=nx, nz=nz, space_order=space_order,
              spacing=spacing, z0=z0, n_checkpoints=n_checkpoints,
              interpret=interpret)
    return m, s2, (nsteps, seg, nseg), (mT, hdT, ehT, dhT, stT, ctT,
                                        injT), z0, kw


def tti_gradient_batched_pallas(vp, damp, epsilon, delta, theta, src_wav,
                                s_idx, s_w, r_idx, r_w, obs, dt, *, nt,
                                spacing, space_order, n_checkpoints,
                                interpret=False):
    """Batched TTI L2 gradient through the Pallas segment kernels:
    checkpointed forward, residual vs ``obs`` (B, nt, nrec), reverse
    gradient. Returns per-shot grads (B, nx, nz) — the drop-in twin of
    vmapping ``tti.forward_ckpt`` + ``jacobian_adjoint_from_ckpt`` with
    ``res = rec - obs`` (gate with ``tti_supported``/``enabled``)."""
    from .pallas_acoustic import residual_rows
    from ..fwi import _traces_from_rows

    m, s2, (nsteps, seg, nseg), ops, z0, kw = _tti_operands(
        vp, damp, epsilon, delta, theta, s_idx, s_w, r_idx, dt, nt=nt,
        spacing=spacing, space_order=space_order,
        n_checkpoints=n_checkpoints, interpret=interpret)
    rec_rows, seg_starts = forward_ckpt_pallas(*ops, src_wav, float(dt),
                                               **kw)
    rec = _traces_from_rows(rec_rows, r_idx, r_w, z0, nt, nsteps,
                            vp.dtype)
    res = rec - obs
    rows = residual_rows(res, r_idx, r_w, m, s2, z0, nsteps, seg, nseg)
    gradT = jacobian_adjoint_pallas(*ops, src_wav, seg_starts, rows,
                                    float(dt), **kw)
    return jnp.swapaxes(gradT, -1, -2) * jnp.float32(-1.0 / s2)


def tti_gradient_residual_batched_pallas(vp, damp, epsilon, delta, theta,
                                         src_wav, s_idx, s_w, r_idx, r_w,
                                         res, dt, *, nt, spacing,
                                         space_order, n_checkpoints,
                                         interpret=False):
    """Same as ``tti_gradient_batched_pallas`` but back-propagating a
    GIVEN residual ``res`` (B, nt, nrec) — the
    ``jacobian_adjoint_from_ckpt`` calling convention used by
    ``AnisotropicWaveSolver.gradient_checkpointed``."""
    from .pallas_acoustic import residual_rows

    m, s2, (nsteps, seg, nseg), ops, z0, kw = _tti_operands(
        vp, damp, epsilon, delta, theta, s_idx, s_w, r_idx, dt, nt=nt,
        spacing=spacing, space_order=space_order,
        n_checkpoints=n_checkpoints, interpret=interpret)
    _, seg_starts = forward_ckpt_pallas(*ops, src_wav, float(dt), **kw)
    rows = residual_rows(res, r_idx, r_w, m, s2, z0, nsteps, seg, nseg)
    gradT = jacobian_adjoint_pallas(*ops, src_wav, seg_starts, rows,
                                    float(dt), **kw)
    return jnp.swapaxes(gradT, -1, -2) * jnp.float32(-1.0 / s2)
