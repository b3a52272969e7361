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
the XLA segment-checkpointed path — 5.5x — and the on-chip parity test
(test_tti_pallas_matches_xla_on_chip) passes.
``DEVITO_FWI_TPU_PALLAS_TTI=0`` opts out. Scope: 2-D f32, phi-less
TTI, receivers on <= 2 z-planes (``tti_supported``); everything else
falls back to the XLA pair.

Round-3 additions, both measured by tools/bench_tti_stream.py on chip:

* **Streamed-history gradient** (``forward_dt2_pallas`` +
  ``gradient_stream_pallas``, default-on via ``_stream_route``,
  ``DEVITO_FWI_TPU_TTI_STREAM=0`` opts out): the forward streams BOTH
  fields' d2/dt2 histories to HBM as pipelined output blocks (bf16 by
  default on TPU, ``pallas_acoustic.stream_hist_dtype``) and the
  reverse sweep consumes them — 2 coupled sweeps per step instead of
  3. Marmousi-scale A/B (300x106+nbl40, so=8, 4 shots, nt=4003):
  0.154 vs 0.219 s = **1.42x**, bf16-history gradient deviation
  3.2e-4 max-rel (f32 history is exact: interpret parity test).
* **Raised 96 MB scoped-vmem limit** (``_compiler_params``): the
  rotated gxx/gzz chains keep ~60 field-sized temporaries live on the
  Mosaic stack — at Marmousi grids (186x380 transposed) that is ~17 MB
  and the default 16 MB limit rejected the kernels REGARDLESS of
  segment length. With the raise (v5e has 128 MB physical VMEM; same
  fix as the 3-D kernels) the recompute pair also runs Marmousi-scale
  TTI at 31 Gcs/s (6-sweep count).

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
           "jacobian_adjoint_pallas", "forward_dt2_pallas",
           "gradient_stream_pallas", "pick_stream_checkpoints_tti",
           "stream_max_shots_tti"]


def enabled():
    if os.environ.get("DEVITO_FWI_TPU_PALLAS_TTI", "1") != "1":
        return False
    if env_interpret():
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def tti_supported(model, rec_idx, nt=None):
    if model.dim != 2 or model.dtype != np.float32:
        return False
    zplanes = np.unique(np.asarray(rec_idx)[..., 1])
    # the planes must be ADJACENT (z0, z0+1): the kernels record
    # exactly those two rows, and two separated planes would silently
    # read the wrong row for the second one (review r5)
    if len(zplanes) > 2 or zplanes.max() - zplanes.min() > 1:
        return False
    # the kernels' static 2-row receiver slice must fit the grid (a
    # z-edge geometry would clamp it to one row and crash the trace)
    z0 = int(zplanes.min())
    if not (0 <= z0 and z0 + 2 <= model.padded_shape[1]):
        return False
    if nt is not None:
        # even a 2-step recompute segment must fit VMEM
        nx, nz = model.padded_shape
        if pick_n_checkpoints_tti(nt, nx, nz) is None:
            return False
    return True


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


def _compiler_params():
    """v5e has 128 MB of physical VMEM; the default 16 MB scoped limit
    rejects the rotated-chain TEMPORARIES at Marmousi-scale grids (the
    gxx/gzz evaluation keeps ~60 field-sized temps live on the Mosaic
    stack — measured 16.7-17.4M scoped at 186x380 regardless of segment
    length). 96 MB matches the 3-D kernels' raised limit; the pick_*
    budgets below keep 1/3 headroom under it."""
    import jax.experimental.pallas.tpu as pltpu
    return pltpu.CompilerParams(vmem_limit_bytes=96 * 2 ** 20)


def _fwd_dt2_kernel(wav_ref, m_ref, hd_ref, eh_ref, dh_ref, st_ref, ct_ref,
                    inj_ref, udt2_ref, vdt2_ref, rec_ref, u_ref, up_ref,
                    v_ref, vp_ref, *, seg, nx, nz, w1, r1, w2, ihx, ihz,
                    z0):
    """One (shot b, segment j) grid step of the history-streaming TTI
    forward: identical coupled leapfrog to ``_fwd_kernel``, but instead
    of segment-start checkpoints it emits BOTH fields' d2/dt2 histories
    (un - 2u + up) as pipelined output blocks — the acoustic
    ``_fwd_dt2_kernel`` pattern on the coupled system."""
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

    s2 = wav_ref[0]                        # slot 0 holds dt^2

    def body(i, _):
        u = u_ref[:]
        up = up_ref[:]
        v = v_ref[:]
        vp = vp_ref[:]
        rec_ref[i] = u[z0:z0 + 2, :] + v[z0:z0 + 2, :]
        Gxx_u = gxx(u)
        Gzz_v = gzz(v)
        w_t = wav_ref[base + i + 1]
        un = (s2 * (eh * Gxx_u + dh * Gzz_v) + two_m_hd * u - m * up) \
            * inv_mhd + w_t * inj
        vn = (s2 * (dh * Gxx_u + Gzz_v) + two_m_hd * v - m * vp) \
            * inv_mhd + w_t * inj
        # cast is a no-op for the f32 history; bf16 halves the streamed
        # HBM traffic (pallas_acoustic.stream_hist_dtype)
        udt2_ref[i] = (un - 2.0 * u + up).astype(udt2_ref.dtype)
        vdt2_ref[i] = (vn - 2.0 * v + vp).astype(vdt2_ref.dtype)
        u_ref[:] = un
        up_ref[:] = u
        v_ref[:] = vn
        vp_ref[:] = v
        return 0

    jax.lax.fori_loop(0, seg, body, 0)


def _grad_stream_kernel(m_ref, hd_ref, eh_ref, dh_ref, st_ref, ct_ref,
                        udt2_ref, vdt2_ref, res_ref, grad_ref, du_ref,
                        dun_ref, dv_ref, dvn_ref, *, seg, nsteps, nx, nz,
                        w1, r1, w2, ihx, ihz, z0, s2):
    """One (shot b, reversed-segment j) grid step of the streamed-history
    TTI gradient: the adjoint sweep of ``_grad_kernel`` with the forward
    recompute removed — both fields' d2/dt2 histories arrive as pipelined
    input blocks. Accumulation order matches ``_grad_kernel`` exactly."""
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
    gzz, gxx = _make_ops_t(w1, r1, w2, ihx, ihz, nx, nz)(st_ref[:],
                                                         ct_ref[:])

    @pl.when(j == 0)
    def _():
        for ref in (du_ref, dun_ref, dv_ref, dvn_ref, grad_ref):
            ref[:] = jnp.zeros((nz, nx), jnp.float32)

    def rev_body(i, _):
        jj = seg - 1 - i

        @pl.when(base + jj < nsteps)
        def _():
            du = du_ref[:]
            dv = dv_ref[:]
            grad_ref[:] = grad_ref[:] \
                + udt2_ref[jj].astype(jnp.float32) * du \
                + vdt2_ref[jj].astype(jnp.float32) * dv
            H0 = gxx(eh * du + dh * dv)
            Hz = gzz(dh * du + dv)
            du_ref[:] = (s2 * H0 + two_m_hd * du - m * dun_ref[:]) \
                * inv_mhd
            dv_ref[:] = (s2 * Hz + two_m_hd * dv - m * dvn_ref[:]) \
                * inv_mhd
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
        compiler_params=_compiler_params(),
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
        compiler_params=_compiler_params(),
        interpret=env_interpret(interpret),
    )(wav, mT, hdT, ehT, dhT, stT, ctT, injT, seg_starts, res_rows)


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "n_checkpoints",
                                   "dt", "interpret", "hist_dtype"))
def forward_dt2_pallas(mT, hdT, ehT, dhT, stT, ctT, injT, src_wav, dt, *,
                       nt, nx, nz, space_order, spacing, z0,
                       n_checkpoints, interpret=False,
                       hist_dtype="float32"):
    """Batched TTI forward on the segment grid that streams BOTH fields'
    d2/dt2 histories to HBM as pipelined output blocks. Returns
    (rec_rows (B, nseg, seg, 2, nx), udt2, vdt2 (B, nseg, seg, nz, nx));
    the in-VMEM arithmetic stays f32 regardless of ``hist_dtype``."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from .acoustic import _ckpt_layout

    w1, r1, w2, ihx, ihz = _statics(space_order, spacing)
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    B = injT.shape[0]
    wav = _pack_wav(src_wav, float(dt) ** 2, nt, nseg * seg)
    kern = partial(_fwd_dt2_kernel, seg=seg, nx=nx, nz=nz, w1=w1, r1=r1,
                   w2=w2, ihx=ihx, ihz=ihz, z0=z0)
    hdtype = jnp.dtype(hist_dtype)
    udt2, vdt2, rec_rows = pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 +
                 [pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((None, None, seg, nz, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, seg, nz, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, seg, 2, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nseg, seg, nz, nx), hdtype),
            jax.ShapeDtypeStruct((B, nseg, seg, nz, nx), hdtype),
            jax.ShapeDtypeStruct((B, nseg, seg, 2, nx), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32)] * 4,
        compiler_params=_compiler_params(),
        interpret=env_interpret(interpret),
    )(wav, mT, hdT, ehT, dhT, stT, ctT, injT)
    return rec_rows, udt2, vdt2


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "n_checkpoints",
                                   "dt", "interpret"))
def gradient_stream_pallas(mT, hdT, ehT, dhT, stT, ctT, udt2, vdt2,
                           res_rows, dt, *, nt, nx, nz, space_order,
                           spacing, z0, n_checkpoints, interpret=False):
    """Reverse-sweep TTI gradient from the streamed d2/dt2 histories
    (``forward_dt2_pallas`` output) — no forward recompute: 2 coupled
    stencil sweeps per step instead of 3. Returns gradT (B, nz, nx),
    UNSCALED like ``jacobian_adjoint_pallas`` (callers apply -1/s^2 and
    transpose)."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from .acoustic import _ckpt_layout

    w1, r1, w2, ihx, ihz = _statics(space_order, spacing)
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    B = udt2.shape[0]
    kern = partial(_grad_stream_kernel, seg=seg, nsteps=nsteps, nx=nx,
                   nz=nz, w1=w1, r1=r1, w2=w2, ihx=ihx, ihz=ihz, z0=z0,
                   s2=float(dt) ** 2)
    return pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 +
                 [pl.BlockSpec((None, None, seg, nz, nx),
                               lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, None, seg, nz, nx),
                               lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, None, seg, 2, nx),
                               lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nz, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32)] * 4,
        compiler_params=_compiler_params(),
        interpret=env_interpret(interpret),
    )(mT, hdT, ehT, dhT, stT, ctT, udt2, vdt2, res_rows)


def pick_n_checkpoints_tti(nt, nx, nz):
    """Smallest checkpoint count whose recompute segment fits VMEM: the
    TTI grad kernel keeps BOTH fields' recomputed dt2 histories
    (seg, nz, nx) f32 in scratch next to ~60 field-sized rotated-chain
    temporaries and the double-buffered checkpoint blocks, under the
    raised 96 MB scoped-vmem limit with 1/3 headroom. Returns None when
    even a 2-step segment cannot fit (grid too large for the VMEM
    kernels — fall back to the XLA pair)."""
    from .pallas_acoustic import _padded_field_bytes

    field = _padded_field_bytes(nx, nz)
    budget = 64 * 2 ** 20 - 80 * field
    seg_max = min(budget // (2 * field), 32)
    if seg_max < 2:
        return None
    nsteps = nt - 2
    return max(int(-(-nsteps // seg_max)), 1)


def pick_stream_checkpoints_tti(nt, nx, nz, hist_dtype="float32"):
    """Checkpoint count for the streamed TTI kernels: TWO double-
    buffered (seg, nz, nx) history blocks next to the ~60 field-sized
    rotated-chain temporaries, under the raised 96 MB scoped-vmem limit
    with 1/3 headroom. Returns None when even a 4-step segment cannot
    fit (fall back to the recompute kernels)."""
    from .pallas_acoustic import _padded_field_bytes

    itemsize = jnp.dtype(hist_dtype).itemsize
    field = _padded_field_bytes(nx, nz)
    hist_field = _padded_field_bytes(nx, nz, itemsize)
    budget = 64 * 2 ** 20 - 80 * field
    seg_max = budget // (4 * hist_field)
    if seg_max < 4:
        return None
    seg_cap = int(os.environ.get("DEVITO_FWI_TPU_STREAM_SEG", "12"))
    seg = min(seg_max, seg_cap)
    nsteps = nt - 2
    return max(int(-(-nsteps // seg)), 1)


def stream_max_shots_tti(nt, nx, nz, hbm_budget_bytes=8 << 30,
                         hist_dtype="float32"):
    """Largest shot batch whose TWO streamed d2/dt2 histories fit the
    HBM budget."""
    from .pallas_acoustic import _padded_field_bytes

    itemsize = jnp.dtype(hist_dtype).itemsize
    per_shot = 2 * (nt - 2) * _padded_field_bytes(nx, nz, itemsize)
    return max(1, int(hbm_budget_bytes // max(per_shot, 1)))


def _stream_route(nt, nx, nz, B):
    """(n_checkpoints, hist_dtype) for the streamed TTI gradient, or
    (None, None) to use the recompute kernels.
    ``DEVITO_FWI_TPU_TTI_STREAM=0`` opts out (the recompute pair stays
    the certified fallback)."""
    from .pallas_acoustic import stream_hist_dtype

    if os.environ.get("DEVITO_FWI_TPU_TTI_STREAM", "1") != "1":
        return None, None
    hist_dtype = stream_hist_dtype()
    snck = pick_stream_checkpoints_tti(nt, nx, nz, hist_dtype)
    if snck is None or B > stream_max_shots_tti(nt, nx, nz,
                                                hist_dtype=hist_dtype):
        return None, None
    return snck, hist_dtype


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
                                interpret=False, stream=None):
    """Batched TTI L2 gradient through the Pallas segment kernels:
    forward, residual vs ``obs`` (B, nt, nrec), reverse gradient.
    Returns per-shot grads (B, nx, nz) — the drop-in twin of vmapping
    ``tti.forward_ckpt`` + ``jacobian_adjoint_from_ckpt`` with
    ``res = rec - obs`` (gate with ``tti_supported``/``enabled``).

    ``stream=None`` auto-routes: when both fields' streamed d2/dt2
    histories fit VMEM blocks and the HBM budget, the forward streams
    them and the reverse sweep skips the recompute (2 coupled sweeps per
    step instead of 3 — the acoustic streamed-history pattern);
    otherwise, or under ``DEVITO_FWI_TPU_TTI_STREAM=0``, the
    checkpoint+recompute pair runs. ``stream=False`` forces recompute,
    ``stream=True`` asserts the streamed route fits."""
    from .pallas_acoustic import residual_rows
    from ..fwi import _traces_from_rows

    nx, nz = vp.shape
    B = int(s_idx.shape[0])
    snck, hist_dtype = _stream_route(nt, nx, nz, B)
    use_stream = (snck is not None) if stream is None else bool(stream)
    if use_stream:
        assert snck is not None, "streamed TTI route does not fit"
        n_checkpoints = snck
    else:
        # the recompute kernel's two (seg, nz, nx) dt2 scratch histories
        # must fit VMEM: raise the checkpoint count when the caller's
        # choice would make segments too long (the acoustic
        # pick_n_checkpoints analog)
        nck_min = pick_n_checkpoints_tti(nt, nx, nz)
        assert nck_min is not None, "grid too large for the VMEM kernels"
        n_checkpoints = max(n_checkpoints, nck_min)

    m, s2, (nsteps, seg, nseg), ops, z0, kw = _tti_operands(
        vp, damp, epsilon, delta, theta, s_idx, s_w, r_idx, dt, nt=nt,
        spacing=spacing, space_order=space_order,
        n_checkpoints=n_checkpoints, interpret=interpret)
    if use_stream:
        rec_rows, udt2, vdt2 = forward_dt2_pallas(
            *ops, src_wav, float(dt), hist_dtype=hist_dtype, **kw)
        rec = _traces_from_rows(rec_rows, r_idx, r_w, z0, nt, nsteps,
                                vp.dtype)
        rows = residual_rows(rec - obs, r_idx, r_w, m, s2, z0, nsteps,
                             seg, nseg)
        gradT = gradient_stream_pallas(*ops[:6], udt2, vdt2, rows,
                                       float(dt), **kw)
    else:
        rec_rows, seg_starts = forward_ckpt_pallas(*ops, src_wav,
                                                   float(dt), **kw)
        rec = _traces_from_rows(rec_rows, r_idx, r_w, z0, nt, nsteps,
                                vp.dtype)
        rows = residual_rows(rec - obs, r_idx, r_w, m, s2, z0, nsteps,
                             seg, nseg)
        gradT = jacobian_adjoint_pallas(*ops, src_wav, seg_starts, rows,
                                        float(dt), **kw)
    return jnp.swapaxes(gradT, -1, -2) * jnp.float32(-1.0 / s2)


def tti_gradient_residual_batched_pallas(vp, damp, epsilon, delta, theta,
                                         src_wav, s_idx, s_w, r_idx, r_w,
                                         res, dt, *, nt, spacing,
                                         space_order, n_checkpoints,
                                         interpret=False, stream=None):
    """Same as ``tti_gradient_batched_pallas`` but back-propagating a
    GIVEN residual ``res`` (B, nt, nrec) — the
    ``jacobian_adjoint_from_ckpt`` calling convention used by
    ``AnisotropicWaveSolver.gradient_checkpointed``. Auto-routes through
    the streamed-history kernels like ``tti_gradient_batched_pallas``."""
    from .pallas_acoustic import residual_rows

    nx, nz = vp.shape
    B = int(s_idx.shape[0])
    snck, hist_dtype = _stream_route(nt, nx, nz, B)
    use_stream = (snck is not None) if stream is None else bool(stream)
    if use_stream:
        assert snck is not None, "streamed TTI route does not fit"
        n_checkpoints = snck
    else:
        # the recompute kernel's two (seg, nz, nx) dt2 scratch histories
        # must fit VMEM: raise the checkpoint count when the caller's
        # choice would make segments too long (the acoustic
        # pick_n_checkpoints analog)
        nck_min = pick_n_checkpoints_tti(nt, nx, nz)
        assert nck_min is not None, "grid too large for the VMEM kernels"
        n_checkpoints = max(n_checkpoints, nck_min)

    m, s2, (nsteps, seg, nseg), ops, z0, kw = _tti_operands(
        vp, damp, epsilon, delta, theta, s_idx, s_w, r_idx, dt, nt=nt,
        spacing=spacing, space_order=space_order,
        n_checkpoints=n_checkpoints, interpret=interpret)
    rows = residual_rows(res, r_idx, r_w, m, s2, z0, nsteps, seg, nseg)
    if use_stream:
        _, udt2, vdt2 = forward_dt2_pallas(
            *ops, src_wav, float(dt), hist_dtype=hist_dtype, **kw)
        gradT = gradient_stream_pallas(*ops[:6], udt2, vdt2, rows,
                                       float(dt), **kw)
    else:
        _, seg_starts = forward_ckpt_pallas(*ops, src_wav, float(dt),
                                            **kw)
        gradT = jacobian_adjoint_pallas(*ops, src_wav, seg_starts, rows,
                                        float(dt), **kw)
    return jnp.swapaxes(gradT, -1, -2) * jnp.float32(-1.0 / s2)
