"""Pallas TPU segment kernel for the 2-D velocity-stress elastic system.

The same VMEM-resident design as ``pallas_acoustic``: a grid over
(time segments) with the five field carries (vx, vz, txx, tzz, txz)
persisting in scratch across sequential segment steps, so the XLA scan's
~12 HBM field sweeps per step collapse to the per-segment receiver-row
blocks. Numerics mirror ``ops.staggered.elastic_forward`` term for term
(same staggered Fornberg stencils, same zero-Dirichlet shifts, same
update association); parity is pinned by tests/test_pallas_staggered.py
in interpreter mode.

Scope: 2-D, float32, one source point, receivers between two z-planes —
the reference ``elastic_example.py`` geometry. Reference semantics:
``seismic/elastic/operators.py:6-65``.

Measured on the chip (380x230, so=8, nt=1166): solver-level wall time is
~205 ms for BOTH paths — the single-shot example API is dominated by the
tunnel's host transfers, not device compute — with trace parity 2.8e-7.
The kernel exists for the same reason the acoustic segment kernels do
(VMEM-resident carries; the acoustic twin measured ~3x the XLA scan at
device level), and becomes the production path whenever elastic shots
are batched.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.fd import fd_weights
from .self_adjoint import staggered_weights
from .pallas_acoustic import env_interpret

__all__ = ["elastic_forward_pallas", "elastic_supported", "seg_layout",
           "visco_sls2_forward_pallas", "visco_sls2_supported"]


def seg_layout(nsteps, target=32):
    """(seg, nseg) segment split of a forward-only time loop."""
    seg = min(max(nsteps, 1), target)
    nseg = -(-max(nsteps, 1) // seg)
    return seg, nseg


def _shift(u, o, axis, nx, nz):
    """Zero-Dirichlet integer shift on the transposed (nz, nx) layout:
    out[idx] = u[idx + o] along `axis`."""
    if o == 0:
        return u
    if axis == 0:
        z = jnp.zeros((abs(o), nx), jnp.float32)
        return jnp.concatenate([u[o:, :], z], 0) if o > 0 \
            else jnp.concatenate([z, u[:o, :]], 0)
    z = jnp.zeros((nz, abs(o)), jnp.float32)
    return jnp.concatenate([u[:, o:], z], 1) if o > 0 \
        else jnp.concatenate([z, u[:, :o]], 1)


def _make_sd(nx, nz):
    """Shifted-derivative factory mirroring
    ``ops.self_adjoint.shifted_derivative``'s association:
    (w0*u[off0] + sum_k wk*u[offk]) * inv_h. `axis` is the PHYSICAL dim
    (0 = x -> lane axis, 1 = z -> sublane axis in the transposed
    layout)."""
    def sd(u, w, off, axis, inv_h):
        kaxis = 1 if axis == 0 else 0
        acc = None
        for wk, ok in zip(w, off):
            if wk == 0.0:
                continue
            term = wk * _shift(u, int(ok), kaxis, nx, nz)
            acc = term if acc is None else acc + term
        return acc * inv_h
    return sd


def _elastic_kernel(wav_ref, lam_ref, mu_ref, b0_ref, b1_ref, damp_ref,
                    d0_ref, d1_ref, mu01_ref, d01_ref, inj_ref, rec_ref,
                    vx_ref, vz_ref, txx_ref, tzz_ref, txz_ref, *,
                    seg, nx, nz, wp, op, wm, om, wc, oc, ihx, ihz, s, z0):
    """One time-segment grid step of the elastic leapfrog (transposed
    (nz, nx) fields). Mirrors ``staggered.elastic_forward``'s step."""
    import jax.experimental.pallas as pl

    j = pl.program_id(0)
    base = j * seg
    lam = lam_ref[:]
    mu = mu_ref[:]
    b0 = b0_ref[:]
    b1 = b1_ref[:]
    damp = damp_ref[:]
    d0 = d0_ref[:]
    d1 = d1_ref[:]
    mu01 = mu01_ref[:]
    d01 = d01_ref[:]
    inj = inj_ref[:]
    sd = _make_sd(nx, nz)

    @pl.when(j == 0)
    def _():
        for ref in (vx_ref, vz_ref, txx_ref, tzz_ref, txz_ref):
            ref[:] = jnp.zeros((nz, nx), jnp.float32)

    def body(i, _):
        vx, vz = vx_ref[:], vz_ref[:]
        txx, tzz, txz = txx_ref[:], tzz_ref[:], txz_ref[:]
        # receivers at time t: rec1 = tau_zz, rec2 = div(v) with the
        # centered own-grid derivative (staggered.py module docstring)
        rec_ref[i, 0] = tzz[z0:z0 + 2, :]
        div_c = sd(vx, wc, oc, 0, ihx) + sd(vz, wc, oc, 1, ihz)
        rec_ref[i, 1] = div_c[z0:z0 + 2, :]

        # v[t+1] = damp (v + dt b div(tau))
        dtau_x = sd(txx, wp, op, 0, ihx) + sd(txz, wm, om, 1, ihz)
        dtau_z = sd(tzz, wp, op, 1, ihz) + sd(txz, wm, om, 0, ihx)
        vxn = d0 * (vx + s * b0 * dtau_x)
        vzn = d1 * (vz + s * b1 * dtau_z)

        dvx = sd(vxn, wm, om, 0, ihx)
        dvz = sd(vzn, wm, om, 1, ihz)
        div_vn = dvx + dvz

        # tau[t+1] = damp (tau + dt lam diag(div v') + dt mu (grad+grad^T))
        txxn = damp * (txx + s * lam * div_vn + 2.0 * s * mu * dvx)
        tzzn = damp * (tzz + s * lam * div_vn + 2.0 * s * mu * dvz)
        g = sd(vxn, wp, op, 1, ihz) + sd(vzn, wp, op, 0, ihx)
        txzn = d01 * (txz + s * mu01 * g)

        wav_t = wav_ref[base + i]
        vx_ref[:] = vxn
        vz_ref[:] = vzn
        txx_ref[:] = txxn + wav_t * inj
        tzz_ref[:] = tzzn + wav_t * inj
        txz_ref[:] = txzn
        return 0

    jax.lax.fori_loop(0, seg, body, 0)


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "dt", "interpret"))
def _elastic_segments(lam_t, mu_t, b0_t, b1_t, damp_t, d0_t, d1_t, mu01_t,
                      d01_t, inj_t, wav_pad, dt, *, nt, nx, nz, space_order,
                      spacing, z0, interpret=False):
    """Segment-grid Pallas elastic forward (transposed operands).
    Returns rec_rows (nseg, seg, 2, 2, nx): per step, the two z-plane
    rows of (tau_zz, div v)."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    dtype = np.float32
    w_p, off_p, w_m, off_m = staggered_weights(space_order)
    r = space_order // 2
    oc = np.arange(-r, r + 1)
    wc = fd_weights(1, oc, 0.0)
    # constants rounded exactly like elastic_forward's jnp.asarray(f32)
    wp = tuple(float(v) for v in np.asarray(w_p, dtype))
    wm = tuple(float(v) for v in np.asarray(w_m, dtype))
    wcc = tuple(float(v) for v in np.asarray(wc, dtype))
    ihx = float(dtype(1.0 / spacing[0]))
    ihz = float(dtype(1.0 / spacing[1]))
    s = float(dtype(dt))
    nsteps = nt - 1
    seg, nseg = seg_layout(nsteps)

    kern = partial(_elastic_kernel, seg=seg, nx=nx, nz=nz,
                   wp=wp, op=tuple(int(o) for o in off_p),
                   wm=wm, om=tuple(int(o) for o in off_m),
                   wc=wcc, oc=tuple(int(o) for o in oc),
                   ihx=ihx, ihz=ihz, s=s, z0=z0)
    return pl.pallas_call(
        kern,
        grid=(nseg,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec((None, seg, 2, 2, nx),
                               lambda j: (j, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nseg, seg, 2, 2, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32)] * 5,
        interpret=env_interpret(interpret),
    )(wav_pad, lam_t, mu_t, b0_t, b1_t, damp_t, d0_t, d1_t, mu01_t, d01_t,
      inj_t)


def elastic_supported(model, src_idx, rec_idx):
    """True when the elastic fast path applies: 2-D f32, one source
    point, receivers between two z-planes."""
    if model.dim != 2 or model.dtype != np.float32:
        return False
    if np.asarray(src_idx).shape[0] != 1:
        return False
    zplanes = np.unique(np.asarray(rec_idx)[..., 1])
    # the kernels record exactly rows z0 and z0+1: the planes must be
    # ADJACENT, not merely two in number (two separated planes would
    # silently read the wrong row for the second one — review r5)
    if len(zplanes) > 2 or zplanes.max() - zplanes.min() > 1:
        return False
    # the kernels' static 2-row receiver slice must fit the grid (a
    # z-edge geometry would clamp it to one row and crash the trace)
    z0 = int(zplanes.min())
    return 0 <= z0 and z0 + 2 <= model.padded_shape[1]


def elastic_forward_pallas(lam, mu, b, damp, src_wav, src_idx, src_w,
                           rec_idx, rec_w, dt, *, nt, spacing,
                           space_order=4, interpret=False):
    """Drop-in twin of ``staggered.elastic_forward`` on the Pallas
    segment kernel (gate with ``elastic_supported`` first). Returns
    (rec1, rec2) traces, each (nt, nrec)."""
    def np_avg(p, dims):
        # numpy twin of staggered.avg_to (each eager jnp op would cost a
        # ~40 ms tunnel round trip — 6 of them dwarfed the kernel)
        for d in dims:
            pp = np.concatenate(
                [p, np.zeros_like(np.take(p, [0], axis=d))], axis=d)
            p = 0.5 * (p + np.take(pp, np.arange(1, p.shape[d] + 1),
                                   axis=d))
        return p.astype(np.float32)

    dtype = np.float32
    lam = np.asarray(lam, dtype)
    mu = np.asarray(mu, dtype)
    nx, nz = lam.shape
    b_a = np.asarray(b, dtype) if np.ndim(b) else np.full((nx, nz), b, dtype)
    damp_a = np.asarray(damp, dtype) if np.ndim(damp) \
        else np.full((nx, nz), damp, dtype)
    b0 = np_avg(b_a, (0,))
    b1 = np_avg(b_a, (1,))
    d0 = np_avg(damp_a, (0,))
    d1 = np_avg(damp_a, (1,))
    mu01 = np_avg(mu, (0, 1))
    d01 = np_avg(damp_a, (0, 1))

    s = float(np.float32(dt))
    s_idx_n = np.asarray(src_idx)
    s_w_n = np.asarray(src_w)
    inj = np.zeros((nx, nz), dtype)
    for c in range(s_idx_n.shape[1]):
        xi, zi = s_idx_n[0, c]
        if 0 <= xi < nx and 0 <= zi < nz:  # drop OOB corners (interp.py)
            inj[xi, zi] += s_w_n[0, c] * s  # w_p * dt (operators.py:20-25)

    r_idx_n = np.asarray(rec_idx)
    z0 = int(r_idx_n[..., 1].min())
    nsteps = nt - 1
    seg, nseg = seg_layout(nsteps)
    wav_pad = np.zeros((nseg * seg,), dtype)
    wav_pad[:nsteps] = np.asarray(src_wav, dtype)[0:nt - 1, 0]

    rows = _elastic_segments(
        jnp.asarray(lam.T), jnp.asarray(mu.T), jnp.asarray(b0.T),
        jnp.asarray(b1.T), jnp.asarray(damp_a.T), jnp.asarray(d0.T),
        jnp.asarray(d1.T), jnp.asarray(mu01.T), jnp.asarray(d01.T),
        jnp.asarray(inj.T), jnp.asarray(wav_pad), float(dt), nt=nt, nx=nx,
        nz=nz, space_order=space_order, spacing=spacing, z0=z0,
        interpret=interpret)
    return _stag_assemble(rows, jnp.asarray(rec_idx), jnp.asarray(rec_w),
                          z0=z0, nt=nt, nsteps=nsteps, nx=nx)


def zplane_weight_matrix(r_idx, r_w, nx, z0):
    """(2*nx, nrec) scatter-weight matrix mapping the two recorded
    z-plane rows (z0, z0+1) to receiver traces — the ONE shared
    builder for the staggered families' trace assembly and its exact
    transpose (residual -> rows). Gates guarantee the planes are
    adjacent (see ``elastic_supported``)."""
    nrec = r_idx.shape[0]
    rxi = r_idx[:, :, 0]
    rplane = (r_idx[:, :, 1] != z0).astype(jnp.int32)
    return jnp.zeros((2 * nx, nrec), jnp.float32).at[
        rplane * nx + rxi, jnp.arange(nrec)[:, None]].add(
        r_w.astype(jnp.float32))


@partial(jax.jit, static_argnames=("z0", "nt", "nsteps", "nx"))
def _stag_assemble(rows, r_idx, r_w, *, z0, nt, nsteps, nx):
    """Receiver rows -> (rec1, rec2) traces; the staggered loop records
    t = 0..nt-2 (vs the acoustic 1..nt-1), rec[nt-1] stays 0. MXU
    contraction against the scattered weight matrix, HIGHEST precision
    (the DEFAULT matmul precision truncates to bf16)."""
    nrec = r_idx.shape[0]
    W = zplane_weight_matrix(r_idx, r_w, nx, z0)
    flat = rows.reshape(-1, 2, 2 * nx)[:nsteps]
    out = []
    for o in range(2):
        tr = jnp.einsum("tq,qr->tr", flat[:, o], W,
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
        out.append(jnp.zeros((nt, nrec), jnp.float32).at[0:nsteps].set(tr))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# viscoacoustic SLS 2nd-order forward (the reference's default kernel,
# operators.py:120-182) as a segment-grid VMEM kernel: carries p, p_prev
# and the memory variable r in scratch; the self-adjoint spatial
# operator sum_d D-_d(b D+_d(p)) uses the same shifted-derivative
# association as ops.self_adjoint.laplacian_sa.
# ---------------------------------------------------------------------------

def _visco_sls2_kernel(wav_ref, damp_ref, b_ref, A_ref, B_ref, C_ref,
                       D_ref, inj_ref, rec_ref, pout_ref, p_ref, pp_ref,
                       r_ref, *, seg, nsteps, nx, nz, wp, op, wm, om,
                       ihx, ihz, z0):
    """One time-segment grid step of the SLS 2nd-order viscoacoustic
    leapfrog (transposed (nz, nx) fields):

        L  = sum_d D-_d(b D+_d(p))
        rn = damp (r + A L - B r)         A = s (tt/t_s) rho, B = s/t_s
        pn = damp (2 p - damp pp + C L - D rn) + wav inj
                                          C = s^2 bm (1+tt), D = s^2 vp^2

    Mirrors ``viscoacoustic.forward``'s sls/2 step; the A-D parameter
    fields are precombined on the host with the XLA expression's own
    left-to-right association so the two paths round identically."""
    import jax.experimental.pallas as pl

    j = pl.program_id(0)
    base = j * seg
    damp = damp_ref[:]
    b = b_ref[:]
    A = A_ref[:]
    B = B_ref[:]
    C = C_ref[:]
    D = D_ref[:]
    inj = inj_ref[:]
    sd = _make_sd(nx, nz)

    def lsa(p):
        gx = sd(p, wp, op, 0, ihx)
        out = sd(b * gx, wm, om, 0, ihx)
        gz = sd(p, wp, op, 1, ihz)
        return out + sd(b * gz, wm, om, 1, ihz)

    @pl.when(j == 0)
    def _():
        for ref in (p_ref, pp_ref, r_ref, pout_ref):
            ref[:] = jnp.zeros((nz, nx), jnp.float32)

    def body(i, _):
        p = p_ref[:]
        pp = pp_ref[:]
        r = r_ref[:]
        rec_ref[i] = p[z0:z0 + 2, :]
        # at iteration start p holds the state after (base + i) updates;
        # capture the final field here when the real steps end inside a
        # padded segment (the padded tail keeps stepping with wav = 0,
        # which the XLA scan never does)
        @pl.when(base + i == nsteps)
        def _():
            pout_ref[:] = p
        L = lsa(p)
        rn = damp * (r + A * L - B * r)
        pn = damp * (2.0 * p - damp * pp + C * L - D * rn)
        p_ref[:] = pn + wav_ref[base + i] * inj
        pp_ref[:] = p
        r_ref[:] = rn
        return 0

    jax.lax.fori_loop(0, seg, body, 0)

    nseg = pl.num_programs(0)
    if nsteps == seg * (nsteps // seg):
        # no padded tail: the final state exists only after the last
        # segment's loop
        @pl.when(j == nseg - 1)
        def _():
            pout_ref[:] = p_ref[:]


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "dt", "interpret"))
def _visco_sls2_segments(damp_t, b_t, A_t, B_t, C_t, D_t, inj_t, wav_pad,
                         dt, *, nt, nx, nz, space_order, spacing, z0,
                         interpret=False):
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    dtype = np.float32
    w_p, off_p, w_m, off_m = staggered_weights(space_order)
    wp = tuple(float(v) for v in np.asarray(w_p, dtype))
    wm = tuple(float(v) for v in np.asarray(w_m, dtype))
    ihx = float(dtype(1.0 / spacing[0]))
    ihz = float(dtype(1.0 / spacing[1]))
    nsteps = nt - 2
    seg, nseg = seg_layout(nsteps)

    kern = partial(_visco_sls2_kernel, seg=seg, nsteps=nsteps, nx=nx,
                   nz=nz, wp=wp, op=tuple(int(o) for o in off_p),
                   wm=wm, om=tuple(int(o) for o in off_m),
                   ihx=ihx, ihz=ihz, z0=z0)
    return pl.pallas_call(
        kern,
        grid=(nseg,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=(pl.BlockSpec((None, seg, 2, nx),
                                lambda j: (j, 0, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((nz, nx), lambda j: (0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((nseg, seg, 2, nx), jnp.float32),
                   jax.ShapeDtypeStruct((nz, nx), jnp.float32)),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32)] * 3,
        interpret=env_interpret(interpret),
    )(wav_pad, damp_t, b_t, A_t, B_t, C_t, D_t, inj_t)


def visco_sls2_supported(model, kernel, time_order, src_idx, rec_idx):
    """True when the viscoacoustic Pallas fast path applies: SLS
    2nd-order, 2-D f32, one source point, receivers on <= 2 z-planes."""
    if (kernel, time_order) != ("sls", 2):
        return False
    return elastic_supported(model, src_idx, rec_idx)


def visco_sls2_forward_pallas(vp, b, qp, damp, src_wav, src_idx, src_w,
                              rec_idx, rec_w, dt, f0, *, nt, spacing,
                              space_order=4, interpret=False):
    """Drop-in twin of ``viscoacoustic.forward`` (sls, time_order=2,
    save=False) on the Pallas segment kernel (gate with
    ``visco_sls2_supported``). Returns (rec traces (nt, nrec),
    final p field (nx, nz)) — the same contract as the XLA path."""
    dtype = np.float32
    vp_a = np.asarray(vp, dtype)
    nx, nz = vp_a.shape

    def field(x):
        x = np.asarray(x, dtype)
        return np.full((nx, nz), x, dtype) if x.ndim == 0 else x

    b_a, qp_a, damp_a = field(b), field(qp), field(damp)
    s = dtype(dt)
    f0f = dtype(f0)
    rho = dtype(1.0) / b_a
    bm = rho * vp_a * vp_a
    t_s = (np.sqrt(dtype(1.0) + dtype(1.0) / qp_a ** 2,
                   dtype=dtype) - dtype(1.0) / qp_a) / f0f
    t_ep = dtype(1.0) / (f0f ** 2 * t_s)
    tt = t_ep / t_s - dtype(1.0)
    # precombined with the XLA expression's left-to-right association
    A = s * (tt / t_s) * rho
    B = s / t_s
    C = s * s * bm * (dtype(1.0) + tt)
    D = s * s * vp_a * vp_a

    s_idx_n = np.asarray(src_idx)
    s_w_n = np.asarray(src_w, dtype)
    inj = np.zeros((nx, nz), dtype)
    vp2 = vp_a * vp_a
    for c in range(s_idx_n.shape[1]):
        xi, zi = s_idx_n[0, c]
        if 0 <= xi < nx and 0 <= zi < nz:  # drop OOB corners (interp.py)
            # src_scale = src_w * dt^2 * vp^2 at the corner
            # (operators.py:28)
            inj[xi, zi] += s_w_n[0, c] * s * s * vp2[xi, zi]

    r_idx_n = np.asarray(rec_idx)
    z0 = int(r_idx_n[..., 1].min())
    nsteps = nt - 2
    seg, nseg = seg_layout(nsteps)
    wav_pad = np.zeros((nseg * seg,), dtype)
    wav_pad[:nsteps] = np.asarray(src_wav, dtype)[1:nt - 1, 0]

    rows, p_final_t = _visco_sls2_segments(
        jnp.asarray(damp_a.T), jnp.asarray(b_a.T), jnp.asarray(A.T),
        jnp.asarray(B.T), jnp.asarray(C.T), jnp.asarray(D.T),
        jnp.asarray(inj.T), jnp.asarray(wav_pad), float(dt), nt=nt,
        nx=nx, nz=nz, space_order=space_order, spacing=spacing, z0=z0,
        interpret=interpret)
    rec = _visco_assemble(rows, jnp.asarray(rec_idx), jnp.asarray(rec_w),
                          z0=z0, nt=nt, nsteps=nsteps, nx=nx)
    return rec, p_final_t.T


@partial(jax.jit, static_argnames=("z0", "nt", "nsteps", "nx"))
def _visco_assemble(rows, r_idx, r_w, *, z0, nt, nsteps, nx):
    """Receiver p-rows -> traces; the 2nd-order loop records
    t = 1..nt-2. MXU contraction at HIGHEST precision (the DEFAULT
    matmul precision truncates to bf16)."""
    nrec = r_idx.shape[0]
    W = zplane_weight_matrix(r_idx, r_w, nx, z0)
    flat = rows.reshape(-1, 2 * nx)[:nsteps]
    tr = jnp.einsum("tq,qr->tr", flat, W,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    return jnp.zeros((nt, nrec), jnp.float32).at[1:nsteps + 1].set(tr)


# ---------------------------------------------------------------------------
# streamed-history elastic GRADIENT (round 5): the Pallas twin of
# ops/staggered_grad.py. The forward kernel keeps the five field carries
# in VMEM and streams the imaging-condition history (vn_x, vn_z, dtau_x,
# dtau_z per step, bf16 by default) to HBM as pipelined output blocks;
# the reverse kernel consumes it in reverse segment order, propagates
# the adjoint velocity-stress fields with the exact staggered-derivative
# transposes (D+^T = -D-, D-^T = -D+ under the zero-Dirichlet halo), and
# accumulates the five (lam, mu_node, mu01, b0, b1) gradient images in
# revisited output blocks. Grid is (shot B, time segment) like
# pallas_acoustic's streamed kernels. The XLA scan route pays ~12 HBM
# field sweeps per step (measured 1.3 Gcs/s/sweep with history writes vs
# 3.9 without); VMEM residency is the whole win here.
# ---------------------------------------------------------------------------

def _elastic_fwd_hist_kernel(wav_ref, lam_ref, mu_ref, b0_ref, b1_ref,
                             damp_ref, d0_ref, d1_ref, mu01_ref, d01_ref,
                             inj_ref, hist_ref, rec_ref, illum_ref,
                             vx_ref, vz_ref, txx_ref, tzz_ref, txz_ref, *,
                             seg, nsteps, nx, nz, wp, op, wm, om, ihx,
                             ihz, s, z0):
    """One (shot b, segment j) grid step of the history-streaming
    elastic forward: the `_elastic_kernel` update (same association)
    minus the rec2 observable, plus per-step history/illum emission."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    base = j * seg
    lam = lam_ref[:]
    mu = mu_ref[:]
    b0 = b0_ref[:]
    b1 = b1_ref[:]
    damp = damp_ref[:]
    d0 = d0_ref[:]
    d1 = d1_ref[:]
    mu01 = mu01_ref[:]
    d01 = d01_ref[:]
    inj = inj_ref[:]
    sd = _make_sd(nx, nz)

    @pl.when(j == 0)
    def _():
        for ref in (vx_ref, vz_ref, txx_ref, tzz_ref, txz_ref, illum_ref):
            ref[:] = jnp.zeros((nz, nx), jnp.float32)

    def body(i, _):
        vx, vz = vx_ref[:], vz_ref[:]
        txx, tzz, txz = txx_ref[:], tzz_ref[:], txz_ref[:]
        rec_ref[i] = tzz[z0:z0 + 2, :]

        dtau_x = sd(txx, wp, op, 0, ihx) + sd(txz, wm, om, 1, ihz)
        dtau_z = sd(tzz, wp, op, 1, ihz) + sd(txz, wm, om, 0, ihx)
        vxn = d0 * (vx + s * b0 * dtau_x)
        vzn = d1 * (vz + s * b1 * dtau_z)
        hd = hist_ref.dtype
        hist_ref[i, 0] = vxn.astype(hd)
        hist_ref[i, 1] = vzn.astype(hd)
        hist_ref[i, 2] = dtau_x.astype(hd)
        hist_ref[i, 3] = dtau_z.astype(hd)

        dvx = sd(vxn, wm, om, 0, ihx)
        dvz = sd(vzn, wm, om, 1, ihz)
        div_vn = dvx + dvz
        txxn = damp * (txx + s * lam * div_vn + 2.0 * s * mu * dvx)
        tzzn = damp * (tzz + s * lam * div_vn + 2.0 * s * mu * dvz)
        g = sd(vxn, wp, op, 1, ihz) + sd(vzn, wp, op, 0, ihx)
        txzn = d01 * (txz + s * mu01 * g)

        @pl.when(base + i < nsteps)
        def _():
            illum_ref[:] = illum_ref[:] + vxn * vxn + vzn * vzn

        wav_t = wav_ref[base + i]
        vx_ref[:] = vxn
        vz_ref[:] = vzn
        txx_ref[:] = txxn + wav_t * inj
        tzz_ref[:] = tzzn + wav_t * inj
        txz_ref[:] = txzn
        return 0

    jax.lax.fori_loop(0, seg, body, 0)


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "seg", "dt",
                                   "hist_dtype", "interpret"))
def elastic_fwd_hist_segments(lam_t, mu_t, b0_t, b1_t, damp_t, d0_t, d1_t,
                              mu01_t, d01_t, inj_t, wav_pad, dt, *, nt,
                              nx, nz, space_order, spacing, z0, seg,
                              hist_dtype="bfloat16", interpret=False):
    """Batched history-streaming elastic forward. Transposed (nz, nx)
    operands; inj_t is the (B, nz, nx) dense per-shot source pattern
    (already scaled by w * dt). Returns (rec_rows (B, nseg, seg, 2, nx)
    tzz rows, hist (B, nseg, seg, 4, nz, nx) in hist_dtype,
    illum (B, nz, nx))."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    dtype = np.float32
    w_p, off_p, w_m, off_m = staggered_weights(space_order)
    wp = tuple(float(v) for v in np.asarray(w_p, dtype))
    wm = tuple(float(v) for v in np.asarray(w_m, dtype))
    ihx = float(dtype(1.0 / spacing[0]))
    ihz = float(dtype(1.0 / spacing[1]))
    s = float(dtype(dt))
    nsteps = nt - 1
    nseg = -(-nsteps // seg)
    B = inj_t.shape[0]

    kern = partial(_elastic_fwd_hist_kernel, seg=seg, nsteps=nsteps,
                   nx=nx, nz=nz, wp=wp,
                   op=tuple(int(o) for o in off_p), wm=wm,
                   om=tuple(int(o) for o in off_m), ihx=ihx, ihz=ihz,
                   s=s, z0=z0)
    hist, rec_rows, illum = pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9 +
                 [pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((None, None, seg, 4, nz, nx),
                         lambda b, j: (b, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, seg, 2, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nseg, seg, 4, nz, nx),
                                 jnp.dtype(hist_dtype)),
            jax.ShapeDtypeStruct((B, nseg, seg, 2, nx), jnp.float32),
            jax.ShapeDtypeStruct((B, nz, nx), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32)] * 5,
        interpret=env_interpret(interpret),
    )(wav_pad, lam_t, mu_t, b0_t, b1_t, damp_t, d0_t, d1_t, mu01_t,
      d01_t, inj_t)
    return rec_rows, hist, illum


def _elastic_grad_stream_kernel(lam_ref, mu_ref, b0_ref, b1_ref, damp_ref,
                                d0_ref, d1_ref, mu01_ref, d01_ref,
                                hist_ref, res_ref, glam_ref, gmun_ref,
                                gmup_ref, gb0_ref, gb1_ref, vxb_ref,
                                vzb_ref, txxb_ref, tzzb_ref, txzb_ref, *,
                                seg, nsteps, nx, nz, wp, op, wm, om, ihx,
                                ihz, s, z0):
    """One (shot b, reversed-segment j) grid step of the elastic adjoint
    sweep: the exact transpose of `_elastic_fwd_hist_kernel`'s update,
    accumulation order matching ops/staggered_grad.py's rev body."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    nseg = pl.num_programs(1)
    k = nseg - 1 - j
    base = k * seg
    lam = lam_ref[:]
    mu = mu_ref[:]
    b0 = b0_ref[:]
    b1 = b1_ref[:]
    damp = damp_ref[:]
    d0 = d0_ref[:]
    d1 = d1_ref[:]
    mu01 = mu01_ref[:]
    d01 = d01_ref[:]
    sd = _make_sd(nx, nz)

    @pl.when(j == 0)
    def _():
        for ref in (vxb_ref, vzb_ref, txxb_ref, tzzb_ref, txzb_ref,
                    glam_ref, gmun_ref, gmup_ref, gb0_ref, gb1_ref):
            ref[:] = jnp.zeros((nz, nx), jnp.float32)

    def body(i, _):
        jj = seg - 1 - i

        @pl.when(base + jj < nsteps)
        def _():
            vnx = hist_ref[jj, 0].astype(jnp.float32)
            vnz = hist_ref[jj, 1].astype(jnp.float32)
            dtx = hist_ref[jj, 2].astype(jnp.float32)
            dtz = hist_ref[jj, 3].astype(jnp.float32)
            dvx = sd(vnx, wm, om, 0, ihx)
            dvz = sd(vnz, wm, om, 1, ihz)
            div_vn = dvx + dvz
            g = sd(vnx, wp, op, 1, ihz) + sd(vnz, wp, op, 0, ihx)

            thx = damp * txxb_ref[:]
            thz = damp * tzzb_ref[:]
            tho = d01 * txzb_ref[:]
            sthd = thx + thz
            glam_ref[:] = glam_ref[:] + s * div_vn * sthd
            gmun_ref[:] = gmun_ref[:] + 2.0 * s * (dvx * thx + dvz * thz)
            gmup_ref[:] = gmup_ref[:] + s * g * tho

            dvbx = s * lam * sthd + 2.0 * s * mu * thx
            dvbz = s * lam * sthd + 2.0 * s * mu * thz
            gb_ = s * mu01 * tho
            vbtx = vxb_ref[:] - sd(dvbx, wp, op, 0, ihx) \
                - sd(gb_, wm, om, 1, ihz)
            vbtz = vzb_ref[:] - sd(dvbz, wp, op, 1, ihz) \
                - sd(gb_, wm, om, 0, ihx)
            vhx = d0 * vbtx
            vhz = d1 * vbtz
            gb0_ref[:] = gb0_ref[:] + s * dtx * vhx
            gb1_ref[:] = gb1_ref[:] + s * dtz * vhz

            dtbx = s * b0 * vhx
            dtbz = s * b1 * vhz
            txxb_n = thx - sd(dtbx, wm, om, 0, ihx)
            tzzb_n = thz - sd(dtbz, wm, om, 1, ihz)
            txzb_n = tho - sd(dtbx, wp, op, 1, ihz) \
                - sd(dtbz, wp, op, 0, ihx)
            # residual lands in lambda^t's tau_zz: zero-placed concat
            # band (aligned whole-tile add; 2-wide window ref ops at
            # odd in-tile offsets abort the remote compiler)
            pieces = []
            if z0 > 0:
                pieces.append(jnp.zeros((z0, nx), jnp.float32))
            pieces.append(res_ref[jj])
            if nz - z0 - 2 > 0:
                pieces.append(jnp.zeros((nz - z0 - 2, nx), jnp.float32))
            tzzb_n = tzzb_n + jnp.concatenate(pieces, axis=0)

            vxb_ref[:] = vhx
            vzb_ref[:] = vhz
            txxb_ref[:] = txxb_n
            tzzb_ref[:] = tzzb_n
            txzb_ref[:] = txzb_n
        return 0

    jax.lax.fori_loop(0, seg, body, 0)


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "seg", "dt",
                                   "interpret"))
def elastic_grad_stream_segments(lam_t, mu_t, b0_t, b1_t, damp_t, d0_t,
                                 d1_t, mu01_t, d01_t, hist, res_rows, dt,
                                 *, nt, nx, nz, space_order, spacing, z0,
                                 seg, interpret=False):
    """Batched adjoint sweep over the streamed elastic history. Returns
    the five transposed gradient images (glam, gmu_node, gmu01, gb0,
    gb1), each (B, nz, nx); the caller applies avg_to_T / chain rule /
    pad-fold on the XLA side."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    dtype = np.float32
    w_p, off_p, w_m, off_m = staggered_weights(space_order)
    wp = tuple(float(v) for v in np.asarray(w_p, dtype))
    wm = tuple(float(v) for v in np.asarray(w_m, dtype))
    ihx = float(dtype(1.0 / spacing[0]))
    ihz = float(dtype(1.0 / spacing[1]))
    s = float(dtype(dt))
    nsteps = nt - 1
    nseg = -(-nsteps // seg)
    B = hist.shape[0]

    kern = partial(_elastic_grad_stream_kernel, seg=seg, nsteps=nsteps,
                   nx=nx, nz=nz, wp=wp,
                   op=tuple(int(o) for o in off_p), wm=wm,
                   om=tuple(int(o) for o in off_m), ihx=ihx, ihz=ihz,
                   s=s, z0=z0)
    grad_spec = pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9 + [
            pl.BlockSpec((None, None, seg, 4, nz, nx),
                         lambda b, j: (b, nseg - 1 - j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, seg, 2, nx),
                         lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(grad_spec,) * 5,
        out_shape=tuple(jax.ShapeDtypeStruct((B, nz, nx), jnp.float32)
                        for _ in range(5)),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32)] * 5,
        interpret=env_interpret(interpret),
    )(lam_t, mu_t, b0_t, b1_t, damp_t, d0_t, d1_t, mu01_t, d01_t, hist,
      res_rows)


def _stream_field_bytes(nx, nz, itemsize=4):
    """HBM/VMEM bytes of one transposed (nz, nx) field under TPU tile
    padding ((8, 128) for 4-byte, (16, 128) for 2-byte types)."""
    sub = 8 * 4 // itemsize
    return (-(-nz // sub) * sub) * (-(-nx // 128) * 128) * itemsize


def pick_elastic_stream_seg(nx, nz, hist_dtype="bfloat16"):
    """Segment length for the streamed elastic gradient kernels: the
    double-buffered (seg, 4, nz, nx) history blocks dominate VMEM
    against ~19 resident f32 fields (9 params + 5 carries + 5 grads in
    the reverse kernel). Returns None when even a 2-step segment cannot
    fit (callers fall back to the XLA saved route)."""
    f = _stream_field_bytes(nx, nz)
    fh = _stream_field_bytes(nx, nz, jnp.dtype(hist_dtype).itemsize)
    budget = 15 * 2 ** 20 - 19 * f
    seg = budget // (2 * 4 * fh)
    if seg < 2:
        return None
    return int(min(seg, 16))


def elastic_grad_stream_supported(model, src_idx, rec_idx, src_wav):
    """True when the streamed elastic gradient kernels apply: 2-D f32,
    one source point per shot with a shared wavelet, all receivers on
    at most two adjacent z-planes away from the z edge, and a segment
    that fits VMEM."""
    if model.dim != 2 or model.dtype != np.float32:
        return False
    s_idx = np.asarray(src_idx)
    if s_idx.ndim != 4 or s_idx.shape[1] != 1:  # (B, npts, corners, 2)
        return False
    if np.asarray(src_wav).shape[1] != 1:
        return False
    r_idx = np.asarray(rec_idx)
    zplanes = np.unique(r_idx[..., 1])
    if len(zplanes) > 2 or zplanes.max() - zplanes.min() > 1:
        return False
    z0 = int(zplanes.min())
    nz = model.padded_shape[1]
    if not (0 <= z0 and z0 + 2 <= nz):
        return False
    from .pallas_acoustic import stream_hist_dtype
    return pick_elastic_stream_seg(model.padded_shape[0], nz,
                                   stream_hist_dtype()) is not None


# ---------------------------------------------------------------------------
# streamed-history viscoacoustic sls/2 GRADIENT (round 5): the Pallas
# twin of ops/visco_grad.py. Forward keeps (p, p_prev, r) in VMEM and
# streams the (L, rn) history; the reverse kernel propagates the
# adjoint (lp, lpp, lr) recursion — lsa is exactly self-adjoint, so the
# transpose reuses it verbatim — accumulating the four coefficient-
# field gradients plus the source-scale vp^2 cotangent in revisited
# output blocks. The (vp, qp) chain rule stays on the XLA side (one
# pointwise vjp of the coefficient map).
# ---------------------------------------------------------------------------

def _visco_fwd_hist_kernel(wav_ref, damp_ref, b_ref, A_ref, B_ref, C_ref,
                           D_ref, inj_ref, hist_ref, rec_ref, illum_ref,
                           p_ref, pp_ref, r_ref, *, seg, nsteps, nx, nz,
                           wp, op, wm, om, ihx, ihz, z0):
    """One (shot b, segment j) grid step of the history-streaming sls/2
    forward (same update association as `_visco_sls2_kernel`)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    base = j * seg
    damp = damp_ref[:]
    b = b_ref[:]
    A = A_ref[:]
    B = B_ref[:]
    C = C_ref[:]
    D = D_ref[:]
    inj = inj_ref[:]
    sd = _make_sd(nx, nz)

    def lsa(p):
        gx = sd(p, wp, op, 0, ihx)
        out = sd(b * gx, wm, om, 0, ihx)
        gz = sd(p, wp, op, 1, ihz)
        return out + sd(b * gz, wm, om, 1, ihz)

    @pl.when(j == 0)
    def _():
        for ref in (p_ref, pp_ref, r_ref, illum_ref):
            ref[:] = jnp.zeros((nz, nx), jnp.float32)

    def body(i, _):
        p = p_ref[:]
        pp = pp_ref[:]
        r = r_ref[:]
        rec_ref[i] = p[z0:z0 + 2, :]
        L = lsa(p)
        rn = damp * (r + A * L - B * r)
        pn = damp * (2.0 * p - damp * pp + C * L - D * rn)
        pn = pn + wav_ref[base + i] * inj
        hd = hist_ref.dtype
        hist_ref[i, 0] = L.astype(hd)
        hist_ref[i, 1] = rn.astype(hd)

        @pl.when(base + i < nsteps)
        def _():
            illum_ref[:] = illum_ref[:] + pn * pn

        p_ref[:] = pn
        pp_ref[:] = p
        r_ref[:] = rn
        return 0

    jax.lax.fori_loop(0, seg, body, 0)


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "seg", "dt",
                                   "hist_dtype", "interpret"))
def visco_fwd_hist_segments(damp_t, b_t, A_t, B_t, C_t, D_t, inj_t,
                            wav_pad, dt, *, nt, nx, nz, space_order,
                            spacing, z0, seg, hist_dtype="bfloat16",
                            interpret=False):
    """Batched history-streaming sls/2 forward. inj_t is the (B, nz,
    nx) dense source pattern (src_w * s^2 * vp^2 at the corners).
    Returns (rec_rows (B, nseg, seg, 2, nx), hist (B, nseg, seg, 2, nz,
    nx), illum (B, nz, nx))."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    dtype = np.float32
    w_p, off_p, w_m, off_m = staggered_weights(space_order)
    wp = tuple(float(v) for v in np.asarray(w_p, dtype))
    wm = tuple(float(v) for v in np.asarray(w_m, dtype))
    ihx = float(dtype(1.0 / spacing[0]))
    ihz = float(dtype(1.0 / spacing[1]))
    nsteps = nt - 2
    nseg = -(-nsteps // seg)
    B = inj_t.shape[0]

    kern = partial(_visco_fwd_hist_kernel, seg=seg, nsteps=nsteps, nx=nx,
                   nz=nz, wp=wp, op=tuple(int(o) for o in off_p), wm=wm,
                   om=tuple(int(o) for o in off_m), ihx=ihx, ihz=ihz,
                   z0=z0)
    hist, rec_rows, illum = pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 +
                 [pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((None, None, seg, 2, nz, nx),
                         lambda b, j: (b, j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, seg, 2, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nseg, seg, 2, nz, nx),
                                 jnp.dtype(hist_dtype)),
            jax.ShapeDtypeStruct((B, nseg, seg, 2, nx), jnp.float32),
            jax.ShapeDtypeStruct((B, nz, nx), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32)] * 3,
        interpret=env_interpret(interpret),
    )(wav_pad, damp_t, b_t, A_t, B_t, C_t, D_t, inj_t)
    return rec_rows, hist, illum


def _visco_grad_stream_kernel(wavs2_ref, damp_ref, b_ref, A_ref, B_ref,
                              C_ref, D_ref, injw_ref, hist_ref, res_ref,
                              ga1_ref, ga2_ref, ga3_ref, ga4_ref,
                              gsrc_ref, lp_ref, lpp_ref, lr_ref,
                              pendR_ref, *, seg, nsteps, nx, nz, wp, op,
                              wm, om, ihx, ihz, z0):
    """One (shot b, reversed-segment j) grid step of the sls/2 adjoint
    sweep — accumulation order matching ops/visco_grad.py's rev body."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    nseg = pl.num_programs(1)
    k = nseg - 1 - j
    base = k * seg
    damp = damp_ref[:]
    b = b_ref[:]
    A = A_ref[:]
    B = B_ref[:]
    C = C_ref[:]
    D = D_ref[:]
    injw = injw_ref[:]
    sd = _make_sd(nx, nz)

    def lsa(p):
        gx = sd(p, wp, op, 0, ihx)
        out = sd(b * gx, wm, om, 0, ihx)
        gz = sd(p, wp, op, 1, ihz)
        return out + sd(b * gz, wm, om, 1, ihz)

    @pl.when(j == 0)
    def _():
        for ref in (lp_ref, lpp_ref, lr_ref, pendR_ref, ga1_ref,
                    ga2_ref, ga3_ref, ga4_ref, gsrc_ref):
            ref[:] = jnp.zeros((nz, nx), jnp.float32)

    def body(i, _):
        jj = seg - 1 - i

        @pl.when(base + jj < nsteps)
        def _():
            L = hist_ref[jj, 0].astype(jnp.float32)
            rn = hist_ref[jj, 1].astype(jnp.float32)
            lp = lp_ref[:]
            P = damp * lp
            R = damp * (lr_ref[:] - D * P)
            ga3_ref[:] = ga3_ref[:] + L * P
            ga4_ref[:] = ga4_ref[:] - rn * P
            ga1_ref[:] = ga1_ref[:] + L * R
            ga2_ref[:] = ga2_ref[:] - rn * pendR_ref[:]
            gsrc_ref[:] = gsrc_ref[:] + wavs2_ref[base + jj] * injw * lp
            lp_new = 2.0 * P + lsa(C * P) + lsa(A * R) + lpp_ref[:]
            pieces = []
            if z0 > 0:
                pieces.append(jnp.zeros((z0, nx), jnp.float32))
            pieces.append(res_ref[jj])
            if nz - z0 - 2 > 0:
                pieces.append(jnp.zeros((nz - z0 - 2, nx), jnp.float32))
            lp_new = lp_new + jnp.concatenate(pieces, axis=0)
            lpp_ref[:] = -damp * P
            lr_ref[:] = R - B * R
            lp_ref[:] = lp_new
            pendR_ref[:] = R
        return 0

    jax.lax.fori_loop(0, seg, body, 0)


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "seg", "dt",
                                   "interpret"))
def visco_grad_stream_segments(damp_t, b_t, A_t, B_t, C_t, D_t, injw_t,
                               hist, res_rows, wavs2, dt, *, nt, nx, nz,
                               space_order, spacing, z0, seg,
                               interpret=False):
    """Batched sls/2 adjoint sweep over the streamed (L, rn) history.
    Returns (ga1, ga2, ga3, ga4, gsrc), each (B, nz, nx) — the caller
    chain-rules to (vp, qp) on the XLA side. ``injw_t`` is the dense
    src_w pattern (weights only, no vp^2/s^2); ``wavs2`` is
    wav_pad * dt^2."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    dtype = np.float32
    w_p, off_p, w_m, off_m = staggered_weights(space_order)
    wp = tuple(float(v) for v in np.asarray(w_p, dtype))
    wm = tuple(float(v) for v in np.asarray(w_m, dtype))
    ihx = float(dtype(1.0 / spacing[0]))
    ihz = float(dtype(1.0 / spacing[1]))
    nsteps = nt - 2
    nseg = -(-nsteps // seg)
    B = hist.shape[0]

    kern = partial(_visco_grad_stream_kernel, seg=seg, nsteps=nsteps,
                   nx=nx, nz=nz, wp=wp,
                   op=tuple(int(o) for o in off_p), wm=wm,
                   om=tuple(int(o) for o in off_m), ihx=ihx, ihz=ihz,
                   z0=z0)
    out_spec = pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] +
                 [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6 +
                 [pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, None, seg, 2, nz, nx),
                               lambda b, j: (b, nseg - 1 - j, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((None, None, seg, 2, nx),
                               lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(out_spec,) * 5,
        out_shape=tuple(jax.ShapeDtypeStruct((B, nz, nx), jnp.float32)
                        for _ in range(5)),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32)] * 4,
        interpret=env_interpret(interpret),
    )(wavs2, damp_t, b_t, A_t, B_t, C_t, D_t, injw_t, hist, res_rows)


def pick_visco_stream_seg(nx, nz, hist_dtype="bfloat16"):
    """Segment length for the streamed visco gradient kernels (~16
    resident f32 fields vs double-buffered 2-field history blocks; a
    13 MB budget and seg cap 12 leave headroom for the lsa temporaries
    on the scoped-vmem stack — seg=16 overflowed the 16 MB limit by
    160 KB at Marmousi scale)."""
    f = _stream_field_bytes(nx, nz)
    fh = _stream_field_bytes(nx, nz, jnp.dtype(hist_dtype).itemsize)
    budget = 13 * 2 ** 20 - 16 * f
    seg = budget // (2 * 2 * fh)
    if seg < 2:
        return None
    return int(min(seg, 12))


def visco_grad_stream_supported(model, src_idx, rec_idx, src_wav):
    """Gate for the streamed sls/2 gradient kernels (same geometry
    rules as the elastic pair)."""
    if not elastic_grad_stream_supported(model, src_idx, rec_idx,
                                         src_wav):
        return False
    from .pallas_acoustic import stream_hist_dtype
    return pick_visco_stream_seg(model.padded_shape[0],
                                 model.padded_shape[1],
                                 stream_hist_dtype()) is not None
