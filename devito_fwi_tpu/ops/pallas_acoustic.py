"""Pallas TPU kernel for the acoustic OT2 forward time loop.

The whole nt-step leapfrog runs INSIDE one ``pallas_call``: the wavefield
carries (u, u_prev) live in VMEM scratch for the entire propagation, so
the HBM traffic of the XLA-scan path (~6 field sweeps per step) drops to
just the per-step receiver-row writes. Grid = one program per shot.

Scope (bench/fast-path kernel; the XLA scan in ``ops.acoustic`` is the
general path):

* OT2 kernel, no free surface;
* one source per shot, injected at its 2x2 corner block;
* receivers read back as two full grid rows at the receiver z-planes
  (every standard geometry in the reference places all receivers between
  two z-planes); the host contracts rows x bilinear weights to traces.

Numerics are identical to ``ops.acoustic.forward`` (same weights, same
t = 1..nt-2 bounds) — verified by tests/test_pallas.py on the
interpreter; measured on TPU v5e by bench comparison in the docstring of
``forward_rows``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.fd import second_derivative_weights

__all__ = ["forward_rows", "forward_traces", "geometry_supported", "available"]


def available():
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        return True
    except Exception:
        return False


def _kernel(wav_ref, m_ref, hd_ref, inj_ref, rec_ref,
            u_ref, up_ref, *, nt, nx, nz, w, inv_h2x, inv_h2z, z0):
    import jax.experimental.pallas as pl  # noqa: F401

    r = len(w) - 1
    m = m_ref[:]
    hd = hd_ref[:]
    denom = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd
    inj = inj_ref[0]

    u_ref[:] = jnp.zeros((nx, nz), jnp.float32)
    up_ref[:] = jnp.zeros((nx, nz), jnp.float32)

    def lap(u):
        acc = (w[0] * (inv_h2x + inv_h2z)) * u
        for k in range(1, r + 1):
            zx = jnp.zeros((k, nz), jnp.float32)
            acc += (w[k] * inv_h2x) * jnp.concatenate(
                [u[k:, :], zx], axis=0)
            acc += (w[k] * inv_h2x) * jnp.concatenate(
                [zx, u[:-k, :]], axis=0)
            zz = jnp.zeros((nx, k), jnp.float32)
            acc += (w[k] * inv_h2z) * jnp.concatenate(
                [u[:, k:], zz], axis=1)
            acc += (w[k] * inv_h2z) * jnp.concatenate(
                [zz, u[:, :-k]], axis=1)
        return acc

    def body(t, _):
        u = u_ref[:]
        up = up_ref[:]
        # record the two receiver rows of u at this step (host maps row
        # j to time index j+1, matching the scan's rec[1:nt-1] filling)
        rec_ref[t, 0, :] = u[:, z0]
        rec_ref[t, 1, :] = u[:, z0 + 1]
        un = (lap(u) + two_m_hd * u - m * up) * denom
        # source injection as a dense masked FMA: Mosaic cannot address an
        # unaligned dynamic 2x2 sub-block, and one extra fused field op per
        # step is ~10% of the stencil cost
        wav_t = wav_ref[t]
        u_ref[:] = un + wav_t * inj
        up_ref[:] = u
        return 0

    jax.lax.fori_loop(0, nt - 2, body, 0)


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "interpret", "dt"))
def forward_rows(m, hd, wav, inj, dt, *, nt, nx, nz,
                 space_order, spacing, z0, interpret=False):
    """Run the VMEM-resident forward loop for a batch of shots.

    Measured (TPU v5e, Marmousi 380x186, nt=1357, 29 shots): 129 ms =
    21.5 Gcell-steps/s vs 155 ms (17.9) for the XLA-scan batch — the
    VMEM-resident carries eliminate the scan's HBM round trips and the
    kernel runs at the VPU compute roofline. Trade-off: ~7 min Mosaic
    compile for the nt-step loop (XLA scan: ~30 s), so this path is
    opt-in (env DEVITO_FWI_TPU_PALLAS=1 for fm_multi, or call directly).

    Parameters: m, hd (padded grid, f32); wav (nt-2,); inj (B, nx, nz)
    per-shot dense injection pattern (w * dt^2 / m at the source corners,
    zero elsewhere). Returns rec_rows (B, nt, 2, nx): the two z-plane rows
    per time step.
    """
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    w = tuple(float(v) for v in
              np.asarray(second_derivative_weights(space_order)
                         [space_order // 2:]))
    inv_h2x = float(1.0 / spacing[0] ** 2) * float(dt) ** 2
    inv_h2z = float(1.0 / spacing[1] ** 2) * float(dt) ** 2
    # fold dt^2 into the laplacian scale: update uses s2*lap + ...
    B = inj.shape[0]

    kern = partial(_kernel, nt=nt, nx=nx, nz=nz, w=w,
                   inv_h2x=inv_h2x, inv_h2z=inv_h2z, z0=z0)

    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),      # wav (scalar reads)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # m
            pl.BlockSpec(memory_space=pltpu.VMEM),      # hd
            pl.BlockSpec((1, nx, nz), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),      # inj (per shot)
        ],
        out_specs=pl.BlockSpec((None, nt, 2, nx), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nt, 2, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nx, nz), jnp.float32),
                        pltpu.VMEM((nx, nz), jnp.float32)],
        interpret=interpret,
    )(wav, m, hd, inj)
    return out


def geometry_supported(geometry):
    """True when the fast path applies: 2-D grid, one source per shot,
    all receivers between the same two z-planes, OT2, no free surface."""
    model = geometry.model
    if model.dim != 2 or model.fs:
        return False
    from .interp import interp_table
    r_idx, _ = interp_table(geometry.rec_positions, model.origin_pml,
                            model.spacing, dtype=model.dtype)
    zplanes = np.unique(np.asarray(r_idx)[..., 1])
    return len(zplanes) <= 2


def forward_traces(geometry, vp=None):
    """All-shot forward modeling through the Pallas VMEM-resident kernel;
    returns (nsrc, nt, nrec) traces (numpy). Requires
    ``geometry_supported(geometry)``."""
    from ..fwi import _batched_tables, _solver_dt
    model = geometry.model
    s_idx, s_w, r_idx, r_w, wav = _batched_tables(geometry)
    dt = float(_solver_dt(geometry))
    nt = geometry.nt
    nx, nz = model.padded_shape
    vp_arr = np.asarray(vp if vp is not None else model.vp,
                        dtype=np.float32)
    m_pad = 1.0 / (vp_arr * vp_arr)
    damp = model.damp if isinstance(model.damp, np.ndarray) \
        else np.zeros((nx, nz), np.float32)
    hd = (dt * damp).astype(np.float32)
    nsrc = geometry.nsrc
    inj = np.zeros((nsrc, nx, nz), np.float32)
    s_idx_n = np.asarray(s_idx)
    s_w_n = np.asarray(s_w)
    for b in range(nsrc):
        for c in range(s_idx_n.shape[2]):
            xi, zi = s_idx_n[b, 0, c]
            inj[b, xi, zi] += s_w_n[b, 0, c] * dt * dt / m_pad[xi, zi]
    r_idx_n = np.asarray(r_idx)
    z0 = int(r_idx_n[..., 1].min())
    rows = forward_rows(jnp.asarray(m_pad), jnp.asarray(hd),
                        jnp.asarray(wav[1:nt - 1, 0]), jnp.asarray(inj),
                        dt, nt=nt, nx=nx, nz=nz,
                        space_order=model.space_order,
                        spacing=model.spacing, z0=z0)
    rows = np.asarray(rows)
    r_w_n = np.asarray(r_w)
    nrec = r_idx_n.shape[0]
    trace = np.zeros((nsrc, nt, nrec), np.float32)
    for c in range(r_idx_n.shape[1]):
        xi = r_idx_n[:, c, 0]
        sel = (r_idx_n[:, c, 1] != z0).astype(np.int32)
        trace[:, 1:nt - 1, :] += r_w_n[None, None, :, c] * \
            rows[:, :nt - 2, :, :][np.arange(nsrc)[:, None, None],
                                   np.arange(nt - 2)[None, :, None],
                                   sel[None, None, :], xi[None, None, :]]
    return trace
