"""Legacy whole-nt Pallas acoustic kernels (bench artifacts only).

``forward_rows``/``forward_traces`` run the entire time loop inside one
Mosaic program with VMEM-resident carries. They were the first measured
proof that a VMEM-resident loop beats the XLA scan (21.5 vs 17.9
Gcell-steps/s on the Marmousi forward), but the whole-nt loop costs a
~7 minute Mosaic compile and has no free-surface support, so every
production path uses the segment-grid kernels in ``pallas_acoustic``
instead. Kept for benchmark provenance; not exported by the package.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.fd import second_derivative_weights
from .pallas_acoustic import env_interpret

__all__ = ["forward_rows", "forward_traces"]


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
    compile for the whole-nt loop, so production paths use the segment
    kernels in ``pallas_acoustic``; this variant is kept as the
    measured-baseline artifact.

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
    # (legacy kernel: keeps the folded dt^2 constants; the production
    # segment kernels use _stencil_constants for XLA-aligned rounding)
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
        interpret=env_interpret(interpret),
    )(wav, m, hd, inj)
    return out


def forward_traces(geometry, vp=None):
    """All-shot forward modeling through the legacy whole-nt Pallas kernel
    (``forward_rows`` — no free-surface support); returns (nsrc, nt, nrec)
    traces (numpy). Requires ``pallas_acoustic.geometry_supported`` and
    ``not model.fs``. Production paths use the segment kernels instead
    (``forward_ckpt_segments`` via ``fwi.fm_multi``)."""
    if geometry.model.fs:
        raise ValueError("forward_traces (forward_rows kernel) has no "
                         "free-surface support; use fwi.fm_multi")
    from ..fwi import _batched_tables, _solver_dt
    import sys
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
    # resolve through the module object so tests can monkeypatch
    # forward_rows into interpreter mode
    mod = sys.modules[__name__]
    rows = mod.forward_rows(jnp.asarray(m_pad), jnp.asarray(hd),
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
