"""Pallas per-step stencil core for the 3-D acoustic leapfrog.

The 2-D production path runs whole TIME SEGMENTS per Pallas grid step
with the wavefield carries resident in VMEM — that design needs every
field in VMEM at once, which a 3-D volume breaks (the 64^3+nbl bench
volume is ~4.7 MB/field padded; u, up, v, vn, m, hd exceed the 16 MB
budget before any history buffer). The XLA 3-D scan path instead runs
at ~5.9 Gcs/s (bench config 5), far off the ~32 Gcs/s HBM-traffic bound
— fusion, not bandwidth, is the limit.

This module takes the middle road: ONE leapfrog time step as a Pallas
kernel, x-blocked, with thin r-row halo blocks read through extra views
of ``u`` (Pallas block index maps cannot express overlapping windows,
but a second BlockSpec with block height r can address the halo rows
exactly when XB % r == 0). The time loop, source/receiver scatter,
checkpointing and adjoint structure all stay in the verified XLA
machinery (``ops.acoustic``): the kernel replaces only
``_update(u, up, lap_fn(u), 0, ...)`` — and mirrors its association
EXACTLY (same ``_axis_d2`` pairwise adds, per-axis scale-accumulate
order, reciprocal-then-multiply), so the hook is numerically invisible.

Gated OFF by default (``DEVITO_FWI_TPU_PALLAS3=1`` opts in) until the
on-chip A/B lands: the TPU tunnel was down when this was written;
interpret-mode parity is pinned by tests/test_pallas3.py.

Scope: 3-D, OT2, fs=False, f32, nx divisible by a valid block height
(``pick_xb``); everything else stays on the XLA path.
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["enabled", "pick_xb", "step3"]


def enabled():
    if os.environ.get("DEVITO_FWI_TPU_PALLAS3", "0") != "1":
        return False
    if os.environ.get("DEVITO_FWI_TPU_PALLAS_INTERPRET", "0") == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _env_interpret():
    return os.environ.get("DEVITO_FWI_TPU_PALLAS_INTERPRET", "0") == "1"


def pick_xb(nx, r, target=16):
    """Largest block height <= ~2*target that divides nx and is a
    multiple of the stencil radius r (halo blocks must tile the x axis);
    None when nx admits no such blocking (caller falls back to XLA)."""
    best = None
    for xb in range(max(r, 4), min(nx, 2 * target) + 1):
        if nx % xb == 0 and xb % r == 0:
            if best is None or abs(xb - target) < abs(best - target):
                best = xb
    return best


def _step3_kernel(s2_ref, u_ref, hu_ref, hn_ref, up_ref, m_ref, damp_ref,
                  out_ref, *, w, inv_h2, XB, r, nx):
    """One x-block of one leapfrog step. ``hu``/``hn`` are the r-row
    halo views below/above the block (masked to the zero-Dirichlet
    boundary at the domain edges); x rows >= nx (block padding) are
    zeroed so they never contaminate the halo reads of later steps."""
    import jax.experimental.pallas as pl

    j = pl.program_id(0)
    J = pl.num_programs(0)
    s2 = s2_ref[0, 0]
    ub = u_ref[:]
    ny, nz = ub.shape[1], ub.shape[2]
    zero_h = jnp.zeros((r, ny, nz), ub.dtype)
    hu = jnp.where(j > 0, hu_ref[:], zero_h)
    hn = jnp.where(j < J - 1, hn_ref[:], zero_h)
    ext = jnp.concatenate([hu, ub, hn], axis=0)      # (XB + 2r, ny, nz)

    # x: slices of the halo-extended block (axis 0); y/z: zero-fill
    # concats. Association mirrors ops.acoustic._axis_d2 /
    # laplacian_parts exactly: w[0]*u first, (plus + minus) summed
    # before the weight multiply, per-axis d2 completed then
    # scale-accumulated in axis order.
    accx = w[0] * ub
    for k in range(1, r + 1):
        accx = accx + w[k] * (ext[r + k:r + k + XB]
                              + ext[r - k:r - k + XB])
    accy = w[0] * ub
    for k in range(1, r + 1):
        zy = jnp.zeros((XB, k, nz), ub.dtype)
        sp = jnp.concatenate([ub[:, k:, :], zy], axis=1)
        sm = jnp.concatenate([zy, ub[:, :-k, :]], axis=1)
        accy = accy + w[k] * (sp + sm)
    accz = w[0] * ub
    for k in range(1, r + 1):
        zz = jnp.zeros((XB, ny, k), ub.dtype)
        sp = jnp.concatenate([ub[:, :, k:], zz], axis=2)
        sm = jnp.concatenate([zz, ub[:, :, :-k]], axis=2)
        accz = accz + w[k] * (sp + sm)
    lap = accx * inv_h2[0]
    lap = lap + accy * inv_h2[1]
    lap = lap + accz * inv_h2[2]

    m = m_ref[:]
    hd = damp_ref[:]
    inv_mhd = 1.0 / (m + hd)
    un = (s2 * lap + (2.0 * m + hd) * ub - m * up_ref[:]) * inv_mhd
    row = j * XB + jax.lax.broadcasted_iota(jnp.int32, (XB, 1, 1), 0)
    out_ref[:] = jnp.where(row < nx, un, 0.0)


@partial(jax.jit, static_argnames=("w", "inv_h2", "XB", "interpret"))
def step3(u, up, m, hd, s2, *, w, inv_h2, XB, interpret=False):
    """One leapfrog update ``un = (s2 lap(u) + (2m+hd)u - m up)/(m+hd)``
    on a 3-D (nx, ny, nz) grid (zero-Dirichlet), x-blocked. ``s2`` is a
    traced scalar (dt^2); ``w``/``inv_h2`` static tuples."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    nx, ny, nz = u.shape
    r = len(w) - 1
    assert XB % r == 0 and nx % XB == 0, (nx, XB, r)
    J = nx // XB
    kr = XB // r
    s2a = jnp.full((1, 1), s2, u.dtype)

    center = pl.BlockSpec((XB, ny, nz), lambda j: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    halo_up = pl.BlockSpec(
        (r, ny, nz), lambda j: (jnp.maximum(j * kr - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    halo_dn = pl.BlockSpec(
        (r, ny, nz),
        lambda j: (jnp.minimum((j + 1) * kr, nx // r - 1), 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_step3_kernel, w=w, inv_h2=inv_h2, XB=XB, r=r, nx=nx),
        grid=(J,),
        in_specs=(pl.BlockSpec(memory_space=pltpu.SMEM), center, halo_up,
                  halo_dn, center, center, center),
        out_shape=jax.ShapeDtypeStruct((nx, ny, nz), u.dtype),
        out_specs=center,
        interpret=interpret or _env_interpret(),
    )(s2a, u, u, u, up, m, hd)
