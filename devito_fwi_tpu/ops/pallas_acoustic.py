"""Pallas TPU kernels for the acoustic OT2 time loops.

Production kernels (the default TPU path for supported geometries — see
``fwi._pallas_z0``): ``forward_ckpt_segments`` and ``gradient_segments``,
a grid over (shot, time-segment) where the wavefield carries live in VMEM
scratch across the sequential segment steps, so the HBM traffic of the
XLA-scan path (~6 field sweeps per step) collapses to the per-segment
checkpoint/receiver-row blocks. The reverse sweep keeps each segment's
recomputed d2u/dt2 history entirely in VMEM. The segment grid keeps the
Mosaic program small (~15 s compile vs ~7 min for a whole-nt loop).

Scope of the fast path:

* OT2 kernel, 2-D, float32, with or without the free surface;
* one source per shot, injected as a dense per-shot pattern;
* receivers between two z-planes (every reference geometry is), read
  back as two grid rows per step and contracted with bilinear weights.

The legacy whole-nt variants (``forward_rows``/``forward_traces``, no fs
support, ~7 min compile) live in ``pallas_legacy`` as bench artifacts.

Numerics are identical to ``ops.acoustic`` (same weights, same
t = 1..nt-2 bounds, same checkpoint layout) — pinned by
tests/test_pallas.py in interpreter mode and by on-chip parity drives.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.fd import second_derivative_weights

__all__ = ["geometry_supported", "available", "gradient_segments",
           "gradient_from_ckpt_pallas", "forward_dt2_segments",
           "gradient_stream_segments", "pick_stream_checkpoints",
           "stream_max_shots", "stream_hist_dtype"]


def available():
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        return True
    except Exception:
        return False


def env_interpret(interpret=False):
    """Resolve the effective interpret flag: explicit True wins; else
    DEVITO_FWI_TPU_PALLAS_INTERPRET=1 turns every kernel into interpreter
    mode (read at trace time — set it before the first call). This lets
    the gated production paths (fused/host/sharded objectives) run on the
    virtual CPU mesh for multi-device validation."""
    return bool(interpret) or \
        os.environ.get("DEVITO_FWI_TPU_PALLAS_INTERPRET", "0") == "1"


def _stencil_constants(space_order, spacing, dt, w_override=None):
    """(w, inv_h2x, inv_h2z, s2) for the segment kernels, dt^2 folded
    into the per-axis 1/h^2 scales (see ``_make_lap_t``)."""
    w_full = second_derivative_weights(space_order) if w_override is None \
        else np.asarray(w_override)
    w = tuple(float(v) for v in np.asarray(w_full)[len(w_full) // 2:])
    s2 = float(dt) ** 2
    inv_h2x = float(1.0 / spacing[0] ** 2) * s2
    inv_h2z = float(1.0 / spacing[1] ** 2) * s2
    return w, inv_h2x, inv_h2z, s2

# ---------------------------------------------------------------------------
# forward sweep with segment checkpoints (Pallas twin of
# ops.acoustic.forward_ckpt, transposed (nz, nx) layout)
# ---------------------------------------------------------------------------

def _make_lap_t(w, inv_h2x, inv_h2z, nx, nz, fs):
    """Laplacian on the transposed (nz, nx) layout: axis 0 = z (sublanes),
    axis 1 = x (lanes), zero-Dirichlet shifts via zero-fill concatenates.

    The association mirrors ``ops.acoustic._axis_d2``/``laplacian_parts``
    EXACTLY — w rounded to f32, (shift+ + shift-) summed before the
    weight multiply, per-axis accumulation, x-axis term scaled and added
    first, the free-surface fix replacing rows 0..r of the unscaled
    z-derivative with the mirrored stencil in the XLA path's term order.
    Folding dt^2/h^2 into single per-tap constants was measured to be a
    COHERENT rounding bias vs the XLA path (constants differ by ~1 ulp
    with the same sign every step): in a thin-sponge reverberant box it
    amplified to 3.4e-3 trace error over ~170 steps where the XLA f32
    path stays 4e-6 from the f64 truth. Shared association keeps the two
    paths' rounding aligned up to compiler FMA contraction."""
    r = len(w) - 1

    def lap(u):
        accx = w[0] * u
        for kk in range(1, r + 1):
            zx = jnp.zeros((nz, kk), jnp.float32)
            sp = jnp.concatenate([u[:, kk:], zx], 1)
            sm = jnp.concatenate([zx, u[:, :-kk]], 1)
            accx = accx + w[kk] * (sp + sm)
        accz = w[0] * u
        for kk in range(1, r + 1):
            zz = jnp.zeros((kk, nx), jnp.float32)
            sp = jnp.concatenate([u[kk:, :], zz], 0)
            sm = jnp.concatenate([zz, u[:-kk, :]], 0)
            accz = accz + w[kk] * (sp + sm)
        if fs:
            # rows 0..r: XLA _fs_fix_last_axis term order — plain +k
            # term, then the odd mirror (zero at z = 0), per k
            rows = []
            for z in range(r + 1):
                acc = w[0] * u[z:z + 1, :]
                for k in range(1, r + 1):
                    acc = acc + w[k] * u[z + k:z + k + 1, :]
                    i = z - k
                    if i > 0:
                        acc = acc + w[k] * u[i:i + 1, :]
                    elif i < 0:
                        acc = acc - w[k] * u[-i:-i + 1, :]
                rows.append(acc)
            accz = jnp.concatenate(rows + [accz[r + 1:]], 0)
        return accx * inv_h2x + accz * inv_h2z

    return lap


def source_pattern(s_idx, s_w, m, s2):
    """Dense per-shot source pattern (w * dt^2 / m at the bilinear
    corners), (B, nx, nz), traceable. One implementation shared by the
    fused objective, fm_multi and the standalone wrappers."""
    B = s_idx.shape[0]
    xi = s_idx[:, 0, :, 0]
    zi = s_idx[:, 0, :, 1]
    vals = s_w[:, 0, :] * s2 / m[xi, zi]
    return jnp.zeros((B,) + m.shape, vals.dtype).at[
        jnp.arange(B)[:, None], xi, zi].add(vals)


def pad_wavelet(src_wav, nt, total, dtype=jnp.float32):
    """src_wav[1:nt-1] zero-padded to the segment-layout length."""
    return jnp.zeros((total,), dtype).at[:nt - 2].set(src_wav[1:nt - 1, 0])


def residual_rows(res_stack, r_idx, r_w, m, s2, z0, nsteps, seg, nseg):
    """Fold the receiver interpolation weights and s^2/m into dense
    two-z-plane rows, (B, nseg, seg, 2, nx) — matching the transposed
    (nz, nx) field layout where the planes are two sublane rows.
    Traceable; `m` is the untransposed (nx, nz) squared slowness.

    Evaluated as one MXU matmul against a small scattered weight matrix
    (nrec, 2*nx) instead of a (B*total*nrec)-point scatter-add: the
    direct scatter runs at ~130M updates/s on TPU (~90 ms on the
    Marmousi bench — more than a whole wavefield sweep), the matmul at
    well under a millisecond."""
    B = res_stack.shape[0]
    nx = m.shape[0]
    nrec = res_stack.shape[2]
    total = nseg * seg
    xi = r_idx[:, :, 0]
    zi = r_idx[:, :, 1]
    plane = (zi != z0).astype(jnp.int32)
    # drop OOB corners like the XLA scatter's mode='drop' does: an x
    # corner at nx would otherwise alias plane 1, x 0 through the
    # plane*nx fold (interp.py contract: device code drops OOB corners)
    valid = (xi >= 0) & (xi < nx) & ((zi == z0) | (zi == z0 + 1))
    xi = jnp.clip(xi, 0, nx - 1)
    scale = jnp.where(valid, r_w * s2 / m[xi, jnp.clip(zi, 0,
                                                       m.shape[1] - 1)],
                      0.0).astype(jnp.float32)
    # V[r, p*nx + x] = sum over this receiver's corners with plane p, x
    V = jnp.zeros((nrec, 2 * nx), jnp.float32)
    V = V.at[jnp.arange(nrec)[:, None], plane * nx + xi].add(scale)
    res_pad = jnp.zeros((B, total, nrec), jnp.float32)
    res_pad = res_pad.at[:, :nsteps].set(
        res_stack[:, 1:nsteps + 1].astype(jnp.float32))
    rows = jnp.einsum("btr,rq->btq", res_pad, V,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    return rows.reshape(B, nseg, seg, 2, nx)


def _fwd_rec_kernel(wav_ref, m_ref, hd_ref, inj_ref, recout_ref,
                    u_ref, up_ref, *, seg, nx, nz, w, inv_h2x, inv_h2z,
                    z0, fs):
    """Forward-only variant of ``_fwd_ckpt_kernel``: records receiver
    rows but emits no checkpoints/illumination (pure modeling — Pallas
    outputs cannot be dead-code-eliminated, so the checkpointed kernel
    would pay GB-scale dead HBM writes here)."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    base = j * seg
    m = m_ref[:]
    hd = hd_ref[:]
    denom = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd
    inj = inj_ref[:]
    lap = _make_lap_t(w, inv_h2x, inv_h2z, nx, nz, fs)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros((nz, nx), jnp.float32)
        up_ref[:] = jnp.zeros((nz, nx), jnp.float32)

    def body(i, _):
        u = u_ref[:]
        up = up_ref[:]
        recout_ref[i] = u[z0:z0 + 2, :]
        un = (lap(u) + two_m_hd * u - m * up) * denom \
            + wav_ref[base + i] * inj
        u_ref[:] = un
        up_ref[:] = u
        return 0

    jax.lax.fori_loop(0, seg, body, 0)


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "n_checkpoints",
                                   "interpret", "dt", "fs"))
def forward_rec_segments(m, hd, wav_pad, inj, dt, *, nt, nx, nz,
                         space_order, spacing, z0, n_checkpoints,
                         fs=False, interpret=False):
    """Segment-grid Pallas forward, receiver rows only (transposed
    operands like ``forward_ckpt_segments``). Returns rec_rows
    (B, nseg, seg, 2, nx)."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from .acoustic import _ckpt_layout

    w, inv_h2x, inv_h2z, s2 = _stencil_constants(space_order, spacing, dt)
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    B = inj.shape[0]

    kern = partial(_fwd_rec_kernel, seg=seg, nx=nx, nz=nz, w=w,
                   inv_h2x=inv_h2x, inv_h2z=inv_h2z, z0=z0, fs=fs)
    return pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # wav_pad
            pl.BlockSpec(memory_space=pltpu.VMEM),            # m
            pl.BlockSpec(memory_space=pltpu.VMEM),            # hd
            pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),            # inj
        ],
        out_specs=pl.BlockSpec((None, None, seg, 2, nx),
                               lambda b, j: (b, j, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nseg, seg, 2, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32),
                        pltpu.VMEM((nz, nx), jnp.float32)],
        interpret=env_interpret(interpret),
    )(wav_pad, m, hd, inj)


def _fwd_ckpt_kernel(wav_ref, m_ref, hd_ref, inj_ref, segout_ref,
                     recout_ref, illum_ref, u_ref, up_ref, *, seg, nsteps,
                     nx, nz, w, inv_h2x, inv_h2z, z0, fs):
    """One (shot b, segment j) grid step of the checkpointed forward:
    leapfrog with VMEM-resident carries, recording the two receiver
    z-plane rows per step, the (u, u_prev) pair at each segment start,
    and the illumination sum. Matches ``ops.acoustic.forward_ckpt``."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    base = j * seg

    m = m_ref[:]
    hd = hd_ref[:]
    denom = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd
    inj = inj_ref[:]
    lap = _make_lap_t(w, inv_h2x, inv_h2z, nx, nz, fs)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros((nz, nx), jnp.float32)
        up_ref[:] = jnp.zeros((nz, nx), jnp.float32)
        illum_ref[:] = jnp.zeros((nz, nx), jnp.float32)

    segout_ref[0] = u_ref[:]      # u[base+1]
    segout_ref[1] = up_ref[:]     # u[base]

    def body(i, _):
        u = u_ref[:]
        up = up_ref[:]
        recout_ref[i] = u[z0:z0 + 2, :]
        un = (lap(u) + two_m_hd * u - m * up) * denom \
            + wav_ref[base + i] * inj

        @pl.when(base + i < nsteps)
        def _():
            illum_ref[:] = illum_ref[:] + un * un

        u_ref[:] = un
        up_ref[:] = u
        return 0

    jax.lax.fori_loop(0, seg, body, 0)


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "n_checkpoints",
                                   "interpret", "dt", "fs"))
def forward_ckpt_segments(m, hd, wav_pad, inj, dt, *, nt, nx, nz,
                          space_order, spacing, z0, n_checkpoints,
                          fs=False, interpret=False):
    """Segment-grid Pallas forward with checkpoints. Transposed operands
    like ``gradient_segments``: m, hd, inj are (.., nz, nx). Returns
    (rec_rows (B, nseg, seg, 2, nx), seg_starts (B, nseg, 2, nz, nx),
    illum (B, nz, nx)). Compiles in seconds (the segment grid keeps the
    Mosaic program small, unlike the whole-nt ``forward_rows`` loop)."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from .acoustic import _ckpt_layout

    w, inv_h2x, inv_h2z, s2 = _stencil_constants(space_order, spacing, dt)
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    B = inj.shape[0]

    kern = partial(_fwd_ckpt_kernel, seg=seg, nsteps=nsteps, nx=nx, nz=nz,
                   w=w, inv_h2x=inv_h2x, inv_h2z=inv_h2z, z0=z0, fs=fs)

    seg_starts, rec_rows, illum = pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # wav_pad
            pl.BlockSpec(memory_space=pltpu.VMEM),            # m
            pl.BlockSpec(memory_space=pltpu.VMEM),            # hd
            pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),            # inj
        ],
        out_specs=(
            pl.BlockSpec((None, None, 2, nz, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # seg_starts
            pl.BlockSpec((None, None, seg, 2, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # rec rows
            pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),            # illum
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nseg, 2, nz, nx), jnp.float32),
            jax.ShapeDtypeStruct((B, nseg, seg, 2, nx), jnp.float32),
            jax.ShapeDtypeStruct((B, nz, nx), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32),    # u
                        pltpu.VMEM((nz, nx), jnp.float32)],   # up
        interpret=env_interpret(interpret),
    )(wav_pad, m, hd, inj)
    return rec_rows, seg_starts, illum


# ---------------------------------------------------------------------------
# reverse sweep: segment-recompute gradient
# ---------------------------------------------------------------------------

def _grad_kernel(wav_ref, m_ref, hd_ref, inj_ref, seg_ref, res_ref,
                 grad_ref, dt2_ref, v_ref, vn_ref, u_ref, up_ref, *,
                 seg, nsteps, nx, nz, w, inv_h2x, inv_h2z, z0,
                 neg_inv_s2, fs):
    """One (shot b, reversed-segment j) grid step of the checkpointed
    gradient: recompute the forward segment from its stored start pair
    while writing the second time derivative history into VMEM, then run
    the adjoint field backward through the segment accumulating
    ``(u.dt2-unscaled) * v`` into the revisited per-shot output block.
    The adjoint carries (v, vn) persist in scratch across the sequential
    segment grid steps; the final grid step applies the ``-1/s^2`` scale.

    Fields are laid out TRANSPOSED, (nz, nx): the receiver z-planes then
    live on two adjacent sublane rows, so residual injection is a plain
    (2, nx) row-slice add (Mosaic has no scatter-add), and the per-plane
    padding of the VMEM history buffer stays small.

    Matches ``ops.acoustic.gradient_from_ckpt`` numerics exactly
    (same update formula, same t = 1..nt-2 bounds, same injection
    ordering; the only re-association is deferring the -1/s^2 factor to
    one final scale). Reference semantics:
    ``seismic/acoustic/operators.py:183-225``."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    nseg = pl.num_programs(1)
    k = nseg - 1 - j          # actual segment (reverse order)
    base = k * seg

    m = m_ref[:]
    hd = hd_ref[:]
    denom = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd
    inj = inj_ref[:]
    # transposed layout; zero-fill concatenate shifts (a z-halo-buffer
    # variant with sublane slice reads crashes the Mosaic remote compiler
    # on unaligned sublane offsets)
    lap = _make_lap_t(w, inv_h2x, inv_h2z, nx, nz, fs)

    @pl.when(j == 0)
    def _():
        v_ref[:] = jnp.zeros((nz, nx), jnp.float32)
        vn_ref[:] = jnp.zeros((nz, nx), jnp.float32)
        grad_ref[:] = jnp.zeros((nz, nx), jnp.float32)

    # ---- forward recompute through segment k, storing u.dt2 * s^2
    u_ref[:] = seg_ref[0]      # u[base+1]
    up_ref[:] = seg_ref[1]     # u[base]

    def fwd_body(i, _):
        u = u_ref[:]
        up = up_ref[:]
        un = (lap(u) + two_m_hd * u - m * up) * denom \
            + wav_ref[base + i] * inj
        dt2_ref[i] = un - 2.0 * u + up
        u_ref[:] = un
        up_ref[:] = u
        return 0

    jax.lax.fori_loop(0, seg, fwd_body, 0)

    # ---- adjoint sweep: local steps jj = seg-1 .. 0 (t = base+jj+1).
    # (A 2-step-unrolled variant with value-chained carries showed no win
    # within the chip's ~20% run-to-run noise — Mosaic already renames
    # the carry shuffle, so the extra body size buys nothing.)
    def rev_body(i, _):
        jj = seg - 1 - i

        @pl.when(base + jj < nsteps)
        def _():
            v = v_ref[:]
            # astype is a no-op on the f32 recompute scratch; it upcasts
            # the bf16 streamed history before the accumulate
            grad_ref[:] = grad_ref[:] \
                + dt2_ref[jj].astype(jnp.float32) * v
            v_ref[:] = (lap(v) + two_m_hd * v - m * vn_ref[:]) * denom
            # residual injection on the two receiver z-plane rows
            # (weights, s^2/m folded in on the host side)
            v_ref[z0:z0 + 2, :] = v_ref[z0:z0 + 2, :] + res_ref[jj]
            vn_ref[:] = v
        return 0

    jax.lax.fori_loop(0, seg, rev_body, 0)

    @pl.when(j == nseg - 1)
    def _():
        grad_ref[:] = grad_ref[:] * neg_inv_s2


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "n_checkpoints",
                                   "interpret", "dt", "fs"))
def gradient_segments(m, hd, wav_pad, inj, seg_starts, res_rows, dt, *, nt,
                      nx, nz, space_order, spacing, z0, n_checkpoints,
                      fs=False, interpret=False):
    """VMEM-resident reverse-sweep gradient for a batch of shots.

    All field operands are TRANSPOSED, (nz, nx): m, hd (nz, nx); wav_pad
    (total,) source wavelet rows src_wav[1:nt-1] zero-padded to nseg*seg;
    inj (B, nz, nx) dense per-shot source pattern (w*dt^2/m); seg_starts
    (B, nseg, 2, nz, nx) from the forward sweep; res_rows
    (B, nseg, seg, 2, nx) receiver-residual rows with rec_w*s^2/m folded
    in. Returns grad (B, nz, nx) = sum_t -u.dt2[t]*v[t].
    """
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from .acoustic import _ckpt_layout

    w, inv_h2x, inv_h2z, s2 = _stencil_constants(space_order, spacing, dt)
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    B = inj.shape[0]

    kern = partial(_grad_kernel, seg=seg, nsteps=nsteps, nx=nx, nz=nz, w=w,
                   inv_h2x=inv_h2x, inv_h2z=inv_h2z, z0=z0,
                   neg_inv_s2=-1.0 / s2, fs=fs)

    out = pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # wav_pad
            pl.BlockSpec(memory_space=pltpu.VMEM),            # m
            pl.BlockSpec(memory_space=pltpu.VMEM),            # hd
            pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),            # inj
            pl.BlockSpec((None, None, 2, nz, nx),
                         lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # seg_starts
            pl.BlockSpec((None, None, seg, 2, nx),
                         lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # res_rows
        ],
        out_specs=pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nz, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((seg, nz, nx), jnp.float32),  # dt2
                        pltpu.VMEM((nz, nx), jnp.float32),       # v
                        pltpu.VMEM((nz, nx), jnp.float32),       # vn
                        pltpu.VMEM((nz, nx), jnp.float32),       # u
                        pltpu.VMEM((nz, nx), jnp.float32)],      # up
        interpret=env_interpret(interpret),
    )(wav_pad, m, hd, inj, seg_starts, res_rows)
    return out


# ---------------------------------------------------------------------------
# streamed-history gradient: the forward kernel writes the d2u/dt2 history
# to HBM as a pipelined output block per segment (the DMA overlaps the next
# segment's compute), and the reverse kernel consumes it in reverse segment
# order — eliminating the forward-recompute sweep entirely. Arithmetic
# matches forward_ckpt_segments + gradient_segments (the dt2
# values are produced by the exact same update formula, and the adjoint
# accumulation order is unchanged); the cost model changes from 3 stencil
# sweeps per step (fwd + recompute + adjoint) to 2 plus ~0.3 field-writes
# of hidden DMA. HBM capacity bounds the shot batch: ~nsteps x padded-field
# bytes per shot (~400 MB on the Marmousi bench), so callers chunk shots
# via ``stream_max_shots``.
# ---------------------------------------------------------------------------

def _fwd_dt2_kernel(wav_ref, m_ref, hd_ref, inj_ref, dt2out_ref, recout_ref,
                    illum_ref, u_ref, up_ref, *, seg, nsteps, nx, nz, w,
                    inv_h2x, inv_h2z, z0, fs):
    """One (shot b, segment j) grid step of the history-streaming forward:
    identical leapfrog to ``_fwd_ckpt_kernel``, but instead of segment-start
    checkpoints it emits the segment's d2u/dt2 history (un - 2u + up, the
    s^2-scaled second time derivative) as an output block."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    base = j * seg

    m = m_ref[:]
    hd = hd_ref[:]
    denom = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd
    inj = inj_ref[:]
    lap = _make_lap_t(w, inv_h2x, inv_h2z, nx, nz, fs)

    @pl.when(j == 0)
    def _():
        u_ref[:] = jnp.zeros((nz, nx), jnp.float32)
        up_ref[:] = jnp.zeros((nz, nx), jnp.float32)
        illum_ref[:] = jnp.zeros((nz, nx), jnp.float32)

    def body(i, _):
        u = u_ref[:]
        up = up_ref[:]
        recout_ref[i] = u[z0:z0 + 2, :]
        un = (lap(u) + two_m_hd * u - m * up) * denom \
            + wav_ref[base + i] * inj
        # cast is a no-op for the default f32 history; bf16 halves the
        # streamed HBM traffic (see stream_hist_dtype)
        dt2out_ref[i] = (un - 2.0 * u + up).astype(dt2out_ref.dtype)

        @pl.when(base + i < nsteps)
        def _():
            illum_ref[:] = illum_ref[:] + un * un

        u_ref[:] = un
        up_ref[:] = u
        return 0

    jax.lax.fori_loop(0, seg, body, 0)


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "n_checkpoints",
                                   "interpret", "dt", "fs", "hist_dtype"))
def forward_dt2_segments(m, hd, wav_pad, inj, dt, *, nt, nx, nz,
                         space_order, spacing, z0, n_checkpoints,
                         fs=False, interpret=False, hist_dtype="float32"):
    """Segment-grid Pallas forward that streams the d2u/dt2 history to HBM.
    Transposed operands like ``forward_ckpt_segments``. Returns
    (rec_rows (B, nseg, seg, 2, nx), dt2 (B, nseg, seg, nz, nx),
    illum (B, nz, nx)). ``hist_dtype`` selects the streamed history
    element type ("float32" or "bfloat16"); the in-VMEM arithmetic stays
    f32 either way."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from .acoustic import _ckpt_layout

    w, inv_h2x, inv_h2z, s2 = _stencil_constants(space_order, spacing, dt)
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    B = inj.shape[0]

    kern = partial(_fwd_dt2_kernel, seg=seg, nsteps=nsteps, nx=nx, nz=nz,
                   w=w, inv_h2x=inv_h2x, inv_h2z=inv_h2z, z0=z0, fs=fs)

    dt2, rec_rows, illum = pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),            # wav_pad
            pl.BlockSpec(memory_space=pltpu.VMEM),            # m
            pl.BlockSpec(memory_space=pltpu.VMEM),            # hd
            pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),            # inj
        ],
        out_specs=(
            pl.BlockSpec((None, None, seg, nz, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # dt2 history
            pl.BlockSpec((None, None, seg, 2, nx),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # rec rows
            pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),            # illum
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nseg, seg, nz, nx),
                                 jnp.dtype(hist_dtype)),
            jax.ShapeDtypeStruct((B, nseg, seg, 2, nx), jnp.float32),
            jax.ShapeDtypeStruct((B, nz, nx), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32),    # u
                        pltpu.VMEM((nz, nx), jnp.float32)],   # up
        interpret=env_interpret(interpret),
    )(wav_pad, m, hd, inj)
    return rec_rows, dt2, illum


def _grad_stream_kernel(m_ref, hd_ref, dt2_ref, res_ref, grad_ref,
                        v_ref, vn_ref, *, seg, nsteps, nx, nz, w,
                        inv_h2x, inv_h2z, z0, neg_inv_s2, fs):
    """One (shot b, reversed-segment j) grid step of the streamed-history
    gradient: the adjoint sweep of ``_grad_kernel`` with the recompute
    removed — the segment's d2u/dt2 history arrives as a pipelined input
    block. Accumulation order matches ``_grad_kernel`` exactly."""
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    nseg = pl.num_programs(1)

    m = m_ref[:]
    hd = hd_ref[:]
    denom = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd
    k = nseg - 1 - j
    base = k * seg
    lap = _make_lap_t(w, inv_h2x, inv_h2z, nx, nz, fs)

    @pl.when(j == 0)
    def _():
        v_ref[:] = jnp.zeros((nz, nx), jnp.float32)
        vn_ref[:] = jnp.zeros((nz, nx), jnp.float32)
        grad_ref[:] = jnp.zeros((nz, nx), jnp.float32)

    def rev_body(i, _):
        jj = seg - 1 - i

        @pl.when(base + jj < nsteps)
        def _():
            v = v_ref[:]
            # astype is a no-op on the f32 recompute scratch; it upcasts
            # the bf16 streamed history before the accumulate
            grad_ref[:] = grad_ref[:] \
                + dt2_ref[jj].astype(jnp.float32) * v
            v_ref[:] = (lap(v) + two_m_hd * v - m * vn_ref[:]) * denom
            v_ref[z0:z0 + 2, :] = v_ref[z0:z0 + 2, :] + res_ref[jj]
            vn_ref[:] = v
        return 0

    jax.lax.fori_loop(0, seg, rev_body, 0)

    @pl.when(j == nseg - 1)
    def _():
        grad_ref[:] = grad_ref[:] * neg_inv_s2


@partial(jax.jit, static_argnames=("nt", "nx", "nz", "space_order",
                                   "spacing", "z0", "n_checkpoints",
                                   "interpret", "dt", "fs"))
def gradient_stream_segments(m, hd, dt2, res_rows, dt, *, nt, nx, nz,
                             space_order, spacing, z0, n_checkpoints,
                             fs=False, interpret=False):
    """Reverse-sweep gradient from a streamed d2u/dt2 history
    (``forward_dt2_segments`` output). Transposed operands; returns grad
    (B, nz, nx) = sum_t -u.dt2[t]*v[t] / s^2, matching
    ``gradient_segments`` up to XLA's per-program FMA contraction."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu
    from .acoustic import _ckpt_layout

    w, inv_h2x, inv_h2z, s2 = _stencil_constants(space_order, spacing, dt)
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)
    B = dt2.shape[0]

    kern = partial(_grad_stream_kernel, seg=seg, nsteps=nsteps, nx=nx,
                   nz=nz, w=w, inv_h2x=inv_h2x, inv_h2z=inv_h2z, z0=z0,
                   neg_inv_s2=-1.0 / s2, fs=fs)

    return pl.pallas_call(
        kern,
        grid=(B, nseg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),            # m
            pl.BlockSpec(memory_space=pltpu.VMEM),            # hd
            pl.BlockSpec((None, None, seg, nz, nx),
                         lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # dt2 history
            pl.BlockSpec((None, None, seg, 2, nx),
                         lambda b, j: (b, nseg - 1 - j, 0, 0, 0),
                         memory_space=pltpu.VMEM),            # res_rows
        ],
        out_specs=pl.BlockSpec((None, nz, nx), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nz, nx), jnp.float32),
        scratch_shapes=[pltpu.VMEM((nz, nx), jnp.float32),    # v
                        pltpu.VMEM((nz, nx), jnp.float32)],   # vn
        interpret=env_interpret(interpret),
    )(m, hd, dt2, res_rows)


def _padded_field_bytes(nx, nz, itemsize=4):
    """HBM bytes of one transposed (nz, nx) field under the TPU tile
    padding ((8, 128) sublane x lane for 4-byte types, (16, 128) for
    2-byte)."""
    sub = 8 * 4 // itemsize
    return (-(-nz // sub) * sub) * (-(-nx // 128) * 128) * itemsize


def stream_hist_dtype():
    """Streamed-history element type, selectable via the
    ``DEVITO_FWI_TPU_HIST`` env var. Default "bf16": halves the
    history's HBM footprint (~400 -> ~200 MB/shot on the Marmousi
    bench, doubling ``stream_max_shots`` and leaving room for the W2
    misfit temporaries) at no measured throughput cost (31.1 vs 31.8
    Gcs/s A/B on chip — the history DMA fully overlaps the sweeps
    either way) and 3.9e-4 max relative gradient deviation on the
    29-shot Marmousi gradient. "f32" restores bit-identical parity
    with the recompute path, and is the default off-TPU (interpret-mode
    CI asserts exact streamed==recompute parity there)."""
    default = "bf16" if jax.default_backend() == "tpu" else "f32"
    val = os.environ.get("DEVITO_FWI_TPU_HIST", default).strip().lower()
    table = {"f32": "float32", "float32": "float32",
             "bf16": "bfloat16", "bfloat16": "bfloat16"}
    if val not in table:
        # a typo must not silently halve the precision the user asked for
        raise ValueError(
            f"DEVITO_FWI_TPU_HIST={val!r}: expected one of "
            f"{sorted(table)}")
    return table[val]


def pick_stream_checkpoints(nt, nx, nz, hist_dtype="float32"):
    """Checkpoint count for the streamed-history kernels: the double-
    buffered (seg, nz, nx) history blocks dominate VMEM, so
    2*seg*field + ~12 resident fields <= ~15 MB. Returns None when even a
    4-step segment cannot fit (fall back to the recompute path)."""
    itemsize = jnp.dtype(hist_dtype).itemsize
    field = _padded_field_bytes(nx, nz)
    hist_field = _padded_field_bytes(nx, nz, itemsize)
    budget = 15 * 2 ** 20 - 12 * field
    seg_max = budget // (2 * hist_field)
    if seg_max < 4:
        return None
    # short segments pipeline the history DMA under the stencil compute;
    # 12 keeps the block DMA (~3.5 MB on the Marmousi bench) well under a
    # segment's compute time. DEVITO_FWI_TPU_STREAM_SEG overrides the cap
    # for one-process A/Bs (tools/audit_gradient.py).
    seg_cap = int(os.environ.get("DEVITO_FWI_TPU_STREAM_SEG", "12"))
    seg = min(seg_max, seg_cap)
    nsteps = nt - 2
    return max(int(-(-nsteps // seg)), 1)


def stream_max_shots(nt, nx, nz, hbm_budget_bytes=8 << 30,
                     hist_dtype="float32"):
    """Largest shot batch whose streamed d2u/dt2 history fits the HBM
    budget (default 8 GB of the chip's 16, leaving room for XLA's other
    live buffers)."""
    itemsize = jnp.dtype(hist_dtype).itemsize
    per_shot = (nt - 2) * _padded_field_bytes(nx, nz, itemsize)
    return max(1, int(hbm_budget_bytes // max(per_shot, 1)))


def gradient_from_ckpt_pallas(vp, damp, src_wav, s_idx, s_w, seg_starts,
                              res_stack, r_idx, r_w, dt, *, nt, spacing,
                              space_order, n_checkpoints, fs=False,
                              interpret=False):
    """Batch gradient through the Pallas reverse kernel with the same call
    shape as a vmapped ``ops.acoustic.gradient_from_ckpt``. seg_starts is
    the stacked (B, nseg, 2, nx, nz) forward checkpoint output; res_stack
    is (B, nt, nrec). Requires the fast-path geometry (2-D, OT2, no free
    surface, receivers on two z-planes)."""
    from .acoustic import _ckpt_layout

    dt = float(dt)
    nx, nz = vp.shape
    m_pad = 1.0 / (np.asarray(vp, np.float32) ** 2)
    # broadcast a scalar damp like the XLA gradient_from_ckpt does — a
    # nonzero scalar must not silently become zeros
    hd = dt * np.broadcast_to(np.asarray(damp, np.float32),
                              (nx, nz)).copy()
    s2 = dt * dt
    nsteps, seg, nseg = _ckpt_layout(nt, n_checkpoints)

    inj = source_pattern(jnp.asarray(s_idx), jnp.asarray(s_w),
                         jnp.asarray(m_pad), s2)
    r_idx_n = np.asarray(r_idx)
    z0 = int(r_idx_n[..., 1].min())
    rows = residual_rows(jnp.asarray(res_stack), jnp.asarray(r_idx),
                         jnp.asarray(r_w), jnp.asarray(m_pad), s2, z0,
                         nsteps, seg, nseg)
    total = nseg * seg
    wav_pad = pad_wavelet(jnp.asarray(src_wav), nt, total)
    # the kernel works in transposed (nz, nx) layout (see _grad_kernel);
    # XLA fuses these swaps into the surrounding program
    grad_t = gradient_segments(
        jnp.asarray(m_pad.T), jnp.asarray(hd.T), jnp.asarray(wav_pad),
        jnp.swapaxes(jnp.asarray(inj), -1, -2),
        jnp.swapaxes(seg_starts, -1, -2), rows, dt, nt=nt, nx=nx, nz=nz,
        space_order=space_order, spacing=spacing, z0=z0,
        n_checkpoints=n_checkpoints, fs=fs, interpret=interpret)
    return jnp.swapaxes(grad_t, -1, -2)


def pick_n_checkpoints(nt, nx, nz, n_min=4):
    """Checkpoint count for the segment kernels such that the per-segment
    d2u/dt2 VMEM history fits: seg * tile-padded-field + ~14 resident
    fields <= ~15 MB (v5e scoped VMEM limit is 16 MB). Returns None when
    even a 4-step segment cannot fit (fall back to the XLA path)."""
    pz = -(-nz // 8) * 8          # sublane padding (transposed layout)
    px = -(-nx // 128) * 128      # lane padding
    field_bytes = pz * px * 4
    # measured on v5e: the reverse kernel's non-history VMEM footprint is
    # ~16 field-equivalents (carries, params, double-buffered blocks)
    budget = 15 * 2 ** 20 - 16 * field_bytes
    seg_max = budget // field_bytes
    if seg_max < n_min:
        return None
    # shorter segments pipeline better (measured on the Marmousi bench:
    # seg 37 -> 0.282 s reverse, seg 17 -> 0.240 s); target ~16 steps
    # unless VMEM forces fewer
    seg = min(seg_max, 24)
    nsteps = nt - 2
    return max(int(-(-nsteps // seg)), 1)


def geometry_supported(geometry):
    """True when the Pallas fast path applies: 2-D grid, one source per
    shot, all receivers between the same two z-planes, OT2 (free surface
    is supported by the segment kernels; the legacy ``pallas_legacy``
    whole-nt kernel additionally requires ``not model.fs``)."""
    model = geometry.model
    if model.dim != 2:
        return False
    from .interp import interp_table
    r_idx, _ = interp_table(geometry.rec_positions, model.origin_pml,
                            model.spacing, dtype=model.dtype)
    zplanes = np.unique(np.asarray(r_idx)[..., 1])
    # the planes must be ADJACENT (z0, z0+1): the kernels record
    # exactly those two rows, and two separated planes would silently
    # read the wrong row for the second one (review r5)
    if len(zplanes) > 2 or zplanes.max() - zplanes.min() > 1:
        return False
    # the kernels read/write u[z0:z0+2, :] as a static 2-row slice; a
    # receiver whose bilinear corners touch the padded-grid z edge
    # (z0 < 0 or z0 + 2 > nz) would clamp that slice to one row and
    # crash the trace — such edge geometries stay on the XLA path,
    # whose drop/fill scatter semantics handle them
    nz = model.padded_shape[1]
    z0 = int(zplanes.min())
    return 0 <= z0 and z0 + 2 <= nz

