"""3-D acoustic Pallas segment kernels (TPU, y-block streaming).

The 2-D kernels (``pallas_acoustic.py``) keep the whole transposed field
VMEM-resident across a time segment; a 3-D field does not fit the ~16 MB
of scoped VMEM, so these kernels stream instead: the grid is
``(shot, time step, y-block)`` and the wavefield time rotation lives in
an HBM double buffer (``memory_space=ANY``, input/output-aliased) from
which each (t, yb) step DMA-reads its R-row y-slab plus stencil halos
and DMA-writes the updated slab. Within one time step every block READS
parity ``(t+1) % 2`` and WRITES parity ``t % 2``, so neighbor-halo reads
never race block writes; the sequential TPU grid orders time steps.

Layout is (ny, nz, nx) — y on the leading (untiled) axis so halo slices
and slab DMAs are leading-axis offsets (dynamic leading-axis indexing
lowers; dynamic sublane/lane offsets do not), z on sublanes so the two
receiver z-planes are static accesses — through the tile-ALIGNED band
helpers ``_extract_zpair``/``_inject_zpair``, because a bare 2-wide
sublane window at in-tile offsets 3..7 aborts the Mosaic compiler — x
on lanes. The model's (nx, ny, nz) fields transpose via (1, 2, 0).

The d2u/dt2 gradient history streams to HBM exactly like the 2-D
``forward_dt2_segments`` (bf16 by default on TPU); illumination and the
gradient accumulate in whole-field VMEM-resident out blocks (block
index = shot only), which bounds the supported padded grid — the route
(`fwi._pallas3_route`) falls back to the XLA saved-history path beyond
it.

Numerics mirror ``ops.acoustic`` exactly (same update association as
the 2-D kernels: per-axis accumulation, x term scaled and added first,
free-surface fix on z replacing rows 0..r in the XLA term order).
Reference semantics: devito ``seismic/acoustic/operators.py`` (3-D is
uniform there via symbolic codegen; here it is this dedicated streaming
kernel family).
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .pallas_acoustic import available, env_interpret
from ..utils.fd import second_derivative_weights

__all__ = [
    "available", "geometry_supported3", "pick_blocks3",
    "stream_max_shots3", "source_planes3", "residual_slabs3",
    "traces_from_slabs3", "forward_dt2_stream3", "gradient_stream3",
    "forward_rec3",
]


def _stencil_constants3(space_order, spacing, dt):
    w_full = second_derivative_weights(space_order)
    w = tuple(float(v) for v in np.asarray(w_full)[len(w_full) // 2:])
    s2 = float(dt) ** 2
    inv = tuple(float(1.0 / h ** 2) * s2 for h in spacing)
    return w, inv, s2


def _lap3_slab(us, w, ih2x, ih2y, ih2z, R, H, fs):
    """Laplacian (dt^2-scaled) of the core R rows of a halo-extended
    (R+2H, nz, nx) y-slab. z (axis 1) and x (axis 2) use zero-fill
    concatenates exactly like the 2-D ``_make_lap_t``; y neighbors come
    from the halo rows by static leading-axis slices. Association
    matches ``ops.acoustic.laplacian_parts`` (x, then y, then z scaled
    at the end; see the 2-D kernel's coherent-rounding note)."""
    r = len(w) - 1
    u = us[H:H + R]
    nz, nx = u.shape[1], u.shape[2]
    accx = w[0] * u
    for k in range(1, r + 1):
        zx = jnp.zeros((R, nz, k), jnp.float32)
        sp = jnp.concatenate([u[:, :, k:], zx], 2)
        sm = jnp.concatenate([zx, u[:, :, :-k]], 2)
        accx = accx + w[k] * (sp + sm)
    accy = w[0] * u
    for k in range(1, r + 1):
        accy = accy + w[k] * (us[H + k:H + R + k] + us[H - k:H + R - k])
    accz = w[0] * u
    for k in range(1, r + 1):
        zz = jnp.zeros((R, k, nx), jnp.float32)
        sp = jnp.concatenate([u[:, k:, :], zz], 1)
        sm = jnp.concatenate([zz, u[:, :-k, :]], 1)
        accz = accz + w[k] * (sp + sm)
    if fs:
        # rows 0..r of the z-derivative: free-surface mirror in the XLA
        # path's term order (_fs_fix_last_axis)
        rows = []
        for z in range(r + 1):
            acc = w[0] * u[:, z:z + 1, :]
            for k in range(1, r + 1):
                acc = acc + w[k] * u[:, z + k:z + k + 1, :]
                i = z - k
                if i > 0:
                    acc = acc + w[k] * u[:, i:i + 1, :]
                elif i < 0:
                    acc = acc - w[k] * u[:, -i:-i + 1, :]
            rows.append(acc)
        accz = jnp.concatenate(rows + [accz[:, r + 1:, :]], 1)
    return accx * ih2x + accy * ih2y + accz * ih2z


def _row_mask(R, y0, ny, dtype=jnp.float32):
    """(R, 1, 1) mask of rows whose global y index is < ny (the y axis
    is padded to a whole number of R-blocks; padded rows must stay zero
    or they would feed ghost reflections back through the y stencil)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0) + y0
    return (rows < ny).astype(dtype)[:, :, None]


def pad_shape3(nz, nx):
    """(nzp, nxp): the z (sublane) and x (lane) extents padded to the
    Mosaic tile (8, 128) — HBM double-buffer DMA slices must be
    tile-aligned in their trailing two dims."""
    return -(-nz // 8) * 8, -(-nx // 128) * 128


def _mask3(R, y0, ny, nz_r, nx_r, nzp, nxp, dtype=jnp.float32):
    """(R, nzp or 1, nxp or 1) mask pinning y/z/x padding cells to zero
    every step — that preserves the XLA path's zero-fill stencil
    semantics at the real-grid edges (a nonzero pad cell would couple
    back through the halo reads)."""
    m = _row_mask(R, y0, ny, dtype)
    if nz_r != nzp:
        zi = jax.lax.broadcasted_iota(jnp.int32, (1, nzp, 1), 1)
        m = m * (zi < nz_r).astype(dtype)
    if nx_r != nxp:
        xi = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nxp), 2)
        m = m * (xi < nx_r).astype(dtype)
    return m


def _zpair_band(z0):
    """(zb, o, L): the tile-aligned sublane band holding rows
    [z0, z0+2) — start zb (multiple of 8), in-band offset o, length L
    (8, or 16 when the pair straddles a tile edge). Mosaic ABORTS on a
    2-wide sublane window at most in-tile offsets (``lower_to_llo.cc``
    'Check failed: d >> 32 == 0 (-1 vs. 0)'; measured: offsets 0 and 2
    lower, 3..7 crash the remote compiler), so every kernel-side
    receiver-plane access goes through an aligned whole-tile band.
    z0+2 <= nzp (a multiple of 8) guarantees zb+L <= nzp."""
    o = z0 % 8
    zb = z0 - o
    return zb, o, (8 if o <= 6 else 16)


def _extract_zpair(u, z0):
    """u[:, z0:z0+2, :] of a (R, nz, nx) value without an unaligned
    sublane slice: aligned whole-tile band + one-hot sublane
    reductions (~0.6% of the step's VPU work at L=8)."""
    zb, o, L = _zpair_band(z0)
    band = u[:, zb:zb + L, :]
    zi = jax.lax.broadcasted_iota(jnp.int32, (1, L, 1), 1)
    r0 = jnp.sum(jnp.where(zi == o, band, 0.0), axis=1, keepdims=True)
    r1 = jnp.sum(jnp.where(zi == o + 1, band, 0.0), axis=1,
                 keepdims=True)
    return jnp.concatenate([r0, r1], 1)


def _zpair_addend(res, z0):
    """(zb, L, addend): the two rows of ``res`` zero-placed at in-band
    offset o of the aligned L-row band (zero-size concat pieces
    guarded)."""
    zb, o, L = _zpair_band(z0)
    R, _, nx = res.shape
    pieces = []
    if o:
        pieces.append(jnp.zeros((R, o, nx), res.dtype))
    pieces.append(res)
    if L - o - 2:
        pieces.append(jnp.zeros((R, L - o - 2, nx), res.dtype))
    addend = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, 1)
    return zb, L, addend


def _inject_zpair(slab, res, z0):
    """slab[:, z0:z0+2, :] += res on a scratch ref without an unaligned
    sublane window: whole-tile read-modify-write of the aligned band."""
    zb, L, addend = _zpair_addend(res, z0)
    slab[:, zb:zb + L, :] = slab[:, zb:zb + L, :] + addend


# ---------------------------------------------------------------------------
# forward: streamed dt2 history + receiver slabs + illumination
# ---------------------------------------------------------------------------

def _fwd3_kernel(wav_ref, m_ref, hd_ref, injp_ref, iy_ref, ub_ref,
                 dt2_ref, rec_ref, illum_ref, ubout_ref,
                 us, up, slab, sem_in, sem_up, sem_out, *,
                 R, H, ny, nz_r, nx_r, nsteps, w, ih2x, ih2y, ih2z, z0,
                 fs):
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    yb = pl.program_id(2)
    y0 = yb * R
    nz, nx = m_ref.shape[1], m_ref.shape[2]

    # u^{t-1} slab with halos from parity (t+1) % 2; u^{t-2} core rows
    # from parity t % 2 (overwritten below AFTER the read completes)
    din = pltpu.make_async_copy(
        ubout_ref.at[(t + 1) % 2, pl.ds(y0, R + 2 * H)], us, sem_in)
    dup = pltpu.make_async_copy(
        ubout_ref.at[t % 2, pl.ds(y0 + H, R)], up, sem_up)

    @pl.when(t > 0)
    def _():
        din.start()

    @pl.when(t > 1)
    def _():
        dup.start()

    m = m_ref[:]
    hd = hd_ref[:]
    denom = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd

    @pl.when(t == 0)
    def _():
        us[:] = jnp.zeros((R + 2 * H, nz, nx), jnp.float32)

    @pl.when(t <= 1)
    def _():
        up[:] = jnp.zeros((R, nz, nx), jnp.float32)

    @pl.when(t > 0)
    def _():
        din.wait()

    @pl.when(t > 1)
    def _():
        dup.wait()

    u = us[H:H + R]
    rec_ref[:] = _extract_zpair(u, z0)
    lap = _lap3_slab(us[:], w, ih2x, ih2y, ih2z, R, H, fs)
    un = (lap + two_m_hd * u - m * up[:]) * denom
    un = un * _mask3(R, y0, ny, nz_r, nx_r, nz, nx)
    slab[:] = un
    # source injection: two dense y-planes at global rows iy, iy+1
    iy = iy_ref[b]
    loc = iy - y0
    for p in range(2):
        hit = (loc + p >= 0) & (loc + p < R)
        idx = jnp.clip(loc + p, 0, R - 1)
        amp = jnp.where(hit, wav_ref[b, t], jnp.float32(0.0))
        slab[idx] = slab[idx] + amp * injp_ref[p]
    un = slab[:]
    dt2_ref[:] = (un - 2.0 * u + up[:]).astype(dt2_ref.dtype)

    @pl.when(t == 0)
    def _():
        illum_ref[pl.ds(y0, R)] = un * un

    @pl.when(t > 0)
    def _():
        illum_ref[pl.ds(y0, R)] = illum_ref[pl.ds(y0, R)] + un * un

    dout = pltpu.make_async_copy(
        slab, ubout_ref.at[t % 2, pl.ds(y0 + H, R)], sem_out)
    dout.start()
    dout.wait()


@partial(jax.jit, static_argnames=("nt", "ny", "nz", "nx", "space_order",
                                   "spacing", "z0", "R", "fs",
                                   "interpret", "dt", "hist_dtype"))
def forward_dt2_stream3(m3, hd3, wav_pad, injp, iy, dt, *, nt, ny, nz, nx,
                        space_order, spacing, z0, R, fs=False,
                        interpret=False, hist_dtype="float32"):
    """Streamed 3-D forward. Operands are (ny, nz, nx)-transposed and
    y-padded to nyb*R rows (pad m with 1, hd/inj with 0):
      m3, hd3: (nyp, nz, nx); wav_pad: (B, nsteps); injp: (B, 2, nz, nx)
      (source pattern planes, s^2/m folded in); iy: (B,) int32 first
      source y-plane. Returns (rec_slab (B, nsteps, nyp, 2, nx),
      dt2 (B, nsteps, nyp, nz, nx) in ``hist_dtype``,
      illum (B, nyp, nz, nx)); rows >= ny of every output are padding.
    """
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    w, (ih2x, ih2y, ih2z), _ = _stencil_constants3(space_order, spacing,
                                                   dt)
    nsteps = nt - 2
    B = injp.shape[0]
    H = space_order // 2
    nyp, nzp, nxp = m3.shape
    assert nyp % R == 0 and (nzp, nxp) == pad_shape3(nz, nx)
    nyb = nyp // R

    kern = partial(_fwd3_kernel, R=R, H=H, ny=ny, nz_r=nz, nx_r=nx,
                   nsteps=nsteps, w=w,
                   ih2x=ih2x, ih2y=ih2y, ih2z=ih2z, z0=z0, fs=fs)
    ub0 = jnp.zeros((2, nyp + 2 * H, nzp, nxp), jnp.float32)
    dt2, rec, illum, _ = pl.pallas_call(
        kern,
        grid=(B, nsteps, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),              # wav
            pl.BlockSpec((R, nzp, nxp), lambda b, t, yb: (yb, 0, 0),
                         memory_space=pltpu.VMEM),              # m slab
            pl.BlockSpec((R, nzp, nxp), lambda b, t, yb: (yb, 0, 0),
                         memory_space=pltpu.VMEM),              # hd slab
            pl.BlockSpec((None, 2, nzp, nxp), lambda b, t, yb: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # inj planes
            pl.BlockSpec(memory_space=pltpu.SMEM),              # iy
            pl.BlockSpec(memory_space=pl.ANY),               # ub
        ],
        out_specs=(
            pl.BlockSpec((None, None, R, nzp, nxp),
                         lambda b, t, yb: (b, t, yb, 0, 0),
                         memory_space=pltpu.VMEM),              # dt2
            pl.BlockSpec((None, None, R, 2, nxp),
                         lambda b, t, yb: (b, t, yb, 0, 0),
                         memory_space=pltpu.VMEM),              # rec slab
            pl.BlockSpec((None, nyp, nzp, nxp),
                         lambda b, t, yb: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # illum
            pl.BlockSpec(memory_space=pl.ANY),               # ub out
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nsteps, nyp, nzp, nxp),
                                 jnp.dtype(hist_dtype)),
            jax.ShapeDtypeStruct((B, nsteps, nyp, 2, nxp), jnp.float32),
            jax.ShapeDtypeStruct((B, nyp, nzp, nxp), jnp.float32),
            jax.ShapeDtypeStruct((2, nyp + 2 * H, nzp, nxp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * H, nzp, nxp), jnp.float32),       # us
            pltpu.VMEM((R, nzp, nxp), jnp.float32),               # up
            pltpu.VMEM((R, nzp, nxp), jnp.float32),               # slab
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={5: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # v5e has 128 MB of physical VMEM; the 16 MB scoped default
            # rejects the whole-field illum/grad out block at bench
            # grids (measured 19.9M at 96^3, R=24)
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=env_interpret(interpret),
    )(wav_pad, m3, hd3, injp, iy, ub0)
    return rec, dt2, illum


def _rec3_kernel(wav_ref, m_ref, hd_ref, injp_ref, iy_ref, ub_ref,
                 rec_ref, ubout_ref, us, up, slab, sem_in, sem_up,
                 sem_out, *, R, H, ny, nz_r, nx_r, nsteps, w, ih2x, ih2y,
                 ih2z, z0, fs):
    """Forward-only variant: records receiver slabs, no dt2/illum
    (Pallas outputs cannot be dead-code-eliminated)."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    b = pl.program_id(0)
    t = pl.program_id(1)
    yb = pl.program_id(2)
    y0 = yb * R
    nz, nx = m_ref.shape[1], m_ref.shape[2]

    din = pltpu.make_async_copy(
        ubout_ref.at[(t + 1) % 2, pl.ds(y0, R + 2 * H)], us, sem_in)
    dup = pltpu.make_async_copy(
        ubout_ref.at[t % 2, pl.ds(y0 + H, R)], up, sem_up)

    @pl.when(t > 0)
    def _():
        din.start()

    @pl.when(t > 1)
    def _():
        dup.start()

    m = m_ref[:]
    hd = hd_ref[:]
    denom = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd

    @pl.when(t == 0)
    def _():
        us[:] = jnp.zeros((R + 2 * H, nz, nx), jnp.float32)

    @pl.when(t <= 1)
    def _():
        up[:] = jnp.zeros((R, nz, nx), jnp.float32)

    @pl.when(t > 0)
    def _():
        din.wait()

    @pl.when(t > 1)
    def _():
        dup.wait()

    u = us[H:H + R]
    rec_ref[:] = _extract_zpair(u, z0)
    lap = _lap3_slab(us[:], w, ih2x, ih2y, ih2z, R, H, fs)
    un = (lap + two_m_hd * u - m * up[:]) * denom
    un = un * _mask3(R, y0, ny, nz_r, nx_r, nz, nx)
    slab[:] = un
    iy = iy_ref[b]
    loc = iy - y0
    for p in range(2):
        hit = (loc + p >= 0) & (loc + p < R)
        idx = jnp.clip(loc + p, 0, R - 1)
        amp = jnp.where(hit, wav_ref[b, t], jnp.float32(0.0))
        slab[idx] = slab[idx] + amp * injp_ref[p]
    dout = pltpu.make_async_copy(
        slab, ubout_ref.at[t % 2, pl.ds(y0 + H, R)], sem_out)
    dout.start()
    dout.wait()


@partial(jax.jit, static_argnames=("nt", "ny", "nz", "nx", "space_order",
                                   "spacing", "z0", "R", "fs",
                                   "interpret", "dt"))
def forward_rec3(m3, hd3, wav_pad, injp, iy, dt, *, nt, ny, nz, nx,
                 space_order, spacing, z0, R, fs=False, interpret=False):
    """Streamed 3-D forward, receiver slabs only (pure modeling)."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    w, (ih2x, ih2y, ih2z), _ = _stencil_constants3(space_order, spacing,
                                                   dt)
    nsteps = nt - 2
    B = injp.shape[0]
    H = space_order // 2
    nyp, nzp, nxp = m3.shape
    assert nyp % R == 0 and (nzp, nxp) == pad_shape3(nz, nx)
    nyb = nyp // R

    kern = partial(_rec3_kernel, R=R, H=H, ny=ny, nz_r=nz, nx_r=nx,
                   nsteps=nsteps, w=w,
                   ih2x=ih2x, ih2y=ih2y, ih2z=ih2z, z0=z0, fs=fs)
    ub0 = jnp.zeros((2, nyp + 2 * H, nzp, nxp), jnp.float32)
    rec, _ = pl.pallas_call(
        kern,
        grid=(B, nsteps, nyb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, nzp, nxp), lambda b, t, yb: (yb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((R, nzp, nxp), lambda b, t, yb: (yb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 2, nzp, nxp), lambda b, t, yb: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec((None, None, R, 2, nxp),
                         lambda b, t, yb: (b, t, yb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nsteps, nyp, 2, nxp), jnp.float32),
            jax.ShapeDtypeStruct((2, nyp + 2 * H, nzp, nxp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * H, nzp, nxp), jnp.float32),
            pltpu.VMEM((R, nzp, nxp), jnp.float32),
            pltpu.VMEM((R, nzp, nxp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={5: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # v5e has 128 MB of physical VMEM; the 16 MB scoped default
            # rejects the whole-field illum/grad out block at bench
            # grids (measured 19.9M at 96^3, R=24)
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=env_interpret(interpret),
    )(wav_pad, m3, hd3, injp, iy, ub0)
    return rec


# ---------------------------------------------------------------------------
# reverse: streamed-history gradient
# ---------------------------------------------------------------------------

def _grad3_kernel(m_ref, hd_ref, dt2_ref, res_ref, vb_ref, grad_ref,
                  vbout_ref, vs, vn, slab, sem_in, sem_up, sem_out, *,
                  R, H, ny, nz_r, nx_r, nsteps, w, ih2x, ih2y, ih2z, z0,
                  neg_inv_s2, fs):
    """One (shot, reversed step j, y-block) grid step of the streamed
    3-D gradient. Accumulation order matches the 2-D
    ``_grad_stream_kernel``: grad += dt2[t]*v, then v steps backward,
    then the residual injects into the new v."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    j = pl.program_id(1)
    yb = pl.program_id(2)
    y0 = yb * R
    nz, nx = m_ref.shape[1], m_ref.shape[2]

    din = pltpu.make_async_copy(
        vbout_ref.at[(j + 1) % 2, pl.ds(y0, R + 2 * H)], vs, sem_in)
    dup = pltpu.make_async_copy(
        vbout_ref.at[j % 2, pl.ds(y0 + H, R)], vn, sem_up)

    @pl.when(j > 0)
    def _():
        din.start()

    @pl.when(j > 1)
    def _():
        dup.start()

    m = m_ref[:]
    hd = hd_ref[:]
    denom = 1.0 / (m + hd)
    two_m_hd = 2.0 * m + hd

    @pl.when(j == 0)
    def _():
        vs[:] = jnp.zeros((R + 2 * H, nz, nx), jnp.float32)

    @pl.when(j <= 1)
    def _():
        vn[:] = jnp.zeros((R, nz, nx), jnp.float32)

    @pl.when(j > 0)
    def _():
        din.wait()

    @pl.when(j > 1)
    def _():
        dup.wait()

    v = vs[H:H + R]
    contrib = dt2_ref[:].astype(jnp.float32) * v

    @pl.when(j == 0)
    def _():
        grad_ref[pl.ds(y0, R)] = contrib

    @pl.when(j > 0)
    def _():
        grad_ref[pl.ds(y0, R)] = grad_ref[pl.ds(y0, R)] + contrib

    lap = _lap3_slab(vs[:], w, ih2x, ih2y, ih2z, R, H, fs)
    vnew = (lap + two_m_hd * v - m * vn[:]) * denom
    vnew = vnew * _mask3(R, y0, ny, nz_r, nx_r, nz, nx)
    slab[:] = vnew
    _inject_zpair(slab, res_ref[:], z0)
    dout = pltpu.make_async_copy(
        slab, vbout_ref.at[j % 2, pl.ds(y0 + H, R)], sem_out)
    dout.start()
    dout.wait()

    @pl.when(j == nsteps - 1)
    def _():
        grad_ref[pl.ds(y0, R)] = grad_ref[pl.ds(y0, R)] * neg_inv_s2


@partial(jax.jit, static_argnames=("nt", "ny", "nz", "nx", "space_order",
                                   "spacing", "z0", "R", "fs",
                                   "interpret", "dt"))
def gradient_stream3(m3, hd3, dt2, res_slab, dt, *, nt, ny, nz, nx,
                     space_order, spacing, z0, R, fs=False,
                     interpret=False):
    """Reverse-sweep 3-D gradient from a streamed dt2 history.
    ``res_slab`` is (B, nsteps, nyp, 2, nx) dense residual rows (s^2/m
    folded in, reverse-time order NOT applied — this function indexes
    backwards). Returns grad (B, nyp, nz, nx) = sum_t -dt2[t]*v[t]/s^2.
    """
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    w, (ih2x, ih2y, ih2z), s2 = _stencil_constants3(space_order, spacing,
                                                    dt)
    nsteps = nt - 2
    B = dt2.shape[0]
    H = space_order // 2
    nyp, nzp, nxp = m3.shape
    assert nyp % R == 0 and (nzp, nxp) == pad_shape3(nz, nx)
    nyb = nyp // R

    kern = partial(_grad3_kernel, R=R, H=H, ny=ny, nz_r=nz, nx_r=nx,
                   nsteps=nsteps, w=w,
                   ih2x=ih2x, ih2y=ih2y, ih2z=ih2z, z0=z0,
                   neg_inv_s2=-1.0 / s2, fs=fs)
    vb0 = jnp.zeros((2, nyp + 2 * H, nzp, nxp), jnp.float32)
    grad, _ = pl.pallas_call(
        kern,
        grid=(B, nsteps, nyb),
        in_specs=[
            pl.BlockSpec((R, nzp, nxp), lambda b, j, yb: (yb, 0, 0),
                         memory_space=pltpu.VMEM),              # m slab
            pl.BlockSpec((R, nzp, nxp), lambda b, j, yb: (yb, 0, 0),
                         memory_space=pltpu.VMEM),              # hd slab
            pl.BlockSpec((None, None, R, nzp, nxp),
                         lambda b, j, yb: (b, nsteps - 1 - j, yb, 0, 0),
                         memory_space=pltpu.VMEM),              # dt2
            pl.BlockSpec((None, None, R, 2, nxp),
                         lambda b, j, yb: (b, nsteps - 1 - j, yb, 0, 0),
                         memory_space=pltpu.VMEM),              # res rows
            pl.BlockSpec(memory_space=pl.ANY),               # vb
        ],
        out_specs=(
            pl.BlockSpec((None, nyp, nzp, nxp),
                         lambda b, j, yb: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),              # grad
            pl.BlockSpec(memory_space=pl.ANY),               # vb out
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, nyp, nzp, nxp), jnp.float32),
            jax.ShapeDtypeStruct((2, nyp + 2 * H, nzp, nxp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((R + 2 * H, nzp, nxp), jnp.float32),       # vs
            pltpu.VMEM((R, nzp, nxp), jnp.float32),               # vn
            pltpu.VMEM((R, nzp, nxp), jnp.float32),               # slab
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={4: 1},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # v5e has 128 MB of physical VMEM; the 16 MB scoped default
            # rejects the whole-field illum/grad out block at bench
            # grids (measured 19.9M at 96^3, R=24)
            vmem_limit_bytes=96 * 2 ** 20),
        interpret=env_interpret(interpret),
    )(m3, hd3, dt2, res_slab, vb0)
    return grad


# ---------------------------------------------------------------------------
# traceable operand builders (host-side matmul assembly, like 2-D)
# ---------------------------------------------------------------------------

def source_planes3(s_idx, s_w, m, s2):
    """Dense two-y-plane source pattern: (injp (B, 2, nzp, nxp),
    iy (B,)). ``m`` is the untransposed (nx, ny, nz) squared slowness;
    the 2^3 bilinear corners of each shot's single source span y in
    {iy, iy+1}. The planes carry the Mosaic-tile-padded trailing dims
    (``pad_shape3``); OOB corners drop (scatter drop mode)."""
    B = s_idx.shape[0]
    nx, ny, nz = m.shape
    nzp, nxp = pad_shape3(nz, nx)
    xi = s_idx[:, 0, :, 0]
    yi = s_idx[:, 0, :, 1]
    zi = s_idx[:, 0, :, 2]
    vals = s_w[:, 0, :] * s2 / m[xi, yi, zi]
    iy = jnp.min(yi, axis=1)
    plane = jnp.clip(yi - iy[:, None], 0, 1)
    injp = jnp.zeros((B, 2, nzp, nxp), vals.dtype)
    injp = injp.at[jnp.arange(B)[:, None], plane, zi, xi].add(
        vals, mode="drop")
    return injp, iy.astype(jnp.int32)


def _plane_weight_matrix(r_idx, r_w, m, s2, z0, ny, nx, nxp,
                         scale_by_m):
    """(nrec, ny*2*nxp) scattered weight matrix V for the two receiver
    z-planes: V[r, (y*2 + p)*nxp + x] sums the receiver's corner
    weights (times s^2/m when ``scale_by_m``) that land on plane p.
    Validity is checked against the REAL grid extents while the column
    layout uses the tile-padded ``nxp`` — an OOB corner must drop (the
    interp contract), never land on a pad lane where it would leak back
    through the stencil halos."""
    nrec = r_idx.shape[0]
    xi = r_idx[:, :, 0]
    yi = r_idx[:, :, 1]
    zi = r_idx[:, :, 2]
    plane = (zi != z0).astype(jnp.int32)
    valid = (xi >= 0) & (xi < nx) & (yi >= 0) & (yi < ny) & \
        ((zi == z0) | (zi == z0 + 1))
    xi = jnp.clip(xi, 0, nx - 1)
    yi = jnp.clip(yi, 0, ny - 1)
    if scale_by_m:
        mv = m[xi, yi, jnp.clip(zi, 0, m.shape[2] - 1)]
        wv = r_w * s2 / mv
    else:
        wv = r_w
    wv = jnp.where(valid, wv, 0.0).astype(jnp.float32)
    V = jnp.zeros((nrec, ny * 2 * nxp), jnp.float32)
    col = (yi * 2 + plane) * nxp + xi
    return V.at[jnp.arange(nrec)[:, None], col].add(wv)


def residual_slabs3(res_stack, r_idx, r_w, m, s2, z0, nsteps, nyp):
    """Residuals -> dense (B, nsteps, nyp, 2, nxp) injection slabs via
    one MXU matmul (the 3-D analog of the 2-D ``residual_rows``)."""
    B = res_stack.shape[0]
    nx, ny, nz = m.shape
    _, nxp = pad_shape3(nz, nx)
    V = _plane_weight_matrix(r_idx, r_w, m, s2, z0, ny, nx, nxp, True)
    res = res_stack[:, 1:nsteps + 1].astype(jnp.float32)
    rows = jnp.einsum("btr,rq->btq", res, V,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    rows = rows.reshape(B, nsteps, ny, 2, nxp)
    if nyp != ny:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, nyp - ny), (0, 0),
                              (0, 0)))
    return rows


def traces_from_slabs3(rec_slab, r_idx, r_w, m, z0, nt, nsteps, dtype):
    """Receiver slabs -> traces (B, nt, nrec): one MXU matmul against
    the transposed plane weight matrix; rec[0] = rec[nt-1] = 0."""
    B, _, nyp, _, nxp = rec_slab.shape
    nx, ny, _ = m.shape
    V = _plane_weight_matrix(r_idx, r_w, m, 1.0, z0, ny, nx, nxp, False)
    rows = rec_slab[:, :, :ny].reshape(B, nsteps, ny * 2 * nxp)
    tr = jnp.einsum("btq,rq->btr", rows, V,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    nrec = V.shape[0]
    rec = jnp.zeros((B, nt, nrec), dtype)
    return rec.at[:, 1:nsteps + 1].set(tr.astype(dtype))


# ---------------------------------------------------------------------------
# routing helpers
# ---------------------------------------------------------------------------

def _field_bytes3(ny, nz, nx, itemsize=4):
    sub = 8 * 4 // itemsize
    return ny * (-(-nz // sub) * sub) * (-(-nx // 128) * 128) * itemsize


def pick_blocks3(ny, nz, nx, hist_itemsize=4):
    """y-rows per block R such that the kernel's VMEM footprint fits:
    the whole-field illum/grad out block + us/up/slab + double-buffered
    m/hd/dt2/rec blocks + ~6 R-row laplacian temporaries within the
    raised 96 MB scoped-vmem limit (with 1/3 headroom — Mosaic's stack
    accounting exceeds the naive sum; measured 19.9M vs 15M estimated
    at 96^3 R=24). Returns None when no R >= 8 fits (fall back to the
    XLA saved-history path)."""
    for R in (32, 24, 16, 8):
        nyp = -(-ny // R) * R
        row = _field_bytes3(1, nz, nx)
        hrow = _field_bytes3(1, nz, nx, hist_itemsize)
        need = (_field_bytes3(nyp, nz, nx)          # illum/grad block
                + (3 * R + 2 * 8) * row             # us+up+slab (+halos)
                + 2 * 2 * R * row                   # m/hd double-buffered
                + 2 * R * hrow                      # dt2 block x2
                + 2 * R * 2 * 128 * 4               # rec slab x2
                + 6 * R * row)                      # lap/update temps
        if need * 4 // 3 <= 96 * 2 ** 20:
            return R
    return None


def stream_max_shots3(nt, ny, nz, nx, hbm_budget_bytes=6 << 30,
                      hist_dtype="float32"):
    """Largest shot batch whose streamed 3-D dt2 history fits HBM."""
    itemsize = jnp.dtype(hist_dtype).itemsize
    per_shot = (nt - 2) * _field_bytes3(ny, nz, nx, itemsize)
    # rec slabs + residual slabs cost 2 * nsteps * (ny, 2, nx) more
    per_shot += 4 * (nt - 2) * _field_bytes3(ny, 2, nx)
    return max(1, int(hbm_budget_bytes // max(per_shot, 1)))


def geometry_supported3(geometry):
    """True when the 3-D streaming kernels apply: 3-D grid, one source
    per shot, all receivers between the same two z-planes with their
    corners inside the padded grid."""
    model = geometry.model
    if model.dim != 3:
        return False
    from .interp import interp_table
    r_idx, _ = interp_table(geometry.rec_positions, model.origin_pml,
                            model.spacing, dtype=model.dtype)
    arr = np.asarray(r_idx)
    zplanes = np.unique(arr[..., 2])
    if len(zplanes) > 2 or int(zplanes.max()) - int(zplanes.min()) > 1:
        return False
    nx, ny, nz = model.padded_shape
    z0 = int(zplanes.min())
    if not (0 <= z0 and z0 + 2 <= nz):
        return False
    s_idx, _ = interp_table(geometry.src_positions, model.origin_pml,
                            model.spacing, dtype=model.dtype)
    sarr = np.asarray(s_idx)
    if sarr[..., 1].min() < 0 or sarr[..., 1].max() >= ny:
        return False
    return True
