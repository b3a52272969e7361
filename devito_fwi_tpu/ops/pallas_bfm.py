"""Pallas TPU kernels for the W2-2d BFM's two hot loops.

The XLA formulations of both loops are HBM-bound, not compute-bound
(measured on the live iteration-5 state of the 29-shot Marmousi batch,
tools/profile_w2_components.py):

* the banded Legendre transform re-reads/re-writes its full-size
  accumulator (or re-reads ``u``) once per band offset — 71-83 ms/call
  against 44.7 ms for the plain blocked transform, although it does 14x
  fewer compare-ops;
* the local-base banded pushforward materializes its one-hot matmul
  operands to HBM every row-block — ~227 ms/call against a ~40 ms
  traffic floor.

Both kernels here keep the block state VMEM-resident so the band
structure finally pays:

* ``legendre_banded`` — ``out[r, i] = max_{|d|<=W} (s_i s_{i+d} -
  u[r, i+d])`` as an unrolled register max over precomputed
  ``P[d] = s_i * s_{i+d}`` row vectors, plus the total-monotonicity
  certificate (argmax brackets at every K-th output, evaluated as
  masked lane reductions) reduced to one ok-flag per row block. The
  grid coordinates are the BFM's own ``s_i = (i + 0.5)/n``, computed
  internally (they must be compile-time constants to precompute P).
* ``pushforward_slabs`` — the bilinear supersample pushforward for one
  (shot, row-block): contributions grouped by LOCAL dy offset g (static
  unrolled loop, rebased per block on the host side) and lane-shifted
  by their dx, summed into a (R+G, lanes) slab built from row-padded
  value concatenates — no scatter, no one-hot operands, no HBM
  intermediates. The caller computes the runtime block bases, runs the
  kernel over a (B, nblk) grid, and overlap-adds the slabs at their
  base offsets (see ``misfit/bfm._pallas_push``).

Reference semantics: misfit/QW2D/src/fot2d.c:50-178 (c-transform) and
fot2d.c:294-457 (pushforward); both kernels compute exactly the same
sums as the XLA paths they accelerate and are parity-tested in
interpreter mode (tests/test_pallas_bfm.py) plus driven on-chip by the
W2 objective tests.
"""
from __future__ import annotations

# offsets consumed per roll of the Legendre kernel's carried window; the
# host wrapper's band padding must cover ceil((2W+1)/_LEG_CHUNK) *
# _LEG_CHUNK - 1 extra lanes, so both read the SAME constant
_LEG_CHUNK = 8

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["available", "env_interpret", "legendre_banded",
           "pushforward_slabs", "pushforward_slabs_nat"]


def available():
    """True when the Mosaic TPU path (or forced interpreter) can run."""
    if env_interpret():
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def env_interpret():
    return os.environ.get("DEVITO_FWI_TPU_PALLAS_INTERPRET", "0") == "1"


def _rup(x, m):
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# banded Legendre transform with in-kernel certificate
# ---------------------------------------------------------------------------

def _legendre_kernel(u_ref, s_ref, sp_ref, out_ref, ok_ref, *, n, W, K,
                     RB, npad):
    """One row block: banded candidate + certificate.

    u_ref: (RB, npad + pad2W) lane-padded block (+BIG fill, rows
    edge-replicated). s_ref: (1, npad) grid coords (0 on pad lanes).
    sp_ref: (1, npad + pad2W) the same coords at the band-padded lane
    offsets (0 off-range — the +BIG u padding kills those entries).
    out_ref: (RB, npad); ok_ref: (8, 128) int32 flag block.

    Both loops are ``fori_loop``s over dynamically ROLLED copies of the
    block (``pltpu.roll`` with a traced shift): a python-unrolled
    maximum chain keeps every window temp live on the Mosaic vector
    stack (measured 108 MB scoped-vmem OOM at W=48, RB=256 — ~75 live
    (RB, npad) buffers), and dynamic LANE slices of refs fail to lower
    ("cannot statically prove index is a multiple of 128").
    """
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    C = _LEG_CHUNK                                 # offsets per roll
    CM = 4                                         # samples per step
    big = jnp.float32(np.finfo(np.float32).max / 8)
    s_row = s_ref[0:1, :]                          # (1, npad)
    u = u_ref[:]
    sp = sp_ref[0:1, :]
    nch = -(-(2 * W + 1) // C)

    width = u.shape[1]

    def dbody(ci, carry):
        # C offsets per step as static unaligned slices of a CARRIED
        # window that advances by a CONSTANT roll of C lanes per step.
        # Per-offset work keeps the sequential fori overhead amortized
        # (one roll per C offsets), and the constant shift lowers to a
        # cheap static rotate — pltpu.roll requires a NON-NEGATIVE
        # shift, and a traced negative shift silently miscompiles.
        acc, zc, spc = carry
        for dd in range(C):
            acc = jnp.maximum(
                acc, s_row * spc[0:1, dd:dd + npad] - zc[:, dd:dd + npad])
        zc = pltpu.roll(zc, width - C, axis=1)
        spc = pltpu.roll(spc, width - C, axis=1)
        return acc, zc, spc

    acc0 = jnp.full((RB, npad), -big, jnp.float32)
    out_ref[:] = jax.lax.fori_loop(0, nch, dbody, (acc0, u, sp))[0]

    # certificate: first/last argmax of every K-th exact output row.
    # Bracket property (total monotonicity of s_i s_j - u_j): for
    # outputs i in [i_m, i_{m+1}], argmax j*(i) lies in
    # [first(i_m), last(i_{m+1})]; all argmaxes are in band iff
    # first(i_m) >= i_{m+1} - W and last(i_{m+1}) <= i_m + W for every
    # consecutive sample pair. Sample positions are i_m = min(m*K, n-1)
    # so the scalar s[i_m] = (i_m + 0.5)/n is computed arithmetically —
    # no dynamic-sublane table reads.
    uc = u[:, W:W + npad]
    lane = jax.lax.broadcasted_iota(jnp.int32, (RB, npad), 1)
    n_samp = -(-(n - 1) // K) + 1

    def first_last(i_m):
        s_im = (i_m.astype(jnp.float32) + 0.5) / n
        v = s_im * s_row - uc
        vmax = jnp.max(v, axis=1, keepdims=True)
        hit = v >= vmax
        first = jnp.min(jnp.where(hit, lane, n), axis=1, keepdims=True)
        last = jnp.max(jnp.where(hit, lane, -1), axis=1, keepdims=True)
        return first, last

    f0, _ = first_last(jnp.int32(0))

    def mchunk(ci, carry):
        # CM samples per step (per-sample fori overhead dominates
        # otherwise); steps beyond the sample count are no-ops
        ok, prev_first = carry
        for k in range(CM):
            m = 1 + ci * CM + k
            i_m = jnp.minimum(m * K, n - 1)
            prev_i = jnp.minimum((m - 1) * K, n - 1)
            first, last = first_last(i_m)
            c = jnp.all(prev_first >= i_m - W) & \
                jnp.all(last <= prev_i + W)
            ok = ok & (c | (m >= n_samp))
            prev_first = first
        return ok, prev_first

    nmch = -(-(n_samp - 1) // CM)
    ok, _ = jax.lax.fori_loop(0, nmch, mchunk, (jnp.bool_(True), f0))
    flag = jnp.where(ok, jnp.int32(1), jnp.int32(0))
    ok_ref[:] = jnp.broadcast_to(flag, (8, 128))


@partial(jax.jit, static_argnames=("W", "K", "interpret"))
def legendre_banded(u, W, K, interpret=False):
    """Banded Legendre transform along the last axis of ``u`` (rows, n)
    against the BFM grid coordinates ``s_i = (i + 0.5)/n``: returns
    ``(out, ok)`` with ``out == max_j (s_i s_j - u[., j])`` whenever
    ``ok`` is True (f32; pass ``interpret=True`` off-TPU)."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    rows, n = u.shape
    dtype = u.dtype
    # the kernel hardcodes f32 accumulators/constants and the host
    # tables below replicate f32 arithmetic — reject other dtypes
    # loudly rather than mis-lowering or silently promoting
    assert dtype == jnp.float32, f"legendre_banded needs float32, got {dtype}"
    big = np.float32(np.finfo(np.float32).max / 8)
    RB = 128
    rows_p = _rup(rows, RB)
    npad = _rup(n, 128)
    # the kernel's chunked rolls read up to
    # ceil((2W+1)/_LEG_CHUNK)*_LEG_CHUNK - 1 + npad lanes; keep the band
    # padding wide enough that no chunk wraps
    pad2w = _rup(max(2 * W, -(-(2 * W + 1) // _LEG_CHUNK) * _LEG_CHUNK),
                 128)
    # pad rows by EDGE replication (constant +big rows would produce
    # degenerate certificate argmaxes), lanes by +big (loses every max)
    u_p = jnp.pad(u, ((0, rows_p - rows), (0, 0)), mode="edge")
    u_p = jnp.pad(u_p, ((0, 0), (0, npad - n)), constant_values=big)
    u_p = jnp.pad(u_p, ((0, 0), (W, pad2w - W)), constant_values=big)

    # build the tables with the SAME f32 arithmetic the kernel's
    # certificate uses for its sample slopes ((i + 0.5)/n evaluated in
    # f32) — an f64-then-cast table double-rounds and can sit 1 ulp off
    # the certificate's slope at a tie point
    s_np = np.zeros((1, npad), np.float32)
    s_np[0, :n] = (np.arange(n, dtype=np.float32)
                   + np.float32(0.5)) / np.float32(n)
    sp_np = np.zeros((1, npad + pad2w), np.float32)
    sp_np[0, W:W + n] = s_np[0, :n]
    s_j = jnp.asarray(s_np, dtype)
    sp_j = jnp.asarray(sp_np, dtype)

    grid = (rows_p // RB,)
    out, okf = pl.pallas_call(
        partial(_legendre_kernel, n=n, W=W, K=K, RB=RB, npad=npad),
        grid=grid,
        in_specs=(
            pl.BlockSpec((RB, npad + pad2w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(s_j.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(sp_j.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((rows_p, npad), dtype),
            jax.ShapeDtypeStruct((grid[0] * 8, 128), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((RB, npad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(u_p, s_j, sp_j)
    return out[:rows, :n], jnp.all(okf[:, 0] == 1)


# ---------------------------------------------------------------------------
# local-base banded pushforward slabs
# ---------------------------------------------------------------------------

def _push_block(rel, dxr, wy0, mass, wx0, *, Q, R, G, DX, lanes):
    """One (shot, row-block): accumulate bilinear contributions into the
    returned (R+G, lanes) slab. rel = dy - base in [0, G-2] for active
    cells (inactive cells carry zero weights); dxr = xI - c + dxmax in
    [0, DX-2]. Every operand is a (Q, R, lanes) value. The slab is
    assembled as a sum of row-padded value concatenates — no
    sublane-offset read-modify-writes of refs.

    The complementary weights derive IN VMEM (wy1 = mass - wy0,
    wx1 = 1 - wx0: exact for clipped cells, <=1 ulp of yf*m / xf
    otherwise) — two fewer (B, Q, n2p, lanes) planes through HBM per
    call than the original 6-plane prep."""
    dtype = wy0.dtype
    wy1 = [mass[q] - wy0[q] for q in range(Q)]
    wx1 = [1.0 - wx0[q] for q in range(Q)]

    # x-selection planes, hoisted out of the g loop:
    # xsel[q][e] = (dxr_q == e) * wx0_q + (dxr_q == e-1) * wx1_q
    xsel = []
    for q in range(Q):
        row = []
        for e in range(DX):
            sel = jnp.where(dxr[q] == e, wx0[q], jnp.zeros((), dtype))
            if e >= 1:
                sel = sel + jnp.where(dxr[q] == e - 1, wx1[q],
                                      jnp.zeros((), dtype))
            row.append(sel)
        xsel.append(row)

    slab = None
    for g in range(G):
        m0 = [jnp.where(rel[q] == g, wy0[q], jnp.zeros((), dtype))
              + jnp.where(rel[q] == g - 1, wy1[q], jnp.zeros((), dtype))
              for q in range(Q)]
        acc = None
        for e in range(DX):
            v = None
            for q in range(Q):
                t = xsel[q][e] * m0[q]
                v = t if v is None else v + t
            if e:
                v = jnp.concatenate(
                    [jnp.zeros((R, e), dtype), v[:, :lanes - e]],
                    axis=1)
            acc = v if acc is None else acc + v
        # rows [g, g+R) of the slab (zero-size concat operands are
        # rejected by Mosaic -> guard the g=0 piece; g <= G-1 so the
        # tail piece is always non-empty)
        parts = ([jnp.zeros((g, lanes), dtype)] if g else []) \
            + [acc, jnp.zeros((G - g, lanes), dtype)]
        padded = jnp.concatenate(parts, axis=0)
        slab = padded if slab is None else slab + padded
    return slab


def _push_kernel(rel_ref, dxr_ref, wy0_ref, mass_ref, wx0_ref,
                 slab_ref, *, Q, R, G, DX, lanes):
    """Blocked-layout kernel: each grid step sees KB pre-transposed
    (Q, R, lanes) row-blocks."""
    KB = rel_ref.shape[1]
    for kb in range(KB):
        slab_ref[0, kb] = _push_block(
            rel_ref[0, kb], dxr_ref[0, kb], wy0_ref[0, kb],
            mass_ref[0, kb], wx0_ref[0, kb],
            Q=Q, R=R, G=G, DX=DX, lanes=lanes)


def _push_kernel_nat(rel_ref, dxr_ref, wy0_ref, mass_ref, wx0_ref,
                     slab_ref, *, Q, R, G, DX, lanes):
    """Natural-layout kernel: the BlockSpec index map slices the
    (1, Q, R, lanes) block straight out of the (B, Q, n2p, lanes)
    planes — no host-side transposes."""
    slab_ref[0, 0] = _push_block(
        rel_ref[0], dxr_ref[0], wy0_ref[0], mass_ref[0], wx0_ref[0],
        Q=Q, R=R, G=G, DX=DX, lanes=lanes)


@partial(jax.jit, static_argnames=("G", "dxmax", "R", "interpret", "KB"))
def pushforward_slabs(rel, dxr, wy0, mass, wx0, *, G, dxmax, R,
                      interpret=False, KB=None):
    """Run the slab kernel over a (B, nblk) grid. Inputs are
    (B, nblk, Q, R, lanes) preprocessed planes (complementary weights
    derive in-kernel); returns slabs (B, nblk, R+G, lanes) whose row 0
    is the block's base target row."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    B, nblk, Q, Rr, lanes = rel.shape
    assert Rr == R
    DX = 2 * dxmax + 2
    # KB row-blocks per grid step would amortize the fixed per-step cost
    # over the (B*nblk ~ 2465 on the Marmousi bench) grid — MEASURED A
    # WASH on chip (tools/bench_push_kb.py, live shapes: 3.13 / 3.21 /
    # 3.17 / 3.14 ms/call at KB=1/2/4/8 — the kernel is compute-bound,
    # not dispatch-bound, at this grid size). Default 1; the knob stays
    # for re-A/Bs at other shapes. Padded groups are all-zero-weight
    # (prep pads weights with 0) so they add nothing.
    if KB is None:
        KB = int(os.environ.get("DEVITO_FWI_TPU_BFM_KB", "1"))
    KB = max(1, min(KB, nblk))
    nblk_p = -(-nblk // KB) * KB
    if nblk_p != nblk:
        pads = [(0, 0), (0, nblk_p - nblk), (0, 0), (0, 0), (0, 0)]
        rel, dxr, wy0, mass = (jnp.pad(a, pads)
                               for a in (rel, dxr, wy0, mass))
        wx0 = jnp.pad(wx0, pads, constant_values=1)
    ispec = pl.BlockSpec((1, KB, Q, R, lanes),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_push_kernel, Q=Q, R=R, G=G, DX=DX, lanes=lanes),
        grid=(B, nblk_p // KB),
        in_specs=(ispec,) * 5,
        out_shape=jax.ShapeDtypeStruct((B, nblk_p, R + G, lanes),
                                       wy0.dtype),
        out_specs=pl.BlockSpec((1, KB, R + G, lanes),
                               lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rel, dxr, wy0, mass, wx0)
    return out[:, :nblk]


@partial(jax.jit, static_argnames=("G", "dxmax", "R", "interpret"))
def pushforward_slabs_nat(rel, dxr, wy0, mass, wx0, *, G, dxmax, R,
                          interpret=False):
    """Slab kernel over NATURAL-layout (B, Q, n2p, lanes) planes: the
    grid's BlockSpec index maps do the (shot, row-block) slicing that
    ``pushforward_slabs`` required six host-side pad/moveaxis/swapaxes
    re-layouts for (measured ~60 ms of a ~63 ms call on the live
    Marmousi state — the kernel itself is 3 ms). Same sums, same
    (B, nblk, R+G, lanes) slab output."""
    import jax.experimental.pallas as pl
    import jax.experimental.pallas.tpu as pltpu

    B, Q, n2p, lanes = rel.shape
    assert n2p % R == 0, (n2p, R)
    nblk = n2p // R
    DX = 2 * dxmax + 2
    ispec = pl.BlockSpec((1, Q, R, lanes),
                         lambda b, j: (b, 0, j, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_push_kernel_nat, Q=Q, R=R, G=G, DX=DX, lanes=lanes),
        grid=(B, nblk),
        in_specs=(ispec,) * 5,
        out_shape=jax.ShapeDtypeStruct((B, nblk, R + G, lanes),
                                       wy0.dtype),
        out_specs=pl.BlockSpec((1, 1, R + G, lanes),
                               lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(rel, dxr, wy0, mass, wx0)
