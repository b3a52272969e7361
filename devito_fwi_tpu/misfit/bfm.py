"""Back-and-forth method (BFM) for the 2-D quadratic-Wasserstein distance.

TPU-native re-implementation of the reference's C solver
(``misfit/QW2D/src/fot2d.c``) as a single jittable JAX function:

* DCT-based Poisson (H^-1) ascent steps (``fot2d.c:459-482``, DCT-II/III
  pair == orthonormal ``dctn``/``idctn`` with the negative-Laplace kernel
  of ``fot2d.c:4-17``).
* c-transform for quadratic cost as a separable discrete Legendre transform.
  The C code evaluates it with a sequential convex-hull scan
  (``fot2d.c:50-178``); that computes exactly ``max_j(s_i x_j - u[j])``, so
  here it is a dense vectorized max — O(n^2) instead of O(n), but
  embarrassingly parallel, which is the right trade on a TPU's VPU.
* mass-conserving density pushforward through the map ``grad(potential)``
  (``fot2d.c:294-457``). The C version supersamples each cell adaptively;
  data-dependent trip counts don't jit, so we use a fixed S x S
  supersampling (default 2, matching the C minimum) with the same
  stretch-cutoff cell rejection.
* adaptive step-size control and the final gradient
  ``(psi - <mu, psi>)/mean(f)`` (``fot2d.c:484-496, 606-656``).

Run it over a batch of shot gathers with ``jax.vmap`` — the TPU-native
replacement for the reference's MPI ``mpibfm2d`` binary.
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["bfm_jax", "bfm_jax_batch", "bfm"]


def _legendre_last(u, s, max_tmp_elems=2_000_000):
    """Discrete Legendre transform along the last axis:
    out[..., i] = max_j (s[i]*s[j] - u[..., j]).

    Evaluated in blocks of output rows: the naive broadcast materializes a
    (rows, n, n) intermediate — ~2 GB per Marmousi shot gather, which
    OOM-crashes the TPU worker under a vmap over shots. Blocking caps the
    intermediate at ~max_tmp_elems while XLA still fuses the max-reduce.

    Negative results (measured on the TPU chip, 8x(1357,101) Marmousi
    batch, full 10-iteration bfm_jax loop — do not re-attempt without a
    new end-to-end measurement):
    * raising max_tmp_elems to 32M (fewer, larger scan steps) is 10x
      faster for the transform standalone but changes the in-loop BFM
      time by <1% — the loop is pushforward-scatter-bound;
    * an exact O(n) convex fast path (slope-histogram argmax + cumsum)
      for the convexification transforms is 3x faster standalone but
      slower in-loop (TPU scatter/gather loses to the fused VPU
      compare-reduce once vmapped over shots)."""
    n = s.shape[0]
    rows = 1
    for d in u.shape[:-1]:
        rows *= d
    blk = max(8, min(n, max_tmp_elems // max(rows * n, 1)))
    nblk = -(-n // blk)
    pad = nblk * blk - n
    s_pad = jnp.pad(s, (0, pad))
    s_blocks = s_pad.reshape(nblk, blk)

    def body(carry, s_i):
        # (..., blk, n) intermediate
        val = s_i[:, None] * s[None, :] - u[..., None, :]
        return carry, jnp.max(val, axis=-1)

    _, out = jax.lax.scan(body, None, s_blocks)
    # out: (nblk, ..., blk) -> (..., nblk*blk)
    out = jnp.moveaxis(out, 0, -2).reshape(u.shape[:-1] + (nblk * blk,))
    return out[..., :n]


def _legendre_last_fast(u, s, max_tmp_elems=2_000_000, W=None, K=None):
    """Exact Legendre transform along the last axis: the Pallas banded
    kernel (VMEM-resident accumulator + in-kernel certificate,
    ``ops/pallas_bfm.legendre_banded``) with the full blocked transform
    as the lax.cond fallback. On the Marmousi W2 workload the transport
    displacement stays within ~18 rows, so the default bands hold
    throughout; inputs whose argmax leaves the band fail the
    certificate and take the exact full path. The certificate needs
    W >= K + max displacement. The kernel honors only
    ``s_i = (i + 0.5)/n`` — the BFM's own grid coordinates, which it
    recomputes internally — so a non-grid ``s`` is checked at runtime
    (endpoint equality in the caller's own f32 arithmetic) and folded
    into the certificate: wrong slopes fall back to the exact path,
    which does honor ``s``."""
    from ..ops import pallas_bfm as _pb

    n = s.shape[0]
    if W is None:
        W, K = (48, 16) if n >= 512 else (24, 8)
    if n <= 2 * W + 1 + n // K or u.dtype != jnp.float32 \
            or not _pb.available():
        return _legendre_last(u, s, max_tmp_elems)
    out_b, ok = _pb.legendre_banded(u.reshape(-1, n), W, K,
                                    interpret=_pb.env_interpret())
    s_ok = (s[0] == jnp.float32(0.5) / n) & \
           (s[-1] == (jnp.float32(n - 1) + 0.5) / n)
    out_b = out_b.reshape(u.shape)
    return jax.lax.cond(
        ok & s_ok, lambda a: a[0],
        lambda a: _legendre_last(a[1], s, max_tmp_elems), (out_b, u))


def _legendre_last_anchored(u, s, A=16, Wside=64,
                            max_tmp_elems=32_000_000):
    """Block-banded Legendre transform along the last axis with a
    sampled-argmax certificate; returns ``(out, ok)`` where ``out``
    equals ``_legendre_last(u, s)`` whenever ``ok`` — same f32
    formula on a window that provably contains every argmax, so the
    only deviation is compiler FMA contraction (the full transform's
    ``s_i*s_j - u_j`` fuses into an FMA; here the product table is
    hoisted), <= 1 ulp of ``s_i*s_j`` per element.

    Because ``s_i s_j - u_j`` is supermodular in (i, j) for
    nondecreasing ``s``, the (first and last) argmax over j is
    nondecreasing in i. So: (1) an anchor pass computes the exact
    full-range first/last argmax at every block edge i = k*A (cost
    ~1/A of the full transform); (2) for every output in block k the
    argmax is bracketed by [first(k*A), last((k+1)*A)]; the
    certificate checks each bracket fits the static window
    [k*A - Wside, k*A + A - 1 + Wside]; (3) the banded evaluation
    gives each A-output block one shared window of width
    W = 2*Wside + A, extracted by shifted RESHAPES of the padded row
    (no gather — TPU element gathers are slow), against a hoisted
    (nA, A, W) product table.

    This supersedes the diagonal-band XLA forms (negative results in
    ``_legendre_2d``): those shifted/re-read full-size operands per
    offset; here the band is materialized once (~W/A x input size)
    and the max fuses over it. Reference semantics: the c-transform
    hulls of fot2d.c:50-178."""
    n = s.shape[0]
    lead = u.shape[:-1]
    U = u.reshape(-1, n)
    Rws = U.shape[0]
    dtype = u.dtype
    nA = -(-n // A)
    npad = nA * A
    W = -(-(2 * Wside + A) // A) * A
    Wlo = Wside
    big = jnp.asarray(jnp.finfo(dtype).max / 8, dtype)

    # ---- anchor pass: exact first/last argmax at block edges ----
    m_idx = jnp.minimum(jnp.arange(nA + 1) * A, n - 1)
    s_anchor = s[m_idx]
    blk = max(1, min(nA + 1, max_tmp_elems // max(Rws * n, 1)))
    nblkA = -(-(nA + 1) // blk)
    sa = jnp.pad(s_anchor, (0, nblkA * blk - (nA + 1)))
    j_iota = jnp.arange(n, dtype=jnp.int32)

    def abody(carry, s_m):
        cand = s_m[:, None] * s[None, :] - U[:, None, :]
        vmax = jnp.max(cand, axis=-1, keepdims=True)
        hit = cand >= vmax
        first = jnp.min(jnp.where(hit, j_iota, n), axis=-1)
        last = jnp.max(jnp.where(hit, j_iota, -1), axis=-1)
        return carry, (first, last)

    _, (first, last) = jax.lax.scan(abody, None, sa.reshape(nblkA, blk))
    first = jnp.moveaxis(first, 0, 1).reshape(Rws, -1)[:, :nA + 1]
    last = jnp.moveaxis(last, 0, 1).reshape(Rws, -1)[:, :nA + 1]

    kA = jnp.arange(nA, dtype=jnp.int32) * A
    ok = jnp.all(first[:, :-1] >= kA[None, :] - Wlo) \
        & jnp.all(last[:, 1:] <= kA[None, :] + (W - Wlo - 1)) \
        & jnp.all(s[1:] >= s[:-1])        # monotone argmax needs sorted s

    # ---- banded evaluation: one shared window per A-output block ----
    # B[r, k, w] = U_pad[r, k*A + w] = U[r, k*A + w - Wlo] (big outside)
    P = npad + W - A
    U_pad = jnp.full((Rws, P), big, dtype).at[:, Wlo:Wlo + n].set(U)
    s_pad = jnp.zeros((P,), dtype).at[Wlo:Wlo + n].set(s)

    def band(x):
        pieces = [x[..., c * A:c * A + npad] for c in range(W // A)]
        pieces = [p.reshape(p.shape[:-1] + (nA, A)) for p in pieces]
        return jnp.concatenate(pieces, axis=-1)     # (..., nA, W)

    sB = band(s_pad)                                 # (nA, W)
    sO = jnp.pad(s, (0, npad - n)).reshape(nA, A)
    PK = sO[:, :, None] * sB[:, None, :]             # (nA, A, W)

    rb = max(1, min(Rws, max_tmp_elems // max(nA * A * W, 1)))
    nrb = -(-Rws // rb)
    U_blk = jnp.pad(U_pad, ((0, nrb * rb - Rws), (0, 0))
                    ).reshape(nrb, rb, P)

    def obody(carry, Ub):
        Bw = band(Ub)                                # (rb, nA, W)
        o = jnp.max(PK[None] - Bw[:, :, None, :], axis=-1)
        return carry, o                              # (rb, nA, A)

    _, out = jax.lax.scan(obody, None, U_blk)
    out = out.reshape(nrb * rb, npad)[:Rws, :n]
    return out.reshape(lead + (n,)), ok


def _legendre_last_anchor_fast(u, s, max_tmp_elems=32_000_000, A=None,
                               Wside=None):
    """Legendre transform via the anchored block-banded evaluation,
    with the full blocked transform as the certificate-failure
    fallback (``lax.cond`` — a real branch in the batch-native BFM).
    Exact up to FMA contraction (see ``_legendre_last_anchored``)."""
    n = s.shape[0]
    # anchor stride / window (env-tunable for on-chip A/Bs; any
    # setting stays EXACT — the certificate rejects brackets that
    # don't fit the window and falls back to the full transform).
    # The anchor pass costs ~1/A of the full transform and is the
    # measured hot part on live Marmousi state. Live 29-shot W2
    # objective A/B (tools/bench_anchor_a.py, one process):
    # A:W = 32:64 -> 2.195 s (10.5x L2) beats 16:64 (2.451, the
    # old default), 64:64 (2.444 — the wider padded band W=192
    # eats the anchor savings) and 32:48 (2.281); objective
    # rel-diff 7e-6 = FMA regrouping, certificates green.
    # A and Wside default independently so an explicit A with default
    # Wside (or vice versa) resolves rather than TypeError-ing.
    if A is None:
        A = int(os.environ.get("DEVITO_FWI_TPU_BFM_ANCHOR_A", "0")) or \
            ((32, 64) if n >= 512 else (8, 32))[0]
    if Wside is None:
        Wside = int(os.environ.get("DEVITO_FWI_TPU_BFM_ANCHOR_W", "0")) \
            or ((32, 64) if n >= 512 else (8, 32))[1]
    if n <= 2 * Wside + 2 * A:
        return _legendre_last(u, s, max_tmp_elems)
    out_b, ok = _legendre_last_anchored(u, s, A, Wside, max_tmp_elems)
    return jax.lax.cond(
        ok, lambda a: a[0],
        lambda a: _legendre_last(a[1], s, max_tmp_elems), (out_b, u))


def _legendre_2d(u, sx, sy, max_tmp_elems=2_000_000, banded=None):
    """2-D Legendre transform, separable (fot2d.c:151-173):
    out[..., iy, ix] = max_{jx, jy} (x_ix x_jx + y_iy y_jy - u[..., jy, jx]).
    Batch-polymorphic over leading dims. ``banded=True`` routes each 1-D
    pass through the certificate-guarded Pallas banded kernel
    (``ops/pallas_bfm.legendre_banded``; exact either way, falls back to
    the full transform off-TPU or when the certificate fails).

    Negative result (measured on the live iteration-5 Marmousi batch on
    chip — do not re-attempt in XLA without a new end-to-end number):
    the banded candidate in XLA LOSES to the plain blocked transform in
    both formulations tried — 82.7 ms/call as a lax.scan over offsets
    (per-step accumulator HBM round trips) and 71.1 ms/call as an
    unrolled maximum chain (2W+1 shifted re-reads of u), vs 44.7 ms for
    the full transform. The Pallas kernel's first cut also does not pay
    (~40 ms/pass incl. certificate vs 44.7 ms for BOTH passes of the
    full transform) and stays opt-in (DEVITO_FWI_TPU_BFM_LEGENDRE=
    banded). The ANCHORED block-banded XLA form
    (``_legendre_last_anchor_fast``) beats both — it materializes the
    band once per A-output block instead of per offset — and is the
    default (live on-chip A/B: W2 objective 2.58 s vs 4.34 s full)."""
    if banded is None:
        banded = os.environ.get("DEVITO_FWI_TPU_BFM_LEGENDRE", "anchor")
    if banded is True or banded == "banded":
        fn = _legendre_last_fast
    elif isinstance(banded, str) and banded.startswith("anchor"):
        # "anchor" or "anchor-a{A}-w{W}" (the suffix only exists to key
        # the trace cache on the ANCHOR_A/W env knobs — the values are
        # re-read from the env inside _legendre_last_anchor_fast)
        fn = _legendre_last_anchor_fast
    else:
        fn = _legendre_last
    a = fn(u, sx, max_tmp_elems)                        # max over jx
    b = fn(-jnp.swapaxes(a, -1, -2), sy,
           max_tmp_elems)                               # max over jy
    return jnp.swapaxes(b, -1, -2)


def _pushforward_map(dual, n1, n2):
    """Corner-grid map = central-difference gradient of the potential
    (fot2d.c:294-325).

    The C code evaluates bilinear interpolation of the cell-centered
    potential at corner positions offset by exactly one grid step, so
    every sample lands midway between two cell centers: the whole map is
    a FIXED four-point stencil with edge clamping. Written as slices of
    an edge-replicated pad instead of gathers (measured 89 ms -> ~3 ms
    per map at Marmousi gather size on TPU v5e; identical values,
    including the clamped corners/edges)."""
    Fp = jnp.pad(dual, 2, mode="edge")           # (n2+4, n1+4)
    # x-map: rows average (i-1, i)c, columns (j, j+1)c minus (j-2, j-1)c
    Rf = Fp[1:n2 + 2, :] + Fp[2:n2 + 3, :]
    xMap = 0.125 * n1 * (Rf[:, 2:n1 + 3] + Rf[:, 3:n1 + 4]
                         - Rf[:, 0:n1 + 1] - Rf[:, 1:n1 + 2])
    # y-map: columns average (j-1, j)c, rows (i, i+1)c minus (i-2, i-1)c
    Cf = Fp[:, 1:n1 + 2] + Fp[:, 2:n1 + 3]
    yMap = 0.125 * n2 * (Cf[2:n2 + 3, :] + Cf[3:n2 + 4, :]
                         - Cf[0:n2 + 1, :] - Cf[1:n2 + 2, :])
    return xMap, yMap


def _cell_corners_and_stretch(xMap, yMap):
    """Per-cell corner values of the pushforward map and the per-axis
    stretch (max corner-to-corner displacement within the cell) — shared
    by the sampling pass and the adaptive hi mask so the cutoff
    rejection and the hi/lo classification can never drift apart
    (fot2d.c:419-423)."""
    cx = (xMap[:-1, :-1], xMap[:-1, 1:], xMap[1:, :-1], xMap[1:, 1:])
    cy = (yMap[:-1, :-1], yMap[:-1, 1:], yMap[1:, :-1], yMap[1:, 1:])
    xStretch = jnp.maximum(jnp.abs(cx[1] - cx[0]), jnp.abs(cx[3] - cx[2]))
    yStretch = jnp.maximum(jnp.abs(cy[2] - cy[0]), jnp.abs(cy[3] - cy[1]))
    return cx, cy, xStretch, yStretch


def _pushforward_subsamples(mu, xMap, yMap, n1, n2, nsub, level_mask=None):
    """Per-subsample factored pushforward quantities, each stacked
    (nsub^2, n2, n1): target column pair ``xI``/``xO`` with x fraction
    ``xf``, target row pair ``yI``/``yO`` with y fraction ``yf``, and the
    per-subsample ``mass``. The bilinear scatter contribution of subsample
    ``q`` of cell (r, c) is the outer product of its x weight pair
    ``((1-xf), xf)`` and y weight pair ``((1-yf), yf)`` times ``mass`` —
    the factored form both the scatter and the banded-matmul pushforward
    expand (fot2d.c:373-457 with fixed sampling).

    ``level_mask`` (bool, cell grid) restricts the contribution to a
    subset of cells — the building block of the two-level adaptive mode,
    which splits cells between a coarse and a fine sampling pass."""
    (c00x, c01x, c10x, c11x), (c00y, c01y, c10y, c11y), xStretch, \
        yStretch = _cell_corners_and_stretch(xMap, yMap)
    xCut = (1.0 / n1) ** (1.0 / 3)
    yCut = (1.0 / n2) ** (1.0 / 3)
    keep = (mu > 0) & (xStretch < xCut) & (yStretch < yCut)
    if level_mask is not None:
        keep = keep & level_mask
    mass = jnp.where(keep, mu, 0.0) / (nsub * nsub)

    xi_l, xo_l, xf_l, yi_l, yo_l, yf_l = [], [], [], [], [], []
    for l in range(nsub):
        for k in range(nsub):
            a = (k + 0.5) / nsub
            b = (l + 0.5) / nsub
            xPoint = ((1 - b) * (1 - a) * c00x + (1 - b) * a * c01x +
                      b * (1 - a) * c10x + a * b * c11x)
            yPoint = ((1 - b) * (1 - a) * c00y + (1 - b) * a * c01y +
                      b * (1 - a) * c10y + a * b * c11y)
            X = xPoint * n1 - 0.5
            Y = yPoint * n2 - 0.5
            xIndex = jnp.floor(X).astype(jnp.int32)
            yIndex = jnp.floor(Y).astype(jnp.int32)
            xf_l.append(X - xIndex)
            yf_l.append(Y - yIndex)
            xi_l.append(jnp.clip(xIndex, 0, n1 - 1))
            xo_l.append(jnp.clip(xIndex + 1, 0, n1 - 1))
            yi_l.append(jnp.clip(yIndex, 0, n2 - 1))
            yo_l.append(jnp.clip(yIndex + 1, 0, n2 - 1))
    mass_q = jnp.broadcast_to(mass, (nsub * nsub,) + mass.shape)
    return (jnp.stack(xi_l), jnp.stack(xo_l), jnp.stack(xf_l),
            jnp.stack(yi_l), jnp.stack(yo_l), jnp.stack(yf_l),
            mass_q, keep)


def _adaptive_hi_mask(xMap, yMap, n1, n2):
    """Cells whose map stretch exceeds what the base 2x2 supersampling
    resolves, per the reference's adaptive sample-count rule
    ``xs = (int)(2*fmax(n*stretch, 1.0))`` (fot2d.c:422-423): a cell is
    "hi" iff that count exceeds 2 on either axis, i.e. stretch >= 1.5/n.
    Those cells are re-sampled at 4x4 — the two-level jittable stand-in
    for the reference's unbounded per-cell counts (data-dependent trip
    counts do not jit; measured effect of full adaptivity vs fixed
    nsub=2 on the oracle fixtures is 1.69e-4 -> 1.53e-4 grad parity, so
    two levels capture nearly all of it)."""
    _, _, xStretch, yStretch = _cell_corners_and_stretch(xMap, yMap)
    return (2.0 * n1 * xStretch >= 3.0) | (2.0 * n2 * yStretch >= 3.0)


def _pushforward_points(mu, xMap, yMap, n1, n2, nsub):
    """Stacked (P, n2, n1) destination indices / values of every
    (subsample, corner) contribution, P = 4*nsub^2, plus the active-cell
    mask — the expanded form the fused scatter consumes."""
    xI, xO, xf, yI, yO, yf, mass, keep = _pushforward_subsamples(
        mu, xMap, yMap, n1, n2, nsub)
    Y = jnp.concatenate([yI, yO, yI, yO])
    X = jnp.concatenate([xI, xI, xO, xO])
    V = jnp.concatenate([(1 - xf) * (1 - yf) * mass,
                         (1 - xf) * yf * mass,
                         xf * (1 - yf) * mass,
                         xf * yf * mass])
    return Y, X, V, keep


def _scatter_from_points(Y, X, V, n1, n2, dtype):
    """One fused scatter-add of all (subsample, corner) contributions:
    4*nsub^2 separate .at[].add calls serialize into as many scatter
    kernels on TPU; a single fused scatter is ~an order of magnitude
    cheaper and compiles to one kernel.

    Negative result (measured, Marmousi batch, full loop): flattening to
    1-D linear indices (`.at[y*n1+x].add`) looks better on a scatter
    microbenchmark with degenerate indices but is ~25% SLOWER in the
    real BFM loop (3.28 s vs 2.62 s per 8-shot batch) — keep the 2-D
    index form."""
    return jnp.zeros((n2, n1), dtype=dtype).at[
        Y.ravel(), X.ravel()].add(V.ravel())


def _sampling_pushforward(mu, xMap, yMap, n1, n2, nsub):
    """Push the density mu through the corner map, supersampling each
    cell nsub x nsub, via one fused scatter-add.

    Negative result (measured on the TPU chip, 8-shot Marmousi batch,
    full BFM loop — do not re-attempt without a new end-to-end
    measurement): a banded "windowed" pushforward (kept-cell
    displacements are structured — |dx| <~ 1 trace, |dy| ~ the data time
    shift — so the scatter collapses to O(dy_max) dense masked shifts
    with a lax.cond scatter fallback) is 3.3x SLOWER than the scatter
    (8.6 s vs 2.6 s): the per-offset compare-select over the 16
    contribution planes does not fuse under vmap and the materialized
    intermediates saturate HBM bandwidth. The scatter's ~130M updates/s
    stands as the fastest known formulation here."""
    dtype = mu.dtype
    pcount = n1 * n2
    Y, X, V, _ = _pushforward_points(mu, xMap, yMap, n1, n2, nsub)
    rho = _scatter_from_points(Y, X, V, n1, n2, dtype)
    total = jnp.sum(rho) / pcount
    return rho / jnp.where(total > 0, total, 1.0)


def _diag_fold(band):
    """Overlap-add fold of (B, R, G, n1) banded contributions into
    (B, R+G-1, n1): out[:, i+g, :] += band[:, i, g, :], as one
    pad/reshape skew (each row of the skewed (G, R+G-1) view is shifted
    one step from the previous) plus a single reduction — O(size) HBM
    traffic instead of G shifted full-size adds."""
    Bb, R, G, n1 = band.shape
    a = jnp.moveaxis(band, 3, 1)                    # (B, n1, R, G)
    a = jnp.swapaxes(a, 2, 3)                       # (B, n1, G, R)
    a = jnp.pad(a, ((0, 0), (0, 0), (0, 0), (0, G)))
    a = a.reshape(Bb, n1, G * (R + G))[:, :, :G * (R + G - 1)]
    a = a.reshape(Bb, n1, G, R + G - 1).sum(axis=2)
    return jnp.moveaxis(a, 1, 2)                    # (B, R+G-1, n1)


def _col_fold(band, Cb, width):
    """Overlap-add of per-column-block windows into full rows:
    out[..., g, j*Cb + o] += band[..., j, g, o], window width Wd <= 2*Cb.
    Blocks overlap only with their neighbors, so even- and odd-indexed
    blocks each land disjointly — pad every window to 2*Cb, reshape each
    parity class into a contiguous row, and add the odd class at offset
    Cb: two reshapes + one add, O(size) HBM traffic."""
    *lead, nbc, G, Wd = band.shape
    nbcp = nbc + (nbc % 2)
    band = jnp.pad(band, tuple((0, 0) for _ in lead)
                   + ((0, nbcp - nbc), (0, 0), (0, 2 * Cb - Wd)))
    b = jnp.moveaxis(band, -3, -2)              # (..., G, nbcp, 2Cb)
    half = nbcp // 2
    ev = b[..., 0::2, :].reshape(*lead, G, half * 2 * Cb)
    od = b[..., 1::2, :].reshape(*lead, G, half * 2 * Cb)

    def place(x, off):
        w = x.shape[-1]
        x = jnp.pad(x, tuple((0, 0) for _ in range(x.ndim - 1))
                    + ((off, max(0, width - off - w)),))
        return x[..., :width]

    return place(ev, 0) + place(od, Cb)


def _local_banded_pushforward_batch(subs, n1, n2, G_local=32, dxmax=7,
                                    margin=128, row_block=32,
                                    col_block=32):
    """Local-base banded-matmul pushforward.

    The global-band form one-hots dy over a window wide enough for the
    WORST displacement anywhere in the batch — on late-time gathers the
    shift can reach tens of rows, blowing up both the W operand and the
    matmul, and forcing the tiered-width dispatch. But the transport map
    is smooth: over one 32-row block of one shot, dy varies by only a
    few rows even when its absolute value is large. So: per (shot,
    row-block), re-base dy at the block's runtime minimum and one-hot
    only the LOCAL variation (``G_local`` wide, static); the absolute
    base becomes a runtime row offset of the folded block, applied with
    scalar ``dynamic_update_slice`` per shot. Arbitrary global shifts up
    to ``margin`` rows ride the offset for free — no tiers, and the
    exact-scatter fallback triggers only when the LOCAL variation
    exceeds ``G_local`` (callers guard with ``_local_band_ok``).
    Same additions as the scatter, in a different order."""
    xI, xO, xf, yI, yO, yf, mass = subs
    B, Q, n2s, n1s = mass.shape
    G = G_local
    R = row_block
    Cb = col_block
    Wd = Cb + 2 * dxmax + 2
    assert Wd <= 2 * Cb, (Wd, Cb)
    n2p = -(-n2s // R) * R
    nbc = -(-n1s // Cb)
    n1p = nbc * Cb
    pad = ((0, 0), (0, 0), (0, n2p - n2s), (0, n1p - n1s))

    def prep(a):
        # (B, Q, n2s, n1s) -> (nblk, B, R, nbc, Q*Cb) scan slices
        a = jnp.pad(a, pad)
        a = jnp.moveaxis(a, 1, 2)                   # (B, n2p, Q, n1p)
        a = a.reshape(B, n2p // R, R, Q, nbc, Cb)
        a = jnp.moveaxis(a, 4, 3)
        a = a.reshape(B, n2p // R, R, nbc, Q * Cb)
        return jnp.moveaxis(a, 1, 0)

    r_glob = jnp.arange(n2p).reshape(n2p // R, 1, R, 1, 1)
    base_c = (jnp.arange(nbc) * Cb).reshape(1, 1, 1, nbc, 1)
    mb = prep(mass)
    act = mb > 0
    dyI = jnp.where(act, prep(yI) - r_glob, margin)
    dyO = jnp.where(act, prep(yO) - r_glob, margin)
    # per-(block, shot) runtime base: min active dy, clipped to the
    # fold margin (blocks with no active cells base at 0)
    bases = jnp.min(jnp.minimum(dyI, margin).reshape(
        n2p // R, B, -1), axis=-1)
    bases = jnp.clip(jnp.where(bases == margin, 0, bases),
                     -margin, margin - G)            # (nblk, B)
    oI = prep(xI) - base_c + dxmax
    oO = prep(xO) - base_c + dxmax
    xs = (oI, oO, prep(xf.astype(mass.dtype)), dyI, dyO,
          prep(yf.astype(mass.dtype)), mb, bases)
    gvals = jnp.arange(G, dtype=jnp.int32)
    wvals = jnp.arange(Wd, dtype=jnp.int32)
    width = n1p + Wd

    def step(carry, xs_i):
        rho_acc, r0 = carry
        oIb, oOb, xfb, dyIb, dyOb, yfb, mbb, base_b = xs_i
        relI = dyIb - base_b[:, None, None, None]
        relO = dyOb - base_b[:, None, None, None]
        # W: (B, R, nbc, S, G) one-hot over LOCAL dy, bilinear y weights
        W = ((relI[..., None] == gvals) * (1 - yfb)[..., None]
             + (relO[..., None] == gvals) * yfb[..., None])
        # X: (B, R, nbc, S, Wd) one-hot over the local column window
        X = ((oIb[..., None] == wvals) * (1 - xfb)[..., None]
             + (oOb[..., None] == wvals) * xfb[..., None]
             ) * mbb[..., None]
        band = jax.lax.dot_general(
            W, X, (((3,), (3,)), ((0, 1, 2), (0, 1, 2))),
            precision=jax.lax.Precision.HIGHEST)    # (B, R, nbc, G, Wd)
        rows = _col_fold(band, Cb, width)           # (B, R, G, width)
        blk = _diag_fold(rows)                      # (B, R+G-1, width)

        def place(b, acc):
            off = r0 + base_b[b] + margin
            cur = jax.lax.dynamic_slice(
                acc, (b, off, 0), (1, R + G - 1, width))
            return jax.lax.dynamic_update_slice(
                acc, cur + blk[b][None], (b, off, 0))

        rho_acc = jax.lax.fori_loop(0, B, place, rho_acc)
        return (rho_acc, r0 + R), None

    rho0 = jnp.zeros((B, n2p + 2 * margin + G, width), mass.dtype)
    (rho_pad, _), _ = jax.lax.scan(step, (rho0, 0), xs)
    return rho_pad[:, margin:margin + n2, dxmax:dxmax + n1]


def _local_band_ok(subs, G_local=32, dxmax=7, margin=128, row_block=32):
    """True iff every (shot, row-block)'s ACTIVE dy values fit a window
    of ``G_local`` rows above the block minimum, with the block base
    within the fold margin — the validity condition of
    ``_local_banded_pushforward_batch`` (dx checked separately)."""
    _, _, _, yI, yO, _, mass = subs
    B, Q, n2s, n1s = mass.shape
    R = row_block
    n2p = -(-n2s // R) * R
    act = mass > 0
    r = jnp.arange(n2s).reshape(1, 1, n2s, 1)
    dyI = jnp.where(act, yI - r, margin)
    dyO = jnp.where(act, yO - r, -margin)

    def blocks(a, fill):
        a = jnp.pad(a, ((0, 0), (0, 0), (0, n2p - n2s), (0, 0)),
                    constant_values=fill)
        a = jnp.moveaxis(a, 1, 2).reshape(B, n2p // R, R, Q, n1s)
        return a

    lo = jnp.min(blocks(dyI, margin), axis=(2, 3, 4))    # (B, nblk)
    hi = jnp.max(blocks(dyO, -margin), axis=(2, 3, 4))
    # emptiness from the activity mask itself — an active cell whose dy
    # equals the inactive-cell fill value (+-margin) must NOT read as
    # empty, or the banded path would silently drop its mass
    empty = ~jnp.any(blocks(act, False), axis=(2, 3, 4))
    lo_c = jnp.where(empty, 0, lo)
    ok_width = jnp.where(empty, True, hi - lo_c <= G_local - 1)
    ok_base = (lo_c >= -margin) & (lo_c <= margin - G_local)
    return jnp.all(ok_width & ok_base)


def _dx_inband_predicate(subs, dxmax):
    """True iff every nonzero-mass subsample's column displacements fit
    the [-dxmax, dxmax+1] band, across the whole batch."""
    xI, xO, _, _, _, _, mass = subs
    n1s = mass.shape[3]
    c = jnp.arange(n1s).reshape(1, 1, 1, n1s)
    act = mass > 0
    dI = jnp.where(act, xI - c, 0)
    dO = jnp.where(act, xO - c, 0)
    return (jnp.min(dI) >= -dxmax) & (jnp.max(dO) <= dxmax + 1)


def _scatter_pushforward_batch(subs, n1, n2, chunk=8):
    """Fallback exact scatter over the batch, serialized in chunks of
    ``chunk`` shots (large scatter vmap widths have faulted the TPU
    worker and degrade scatter throughput)."""
    xI, xO, xf, yI, yO, yf, mass = subs
    B = mass.shape[0]
    chunk = min(chunk, B)
    Y = jnp.concatenate([yI, yO, yI, yO], axis=1)
    X = jnp.concatenate([xI, xI, xO, xO], axis=1)
    V = jnp.concatenate([(1 - xf) * (1 - yf) * mass,
                         (1 - xf) * yf * mass,
                         xf * (1 - yf) * mass,
                         xf * yf * mass], axis=1)
    nb = -(-B // chunk)
    padb = ((0, nb * chunk - B),) + ((0, 0),) * 3
    Yp = jnp.pad(Y, padb).reshape(nb, chunk, *Y.shape[1:])
    Xp = jnp.pad(X, padb).reshape(nb, chunk, *X.shape[1:])
    Vp = jnp.pad(V, padb).reshape(nb, chunk, *V.shape[1:])

    def one_chunk(args):
        Yc, Xc, Vc = args
        return jax.vmap(
            lambda y, x, v: _scatter_from_points(y, x, v, n1, n2,
                                                 mass.dtype))(Yc, Xc, Vc)

    rho = jax.lax.map(one_chunk, (Yp, Xp, Vp))
    return rho.reshape(nb * chunk, n2, n1)[:B]


def _pallas_push(subs, n1, n2, G, dxmax, margin, R, fold="loop",
                 prep_mode=None):
    """Pushforward through the Pallas slab kernel
    (``ops/pallas_bfm.pushforward_slabs[_nat]``): preprocess the
    subsample planes into block-rebased (rel dy, dx, weight) form, run
    the kernel over a (B, nblk) grid, and overlap-add the slabs at their
    runtime base offsets. Exact same additions as the scatter; valid
    when ``_local_band_ok(subs, G, row_block=R)`` and the dx predicate
    hold (caller guards).

    ``prep_mode`` (env ``DEVITO_FWI_TPU_BFM_PREP``): "nat" (default)
    hands the kernel naturally-laid-out (B, Q, n2p, lanes) planes and
    lets the BlockSpec index maps do the row-block slicing; "blocked"
    is the original six-re-layout host-side prep (measured ~60 ms of a
    ~63 ms call on the live Marmousi state — kept for A/Bs)."""
    from ..ops import pallas_bfm as _pb

    if prep_mode is None:
        prep_mode = os.environ.get("DEVITO_FWI_TPU_BFM_PREP", "nat")
    xI, xO, xf, yI, yO, yf, mass = subs
    B, Q, n2s, n1s = mass.shape
    # the kernel writes source column c at output column c + dx + dxmax
    # (targets up to n1-1+dxmax after the +dxmax rebase), and the final
    # crop reads [dxmax : dxmax+n1] — lanes must cover n1s + dxmax, not
    # just n1s, or right-edge mass truncates (and the crop under-sizes
    # whenever n1 % 128 is 0 or > 128 - dxmax)
    lanes = -(-(n1s + dxmax) // 128) * 128
    nblk = -(-n2s // R)
    n2p = nblk * R
    dtype = mass.dtype
    pad = ((0, 0), (0, 0), (0, n2p - n2s), (0, lanes - n1s))

    r = jnp.arange(n2s).reshape(1, 1, n2s, 1)
    c = jnp.arange(n1s).reshape(1, 1, 1, n1s)
    act = mass > 0
    dy = jnp.where(act, yI - r, margin)
    # fold clipped targets (yO == yI / xO == xI at grid edges) into the
    # base weight so the kernel's +1 placement stays uniform
    # complementary weights (wy1 = yf*mass, wx1 = xf) derive IN the
    # kernel as mass - wy0 / 1 - wx0 (exact for clipped cells, <=1 ulp
    # otherwise) — two fewer full-size planes through HBM
    yclip = yO == yI
    wy0 = jnp.where(yclip, mass, (1 - yf) * mass)
    xclip = xO == xI
    wx0 = jnp.where(xclip, jnp.ones((), dtype), (1 - xf))
    dxr = jnp.clip(xI - c + dxmax, 0, 2 * dxmax + 1)

    if prep_mode == "nat":
        # pads only (contiguous copies that XLA fuses with the weight
        # elementwise math) — the kernel's index maps do the blocking
        def prep(a, fill=0):
            return jnp.pad(a, pad, constant_values=fill)

        dy_p = prep(dy, margin)                      # (B, Q, n2p, lanes)
        bases = jnp.min(dy_p.reshape(B, Q, nblk, R * lanes),
                        axis=(1, 3))
        bases = jnp.clip(jnp.where(bases == margin, 0, bases),
                         -margin, margin - G)        # (B, nblk)
        base_rows = jnp.repeat(bases, R, axis=1)     # (B, n2p)
        rel = (dy_p - base_rows[:, None, :, None]).astype(jnp.int32)
        slabs = _pb.pushforward_slabs_nat(
            rel, prep(dxr).astype(jnp.int32), prep(wy0).astype(dtype),
            prep(mass).astype(dtype), prep(wx0, 1).astype(dtype),
            G=G, dxmax=dxmax, R=R,
            interpret=_pb.env_interpret())           # (B, nblk, R+G, lanes)
    else:
        def prep(a, fill=0):
            a = jnp.pad(a, pad, constant_values=fill)
            a = jnp.moveaxis(a, 1, 2).reshape(B, nblk, R, Q, lanes)
            return jnp.swapaxes(a, 2, 3)            # (B, nblk, Q, R, lanes)

        dy_b = prep(dy, margin)
        bases = jnp.min(dy_b.reshape(B, nblk, -1), axis=-1)
        bases = jnp.clip(jnp.where(bases == margin, 0, bases),
                         -margin, margin - G)        # (B, nblk)
        rel = (dy_b - bases[:, :, None, None, None]).astype(jnp.int32)
        slabs = _pb.pushforward_slabs(
            rel, prep(dxr).astype(jnp.int32), prep(wy0).astype(dtype),
            prep(mass).astype(dtype), prep(wx0, 1).astype(dtype),
            G=G, dxmax=dxmax, R=R,
            interpret=_pb.env_interpret())           # (B, nblk, R+G, lanes)

    if fold == "vec":
        return _fold_slabs_vec(slabs, bases, n1, n2, G=G, dxmax=dxmax,
                               margin=margin, R=R)

    rho0 = jnp.zeros((B, n2p + 2 * margin + G, lanes), dtype)

    def place(k, acc):
        b = k // nblk
        j = k - b * nblk
        off = j * R + bases[b, j] + margin
        cur = jax.lax.dynamic_slice(acc, (b, off, 0),
                                    (1, R + G, lanes))
        return jax.lax.dynamic_update_slice(
            acc, cur + jax.lax.dynamic_slice(
                slabs, (b, j, 0, 0), (1, 1, R + G, lanes))[0],
            (b, off, 0))

    rho = jax.lax.fori_loop(0, B * nblk, place, rho0)
    return rho[:, margin:margin + n2, dxmax:dxmax + n1]


def _fold_slabs_vec(slabs, bases, n1, n2, *, G, dxmax, margin, R):
    """Overlap-add of per-block slabs at their runtime base offsets,
    vectorized: rho[b, j*R + bases[b,j] + margin + t] += slabs[b,j,t].
    The runtime part of the offset (``shift = bases + margin``, bounded
    by the fold margin) becomes a per-block row GATHER into an S-row
    window, the static ``j*R`` part a skewed-reshape diagonal fold over
    whole R-row blocks (``_diag_fold``); same sums per output row.

    NEGATIVE RESULT (live on-chip A/B, 29-shot Marmousi state): 83.0 vs
    50.1 ms/pushforward against the ``fori_loop`` fold — the S-row
    (S ~ 17*R) gather window reads the slab stack ~C/2 times over,
    while the "serial" loop is only nblk (~85) iterations because the
    dynamic_update_slices are batch-vectorized over shots. Kept as
    DEVITO_FWI_TPU_BFM_FOLD=vec for re-A/Bs on other geometries."""
    B, nblk, S0, lanes = slabs.shape
    assert S0 == R + G
    dtype = slabs.dtype
    # window rows: runtime shift in [0, 2*margin - G] plus the slab's
    # S0, rounded up to whole R-blocks for the diagonal fold
    C = -(-(2 * margin - G + S0) // R)
    S = C * R
    shift = (bases + margin).astype(jnp.int32)          # (B, nblk)
    t = jnp.arange(S, dtype=jnp.int32)
    idx = t[None, None, :] - shift[:, :, None]          # (B, nblk, S)
    valid = (idx >= 0) & (idx < S0)
    rolled = jnp.take_along_axis(
        slabs, jnp.clip(idx, 0, S0 - 1)[..., None], axis=2)
    rolled = jnp.where(valid[..., None], rolled, jnp.zeros((), dtype))
    # block j's window covers global row blocks k = j..j+C-1; fold the
    # (nblk, C) diagonals with the same skew _diag_fold uses
    x = rolled.reshape(B, nblk, C, R * lanes)
    rows = _diag_fold(x).reshape(B, (nblk + C - 1) * R, lanes)
    # global row of slab row 0 at shift 0 is 0 == rho row 0 of the loop
    # form; the loop form's crop starts at `margin`
    need = margin + n2
    if rows.shape[1] < need:
        rows = jnp.pad(rows, ((0, 0), (0, need - rows.shape[1]), (0, 0)))
    return rows[:, margin:margin + n2, dxmax:dxmax + n1]


def _dispatch_push(subs, n1, n2, dmax, push_backend=None):
    """Pushforward dispatch, cheapest first:

    1. Pallas slab kernel (``_pallas_push``) when every (shot,
       16-row-block)'s LOCAL dy variation fits its G=24 window and |dx|
       is narrow — both hold on the measured FWI workloads (|dx| <= 6
       and mean local dy width ~3 on the live Marmousi state; the local
       window absorbs the oracle fixtures' +-69-row ABSOLUTE shifts);
    2. the XLA local-base banded matmul with a wider G=32 window over
       32-row blocks;
    3. the exact scatter.

    All branches compute the exact same sums; the predicates only pick
    the cheapest valid ordering. ``dmax`` bounds the absolute row shift
    the banded paths' fold margins accommodate.

    Note: the DEVITO_FWI_TPU_BFM_PREP toggle is honored only when
    ``push_backend`` came through :func:`resolve_backends` (which
    appends the ``-blockedprep`` suffix). A caller passing an explicit
    base string like ``"pallas"`` gets the "nat" prep layout regardless
    of the env var — pass the resolved string to opt in."""
    from ..ops import pallas_bfm as _pb

    dxmax = 7
    dx_ok = _dx_inband_predicate(subs, dxmax)
    margin = dmax + 1
    xla_ok = dx_ok & _local_band_ok(subs, G_local=32, dxmax=dxmax,
                                    margin=margin)

    def xla_or_scatter(s):
        return jax.lax.cond(
            xla_ok,
            lambda t: _local_banded_pushforward_batch(
                t, n1, n2, G_local=32, dxmax=dxmax, margin=margin),
            lambda t: _scatter_pushforward_batch(t, n1, n2), s)

    if push_backend is None:
        push_backend = resolve_backends()[0]
    prep_mode = "blocked" if push_backend.endswith("-blockedprep") \
        else "nat"
    base_backend = push_backend.replace("-blockedprep", "")
    fold = "vec" if base_backend == "pallas-vecfold" else "loop"
    is_pallas = base_backend in ("pallas", "pallas-vecfold")
    # Q <= 8: the slab kernel python-unrolls a G*DX*Q multiply-add chain
    # with Q*DX hoisted xsel buffers — at the adaptive hi pass's Q = 16
    # that is ~256 live (R, lanes) temps, the exact scoped-vmem OOM
    # pattern CLAUDE.md documents; route wide-Q batches to the XLA paths
    if not (is_pallas and _pb.available()
            and subs[2].dtype == jnp.float32 and subs[2].shape[1] <= 8):
        return xla_or_scatter(subs)
    pallas_ok = dx_ok & _local_band_ok(subs, G_local=24, dxmax=dxmax,
                                       margin=margin, row_block=16)
    return jax.lax.cond(
        pallas_ok,
        lambda s: _pallas_push(s, n1, n2, G=24, dxmax=dxmax,
                               margin=margin, R=16, fold=fold,
                               prep_mode=prep_mode),
        xla_or_scatter, subs)


def _sampling_pushforward_batch(mu_b, xMap_b, yMap_b, n1, n2, nsub, dmax,
                                push_backend=None):
    """Batch pushforward: banded matmul when every displacement is in
    band (the common FWI case), exact scatter fallback otherwise. The
    predicate is batch-wide so ``lax.cond`` stays a real branch — under a
    per-shot vmap it would become a select and run both sides.

    ``nsub == 0`` selects the two-level adaptive mode (the jittable
    analog of the reference's per-cell adaptive supersampling,
    fot2d.c:419-423): low-stretch cells are sampled 2x2 and high-stretch
    cells 4x4, the two passes concatenated along the subsample axis so
    the banded/scatter kernels run once over Q = 4 + 16 subsamples."""
    dtype = mu_b.dtype
    pcount = n1 * n2
    if nsub == 0:
        hi = jax.vmap(lambda xm, ym: _adaptive_hi_mask(xm, ym, n1, n2))(
            xMap_b, yMap_b)
        lo_out = jax.vmap(lambda m, xm, ym, h: _pushforward_subsamples(
            m, xm, ym, n1, n2, 2, level_mask=~h))(
            mu_b, xMap_b, yMap_b, hi)
        rho = _dispatch_push(lo_out[:7], n1, n2, dmax, push_backend)

        # the 4x4 pass covers only high-stretch cells — usually none
        # (its 16 subsample planes would quadruple the banded-matmul
        # work), so it runs behind a batch-wide cond
        def hi_pass(args):
            mu, xm, ym, h = args
            hi_out = jax.vmap(lambda m, x, y, hh: _pushforward_subsamples(
                m, x, y, n1, n2, 4, level_mask=hh))(mu, xm, ym, h)
            return _dispatch_push(hi_out[:7], n1, n2, dmax, push_backend)

        rho = rho + jax.lax.cond(
            jnp.any(hi), hi_pass,
            lambda args: jnp.zeros_like(rho),
            (mu_b, xMap_b, yMap_b, hi))
        total = jnp.sum(rho, axis=(1, 2), keepdims=True) / pcount
        return rho / jnp.where(total > 0, total, 1.0).astype(dtype)
    out = jax.vmap(lambda m, xm, ym: _pushforward_subsamples(
        m, xm, ym, n1, n2, nsub))(mu_b, xMap_b, yMap_b)
    rho = _dispatch_push(out[:7], n1, n2, dmax, push_backend)
    total = jnp.sum(rho, axis=(1, 2), keepdims=True) / pcount
    return rho / jnp.where(total > 0, total, 1.0).astype(dtype)


def bfm_jax_batch(f_b, g_b, num_steps=10, step_scale=1.0, nsub=2,
                  dmax=127, max_tmp_elems=32_000_000, push_backend=None,
                  legendre_banded=None, return_carry=False):
    """Batched quadratic-Wasserstein distance and gradient d W2 / d f of
    two (B, n2, n1) stacks of 2-D densities (rows = time/y, cols =
    traces/x). Returns per-shot ``(losses (B,), grads (B, n2, n1))``.

    Mirrors ``fotGradient2d`` (``fot2d.c:606-656``) per shot: inputs are
    normalized to unit mean, the BFM iteration alternates H^-1 ascent +
    convexification + pushforward on each potential, and the gradient is
    ``(psi - <mu, psi>/pcount)/mean(f)``.

    Batch-native rather than ``vmap`` of a per-shot solver so the
    pushforward can pick the banded-matmul path with a single batch-wide
    ``lax.cond`` (under vmap the cond would become a select and run the
    slow scatter unconditionally). ``dmax`` bounds the ABSOLUTE row
    displacement the local-base banded pushforward's fold margin
    accommodates (the banded fast path needs only the per-row-block
    LOCAL dy variation to be narrow — see
    ``_local_banded_pushforward_batch``); batches beyond it fall back
    to the exact scatter. ``nsub=0`` selects two-level adaptive supersampling
    (see ``_sampling_pushforward_batch``). ``max_tmp_elems`` bounds the
    Legendre transform's blocked intermediate (the old in-loop default
    of 2M was tuned when the scatter dominated; 32M is ~10x faster
    standalone).

    ``push_backend`` ("xla"/"pallas") and ``legendre_banded`` select the
    pushforward / Legendre implementations; None reads
    DEVITO_FWI_TPU_BFM_PUSH / DEVITO_FWI_TPU_BFM_LEGENDRE **here, at
    call time, outside jit** — they are static arguments of the jitted
    core, so toggling the env vars between calls retraces instead of
    silently hitting the stale compiled variant (the footgun that would
    otherwise invalidate same-process A/B timings)."""
    push_backend, legendre_banded = resolve_backends(push_backend,
                                                     legendre_banded)
    return _bfm_jax_batch_core(f_b, g_b, num_steps, step_scale, nsub,
                               dmax, max_tmp_elems, push_backend,
                               legendre_banded, bool(return_carry))


def resolve_backends(push_backend=None, legendre_banded=None):
    """Resolve the (pushforward, Legendre) backend selection — env vars
    consulted HERE, at call time, never inside a trace. Callers that jit
    around the BFM must run this outside their jit and pass the result
    as static args (see ``fwi._misfit_config_key``, which folds this
    into the fused objective's trace key)."""
    if push_backend is None:
        push_backend = os.environ.get("DEVITO_FWI_TPU_BFM_PUSH", "pallas")
    if push_backend == "pallas":
        # fold variant is part of the static backend key so same-process
        # A/B toggles retrace instead of reusing the stale trace.
        # Default "loop": the vectorized diagonal fold ("vec") LOST the
        # live on-chip A/B (83.0 vs 50.1 ms/pushforward on the 29-shot
        # Marmousi state — the runtime-shift row gather reads the slab
        # stack ~C/2 times over; the serial fori of
        # dynamic_update_slices is only ~85 iterations because it is
        # batch-vectorized over shots). Kept as an opt-in for re-A/Bs.
        fold = os.environ.get("DEVITO_FWI_TPU_BFM_FOLD", "loop")
        if fold == "vec":
            push_backend = "pallas-vecfold"
    if push_backend.startswith("pallas"):
        # prep layout is likewise trace-time state: "nat" (default)
        # hands the kernel natural-layout planes and lets the BlockSpec
        # index maps do the blocking; "blocked" is the original
        # six-re-layout host prep, kept for A/Bs.
        if (os.environ.get("DEVITO_FWI_TPU_BFM_PREP", "nat") == "blocked"
                and not push_backend.endswith("-blockedprep")):
            # idempotent: an already-resolved '...-blockedprep' string
            # passed back through (qWasserstein.jax_batch ->
            # bfm_jax_batch double-resolves) must not double the suffix.
            push_backend += "-blockedprep"
    if legendre_banded is None:
        # "anchor" (the XLA anchored block-banded transform,
        # _legendre_last_anchor_fast) won the live on-chip A/B: the
        # 29-shot SMARMN W2 gradient objective runs 2.58 s vs 4.34 s
        # with the full transform (10.7x vs 18.1x L2,
        # tools/bench_w2_variants.py) — certificate-guarded, so
        # out-of-band states fall back to the exact full transform
        legendre_banded = os.environ.get("DEVITO_FWI_TPU_BFM_LEGENDRE",
                                         "anchor")
    if legendre_banded is True:
        legendre_banded = "banded"
    elif legendre_banded is False:
        legendre_banded = "full"
    legendre_banded = str(legendre_banded)
    if legendre_banded == "anchor":
        # fold the anchor-stride knobs into the static key so toggling
        # DEVITO_FWI_TPU_BFM_ANCHOR_A/W between calls retraces
        aa = os.environ.get("DEVITO_FWI_TPU_BFM_ANCHOR_A")
        ww = os.environ.get("DEVITO_FWI_TPU_BFM_ANCHOR_W")
        if aa or ww:
            legendre_banded = "anchor-a%s-w%s" % (aa or "0", ww or "0")
    return push_backend, legendre_banded


@partial(jax.jit, static_argnames=("num_steps", "nsub", "dmax",
                                   "max_tmp_elems", "push_backend",
                                   "legendre_banded", "return_carry"))
def _bfm_jax_batch_core(f_b, g_b, num_steps, step_scale, nsub, dmax,
                        max_tmp_elems, push_backend, legendre_banded,
                        return_carry=False):
    """Jitted body of ``bfm_jax_batch`` (see its docstring).
    ``return_carry=True`` additionally returns the final BFM loop carry
    ``(phi, dual, rho, sigma, wd)`` plus ``(mu, nu)`` — the live-state
    hook tools/profile_w2_components.py replays components on, kept
    INSIDE the solver so it cannot drift from the production loop (a
    hand-rolled replay once omitted the adaptive sigma updates)."""
    dtype = f_b.dtype
    B, n2, n1 = f_b.shape
    pcount = n1 * n2

    def psum(x):
        return jnp.sum(x, axis=(-2, -1))

    sum1 = psum(f_b)[:, None, None] / pcount
    sum2 = psum(g_b)[:, None, None] / pcount
    mu = jnp.where(sum1 > 0, f_b / sum1, 0.0)
    nu = jnp.where(sum2 > 0, g_b / sum2, 0.0)

    # a muted/dead shot (all-zero gather) must not poison the batch:
    # unguarded, sigma0 = step_scale/0 = inf and that shot's loss is NaN
    # through the summed objective (the gradient was already guarded by
    # the sum1 > 0 select below)
    maxd = jnp.maximum(jnp.max(mu, axis=(1, 2)), jnp.max(nu, axis=(1, 2)))
    live = maxd > 0
    sigma0 = jnp.where(live, step_scale / jnp.where(live, maxd, 1.0), 1.0)

    xs = (jnp.arange(n1, dtype=dtype) + 0.5) / n1
    ys = (jnp.arange(n2, dtype=dtype) + 0.5) / n2
    quad = 0.5 * (xs[None, :] ** 2 + ys[:, None] ** 2)
    quad_b = jnp.broadcast_to(quad, (B, n2, n1))

    # negative-Laplace DCT kernel (fot2d.c:4-17)
    kx = 2.0 * n1 * n1 * (1 - jnp.cos(jnp.pi * jnp.arange(n1) / n1))
    ky = 2.0 * n2 * n2 * (1 - jnp.cos(jnp.pi * jnp.arange(n2) / n2))
    kernel = (kx[None, :] + ky[:, None]).astype(dtype)
    kernel = kernel.at[0, 0].set(1.0)

    # orthonormal DCT-II/III as cosine-matrix matmuls: jax.scipy.fft.dctn
    # is UNIMPLEMENTED on some TPU runtimes (it crashed the axon worker),
    # while two MXU matmuls at precision='highest' run the whole batch in
    # ~30 ms with ~1e-6 roundtrip error
    def _dct_mat(n):
        k = jnp.arange(n, dtype=dtype)[:, None]
        i = jnp.arange(n, dtype=dtype)[None, :]
        C = jnp.sqrt(2.0 / n) * jnp.cos(jnp.pi * (i + 0.5) * k / n)
        return C.at[0].mul(jnp.sqrt(0.5).astype(dtype))
    C1 = _dct_mat(n1)
    C2 = _dct_mat(n2)

    def dct2(x):
        y = jnp.matmul(C2, x, precision="highest")
        return jnp.matmul(y, C1.T, precision="highest")

    def idct2(x):
        y = jnp.matmul(C2.T, x, precision="highest")
        return jnp.matmul(y, C1, precision="highest")

    def update_potential(phi, rho, target, sigma):
        r = rho - target
        w = dct2(r) / kernel
        w = w.at[:, 0, 0].set(0.0)
        w = idct2(w)
        h1 = psum(w * r) / pcount
        return phi + sigma[:, None, None] * w, h1

    def compute_w2(phi, dual):
        return psum(quad_b * (mu + nu) - nu * phi - mu * dual) / pcount

    def step_update(sigma, value, old, h1):
        diff = value - old
        up = diff > h1 * sigma * 0.75
        dn = diff < h1 * sigma * 0.25
        return jnp.where(up, sigma / 0.8, jnp.where(dn, sigma * 0.8, sigma))

    def legendre(u):
        return _legendre_2d(u, xs, ys, max_tmp_elems,
                            banded=legendre_banded)

    def pushforward(dens, potential):
        xMap, yMap = jax.vmap(
            lambda p: _pushforward_map(p, n1, n2))(potential)
        return _sampling_pushforward_batch(dens, xMap, yMap, n1, n2,
                                           nsub, dmax,
                                           push_backend=push_backend)

    def body(carry, _):
        phi, dual, rho, sigma, old = carry
        # first half: update phi against nu, push nu through phi's map
        phi, h1 = update_potential(phi, rho, nu, sigma)
        dual = legendre(phi)
        phi = legendre(dual)
        value = compute_w2(phi, dual)
        sigma = step_update(sigma, value, old, h1)
        old = value
        rho = pushforward(nu, phi)
        # second half: update dual against mu, push mu through dual's map
        dual, h1 = update_potential(dual, rho, mu, sigma)
        phi = legendre(dual)
        dual = legendre(phi)
        rho = pushforward(mu, dual)
        value = compute_w2(phi, dual)
        sigma = step_update(sigma, value, old, h1)
        old = value
        return (phi, dual, rho, sigma, old), None

    init = (quad_b, quad_b, mu, sigma0.astype(dtype),
            compute_w2(quad_b, quad_b).astype(dtype))
    (phi, dual, rho, sigma, wd), _ = jax.lax.scan(body, init, None,
                                                  length=num_steps)

    dual_f = quad_b - dual
    term = psum(mu * dual_f)[:, None, None] / pcount
    grad = jnp.where(sum1 > 0, (dual_f - term) / sum1, 0.0)
    if return_carry:
        return jnp.where(live, wd, 0.0), grad, \
            (phi, dual, rho, sigma, wd), (mu, nu)
    return jnp.where(live, wd, 0.0), grad


def bfm_jax(f, g, num_steps=10, step_scale=1.0, nsub=2,
            push_backend=None, legendre_banded=None):
    """Single-gather quadratic-Wasserstein distance and gradient — thin
    wrapper over the batch solver (see ``bfm_jax_batch``). The wrapper
    itself is NOT jitted — an outer jit would freeze the env-var
    backend selection into its trace (the toggle-retraces guarantee) —
    but it resolves the backends at call time and dispatches ONE jitted
    program, so host callers pay a single tunnel round trip."""
    push_backend, legendre_banded = resolve_backends(push_backend,
                                                     legendre_banded)
    return _bfm_jax_single(f, g, num_steps, step_scale, nsub,
                           push_backend, legendre_banded)


@partial(jax.jit, static_argnames=("num_steps", "nsub", "push_backend",
                                   "legendre_banded"))
def _bfm_jax_single(f, g, num_steps, step_scale, nsub, push_backend,
                    legendre_banded):
    wd, grad = _bfm_jax_batch_core(
        f[None], g[None], num_steps, step_scale, nsub, 127, 32_000_000,
        push_backend, legendre_banded, False)
    return wd[0], grad[0]


class bfm:
    """Host-facing wrapper matching the reference driver's call shape
    (``misfit/bfm.py:145-192``): ``gradient(f, g) -> (loss, grad)`` with f, g
    of shape (nt, ntraces)."""

    def __init__(self, num_steps=10, step_scale=8.0, nsub=2):
        self.num_steps = num_steps
        self.step_scale = step_scale
        self.nsub = nsub

    def gradient(self, f, g):
        import numpy as np
        f = jnp.asarray(f)
        g = jnp.asarray(g)
        # reference layout: rows = time (y in the C solver), cols = traces
        loss, grad = bfm_jax(f, g, num_steps=self.num_steps,
                             step_scale=self.step_scale, nsub=self.nsub)
        return float(loss), np.asarray(grad)


bfmx = bfm  # reference alias: bfmx was the subprocess driver
