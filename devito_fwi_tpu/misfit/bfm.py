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

from functools import partial

import jax
import jax.numpy as jnp

__all__ = ["bfm_jax", "bfm"]


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
    rows = 1 if u.ndim == 1 else u.shape[0]
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


def _legendre_2d(u, sx, sy):
    """2-D Legendre transform, separable (fot2d.c:151-173):
    out[iy, ix] = max_{jx, jy} (x_ix x_jx + y_iy y_jy - u[jy, jx])."""
    a = _legendre_last(u, sx)           # (n2, n1) max over jx
    b = _legendre_last(-a.T, sy)        # (n1, n2) max over jy
    return b.T


def _interp_c(f, X, Y, n1, n2):
    """Bilinear interpolation with the C code's clamped-extrapolation
    convention (fot2d.c:268-292). X, Y in map coordinates [0, 1]."""
    xi = jnp.clip(X * n1 - 0.5, 0, n1 - 1)
    yi = jnp.clip(Y * n2 - 0.5, 0, n2 - 1)
    xIndex = jnp.floor(xi).astype(jnp.int32)
    yIndex = jnp.floor(yi).astype(jnp.int32)
    xfrac = X * n1 - xIndex - 0.5
    yfrac = Y * n2 - yIndex - 0.5
    xOther = jnp.clip(xIndex + jnp.sign(xfrac).astype(jnp.int32), 0, n1 - 1)
    yOther = jnp.clip(yIndex + jnp.sign(yfrac).astype(jnp.int32), 0, n2 - 1)
    ax, ay = jnp.abs(xfrac), jnp.abs(yfrac)
    return ((1 - ax) * (1 - ay) * f[yIndex, xIndex] +
            ax * (1 - ay) * f[yIndex, xOther] +
            (1 - ax) * ay * f[yOther, xIndex] +
            ax * ay * f[yOther, xOther])


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


def _pushforward_points(mu, xMap, yMap, n1, n2, nsub):
    """Stacked (P, n2, n1) destination indices / values of every
    (subsample, corner) contribution, P = 4*nsub^2, plus the active-cell
    mask (fot2d.c:373-457 with fixed sampling)."""
    # per-cell corner values
    c00x, c01x = xMap[:-1, :-1], xMap[:-1, 1:]
    c10x, c11x = xMap[1:, :-1], xMap[1:, 1:]
    c00y, c01y = yMap[:-1, :-1], yMap[:-1, 1:]
    c10y, c11y = yMap[1:, :-1], yMap[1:, 1:]
    xStretch = jnp.maximum(jnp.abs(c01x - c00x), jnp.abs(c11x - c10x))
    yStretch = jnp.maximum(jnp.abs(c10y - c00y), jnp.abs(c11y - c01y))
    xCut = (1.0 / n1) ** (1.0 / 3)
    yCut = (1.0 / n2) ** (1.0 / 3)
    keep = (mu > 0) & (xStretch < xCut) & (yStretch < yCut)
    mass = jnp.where(keep, mu, 0.0) / (nsub * nsub)

    ys_l, xs_l, vs_l = [], [], []
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
            xFrac = X - xIndex
            yFrac = Y - yIndex
            xI = jnp.clip(xIndex, 0, n1 - 1)
            xO = jnp.clip(xIndex + 1, 0, n1 - 1)
            yI = jnp.clip(yIndex, 0, n2 - 1)
            yO = jnp.clip(yIndex + 1, 0, n2 - 1)
            ys_l += [yI, yO, yI, yO]
            xs_l += [xI, xI, xO, xO]
            vs_l += [(1 - xFrac) * (1 - yFrac) * mass,
                     (1 - xFrac) * yFrac * mass,
                     xFrac * (1 - yFrac) * mass,
                     xFrac * yFrac * mass]
    return jnp.stack(ys_l), jnp.stack(xs_l), jnp.stack(vs_l), keep


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


@partial(jax.jit, static_argnames=("num_steps", "nsub"))
def bfm_jax(f, g, num_steps=10, step_scale=1.0, nsub=2):
    """Quadratic-Wasserstein distance and gradient d W2 / d f of two
    same-shape 2-D densities (rows = time/y, cols = traces/x).

    Mirrors ``fotGradient2d`` (``fot2d.c:606-656``): inputs are normalized
    to unit mean, the BFM iteration alternates H^-1 ascent + convexification
    + pushforward on each potential, and the gradient is
    ``(psi - <mu, psi>/pcount)/mean(f)``.
    """
    dtype = f.dtype
    n2, n1 = f.shape
    pcount = n1 * n2

    sum1 = jnp.sum(f) / pcount
    sum2 = jnp.sum(g) / pcount
    mu = jnp.where(sum1 > 0, f / sum1, 0.0)
    nu = jnp.where(sum2 > 0, g / sum2, 0.0)

    sigma0 = step_scale / jnp.maximum(jnp.max(mu), jnp.max(nu))

    xs = (jnp.arange(n1, dtype=dtype) + 0.5) / n1
    ys = (jnp.arange(n2, dtype=dtype) + 0.5) / n2
    quad = 0.5 * (xs[None, :] ** 2 + ys[:, None] ** 2)

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
        w = w.at[0, 0].set(0.0)
        w = idct2(w)
        h1 = jnp.sum(w * r) / pcount
        return phi + sigma * w, h1

    def compute_w2(phi, dual):
        return jnp.sum(quad * (mu + nu) - nu * phi - mu * dual) / pcount

    def step_update(sigma, value, old, h1):
        diff = value - old
        up = diff > h1 * sigma * 0.75
        dn = diff < h1 * sigma * 0.25
        return jnp.where(up, sigma / 0.8, jnp.where(dn, sigma * 0.8, sigma))

    def body(carry, _):
        phi, dual, rho, sigma, old = carry
        # first half: update phi against nu, push nu through phi's map
        phi, h1 = update_potential(phi, rho, nu, sigma)
        dual = _legendre_2d(phi, xs, ys)
        phi = _legendre_2d(dual, xs, ys)
        value = compute_w2(phi, dual)
        sigma = step_update(sigma, value, old, h1)
        old = value
        xMap, yMap = _pushforward_map(phi, n1, n2)
        rho = _sampling_pushforward(nu, xMap, yMap, n1, n2, nsub)
        # second half: update dual against mu, push mu through dual's map
        dual, h1 = update_potential(dual, rho, mu, sigma)
        phi = _legendre_2d(dual, xs, ys)
        dual = _legendre_2d(phi, xs, ys)
        xMap, yMap = _pushforward_map(dual, n1, n2)
        rho = _sampling_pushforward(mu, xMap, yMap, n1, n2, nsub)
        value = compute_w2(phi, dual)
        sigma = step_update(sigma, value, old, h1)
        old = value
        return (phi, dual, rho, sigma, old), None

    init = (quad, quad, mu, sigma0.astype(dtype),
            compute_w2(quad, quad).astype(dtype))
    (phi, dual, rho, sigma, wd), _ = jax.lax.scan(body, init, None,
                                                  length=num_steps)

    dual_f = quad - dual
    term = jnp.sum(mu * dual_f) / pcount
    grad = jnp.where(sum1 > 0, (dual_f - term) / sum1, 0.0)
    return wd, grad


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
