"""Absorbing-boundary-condition methods: PML and hybrid ABC (HABC).

TPU-native re-design of the reference's boundary-method studies
(``seismic/abc_methods/03_pml.ipynb``, ``04_habc.ipynb``; the sponge
damping of ``02_damping.ipynb`` is the production boundary in
``models/model.py``). devito's SubDomain machinery disappears: the
damping/weight masks are zero in the interior, so every time step is ONE
uniform update over the whole grid (XLA-friendly — no data-dependent
control flow), and the time loop is a ``lax.scan``.

PML — the second-order split formulation of the reference notebook
(Grote & Sim style): pressure u on nodes plus an auxiliary vector field
phi = (phi1, phi2) on the dual (half-cell-shifted) grid,

    u_tt + (zx+zz) u_t + zx zz u = v^2 lap(u) + div~(phi)
    phi1_t + zx phi1 = (zz-zx) v^2 u_x        (dual grid)
    phi2_t + zz phi2 = (zx-zz) v^2 u_z        (dual grid)

discretized exactly as the notebook's devito Eqs (centered u.dtc,
Crank-Nicolson phi relaxation, the 4-point half-cell averages for the
cross-grid derivatives). Damping profile zeta(a) = quibar *
(a - sin(2 pi a)/(2 pi)) over the layer depth fraction a, layers on
left/right/bottom, free-surface (Neumann) top.

HABC — one-way boundary equations blended with the interior update by a
weight ramp w (Higdon 1987 / Clayton-Engquist A1, A2):

    u[t+1] = (1 - w) u3 + w aux

where u3 is the unblended interior prediction and aux the one-way
scheme's prediction (``habctype`` 1 = Clayton A1, 2 = Clayton A2 with
45-degree corner equations, 3 = two-term Higdon, the notebook default).
``habcw`` selects the linear (1) or power (2) weight ramp.

All kernels are jittable, f32/f64-polymorphic, and differentiable by
construction (pure lax ops); space order 2, matching the reference
notebooks.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["pml_profiles", "habc_weights", "extend_velocity",
           "pml_acoustic_forward", "habc_acoustic_forward"]


# ---------------------------------------------------------------------------
# profile / weight builders (numpy, precomputed once)
# ---------------------------------------------------------------------------

def _layer_fraction(n, npml, half=False):
    """Depth fraction a in [0, 1] into the left/right layers of an n-point
    axis (0 in the interior). `half` shifts sample points by +h/2 (dual)."""
    i = np.arange(n, dtype=np.float64) + (0.5 if half else 0.0)
    left = np.maximum(0.0, (npml - i) / npml)
    right = np.maximum(0.0, (i - (n - 1 - npml)) / npml)
    return left + right


def pml_profiles(shape, npml, quibar=0.05, dtype=np.float32):
    """Damping fields for the split PML (reference 03_pml cells 28-36):
    zeta = quibar (a - sin(2 pi a) / (2 pi)), layers left/right in x and
    bottom in z. Returns (zx0, zz0) on nodes and (zx1, zz1) on the dual
    grid (stored full-shape, edge rows/cols replicated like the
    notebook's dampx1/dampz1 extension)."""
    nx, nz = shape

    def zeta(a):
        return quibar * (a - np.sin(2.0 * np.pi * a) / (2.0 * np.pi))

    def z_frac(n, half):
        i = np.arange(n, dtype=np.float64) + (0.5 if half else 0.0)
        return np.maximum(0.0, (i - (n - 1 - npml)) / npml)  # bottom only

    zx0 = np.broadcast_to(zeta(_layer_fraction(nx, npml))[:, None],
                          (nx, nz)).astype(dtype)
    zz0 = np.broadcast_to(zeta(z_frac(nz, False))[None, :],
                          (nx, nz)).astype(dtype)
    # dual grid: nx-1 x nz-1 points at +h/2, edge-extended to full shape
    zx1_ = zeta(_layer_fraction(nx, npml, half=True)[:nx - 1])
    zz1_ = zeta(z_frac(nz, True)[:nz - 1])
    zx1 = np.empty((nx, nz), np.float64)
    zz1 = np.empty((nx, nz), np.float64)
    zx1[:nx - 1, :nz - 1] = zx1_[:, None]
    zz1[:nx - 1, :nz - 1] = zz1_[None, :]
    zx1[nx - 1, :] = zx1[nx - 2, :]
    zz1[nx - 1, :] = zz1[nx - 2, :]
    zx1[:, nz - 1] = zx1[:, nz - 2]
    zz1[:, nz - 1] = zz1[:, nz - 2]
    return (zx0, zz0, zx1.astype(dtype), zz1.astype(dtype))


def habc_weights(shape, npml, habcw=2, habctype=3, dtype=np.float32):
    """Blending weight fields (wx, wz) for the HABC strips (reference
    04_habc cell 25): w = 1 at the outer edge, ramping to 0 at the
    interior. habcw=1 linear; habcw=2 the piecewise power ramp with
    m = 2 and the notebook's type-dependent exponent."""
    nx, nz = shape

    def ramp(npts):
        w = np.zeros(npts)
        if habcw == 1:
            for i in range(npts):
                w[i] = (npts - i) / npts
        else:
            m = 2
            alpha = (1.0 + 0.15 * (npts - m) if habctype == 3
                     else 1.5 + 0.07 * (npts - m))
            for i in range(npts):
                w[i] = 1.0 if i <= m else ((npts - i) / (npts - m)) ** alpha
        return w

    wx1d = ramp(npml)
    wx = np.zeros((nx, nz))
    wz = np.zeros((nx, nz))
    for k in range(npml):
        wx[k, :] = wx1d[k]
        wx[nx - 1 - k, :] = wx1d[k]
        wz[:, nz - 1 - k] = wx1d[k]
    return wx.astype(dtype), wz.astype(dtype)


def extend_velocity(v, npml):
    """Edge-replicate a velocity model into the absorbing layers
    (left/right in x, bottom in z)."""
    v = np.asarray(v)
    return np.pad(v, ((npml, npml), (0, npml)), mode="edge")


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------

def _lap2(u, inv_hx2, inv_hz2):
    """Space-order-2 Laplacian with zero-Dirichlet halo."""
    up = jnp.pad(u, 1)
    c = up[1:-1, 1:-1]
    return ((up[2:, 1:-1] - 2.0 * c + up[:-2, 1:-1]) * inv_hx2 +
            (up[1:-1, 2:] - 2.0 * c + up[1:-1, :-2]) * inv_hz2)


def _sh(u, dx, dz):
    """u shifted so result[i,j] = u[i+dx, j+dz], zero-filled."""
    nx, nz = u.shape
    up = jnp.pad(u, 2)
    return jax.lax.dynamic_slice(up, (2 + dx, 2 + dz), (nx, nz))


# one canonical sparse gather/scatter pair (OOB-corner drop semantics
# live with the interp_table contract) — do not re-copy per physics file
from .acoustic import _gather, _scatter_add  # noqa: E402


def _top_neumann(u):
    return u.at[:, 0].set(u[:, 1])


# ---------------------------------------------------------------------------
# PML forward
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nt", "spacing", "npml", "quibar"))
def pml_acoustic_forward(v, src_wav, src_idx, src_w, rec_idx, rec_w, dt, *,
                         nt, spacing, npml, quibar=0.05, v_dual=None):
    """Acoustic forward modeling with the split-field PML (reference
    ``03_pml.ipynb`` cells 37-42). `v` is the velocity on the extended
    grid (layers included; see ``extend_velocity``); src/rec tables are
    built against the extended-grid origin. Returns (rec (nt, nrec),
    u final)."""
    dtype = v.dtype
    nx, nz = v.shape
    hx, hz = spacing
    zx0, zz0, zx1, zz1 = (jnp.asarray(z, dtype=dtype)
                          for z in pml_profiles((nx, nz), npml, quibar,
                                                np.float64))
    if v_dual is None:
        vd = 0.25 * (v + _sh(v, 1, 0) + _sh(v, 0, 1) + _sh(v, 1, 1))
        vd = vd.at[nx - 1, :].set(vd[nx - 2, :])
        vd = vd.at[:, nz - 1].set(vd[:, nz - 2])
    else:
        vd = jnp.asarray(v_dual, dtype=dtype)

    s = jnp.asarray(dt, dtype=dtype)
    inv_hx2 = jnp.asarray(1.0 / hx ** 2, dtype=dtype)
    inv_hz2 = jnp.asarray(1.0 / hz ** 2, dtype=dtype)
    v2 = v * v
    vd2 = vd * vd
    S = zx0 + zz0
    P = zx0 * zz0
    A = 1.0 / s ** 2 + S / (2.0 * s)           # u[t+1] coefficient
    src_scale = src_w * s ** 2 * _gather(v2, src_idx)

    # phi relaxation factors (Crank-Nicolson)
    d1a = 1.0 / s - zx1 / 2.0
    d1b = 1.0 / (1.0 / s + zx1 / 2.0)
    d2a = 1.0 / s - zz1 / 2.0
    d2b = 1.0 / (1.0 / s + zz1 / 2.0)
    g1 = (zz1 - zx1) * vd2 * (0.25 / hx)
    g2 = (zx1 - zz1) * vd2 * (0.25 / hz)

    def step(carry, src_t):
        u, um, p1, p2 = carry
        rec_t = jnp.sum(_gather(u, rec_idx) * rec_w, axis=-1)

        # div~(phi) at nodes (notebook pde02b/c index arithmetic)
        dphi = ((_sh(p1, 0, -1) + p1 - _sh(p1, -1, -1) - _sh(p1, -1, 0))
                * (0.5 / hx) +
                (_sh(p2, -1, 0) + p2 - _sh(p2, -1, -1) - _sh(p2, 0, -1))
                * (0.5 / hz))
        rhs = ((2.0 * u - um) / s ** 2 + S * um / (2.0 * s) - P * u +
               v2 * _lap2(u, inv_hx2, inv_hz2) + dphi)
        un = rhs / A
        un = _scatter_add(un, src_idx, src_t[:, None] * src_scale)
        # bc: Dirichlet x-edges + bottom, Neumann top (notebook cell 41)
        un = un.at[0, :].set(0.).at[-1, :].set(0.).at[:, -1].set(0.)
        un = _top_neumann(un)

        # phi updates read u[t+1] and u[t] (4-point half-cell averages)
        ax = (_sh(un, 1, 0) + _sh(un, 1, 1) - un - _sh(un, 0, 1) +
              _sh(u, 1, 0) + _sh(u, 1, 1) - u - _sh(u, 0, 1))
        bz = (_sh(un, 0, 1) + _sh(un, 1, 1) - un - _sh(un, 1, 0) +
              _sh(u, 0, 1) + _sh(u, 1, 1) - u - _sh(u, 1, 0))
        p1n = (p1 * d1a + g1 * ax) * d1b
        p2n = (p2 * d2a + g2 * bz) * d2b
        return (un, u, p1n, p2n), rec_t

    z = jnp.zeros_like(v)
    (u_fin, _, _, _), recs = jax.lax.scan(step, (z, z, z, z),
                                          src_wav[0:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    return rec.at[0:nt - 1].set(recs), u_fin


# ---------------------------------------------------------------------------
# HABC forward
# ---------------------------------------------------------------------------

def _clayton_a1(u3, u2, v, s, h, d):
    """Clayton-Engquist A1 prediction (04_habc cell 36): strip whose
    interior lies toward shift direction d = (dx, dz)."""
    vd = v * s
    hh = h
    return ((( -vd + hh) * u2 + (vd + hh) * _sh(u2, *d) +
             (vd - hh) * _sh(u3, *d)) / (vd + hh))


def _clayton_a2(u3, u2, u1, v, s, h, ht, d, t_):
    """Clayton-Engquist A2 prediction (04_habc cell 37). `h` is the
    normal spacing, `ht` the tangential one, `d` the unit shift toward
    the interior, `t_` the tangential unit shift."""
    c1 = 1.0 / (2.0 * s ** 2) + v / (2.0 * s * h)
    c2 = -1.0 / (2.0 * s ** 2) + v / (2.0 * s * h) - v * v / (2.0 * ht ** 2)
    c3 = -1.0 / (2.0 * s ** 2) - v / (2.0 * s * h)
    c4 = 1.0 / s ** 2
    c5 = v * v / (4.0 * ht ** 2)
    tp = tuple(t_)
    tm = tuple(-x for x in t_)
    dpt = tuple(a + b for a, b in zip(d, tp))
    dmt = tuple(a + b for a, b in zip(d, tm))
    return ((c2 * (_sh(u3, *d) + u1) + c3 * _sh(u1, *d) +
             c4 * (u2 + _sh(u2, *d)) +
             c5 * (_sh(u3, *dpt) + _sh(u3, *dmt) +
                   _sh(u1, *tp) + _sh(u1, *tm))) / c1)


def _higdon(u3, u2, u1, v, s, h, d):
    """Two-term Higdon prediction, angles 0 and pi/4, space/time averaging
    parameters a = b = 1/2 (04_habc cell 38)."""
    d2 = tuple(2 * x for x in d)
    ga = []
    for alpha in (0.0, np.pi / 4):
        ca = float(np.cos(alpha))
        gt = ca * 0.5 / s          # time-difference coefficient
        gs = ca * 0.5 / h * v      # space-difference coefficient
        ga.append((gt + gs, -gt + gs, gt - gs, -gt - gs))
    (c11, c12, c13, c14), (c21, c22, c23, c24) = ga
    aux = (u2 * (-c11 * c22 - c12 * c21) +
           _sh(u3, *d) * (-c11 * c23 - c13 * c21) +
           _sh(u2, *d) * (-c11 * c24 - c12 * c23 - c14 * c21 - c13 * c22) +
           u1 * (-c12 * c22) +
           _sh(u1, *d) * (-c12 * c24 - c14 * c22) +
           _sh(u3, *d2) * (-c13 * c23) +
           _sh(u2, *d2) * (-c13 * c24 - c14 * c23) +
           _sh(u1, *d2) * (-c14 * c24)) / (c11 * c21)
    return aux


def _corner_45(u3, u2, v, s, hx, hz, dx, dz):
    """The A2 path's 45-degree corner one-way update (04_habc cells
    stencil4/stencil5): `dx`, `dz` are the shifts toward the interior."""
    r2 = float(np.sqrt(2.0))
    q = r2 / (4.0 * v * s)
    ax = 1.0 / (4.0 * hx)
    az = 1.0 / (4.0 * hz)
    num = ((-ax + az - q) * _sh(u3, 0, dz) +
           (ax - az - q) * _sh(u3, dx, 0) +
           (ax + az - q) * _sh(u3, dx, dz) +
           (-ax - az + q) * u2 +
           (-ax + az + q) * _sh(u2, 0, dz) +
           (ax - az + q) * _sh(u2, dx, 0) +
           (ax + az + q) * _sh(u2, dx, dz))
    return num / (ax + az + q)


@partial(jax.jit,
         static_argnames=("nt", "spacing", "npml", "habctype", "habcw"))
def habc_acoustic_forward(v, src_wav, src_idx, src_w, rec_idx, rec_w, dt, *,
                          nt, spacing, npml, habctype=3, habcw=2):
    """Acoustic forward modeling with the hybrid ABC (reference
    ``04_habc.ipynb``): interior prediction everywhere, then the
    bottom / right / left strips are replaced (in the notebook's write
    order) by the weight-blended one-way predictions. Returns
    (rec (nt, nrec), None)."""
    dtype = v.dtype
    nx, nz = v.shape
    hx, hz = spacing
    wx_, wz_ = habc_weights((nx, nz), npml, habcw, habctype, np.float64)
    wx = jnp.asarray(wx_, dtype=dtype)
    wz = jnp.asarray(wz_, dtype=dtype)
    ii, jj = np.meshgrid(np.arange(nx), np.arange(nz), indexing="ij")
    m_left = jnp.asarray(ii < npml)
    m_right = jnp.asarray(ii >= nx - npml)
    m_bottom = jnp.asarray((jj >= nz - npml) &
                           (ii >= npml) & (ii < nx - npml))
    # A2 corner diagonals (stencil4/5)
    m_diag_r = jnp.asarray((ii - jj == nx - nz) & (ii >= nx - npml))
    m_diag_l = jnp.asarray((ii + jj == nz - 1) & (ii < npml))

    s = jnp.asarray(dt, dtype=dtype)
    inv_hx2 = jnp.asarray(1.0 / hx ** 2, dtype=dtype)
    inv_hz2 = jnp.asarray(1.0 / hz ** 2, dtype=dtype)
    v2 = v * v
    src_scale = src_w * s ** 2 * _gather(v2, src_idx)

    def one_way(u3, u2, u1, h, ht, d, t_):
        if habctype == 1:
            return _clayton_a1(u3, u2, v, s, h, d)
        if habctype == 2:
            return _clayton_a2(u3, u2, u1, v, s, h, ht, d, t_)
        return _higdon(u3, u2, u1, v, s, h, d)

    def step(carry, src_t):
        u, um = carry
        rec_t = jnp.sum(_gather(u, rec_idx) * rec_w, axis=-1)

        # interior prediction + source (04_habc stencil0 + src_term)
        un = (2.0 * u - um + s ** 2 * v2 * _lap2(u, inv_hx2, inv_hz2))
        un = _scatter_add(un, src_idx, src_t[:, None] * src_scale)

        u1, u2 = um, u
        # bottom strip first, refresh, then right, then left (cell 40)
        u3 = un
        aux_b = one_way(u3, u2, u1, hz, hx, (0, -1), (1, 0))
        u3 = jnp.where(m_bottom, (1.0 - wz) * u3 + wz * aux_b, u3)
        aux_r = one_way(u3, u2, u1, hx, hz, (-1, 0), (0, 1))
        aux_l = one_way(u3, u2, u1, hx, hz, (1, 0), (0, 1))
        u3 = jnp.where(m_right, (1.0 - wx) * u3 + wx * aux_r, u3)
        u3 = jnp.where(m_left, (1.0 - wx) * u3 + wx * aux_l, u3)
        if habctype == 2:
            diag_r = _corner_45(u3, u2, v, s, hx, hz, -1, -1)
            diag_l = _corner_45(u3, u2, v, s, hx, hz, 1, -1)
            u3 = jnp.where(m_diag_r, (1.0 - wz) * u3 + wz * diag_r, u3)
            u3 = jnp.where(m_diag_l, (1.0 - wx) * u3 + wx * diag_l, u3)
        un = _top_neumann(u3)
        return (un, u), rec_t

    z = jnp.zeros_like(v)
    (_, _), recs = jax.lax.scan(step, (z, z), src_wav[0:nt - 1])
    rec = jnp.zeros((nt, rec_idx.shape[0]), dtype=dtype)
    return rec.at[0:nt - 1].set(recs), None
