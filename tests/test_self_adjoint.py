"""Self-adjoint solver correctness suite.

Replicates the reference's gold-standard FWI math checks
(``seismic/self_adjoint/test_wavesolver_iso.py``): forward/adjoint
linearity, F adjoint dot test, Born linearization slopes h^2/h^4,
Jacobian linearity, J adjoint dot test, skew-symmetry of the
half-cell-shifted derivative stencils, and the w/Q boundary field
(``test_utils.py``). All in float64, space_order=8, like the reference.
"""
import numpy as np
import pytest

from devito_fwi_tpu.ops import self_adjoint as sa
from devito_fwi_tpu.ops.sa_wavesolver import acoustic_sa_setup


def _setup(shape=(71, 61), tn=500.):
    return acoustic_sa_setup(shape=shape, spacing=(10.,) * len(shape),
                             tn=tn, space_order=8, nbl=10,
                             dtype=np.float64)


def _box_dm(model, size=5, seed=0):
    np.random.seed(seed)
    dm = np.zeros(model.padded_shape, dtype=np.float64)
    ns = 2 * size + 1
    ctr = [n // 2 for n in model.padded_shape]
    sl = tuple(slice(c - size, c + size + 1) for c in ctr)
    dm[sl] = -1 + 2 * np.random.rand(*([ns] * model.dim))
    return dm


# ---------------------------------------------------------------------------
# skew-symmetry (reference test_wavesolver_iso.py:313-359)
# ---------------------------------------------------------------------------

def test_derivative_skew_symmetry():
    np.random.seed(0)
    import jax.numpy as jnp
    n = 101
    f1 = -1 + 2 * np.random.rand(n)
    g1 = -1 + 2 * np.random.rand(n)
    wp, op, wm, om = sa.staggered_weights(8)
    f2 = np.asarray(sa.shifted_derivative(jnp.asarray(f1), jnp.asarray(wp),
                                          op, 0, 1.0))
    g2 = np.asarray(sa.shifted_derivative(jnp.asarray(g1), jnp.asarray(wm),
                                          om, 0, 1.0))
    f1g2 = np.dot(f1, g2)
    g1f2 = np.dot(g1, f2)
    diff = (f1g2 + g1f2) / (f1g2 - g1f2)
    assert np.isclose(diff, 0.0, atol=1e-12)


# ---------------------------------------------------------------------------
# w/Q boundary field (reference test_utils.py)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape, npad", [((41, 31), 5), ((21, 21, 21), 4)])
def test_w_over_q(shape, npad):
    w, qmin, qmax = 2 * np.pi * 0.01, 0.1, 100.0
    woq = sa.setup_w_over_q(shape, w, qmin, qmax, npad, dtype=np.float64)
    # interior = w/qmax, outer edge = w/qmin
    interior = tuple(slice(npad, n - npad) for n in shape)
    assert np.allclose(woq[interior], w / qmax, rtol=1e-6)
    assert np.isclose(woq.flat[0], w / qmin, rtol=1e-6)
    # monotone decay into the interior along the first axis mid-line
    mid = tuple(n // 2 for n in shape[1:])
    line = woq[(slice(0, npad + 1),) + mid]
    assert np.all(np.diff(line) <= 1e-12)


# ---------------------------------------------------------------------------
# linearity of F (reference :17-72)
# ---------------------------------------------------------------------------

def test_linearity_forward_F():
    solver = _setup()
    src = solver.geometry.src
    a = -1 + 2 * np.random.rand()
    rec1, _, _ = solver.forward(src)
    src2 = solver.geometry.new_src()
    src2.data[:] = a * src.data
    rec2, _, _ = solver.forward(src2)
    rec1d = a * rec1.data
    rms2 = np.sqrt(np.mean(rec2.data ** 2))
    diff = (rec1d - rec2.data) / rms2
    assert np.allclose(diff, 0.0, atol=1e-12)


def test_linearity_adjoint_F():
    solver = _setup()
    np.random.seed(0)
    a = np.random.rand()
    rec = solver.geometry.rec
    rec.data[:] = np.random.rand(*rec.data.shape)
    src1, _, _ = solver.adjoint(rec)
    rec2 = solver.geometry.new_rec()
    rec2.data[:] = a * rec.data
    src2, _, _ = solver.adjoint(rec2)
    rms2 = np.sqrt(np.mean(src2.data ** 2))
    diff = (a * src1.data - src2.data) / rms2
    assert np.allclose(diff, 0.0, atol=1e-12)


# ---------------------------------------------------------------------------
# F adjoint dot test (reference :74-95)
# ---------------------------------------------------------------------------

def test_adjoint_F():
    solver = _setup()
    np.random.seed(0)
    src1 = solver.geometry.src
    rec1 = solver.geometry.new_rec()
    rec1.data[:] = np.random.rand(*rec1.data.shape)
    rec2, _, _ = solver.forward(src1)
    src2, _, _ = solver.adjoint(rec1)
    sum_s = np.dot(src1.data.ravel(), src2.data.ravel())
    sum_r = np.dot(rec1.data.ravel(), rec2.data.ravel())
    diff = (sum_s - sum_r) / (sum_s + sum_r)
    assert np.isclose(diff, 0.0, atol=1e-12)


# ---------------------------------------------------------------------------
# Born linearization slopes (reference :97-168)
# ---------------------------------------------------------------------------

def test_linearization_F():
    solver = _setup()
    src = solver.geometry.src
    m0 = np.full(solver.model.padded_shape, 1.5, dtype=np.float64)
    dm = _box_dm(solver.model)

    rec0, _, _, _ = (None, None, None, None)
    rec0, u0, _ = solver.forward(src, vp=m0)
    rec0_data = rec0.data.copy()
    rec1, _, _, _ = solver.jacobian(dm, src=src, vp=m0)
    rec1_data = rec1.data.copy()

    dh, h, nstep = np.sqrt(2.0), 0.1, 7
    scale = np.empty(nstep)
    norm1 = np.empty(nstep)
    norm2 = np.empty(nstep)
    for k in range(nstep):
        h = h / dh
        rec2, _, _ = solver.forward(src, vp=m0 + h * dm)
        scale[k] = h
        norm1[k] = 0.5 * np.linalg.norm(rec2.data - rec0_data) ** 2
        norm2[k] = 0.5 * np.linalg.norm(
            rec2.data - rec0_data - h * rec1_data) ** 2
    p1 = np.polyfit(np.log10(scale), np.log10(norm1), 1)
    p2 = np.polyfit(np.log10(scale), np.log10(norm2), 1)
    assert np.isclose(p1[0], dh ** 2, rtol=0.25)
    assert np.isclose(p2[0], dh ** 4, rtol=0.10)


# ---------------------------------------------------------------------------
# linearity of J (reference :170-263)
# ---------------------------------------------------------------------------

def test_linearity_forward_J():
    solver = _setup()
    src = solver.geometry.src
    np.random.seed(0)
    a = np.random.rand()
    m0 = np.full(solver.model.padded_shape, 1.5, dtype=np.float64)
    dm = _box_dm(solver.model)
    rec1, _, _, _ = solver.jacobian(dm, src=src, vp=m0)
    rec1_data = rec1.data.copy()
    rec2, _, _, _ = solver.jacobian(a * dm, src=src, vp=m0)
    rms2 = np.sqrt(np.mean(rec2.data ** 2))
    diff = (a * rec1_data - rec2.data) / rms2
    assert np.allclose(diff, 0.0, atol=1e-12)


def test_linearity_adjoint_J():
    solver = _setup()
    src = solver.geometry.src
    np.random.seed(0)
    a = np.random.rand()
    m0 = np.full(solver.model.padded_shape, 1.5, dtype=np.float64)
    rec0, u0, _ = solver.forward(src, vp=m0, save=True)
    rec1 = solver.geometry.new_rec()
    rec1.data[:] = np.random.rand(*rec1.data.shape)
    dm1, _, _, _ = solver.jacobian_adjoint(rec1, u0, vp=m0)
    rec2 = solver.geometry.new_rec()
    rec2.data[:] = a * rec1.data
    dm2, _, _, _ = solver.jacobian_adjoint(rec2, u0, vp=m0)
    rms2 = np.sqrt(np.mean(dm2 ** 2))
    diff = (a * dm1 - dm2) / rms2
    # 1e-11 (reference uses 1e-12): f64 rounding accumulates slightly
    # differently in the fused scan than in devito's per-eq loops
    assert np.allclose(diff, 0.0, atol=1e-11)


# ---------------------------------------------------------------------------
# J adjoint dot test (reference :265-311)
# ---------------------------------------------------------------------------

def test_adjoint_J():
    solver = _setup()
    np.random.seed(0)
    src0 = solver.geometry.src
    m0 = np.full(solver.model.padded_shape, 1.5, dtype=np.float64)
    dm1 = _box_dm(solver.model)
    rec1 = solver.geometry.new_rec()
    rec1.data[:] = np.random.rand(*rec1.data.shape)
    rec2, u0, _, _ = solver.jacobian(dm1, src=src0, vp=m0, save=True)
    dm2, _, _, _ = solver.jacobian_adjoint(rec1, u0, vp=m0)
    sum_m = np.dot(dm1.ravel(), dm2.ravel())
    sum_d = np.dot(rec1.data.ravel(), rec2.data.ravel())
    diff = (sum_m - sum_d) / (sum_m + sum_d)
    assert np.isclose(diff, 0.0, atol=1e-11)


# ---------------------------------------------------------------------------
# 3-D smoke: the propagators are dimension-agnostic
# ---------------------------------------------------------------------------

def test_forward_3d_smoke():
    solver = acoustic_sa_setup(shape=(21, 21, 21), spacing=(10., 10., 10.),
                               tn=100., space_order=8, nbl=5,
                               dtype=np.float64)
    rec, u, _ = solver.forward()
    assert np.isfinite(rec.data).all()
    assert np.abs(rec.data).max() > 0


# ---------------------------------------------------------------------------
# analytic far-field comparison (reference :360-462): numerical wholespace
# response vs the 2-D Green's function (Hankel of the 2nd kind) for a
# Ricker source. Moderate scale: dx=0.5 (33 points per wavelength at the
# Ricker peak), r = 60*sqrt(2) offset.
# ---------------------------------------------------------------------------

def test_analytic_comparison_2d():
    from scipy.special import hankel2
    from devito_fwi_tpu.models.model import SeismicModel
    from devito_fwi_tpu.models.geometry import AcquisitionGeometry
    from devito_fwi_tpu.models.sources import ricker_wavelet
    from devito_fwi_tpu.ops.sa_wavesolver import SaIsoAcousticWaveSolver

    nt, dt = 1001, 0.1
    tmax = dt * (nt - 1)
    fpeak = 0.090
    t0w = 1.0 / fpeak
    omega = 2 * np.pi * fpeak
    so, npad, dx = 8, 50, 0.5
    shape = (401, 401)
    v0 = 1.5
    init_damp = lambda m: sa.setup_w_over_q(m.padded_shape, omega, 0.1, 1e5,
                                            m.nbl, dtype=np.float64)
    model = SeismicModel(origin=(0., 0.), shape=shape,
                         vp=np.full(shape, v0), b=np.full(shape, 1.0),
                         spacing=(dx, dx), nbl=npad, space_order=so,
                         bcs=init_damp, dtype=np.float64, dt=dt)
    src_coords = np.array([[shape[0] // 2 * dx, shape[1] // 2 * dx]])
    rec_coords = src_coords + 60.0
    geometry = AcquisitionGeometry(model, rec_coords, src_coords, 0.0, tmax,
                                   src_type="Ricker", f0=fpeak)
    solver = SaIsoAcousticWaveSolver(model, geometry, space_order=so)
    rec, _, _ = solver.forward()

    # analytic response: u(r, t) = ifft(-i pi H0^2(w r / v) q(w)) / (2 pi),
    # with 20x temporal padding, scaled by dx^2 to convert to pressure
    sx, sz = src_coords[0]
    rx, rz = rec_coords[0]
    ntpad = 20 * (nt - 1) + 1
    tmaxpad = dt * (ntpad - 1)
    tpad = np.linspace(0, tmaxpad, ntpad)
    wav = ricker_wavelet(tpad, fpeak, t0w)
    nf = ntpad // 2 + 1
    faxis = np.arange(nf) / tmaxpad
    R = np.fft.fft(wav)[:nf]
    U_a = np.zeros(nf, dtype=complex)
    r = np.sqrt((rx - sx) ** 2 + (rz - sz) ** 2)
    w = 2 * np.pi * faxis[1:nf - 1]
    U_a[1:nf - 1] = -1j * np.pi * hankel2(0.0, w * r / v0) * R[1:nf - 1]
    uAna = (np.real(np.fft.ifft(U_a, ntpad))[:nt] / (2 * np.pi)) * dx ** 2

    diff = rec.data[:, 0] - uAna
    assert np.abs(diff).max() < 0.02 * np.abs(uAna).max()
