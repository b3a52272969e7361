"""Non-circular W2-2d BFM parity gate against the REFERENCE C solver.

The reference's ground truth for the 2-D quadratic-Wasserstein misfit is
the C binary built from ``/root/reference/misfit/QW2D/src`` (driven via
subprocess by ``misfit/bfm.py:145-192``). The prebuilt binary cannot run
here (it links libfftw3f, absent), so this test compiles the reference
sources *out of tree* against ``tests/oracle/fftw_shim.c`` — an original
FFTW-API shim implementing FFTW's unnormalized REDFT10/REDFT01 semantics
with double-precision cosine-matrix products — and asserts that both this
repo's solvers (the C++ ``native/bfm2d.cpp`` and the JAX ``misfit.bfm``)
reproduce the oracle's loss and gradient.

No reference code is vendored: sources are read from /root/reference at
build time; the test skips when that tree (or gcc) is unavailable.

Tolerances: the two repo solvers use a fixed supersampling factor in the
density pushforward where the reference adapts per cell, so agreement is
~2e-4 relative; the gate asserts <= 1e-3 (SURVEY.md section 7.5).
"""
import os
import subprocess
import tempfile

import numpy as np
import pytest

REF_SRC = "/root/reference/misfit/QW2D/src"
_HERE = os.path.dirname(os.path.abspath(__file__))
_ORACLE = None


def _build_oracle():
    global _ORACLE
    if _ORACLE is not None:
        return _ORACLE
    if not os.path.exists(os.path.join(REF_SRC, "fot2d.c")):
        pytest.skip("reference BFM sources unavailable")
    out = os.path.join(tempfile.gettempdir(), "bfm2d_oracle")
    if not os.path.exists(out):
        cmd = ["gcc",
               os.path.join(REF_SRC, "fot2d.c"),
               os.path.join(REF_SRC, "normalize.c"),
               os.path.join(REF_SRC, "w2.c"),
               os.path.join(_HERE, "oracle", "fftw_shim.c"),
               "-I", os.path.join(_HERE, "oracle"),
               "-o", out, "-O2", "-std=c11", "-lm", "-fopenmp", "-w"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            pytest.skip("cannot build reference oracle (no gcc?)")
    _ORACLE = out
    return out


def _oracle_gradient(mu, nu, num_steps, step_scale):
    """Run the reference binary with the bfmx file protocol
    (``misfit/bfm.py:156-186``): row-major (nt, ntraces) float32 files,
    argv = (ntraces, nt, steps, scale, 1, dir)."""
    binary = _build_oracle()
    nt, ntr = mu.shape
    with tempfile.TemporaryDirectory() as d:
        mu.astype(np.float32).tofile(os.path.join(d, "syn_data"))
        nu.astype(np.float32).tofile(os.path.join(d, "obs_data"))
        subprocess.run([binary, str(ntr), str(nt), str(num_steps),
                        str(step_scale), "1", d],
                       check=True, capture_output=True)
        grad = np.fromfile(os.path.join(d, "grad_data"),
                           dtype=np.float32).reshape(nt, ntr)
        loss = float(np.loadtxt(os.path.join(d, "loss")))
    return loss, grad


def _wavelet(dt, n, freq, delay):
    t = (np.arange(0, n) - delay) * dt
    tmp = np.pi * np.pi * freq * freq * t * t
    return ((1. - 2. * tmp) * np.exp(-tmp)).reshape(n, 1)


def _ricker_gathers():
    """410x101 shifted-Ricker gathers (the reference test_misfit.py shape)
    with trace-dependent moveout, plus the linear positivity transform."""
    shape = (410, 101)
    ntr = shape[1]
    d1 = 120 + 60 * np.sin(np.linspace(0, np.pi, ntr))
    d2 = 200 + 40 * np.cos(np.linspace(0, np.pi, ntr))
    f = np.concatenate([_wavelet(0.001, shape[0], 5, d) for d in d1],
                       axis=1).astype(np.float32)
    g = np.concatenate([_wavelet(0.001, shape[0], 5, d) for d in d2],
                       axis=1).astype(np.float32)
    c = max(0.0, -min(f.min(), g.min())) * 1.01
    return f + c, g + c


@pytest.fixture(scope="module")
def oracle_ricker():
    mu, nu = _ricker_gathers()
    loss, grad = _oracle_gradient(mu, nu, num_steps=10, step_scale=1.0)
    return mu, nu, loss, grad


def test_native_matches_reference_binary(oracle_ricker):
    from devito_fwi_tpu.misfit import native
    if not native.available():
        pytest.skip("native bfm2d unavailable")
    mu, nu, loss_o, grad_o = oracle_ricker
    loss_n, grad_n = native.bfm_gradient(mu, nu, num_steps=10,
                                         step_scale=1.0, nsub=2)
    assert abs(loss_n - loss_o) / abs(loss_o) < 1e-3
    assert (np.linalg.norm(grad_n - grad_o)
            / np.linalg.norm(grad_o)) < 1e-3


def test_native_adaptive_matches_reference_binary(oracle_ricker):
    """nsub=0 enables the reference's per-cell adaptive pushforward
    supersampling in the native solver, removing the last algorithmic
    difference from the C binary. Measured: grad parity 1.69e-4 (fixed
    nsub=2) -> 1.53e-4 (adaptive) — i.e. the supersampling choice is NOT
    the dominant residual; the remaining ~1.5e-4 is the reference's
    float32 internals vs this solver's float64 (which also answers
    SURVEY 7.5's open accuracy question about fixed supersampling)."""
    from devito_fwi_tpu.misfit import native
    if not native.available():
        pytest.skip("native bfm2d unavailable")
    mu, nu, loss_o, grad_o = oracle_ricker
    loss_n, grad_n = native.bfm_gradient(mu, nu, num_steps=10,
                                         step_scale=1.0, nsub=0)
    assert abs(loss_n - loss_o) / abs(loss_o) < 2e-4
    assert (np.linalg.norm(grad_n - grad_o)
            / np.linalg.norm(grad_o)) < 2e-4


def test_jax_matches_reference_binary(oracle_ricker):
    """Fixed nsub=2: measured 6.0e-5 loss / 1.69e-4 grad parity in f64
    (the residual is the oracle's float32 internals, not the sampling)."""
    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.misfit.bfm import bfm_jax
    mu, nu, loss_o, grad_o = oracle_ricker
    loss_j, grad_j = jax.jit(
        lambda a, b: bfm_jax(a, b, num_steps=10, step_scale=1.0))(
        jnp.asarray(mu), jnp.asarray(nu))
    assert abs(float(loss_j) - loss_o) / abs(loss_o) < 3e-4
    assert (np.linalg.norm(np.asarray(grad_j) - grad_o)
            / np.linalg.norm(grad_o)) < 3e-4


def test_jax_adaptive_matches_reference_binary(oracle_ricker):
    """nsub=0 = two-level adaptive supersampling (2x2 base, 4x4 on
    high-stretch cells, reference rule fot2d.c:419-423). Measured grad
    parity 1.53e-4 — identical to the native solver's fully-adaptive
    nsub=0 mode, confirming two levels capture the whole effect."""
    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.misfit.bfm import bfm_jax
    mu, nu, loss_o, grad_o = oracle_ricker
    loss_j, grad_j = jax.jit(
        lambda a, b: bfm_jax(a, b, num_steps=10, step_scale=1.0, nsub=0))(
        jnp.asarray(mu), jnp.asarray(nu))
    assert abs(float(loss_j) - loss_o) / abs(loss_o) < 2e-4
    assert (np.linalg.norm(np.asarray(grad_j) - grad_o)
            / np.linalg.norm(grad_o)) < 2e-4


def test_oracle_smooth_density_parity():
    """Smooth Gaussian densities: a second, qualitatively different input
    family (no sharp wavefronts) through the same gate."""
    from devito_fwi_tpu.misfit import native
    if not native.available():
        pytest.skip("native bfm2d unavailable")
    nt, ntr = 96, 64
    y, x = np.meshgrid(np.linspace(0, 1, nt), np.linspace(0, 1, ntr),
                       indexing="ij")
    f = (np.exp(-((x - .4) ** 2 + (y - .45) ** 2) / .02) + .05
         ).astype(np.float32)
    g = (np.exp(-((x - .6) ** 2 + (y - .55) ** 2) / .02) + .05
         ).astype(np.float32)
    loss_o, grad_o = _oracle_gradient(f, g, num_steps=10, step_scale=1.0)
    loss_n, grad_n = native.bfm_gradient(f, g, num_steps=10,
                                         step_scale=1.0, nsub=2)
    assert abs(loss_n - loss_o) / abs(loss_o) < 1e-3
    assert (np.linalg.norm(grad_n - grad_o)
            / np.linalg.norm(grad_o)) < 1e-3
