"""ctypes bindings for the native C++ BFM W2-2D solver (``native/bfm2d.cpp``).

This is the TPU-framework's equivalent of the reference's native misfit
stack: the ``bfm2d`` subprocess binary built from ``misfit/QW2D/src``
(``misfit/bfm.py:145-192``), the non-vendored ``w2`` extension module with
its ``ctransform``/``pushforward`` kernels (``misfit/bfm.py:1``), and the
MPI ``mpibfm2d`` batch binary (OpenMP task batch here). The library is
built on demand with ``make -C native`` and loaded in-process — no file
I/O or subprocess round trips.

The JAX solver (``misfit.bfm.bfm_jax``) remains the production TPU path;
this native solver is the CPU parity anchor (exact sequential convex hull,
float64 internals) and the fast host-side option.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "bfm_gradient", "bfm_gradient_batch", "ctransform",
           "pushforward", "bfm_native"]

_LIB = None
_TRIED = False


def _root():
    return os.path.abspath(os.path.join(os.path.dirname(__file__),
                                        "..", ".."))


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(_root(), "native", "libbfm2d.so")
    # Always invoke make: it is a no-op when the .so is newer than
    # bfm2d.cpp, and it guarantees source edits are never shadowed by a
    # stale binary (the .so is gitignored, never committed).
    try:
        subprocess.run(["make", "-C", os.path.dirname(path)],
                       check=True, capture_output=True)
    except Exception:
        if not os.path.exists(path):
            return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None
    fp = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
    lib.bfm2d_gradient.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_int, ctypes.c_float,
                                   ctypes.c_int, fp,
                                   ctypes.POINTER(ctypes.c_float)]
    lib.bfm2d_gradient.restype = ctypes.c_int
    dp = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")
    try:
        # optional symbol: a stale pre-r4 .so (make failed, binary
        # survives) must degrade to phases-unavailable, not break
        # available() for every caller
        lib.bfm2d_gradient_timed.argtypes = [
            fp, fp, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_int, fp,
            ctypes.POINTER(ctypes.c_float), dp]
        lib.bfm2d_gradient_timed.restype = ctypes.c_int
    except AttributeError:
        pass
    lib.bfm2d_gradient_batch.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int,
                                         ctypes.c_int, ctypes.c_int,
                                         ctypes.c_float, ctypes.c_int, fp, fp]
    lib.bfm2d_gradient_batch.restype = ctypes.c_int
    lib.bfm2d_ctransform.argtypes = [fp, ctypes.c_int, ctypes.c_int, fp]
    lib.bfm2d_ctransform.restype = ctypes.c_int
    lib.bfm2d_pushforward.argtypes = [fp, fp, ctypes.c_int, ctypes.c_int,
                                      ctypes.c_int, fp]
    lib.bfm2d_pushforward.restype = ctypes.c_int
    _LIB = lib
    return lib


def available():
    return _load() is not None


def bfm_gradient(f, g, num_steps=10, step_scale=1.0, nsub=2,
                 return_phases=False):
    """(loss, grad) of the 2-D quadratic-Wasserstein distance; f, g are
    (nt, ntraces) = (n2, n1) row-major arrays like the JAX ``bfm_jax``.
    ``nsub=0`` selects the reference binary's per-cell ADAPTIVE
    pushforward supersampling (fot2d.c:405-406); positive values use a
    fixed nsub x nsub grid (2 = the reference's minimum, and what the
    jittable JAX solver uses).

    ``return_phases=True`` appends the solver's per-phase wall-clock
    breakdown — the reference C solver's 4-phase ``clock()`` printout
    (fot2d.c:530-534,599-602) as data: a dict with keys
    update / legendre / pushforward / total (seconds)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native bfm2d library unavailable")
    f = np.ascontiguousarray(f, dtype=np.float32)
    g = np.ascontiguousarray(g, dtype=np.float32)
    n2, n1 = f.shape
    grad = np.empty_like(f)
    loss = ctypes.c_float(0.0)
    if return_phases:
        if not hasattr(lib, "bfm2d_gradient_timed"):
            raise RuntimeError(
                "libbfm2d.so predates the timed ABI — rebuild with "
                "`make -C native`")
        phases = np.zeros(4, dtype=np.float64)
        rc = lib.bfm2d_gradient_timed(f, g, n1, n2, int(num_steps),
                                      float(step_scale), int(nsub), grad,
                                      ctypes.byref(loss), phases)
        if rc != 0:
            raise RuntimeError("bfm2d_gradient_timed failed rc=%d" % rc)
        keys = ("update", "legendre", "pushforward", "total")
        return float(loss.value), grad, dict(zip(keys, phases.tolist()))
    rc = lib.bfm2d_gradient(f, g, n1, n2, int(num_steps),
                            float(step_scale), int(nsub), grad,
                            ctypes.byref(loss))
    if rc != 0:
        raise RuntimeError("bfm2d_gradient failed rc=%d" % rc)
    return float(loss.value), grad


def bfm_gradient_batch(f, g, num_steps=10, step_scale=1.0, nsub=2):
    """Batched (loss[b], grad[b]) over leading axis — the mpibfm2d analog."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native bfm2d library unavailable")
    f = np.ascontiguousarray(f, dtype=np.float32)
    g = np.ascontiguousarray(g, dtype=np.float32)
    nb, n2, n1 = f.shape
    grad = np.empty_like(f)
    loss = np.empty(nb, dtype=np.float32)
    rc = lib.bfm2d_gradient_batch(f, g, nb, n1, n2, int(num_steps),
                                  float(step_scale), int(nsub), grad, loss)
    if rc != 0:
        raise RuntimeError("bfm2d_gradient_batch failed rc=%d" % rc)
    return loss, grad


def ctransform(u):
    """Separable discrete Legendre transform (quadratic-cost c-transform)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native bfm2d library unavailable")
    u = np.ascontiguousarray(u, dtype=np.float32)
    n2, n1 = u.shape
    out = np.empty_like(u)
    rc = lib.bfm2d_ctransform(u, n1, n2, out)
    if rc != 0:
        raise RuntimeError("bfm2d_ctransform failed rc=%d" % rc)
    return out


def pushforward(mu, dual, nsub=2):
    """Push the density mu through the gradient map of `dual`."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native bfm2d library unavailable")
    mu = np.ascontiguousarray(mu, dtype=np.float32)
    dual = np.ascontiguousarray(dual, dtype=np.float32)
    n2, n1 = mu.shape
    out = np.empty_like(mu)
    rc = lib.bfm2d_pushforward(mu, dual, n1, n2, int(nsub), out)
    if rc != 0:
        raise RuntimeError("bfm2d_pushforward failed rc=%d" % rc)
    return out


class bfm_native:
    """Drop-in host-side BFM driver with the same call shape as
    ``misfit.bfm.bfm`` (``gradient(f, g) -> (loss, grad)``)."""

    def __init__(self, num_steps=10, step_scale=8.0, nsub=2):
        self.num_steps = num_steps
        self.step_scale = step_scale
        self.nsub = nsub

    def gradient(self, f, g):
        return bfm_gradient(f, g, num_steps=self.num_steps,
                            step_scale=self.step_scale, nsub=self.nsub)
