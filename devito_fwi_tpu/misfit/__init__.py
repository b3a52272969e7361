"""Misfit layer: L2 and quadratic-Wasserstein (1-D trace-wise, 2-D BFM).

Re-design of the reference ``misfit/`` package: the optimal-transport
solver is pure JAX (``bfm.py``) instead of an FFTW/OpenMP C subprocess,
so W2 misfits fuse into the jitted FWI objective and batch over shots
with vmap.
"""
from .w2 import least_square, least_square_jax, qWasserstein, Misfit
from .bfm import bfm, bfmx, bfm_jax

__all__ = ["least_square", "least_square_jax", "qWasserstein", "Misfit",
           "bfm", "bfmx", "bfm_jax"]
