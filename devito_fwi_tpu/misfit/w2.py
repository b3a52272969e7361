"""Quadratic-Wasserstein misfits (trace-wise 1-D and BFM 2-D).

Re-implementation of reference ``misfit/misfit.py`` with both a
numpy host path (API parity) and jittable JAX paths so the whole FWI
objective can fuse into one TPU program:

* positivity transforms linear/square/exp/softplus with chain-rule factor d
  (``misfit/misfit.py:20-45``)
* 1-D W2 per trace: normalize to probability, CDF quantile map via interp,
  loss ``.5*sum((t-T)^2 mu)``, closed-form gradient via cumulative sums
  (``misfit/misfit.py:47-67``)
* 2-D W2 delegates to the back-and-forth solver in ``misfit.bfm``
  (``misfit/misfit.py:69-79``).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["least_square", "qWasserstein", "Misfit", "transform_jax",
           "w2_1d_jax"]


def least_square(x, y):
    """L2 misfit (reference ``misfit/misfit.py:5-9``)."""
    residual = x - y
    fval = 0.5 * float(np.linalg.norm(np.asarray(residual).ravel()) ** 2)
    return fval, residual


def least_square_jax(x, y):
    residual = x - y
    return 0.5 * jnp.sum(residual * residual), residual


def transform_jax(f, g, trans_type="linear", gamma=1.0):
    """Positivity transform -> (mu, nu, d) with d the chain-rule factor."""
    if trans_type == "linear":
        min_value = jnp.minimum(f.min(), g.min())
        c = jnp.where(min_value < 0, -min_value, 0.0) * gamma
        return f + c, g + c, jnp.ones_like(f)
    elif trans_type == "square":
        return f * f, g * g, 2 * f
    elif trans_type == "exp":
        mu = jnp.exp(gamma * f)
        return mu, jnp.exp(gamma * g), gamma * mu
    elif trans_type == "softplus":
        mu = jnp.log(jnp.exp(gamma * f) + 1)
        nu = jnp.log(jnp.exp(gamma * g) + 1)
        # true chain-rule factor d(mu)/df = gamma*sigmoid(gamma*f).
        # Documented divergence: the reference's misfit.py writes
        # gamma/exp(-gamma*f) = gamma*exp(gamma*f) — an unbounded factor
        # that makes the softplus gradient not descend its own loss
        return mu, nu, gamma / (1.0 + jnp.exp(-gamma * f))
    else:
        return f, g, jnp.ones_like(f)


def _interp_mono(x, xp, fp):
    """``jnp.interp`` for monotone `xp`, with the index search as a dense
    vectorized count instead of a binary search: ``jnp.interp``/
    ``searchsorted`` compile to minutes-slow while-loops on TPU, while the
    O(n^2) compare-reduce fuses into one VPU reduction (~1 ms for a full
    shot gather). Matches ``jnp.interp`` to float rounding."""
    n = xp.shape[0]
    idx = jnp.sum((xp[None, :] <= x[:, None]).astype(jnp.int32), axis=1) - 1
    idx = jnp.clip(idx, 0, n - 2)
    x0 = jnp.take(xp, idx)
    x1 = jnp.take(xp, idx + 1)
    f0 = jnp.take(fp, idx)
    f1 = jnp.take(fp, idx + 1)
    dx = x1 - x0
    w = jnp.where(dx > 0, (x - x0) / jnp.where(dx > 0, dx, 1.0), 0.0)
    y = f0 + w * (f1 - f0)
    y = jnp.where(x <= xp[0], fp[0], y)
    y = jnp.where(x >= xp[-1], fp[-1], y)
    return y


def w2_1d_jax(f, g):
    """Trace-wise quadratic Wasserstein distance of two positive 1-D signals.

    Jittable replica of reference ``misfit/misfit.py:47-67``.
    """
    # dead-trace guard: an all-zero channel must yield loss 0 / grad 0,
    # not divide by zero and poison the summed objective with NaN
    mass = jnp.sum(f)
    mass_g = jnp.sum(g)
    live = (mass > 0) & (mass_g > 0)
    mu = f / jnp.where(live, mass, 1.0)
    nu = g / jnp.where(live, mass_g, 1.0)
    t = jnp.linspace(0.0, 1.0, mu.shape[0], dtype=f.dtype)
    F = jnp.cumsum(mu)
    G = jnp.cumsum(nu)
    T = _interp_mono(F, G, t)
    d = t - T
    loss = 0.5 * jnp.sum(d * d * mu)
    grad = jnp.cumsum(d) - jnp.sum(d)
    grad = (grad - jnp.sum(grad * mu)) / jnp.where(live, mass, 1.0)
    return jnp.where(live, loss, 0.0), jnp.where(live, grad, 0.0)


def _qw_jax_impl(f, g, *, trans_type, gamma, method, num_steps,
                 step_scale, bfm_backend, push_backend=None,
                 legendre_banded=None):
    """Traceable qWasserstein body (configuration as explicit args so
    the jitted form caches correctly — see qWasserstein.__call__).
    ``push_backend``/``legendre_banded`` are the BFM backend statics,
    resolved from the env by the CALLER outside any jit
    (``bfm.resolve_backends``) so env toggles retrace."""
    mu, nu, d = transform_jax(f, g, trans_type, gamma)
    if method == "1d":
        losses, grads = jax.vmap(w2_1d_jax, in_axes=1, out_axes=(0, 1))(
            mu, nu)
        return jnp.sum(losses), grads * d
    # reference misfit.py:73 computes mass from the TRANSFORMED
    # density (its `_2d_calculator(f=mu, ...)` receives mu), not the
    # raw traces
    # dead-gather guard: an all-zero mu (fully muted shot with the
    # default linear transform) has mass 0; the BFM already returns
    # loss 0 / grad 0 for it, and dividing that zero gradient by a
    # zero mass would resurrect it as NaN
    mass = jnp.sum(mu) / mu.size
    mass = jnp.where(mass > 0, mass, 1.0)
    if bfm_backend == "native":
        # host callback into the C++ OpenMP BFM: the TPU program
        # pauses, ships the (batched under vmap) densities to the
        # host, and gets loss/grad back — the in-process analog of
        # the reference's bfm2d subprocess round trip
        loss, grad = _native_bfm_callback(mu, nu, num_steps, step_scale)
    else:
        from .bfm import bfm_jax
        loss, grad = bfm_jax(mu, nu, num_steps=num_steps,
                             step_scale=step_scale,
                             push_backend=push_backend,
                             legendre_banded=legendre_banded)
    return loss, (grad / mass) * d


_qw_jitted = jax.jit(_qw_jax_impl,
                     static_argnames=("trans_type", "gamma", "method",
                                      "num_steps", "step_scale",
                                      "bfm_backend", "push_backend",
                                      "legendre_banded"))


def _bfm_statics(method, bfm_backend):
    """Call-time BFM backend statics for the jitted qWasserstein paths
    (None when the BFM is not in play, to avoid spurious retraces)."""
    if method != "2d" or bfm_backend == "native":
        return None, None
    from .bfm import resolve_backends
    return resolve_backends()


class qWasserstein:
    """Quadratic-Wasserstein misfit (reference ``misfit/misfit.py:11-104``).

    ``__call__`` takes numpy (nt, ntraces) shot gathers and returns
    ``(loss, grad)``; ``jax(f, g)`` is the jit-traceable equivalent used by
    the fused objective.
    """

    def __init__(self, trans_type="linear", gamma=1.0, method="1d",
                 num_steps=10, step_scale=1.0, bfm_backend="jax"):
        self.gamma = gamma
        assert method in ("1d", "2d")
        self.method = method
        self.trans_type = trans_type
        self.num_steps = num_steps
        self.step_scale = step_scale
        self.bfm_backend = bfm_backend
        self._bfm = None

    # ------------------------------------------------------------------ jax
    def jax(self, f, g):
        push, leg = _bfm_statics(self.method, self.bfm_backend)
        return _qw_jax_impl(f, g, trans_type=self.trans_type,
                            gamma=self.gamma, method=self.method,
                            num_steps=self.num_steps,
                            step_scale=self.step_scale,
                            bfm_backend=self.bfm_backend,
                            push_backend=push, legendre_banded=leg)

    def jax_batch(self, f_b, g_b):
        """Traceable batched misfit over a (B, nt, ntraces) shot stack:
        returns ``(fvals (B,), residuals (B, nt, ntraces))``. For the 2-D
        method this routes through the batch-native BFM
        (``bfm.bfm_jax_batch``) whose banded-matmul pushforward needs a
        batch-wide ``lax.cond`` — a per-shot ``vmap`` of :meth:`jax`
        would degrade it to the slow scatter unconditionally."""
        if self.method != "2d" or self.bfm_backend == "native":
            return jax.vmap(self.jax)(f_b, g_b)
        mus, nus, ds = jax.vmap(
            lambda f, g: transform_jax(f, g, self.trans_type, self.gamma)
        )(f_b, g_b)
        mass = jnp.sum(mus, axis=(1, 2)) / (mus.shape[1] * mus.shape[2])
        # per-shot dead-gather guard (see _qw_jax_impl): keep the BFM's
        # zero gradient zero instead of 0/0 = NaN poisoning the batch
        mass = jnp.where(mass > 0, mass, 1.0)
        from .bfm import bfm_jax_batch
        push, leg = _bfm_statics(self.method, self.bfm_backend)
        losses, grads = bfm_jax_batch(mus, nus, num_steps=self.num_steps,
                                      step_scale=self.step_scale,
                                      push_backend=push,
                                      legendre_banded=leg)
        return losses, (grads / mass[:, None, None]) * ds

    # ---------------------------------------------------------------- numpy
    def __call__(self, f, g):
        f = np.asarray(f)
        g = np.asarray(g)
        shape = f.shape
        ntr = 1 if f.ndim == 1 else shape[1]
        if self.method == "2d" and ntr <= 1:
            raise ValueError("Can not use 2d method for 1D input.")
        if f.ndim == 1:
            f = f[:, None]
            g = g[:, None]
        if self.method == "2d" and self.bfm_backend == "native":
            # C++ BFM (native/bfm2d.cpp): host-side parity anchor for the
            # reference's QW2D/bin/bfm2d subprocess binary
            from .native import bfm_gradient
            mu, nu, d = transform_jax(jnp.asarray(f), jnp.asarray(g),
                                      self.trans_type, self.gamma)
            mass = float(np.sum(np.asarray(mu)) / mu.size)
            if mass <= 0:  # dead gather: native BFM returns grad 0
                mass = 1.0
            loss, grad = bfm_gradient(np.asarray(mu), np.asarray(nu),
                                      num_steps=self.num_steps,
                                      step_scale=self.step_scale)
            grad = (grad / mass) * np.asarray(d)
            return float(loss), grad.reshape(shape)
        # jit the whole misfit (eager per-op dispatch over the TPU
        # tunnel would pay one host round-trip per primitive). The
        # configuration enters the jitted impl as real (static)
        # arguments, so mutating e.g. gamma between calls (a gamma-
        # continuation loop) retraces instead of silently reusing a
        # stale trace. (A per-instance ``jax.jit(self.jax)`` does NOT
        # achieve this: jit keys its global cache on the bound method,
        # and the attribute values read at trace time go stale.)
        push, leg = _bfm_statics(self.method, self.bfm_backend)
        loss, grad = _qw_jitted(
            jnp.asarray(f), jnp.asarray(g), trans_type=self.trans_type,
            gamma=self.gamma, method=self.method,
            num_steps=self.num_steps, step_scale=self.step_scale,
            bfm_backend=self.bfm_backend,
            push_backend=push, legendre_banded=leg)
        return float(loss), np.asarray(grad).reshape(shape)

    def batch(self, f_b, g_b):
        """Vectorized misfit over a (nb, nt, ntraces) shot batch — the
        analog of the reference's MPI batch binary ``mpibfm2d``
        (``misfit/QW2D/bin/``). Native 2-D gathers fan out over OpenMP
        threads in a single C call; other configurations fall back to a
        per-gather loop."""
        f_b = np.asarray(f_b)
        g_b = np.asarray(g_b)
        if self.method == "2d" and self.bfm_backend == "native":
            from .native import bfm_gradient_batch
            mu, nu, d = _transform_np_batch(f_b, g_b, self.trans_type,
                                            self.gamma)
            mass = mu.reshape(mu.shape[0], -1).sum(axis=1) \
                / float(mu[0].size)
            mass = np.where(mass > 0, mass, 1.0)  # dead-gather guard
            losses, grads = bfm_gradient_batch(
                mu, nu, num_steps=self.num_steps,
                step_scale=self.step_scale)
            grads = (grads / mass[:, None, None]) * d
            return losses, grads
        out = [self(f, g) for f, g in zip(f_b, g_b)]
        # same return type as the native path (an (nb, nt, ntr) array)
        return np.array([o[0] for o in out]), \
            np.stack([o[1] for o in out])


def _transform_np_batch(f, g, trans_type, gamma):
    """Per-gather positivity transform over a (nb, nt, ntraces) batch;
    numpy twin of ``transform_jax`` with reductions per gather."""
    if trans_type == "linear":
        mn = np.minimum(f.min(axis=(1, 2)), g.min(axis=(1, 2)))
        c = (np.where(mn < 0, -mn, 0.0) * gamma)[:, None, None]
        return f + c, g + c, np.ones_like(f)
    if trans_type == "square":
        return f * f, g * g, 2 * f
    if trans_type == "exp":
        mu = np.exp(gamma * f)
        return mu, np.exp(gamma * g), gamma * mu
    if trans_type == "softplus":
        mu = np.log(np.exp(gamma * f) + 1)
        nu = np.log(np.exp(gamma * g) + 1)
        # true derivative (see transform_jax's documented divergence)
        return mu, nu, gamma / (1.0 + np.exp(-gamma * f))
    return f, g, np.ones_like(f)


def _native_bfm_callback(mu, nu, num_steps, step_scale):
    """jittable wrapper over the native batch BFM via jax.pure_callback
    (vmap-batchable: the callback sees the whole shot batch and fans it
    out over OpenMP threads)."""
    from .native import bfm_gradient, bfm_gradient_batch

    def cb(mu_h, nu_h):
        mu_h = np.ascontiguousarray(mu_h, dtype=np.float32)
        nu_h = np.ascontiguousarray(nu_h, dtype=np.float32)
        if mu_h.ndim == 3:
            loss, grad = bfm_gradient_batch(mu_h, nu_h,
                                            num_steps=num_steps,
                                            step_scale=step_scale)
            return loss.astype(np.float32), grad
        loss, grad = bfm_gradient(mu_h, nu_h, num_steps=num_steps,
                                  step_scale=step_scale)
        return np.float32(loss), grad

    out_shape = (jax.ShapeDtypeStruct((), jnp.float32),
                 jax.ShapeDtypeStruct(mu.shape, jnp.float32))
    loss, grad = jax.pure_callback(cb, out_shape, mu, nu,
                                   vmap_method="expand_dims")
    return loss.astype(mu.dtype), grad.astype(mu.dtype)


class Misfit:
    """Wrapper (reference ``misfit/misfit.py:106-111``)."""

    def __init__(self, operator):
        self.operator = operator

    def __call__(self, x, y):
        return self.operator(x, y)
