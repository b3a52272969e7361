"""First-order (pressure-velocity) staggered-grid acoustics.

Runnable port of the reference tutorial
``seismic/tutorials/05_staggered_acoustic.ipynb``: the 2nd-order-in-space
system

    dv/dt = 1/rho grad(p)        (velocity on half-staggered points)
    dp/dt = rho Vp^2 div(v)      (pressure on nodes)

advanced with the same leapfrog the notebook's devito operator generates
(``v.forward = v + dt/rho * grad(p)``; ``p.forward = p + dt*rho*Vp^2 *
div(v.forward)``), a DGauss source at the domain centre, and the
notebook's golden ``norm(p) = 0.35098`` (the devito ``norm`` of a
``time_order=1`` TimeFunction covers BOTH time buffers — last and
second-to-last steps).

The 4th-order staggered variant uses the classic (9/8, -1/24)
half-point coefficients. The notebook's second assert re-checks the
2nd-order field by name (``norm(p)``, not ``p4``) so the reference pins
no 4th-order value; ours is asserted at 0.33737.

Where this lands in the framework: the same staggered first-derivative
machinery powers the production elastic/viscoelastic solvers
(``ops/staggered.py``) and the staggered TTI kernel (``ops/tti.py``).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # some environments pre-register a TPU platform via sitecustomize,
    # overriding the env var (CLAUDE.md) — honor an explicit cpu request
    jax.config.update("jax_platforms", "cpu")

from devito_fwi_tpu.models.sources import dgauss_wavelet


def staggered_diff(f, axis, h, so, forward):
    """Staggered first derivative along ``axis`` with zero halo:
    ``forward=True`` evaluates at i+1/2 (node field -> staggered field),
    ``False`` at i-1/2... i (staggered -> node). so in {2, 4}."""
    fp = jnp.pad(f, 2)
    base = [slice(2, -2)] * f.ndim

    def sh(k):
        t = list(base)
        t[axis] = slice(2 + k, f.shape[axis] + 2 + k)
        return fp[tuple(t)]

    a, b = (1, 0) if forward else (0, -1)
    if so == 2:
        return (sh(a) - sh(b)) / h
    return (9. / 8. * (sh(a) - sh(b))
            - 1. / 24. * (sh(a + 1) - sh(b - 1))) / h


def run(so, shape=(81, 81), extent=2000., tn=200., vp=4.0, density=1.0,
        f0=0.01, amp=0.004):
    h = extent / (shape[0] - 1)
    dt = 1e2 * (1. / np.sqrt(2.)) / 60.          # notebook's CFL choice
    num = int(np.ceil((tn - 0.) / dt)) + 1
    tv = np.linspace(0., dt * (num - 1), num)
    wav = jnp.asarray(dgauss_wavelet(tv, f0, a=amp), jnp.float32)
    ro = dt / density
    l2m = dt * density * vp * vp
    si = (shape[0] // 2, shape[1] // 2)

    def body(carry, w):
        p, vx, vz = carry
        vx = vx + ro * staggered_diff(p, 0, h, so, True)
        vz = vz + ro * staggered_diff(p, 1, h, so, True)
        pn = p + l2m * (staggered_diff(vx, 0, h, so, False)
                        + staggered_diff(vz, 1, h, so, False))
        pn = pn.at[si].add(w)
        return (pn, vx, vz), p

    z = jnp.zeros(shape, jnp.float32)
    (p, vx, vz), hist = jax.lax.scan(body, (z, z, z), wav[:num - 1])
    # devito norm(p) covers the TimeFunction's two time buffers
    return float(jnp.sqrt(jnp.sum(p ** 2) + jnp.sum(hist[-1] ** 2)))


def main():
    n2 = run(2)
    print(f"2nd-order staggered: norm(p) = {n2:.5f}  (notebook: 0.35098)")
    assert np.isclose(n2, 0.35098, atol=1e-4, rtol=0), n2
    n4 = run(4)
    print(f"4th-order staggered: norm(p) = {n4:.5f}")
    assert np.isclose(n4, 0.33737, atol=1e-4, rtol=0), n4
    print("ok")


if __name__ == "__main__":
    main()
