"""Deriving (and numerically verifying) the acoustic time update.

Runnable analog of the reference's derivation notebook
``seismic/acoustic/acoustic_time_update_nb.ipynb``, which works the
Cerjan-damped constant-density acoustic system

    m d2u/dt2 + eta du/dt = laplacian(u) + q

into the explicit update its operator implements (reference
``seismic/acoustic/operators.py`` stencil): with the 2nd-order centred
d2u/dt2 and the FORWARD 1st-order du/dt approximation,

    m (u[t+1] - 2 u[t] + u[t-1]) / dt^2
        + eta (u[t+1] - u[t]) / dt = lap(u[t]) + q[t]

    =>  u[t+1] = ( dt^2 (lap + q) + (2 m + dt eta) u[t]
                   - m u[t-1] ) / (m + dt eta)

The framework's production update (``ops/acoustic._update``) is this
expression with ``hd = dt*eta`` and the reciprocal hoisted. Two
numerical checks replace the notebook's symbolic algebra:

1. the derived right-hand side above equals ``_update`` to f32 machine
   epsilon on random fields (they are the same algebra, associated
   slightly differently);
2. solving the damped-PDE residual for u[t+1] with a GENERIC implicit
   root find (no algebra at all) reproduces the same update, i.e. the
   derivation is correct, not just transcribed;
3. the scheme self-converges at 2nd order in dt on a smooth standing
   wave (undamped interior), the accuracy the derivation promises.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from devito_fwi_tpu.ops.acoustic import _update, _prep, _make_lap


def main():
    rng = np.random.RandomState(3)
    shape = (40, 40)
    vp = jnp.asarray(1.5 + rng.rand(*shape).astype(np.float32))
    damp = jnp.asarray(rng.rand(*shape).astype(np.float32) * 0.3)
    dt, spacing = 1.1, (10.0, 10.0)
    u = jnp.asarray(rng.randn(*shape).astype(np.float32))
    up = jnp.asarray(rng.randn(*shape).astype(np.float32))
    q = jnp.asarray(rng.randn(*shape).astype(np.float32))

    w, inv_h2, m, s2, hd, inv_mhd = _prep(vp, damp, dt, spacing, 4)
    lap_fn = _make_lap(m, w, inv_h2, False, "OT2", s2)
    lap = lap_fn(u)

    # 1. the derived closed form == the production _update
    eta = damp
    derived = (dt * dt * (lap + q) + (2 * m + dt * eta) * u - m * up) \
        / (m + dt * eta)
    prod = _update(u, up, lap, q, m, hd, s2, inv_mhd)
    d1 = float(jnp.abs(derived - prod).max() / jnp.abs(prod).max())
    print(f"derived formula vs production _update: max rel {d1:.2e}")
    assert d1 < 1e-6, d1

    # 2. derivation check with no algebra: solve the PDE residual
    #    R(un) = m(un - 2u + up)/dt^2 + eta(un - u)/dt - lap - q = 0
    #    for un. R is affine in un, so one Newton step from 0 is exact.
    def residual(un):
        return (m * (un - 2 * u + up) / dt ** 2
                + eta * (un - u) / dt - lap - q)

    r0 = residual(jnp.zeros_like(u))
    slope = (m / dt ** 2 + eta / dt)          # dR/dun
    un_solved = -r0 / slope
    d2 = float(jnp.abs(un_solved - prod).max() / jnp.abs(prod).max())
    print(f"implicit PDE solve vs production update: max rel {d2:.2e}")
    assert d2 < 1e-5, d2

    # 3. 2nd-order temporal self-convergence on a smooth standing wave
    jax.config.update("jax_enable_x64", True)
    n = 64
    x = np.arange(n) * 10.0
    u0 = np.float64(np.sin(np.pi * x[:, None] / x[-1])
                    * np.sin(np.pi * x[None, :] / x[-1]))
    vpc = jnp.full((n, n), 2.0, jnp.float64)
    zero = jnp.zeros((n, n), jnp.float64)

    def run(dt, nsteps):
        w, inv_h2, m, s2, hd, inv_mhd = _prep(vpc, zero, dt, (10., 10.), 4)
        lap_fn = _make_lap(m, w, inv_h2, False, "OT2", s2)

        def body(c, _):
            u, up = c
            un = _update(u, up, lap_fn(u), 0.0, m, hd, s2, inv_mhd)
            return (un, u), None

        # 2nd-order leapfrog start-up for du/dt(0) = 0: the Taylor
        # history u(-dt) = u0 + dt^2/(2m) lap(u0) (plain u(-dt) = u0
        # leaves an O(dt) velocity error that degrades the whole run
        # to 1st order)
        ui = jnp.asarray(u0)
        upi = ui + 0.5 * dt * dt * lap_fn(ui) / m
        (u, _), _ = jax.lax.scan(body, (ui, upi), None, length=nsteps)
        return np.asarray(u)

    T = 48.0
    errs = []
    for k in (1, 2, 4):
        dt = 1.2 / k
        coarse = run(dt, int(T / dt))
        fine = run(dt / 2, int(T / (dt / 2)))
        errs.append(np.abs(coarse - fine).max())
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(2)]
    print(f"self-convergence errors: {[f'{e:.3e}' for e in errs]}")
    print(f"observed temporal orders: {[f'{o:.2f}' for o in orders]}")
    assert all(o > 1.8 for o in orders), orders
    print("ok")


if __name__ == "__main__":
    main()
