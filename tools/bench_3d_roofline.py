#!/usr/bin/env python
"""3-D roofline probe: bare XLA leapfrog sweeps (no src/rec/history) at
the bench config-5 size, timed on chip in one process — the honest
per-sweep ceiling the 3-D gradient routes should be judged against
(the 2-D equivalent is documented at 32-34 Gcs/s 1-sweep).

Variants:
  * bare scan (2 carries, no outputs)            — the fwd ceiling
  * save-history scan (writes u each step)       — the saved-route fwd
  * read-history scan (reads u[t] each step)     — the saved-route rev

Usage: python tools/bench_3d_roofline.py [--shape 64] [--nbl 16]
       [--nt 500] [--nsrc 4]
"""
import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, default=64)
    ap.add_argument("--nbl", type=int, default=16)
    ap.add_argument("--nt", type=int, default=500)
    ap.add_argument("--nsrc", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu.ops.acoustic import _prep, _make_lap

    kw = dict(shape=(args.shape,) * 3, spacing=(15.,) * 3, space_order=8,
              nbl=args.nbl, dt=1.5)
    model = demo_model("layers-isotropic", nlayers=3, **kw)
    w, inv_h2, m, s2, hd, inv_mhd = _prep(
        jnp.asarray(model.vp), jnp.asarray(model.damp), 1.5,
        model.spacing, 8)
    lap = _make_lap(m, w, inv_h2, False, "OT2", s2)
    B, nt = args.nsrc, args.nt
    cells = int(np.prod(model.padded_shape))
    shape3 = model.padded_shape

    def step(u, up):
        return (s2 * lap(u) + (2.0 * m + hd) * u - m * up) * inv_mhd

    fetch = jax.jit(lambda x: x.ravel()[0])

    def timeit(fn, *a):
        out = jax.block_until_ready(fn(*a))
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(fetch(fn(*a)))
            best = min(best, time.perf_counter() - t0)
        return best

    z = jnp.zeros((B,) + shape3, jnp.float32)

    @jax.jit
    def bare(u0):
        def body(c, _):
            u, up = c
            return (step(u, up) + 1e-30, u), None
        (u, _), _ = jax.lax.scan(
            body, (u0, jnp.zeros_like(u0)), None, length=nt)
        return u

    @jax.jit
    def save(u0):
        def body(c, _):
            u, up = c
            un = step(u, up) + 1e-30
            return (un, u), un
        _, hist = jax.lax.scan(
            body, (u0, jnp.zeros_like(u0)), None, length=nt)
        return hist[-1]

    # hist passed as a jit ARGUMENT — a closure capture of a ~GB array
    # lowers as a program constant and round-trips the tunnel at compile
    # time (CLAUDE.md)
    hist0 = jnp.zeros((nt,) + shape3, jnp.float32)

    @jax.jit
    def read(u0, hist):
        def body(c, t):
            u, up = c
            ut = jax.lax.dynamic_index_in_dim(hist, t, keepdims=False)
            return (step(u, up) + ut[None] * 1e-30, u), None
        (u, _), _ = jax.lax.scan(
            body, (u0, jnp.zeros_like(u0)), jnp.arange(nt))
        return u

    out = {"padded": list(shape3), "nt": nt, "B": B}
    # vmapped step functions operate on the (B, ...) leading axis already
    for name, fn in (("bare_scan", bare), ("save_history", save)):
        t = timeit(fn, z)
        out[f"{name}_s"] = round(t, 4)
        out[f"{name}_gcs_1sweep"] = round(B * nt * cells / t / 1e9, 2)
    # read-history: hist is per-shot in the saved route; time the
    # single-shot version scaled
    t = timeit(read, z, hist0)
    out["read_history_s"] = round(t, 4)
    out["read_history_gcs_1sweep"] = round(B * nt * cells / t / 1e9, 2)
    out["note"] = ("read_history reads ONE shot's history shared across "
                   "the batch — an optimistic rev ceiling")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
