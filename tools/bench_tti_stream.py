#!/usr/bin/env python
"""One-process on-chip A/B: TTI Pallas gradient, checkpoint+recompute vs
streamed-history route (bench config-4 workload). CLAUDE.md measurement
rules: compare variants IN ONE PROCESS, min-of-N, end every timed chain
in a real device->host scalar fetch.

Usage: python tools/bench_tti_stream.py [--repeats 6]
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
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--shape", type=int, nargs=2, default=(120, 80))
    ap.add_argument("--nbl", type=int, default=20)
    ap.add_argument("--nsrc", type=int, default=4)
    ap.add_argument("--tn", type=float, default=500.0)
    args_cli = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu import AcquisitionGeometry
    from devito_fwi_tpu.ops import tti, pallas_tti as pt
    from devito_fwi_tpu.ops.interp import interp_table
    from devito_fwi_tpu.fwi import _solver_dt

    model = demo_model("layers-tti", shape=tuple(args_cli.shape),
                       spacing=(10., 10.), nbl=args_cli.nbl,
                       space_order=8)
    nsrc, nrec = args_cli.nsrc, args_cli.shape[0]
    srcs = np.empty((nsrc, 2))
    srcs[:, 0] = np.linspace(0, model.domain_size[0], nsrc)
    srcs[:, 1] = 20.0
    rec = np.empty((nrec, 2))
    rec[:, 0] = np.linspace(0, model.domain_size[0], nrec)
    rec[:, 1] = 20.0
    geometry = AcquisitionGeometry(model, rec, srcs, 0.0, args_cli.tn,
                                   f0=0.010, src_type="Ricker")

    s_idx, s_w = interp_table(geometry.src_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    r_idx, r_w = interp_table(geometry.rec_positions, model.origin_pml,
                              model.spacing, dtype=model.dtype)
    s_idx, s_w = jnp.asarray(s_idx)[:, None], jnp.asarray(s_w)[:, None]
    r_idx, r_w = jnp.asarray(r_idx), jnp.asarray(r_w)
    params = (jnp.asarray(model.vp), jnp.asarray(model.damp),
              jnp.asarray(model.epsilon), jnp.asarray(model.delta),
              jnp.asarray(model.theta))
    wav = jnp.asarray(geometry.src.data[:, :1])
    dt = float(_solver_dt(geometry))
    nck = 16
    kw = dict(nt=geometry.nt, spacing=model.spacing, space_order=8,
              n_checkpoints=nck)

    obs, _ = jax.vmap(lambda a, b: tti.forward_ckpt(
        *params, None, wav, a, b, r_idx, r_w, dt, **kw))(s_idx, s_w)
    obs = jax.block_until_ready(0.999 * obs)

    fetch = jax.jit(lambda x: x.ravel()[0])

    def make(stream):
        @jax.jit
        def grad_all():
            return jnp.sum(pt.tti_gradient_batched_pallas(
                *params, wav, s_idx, s_w, r_idx, r_w, obs, dt,
                stream=stream, **kw), axis=0)
        return grad_all

    nt = geometry.nt
    cells = int(np.prod(model.padded_shape))
    out = {"workload": f"layers-tti {args_cli.shape}+nbl{args_cli.nbl}, "
                       f"so=8, {nsrc} shots, nt={nt}"}
    grads = {}
    for name, stream, sweeps in (("recompute", False, 6.0),
                                 ("streamed", True, 4.0)):
        fn = make(stream)
        g = jax.block_until_ready(fn())  # compile
        grads[name] = np.asarray(g)
        best = float("inf")
        for _ in range(args_cli.repeats):
            tic = time.perf_counter()
            float(fetch(fn()))
            best = min(best, time.perf_counter() - tic)
        out[f"{name}_s"] = round(best, 5)
        out[f"{name}_gcs"] = round(
            sweeps / 2.0 * 2.0 * nsrc * nt * cells / best / 1e9, 3)
    d = np.abs(grads["streamed"] - grads["recompute"]).max()
    out["max_abs_dev"] = float(d)
    out["max_rel_dev"] = float(d / np.abs(grads["recompute"]).max())
    out["speedup"] = round(out["recompute_s"] / out["streamed_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
