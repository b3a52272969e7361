"""One-process 3-D gradient-path A/B for the real chip.

Times the bench's 3-D config (64^3+nbl, 4 shots, L2 gradient) across:

  * ``ckpt``   — the fused objective's current path: 3 sweeps/step
    (forward checkpoint sweep, reverse recompute, adjoint), via
    ``fwi_obj_multi``;
  * ``saved``  — the 2-sweep alternative: ``forward(save=True)`` streams
    the full wavefield history to HBM (4 shots x ~1.2 GB here), the
    reverse sweep consumes it (``ops.acoustic.gradient``);

each under ``DEVITO_FWI_TPU_PALLAS3`` 0/1 (the x-blocked per-step Pallas
leapfrog). Cross-process spread on the tunnel chip is ~20%, so all four
variants run in this one process (CLAUDE.md); min-of-N with a scalar
fetch per call. Use the result to route the 3-D fused objective.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(n=64, tn=500.0):
    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu import AcquisitionGeometry
    from devito_fwi_tpu.fwi import fwi_obj_multi, fm_multi
    from devito_fwi_tpu.misfit import least_square
    from devito_fwi_tpu.ops.interp import interp_table
    from devito_fwi_tpu.ops import acoustic as ac

    kw = dict(shape=(n, n, n), spacing=(15., 15., 15.), space_order=8,
              nbl=16, dt=1.5)
    model1 = demo_model("layers-isotropic", nlayers=3, **kw)
    model0 = demo_model("layers-isotropic", nlayers=1, **kw)
    nsrc, nrec = 4, 48
    ext = model1.domain_size[0]
    src = np.stack([np.linspace(0, ext, nsrc), np.full(nsrc, ext / 2),
                    np.full(nsrc, 30.0)], 1)
    rec = np.stack([np.linspace(0, ext, nrec), np.full(nrec, ext / 2),
                    np.full(nrec, 30.0)], 1)
    g1 = AcquisitionGeometry(model1, rec, src, 0.0, tn, f0=0.012,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(model0, rec, src, 0.0, tn, f0=0.012,
                             src_type="Ricker")
    obs = fm_multi(g1)
    obs_stack = jnp.asarray(np.stack([np.asarray(o.data) for o in obs]))

    s_idx, s_w = interp_table(g0.src_positions, model0.origin_pml,
                              model0.spacing, dtype=np.float32)
    r_idx, r_w = interp_table(g0.rec_positions, model0.origin_pml,
                              model0.spacing, dtype=np.float32)
    s_idx_b = jnp.asarray(s_idx)[:, None]
    s_w_b = jnp.asarray(s_w)[:, None]
    r_idx_j, r_w_j = jnp.asarray(r_idx), jnp.asarray(r_w)
    vp = jnp.asarray(model0.vp)
    damp = jnp.asarray(model0.damp)
    wav = jnp.asarray(g0.src.data[:, :1])
    dt = float(g0.dt)
    okw = dict(nt=g0.nt, spacing=model0.spacing,
               space_order=model0.space_order, kernel="OT2", fs=False)
    fetch = jax.jit(lambda x: x.ravel()[0])

    nt = g0.nt
    cells = float(np.prod(model0.padded_shape))

    def time_best(fn, n=4):
        """fn must end in a real device->host dependency (the tunnel's
        block_until_ready returns early — CLAUDE.md)."""
        best = float("inf")
        for _ in range(n):
            tic = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - tic)
        return best

    results = {}
    for p3 in ("0", "1"):
        os.environ["DEVITO_FWI_TPU_PALLAS3"] = p3
        jax.clear_caches()

        def obj_ckpt():
            # fwi_obj_multi returns the gradient as a host numpy array —
            # already a real fetch
            f, g, _ = fwi_obj_multi(g0, obs, least_square, None, None,
                                    True, calc_grad=True)
            return float(f)

        @jax.jit
        def _grad_saved():
            def per(a, b, ob):
                rec, u = ac.forward(vp, damp, wav, a, b, r_idx_j, r_w_j,
                                    dt, save=True, **okw)
                gr, _ = ac.gradient(vp, damp, u, rec - ob, r_idx_j,
                                    r_w_j, dt, **okw)
                return gr
            return jnp.sum(jax.vmap(per)(s_idx_b, s_w_b, obs_stack), 0)

        def grad_saved():
            return float(fetch(_grad_saved()))

        for name, fn in (("ckpt", obj_ckpt), ("saved", grad_saved)):
            try:
                fn()  # compile + sanity
                t = time_best(fn)
                gcs = 2.0 * nsrc * nt * cells / t / 1e9
                results[f"{name}_p3{p3}_s"] = round(t, 4)
                results[f"{name}_p3{p3}_gcs"] = round(gcs, 2)
                print(f"{name} PALLAS3={p3}: {t:.3f} s  {gcs:.2f} Gcs/s",
                      flush=True)
            except Exception as e:  # OOM etc. — record and continue
                results[f"{name}_p3{p3}_error"] = repr(e)[:200]
                print(f"{name} PALLAS3={p3}: FAILED {e!r}", flush=True)

    os.environ.pop("DEVITO_FWI_TPU_PALLAS3", None)
    print(json.dumps(results))


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=64, help="cube edge")
    p.add_argument("--tn", type=float, default=500.0)
    a = p.parse_args()
    main(a.n, a.tn)
