#!/usr/bin/env python
"""Localize the 3-D saved-route loss vs the bare-sweep roofline.

tools/bench_3d_roofline.py measured the bare 3-D XLA scan at 24.2
Gcs/s 1-sweep (save_history 23.7, read_history 20.7) at the bench
config-5 size, while the production saved-route gradient composite is
~8.7 — ~37% of ceiling. This probe times the PRODUCTION pieces
(ops.acoustic.forward save=True with src/rec, ops.acoustic.gradient
from the saved history) in one process to find where the 2.5x goes.

Usage: python tools/bench_3d_pieces.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(n=64, tn=500.0, nsrc=4):
    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu import AcquisitionGeometry
    from devito_fwi_tpu.ops.interp import interp_table
    from devito_fwi_tpu.ops import acoustic as ac
    from devito_fwi_tpu.fwi import _solver_dt

    kw = dict(shape=(n, n, n), spacing=(15., 15., 15.), space_order=8,
              nbl=16, dt=1.5)
    model = demo_model("layers-isotropic", nlayers=3, **kw)
    nrec = 48
    ext = model.domain_size[0]
    src = np.stack([np.linspace(0, ext, nsrc), np.full(nsrc, ext / 2),
                    np.full(nsrc, 30.0)], 1)
    rec = np.stack([np.linspace(0, ext, nrec), np.full(nrec, ext / 2),
                    np.full(nrec, 30.0)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0.0, tn, f0=0.012,
                               src_type="Ricker")
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    s_idx_b = jnp.asarray(s_idx)[:, None]
    s_w_b = jnp.asarray(s_w)[:, None]
    r_idx_j, r_w_j = jnp.asarray(r_idx), jnp.asarray(r_w)
    vp, damp = jnp.asarray(model.vp), jnp.asarray(model.damp)
    wav = jnp.asarray(geom.src.data[:, :1])
    dt = float(_solver_dt(geom))
    nt = geom.nt
    cells = int(np.prod(model.padded_shape))
    B = nsrc
    st = dict(nt=nt, spacing=model.spacing, space_order=8, kernel="OT2",
              fs=False)

    fetch = jax.jit(lambda x: x.ravel()[0])

    def timeit(fn, *a, n_rep=5):
        # never hold a result across calls: one live (nt, 96^3) 4-shot
        # history is 7.1 GB — two OOM the 16 GB chip
        float(fetch(fn(*a)))
        best = float("inf")
        for _ in range(n_rep):
            t0 = time.perf_counter()
            float(fetch(fn(*a)))
            best = min(best, time.perf_counter() - t0)
        return best

    out = {"padded": list(model.padded_shape), "nt": nt, "B": B}

    # (f32 save=True at B=4 OOMs as a standalone jit output — the scan
    # stack + the jit result copy are both live; the bf16 variant below
    # is the production one)

    # 2. production forward save=False
    @jax.jit
    def fwd_nosave():
        rec_d, _fin = jax.vmap(
            lambda a, b: ac.forward(vp, damp, wav, a, b, r_idx_j, r_w_j,
                                    dt, save=False, **st))(s_idx_b, s_w_b)
        return rec_d

    t = timeit(fwd_nosave)
    out["fwd_nosave_s"] = round(t, 4)
    out["fwd_nosave_gcs_1sweep"] = round(B * nt * cells / t / 1e9, 2)
    rec_d = jax.block_until_ready(fwd_nosave())

    # 1b. bf16 saved forward
    @jax.jit
    def fwd_save16():
        rec_d, u_hist = jax.vmap(
            lambda a, b: ac.forward(vp, damp, wav, a, b, r_idx_j, r_w_j,
                                    dt, save=True, save_dtype="bfloat16",
                                    **st))(s_idx_b, s_w_b)
        return u_hist

    t = timeit(fwd_save16)
    out["fwd_save16_s"] = round(t, 4)
    out["fwd_save16_gcs_1sweep"] = round(B * nt * cells / t / 1e9, 2)

    # 3. production reverse variants — hist passed as an ARGUMENT
    box = tuple(int(np.unique(np.asarray(r_idx)[..., d]).min())
                for d in (1, 2))

    def make_rev(**g_kw):
        @jax.jit
        def rev(hist_a, res_a):
            def per(h, r):
                outp = ac.gradient(vp, damp, h, r, r_idx_j, r_w_j, dt,
                                   **g_kw, **st)
                return outp[0] + (outp[2] if len(outp) == 3 else 0.0)
            return jnp.sum(jax.vmap(per)(hist_a, res_a), axis=0)
        return rev

    res = 0.3 * jnp.asarray(np.asarray(rec_d))
    hist = jax.block_until_ready(fwd_save16())
    for name, g_kw in (("rev_old_bf16", {}),
                       ("rev_box_bf16", dict(rec_box=box)),
                       ("rev_box_illum_bf16", dict(rec_box=box,
                                                   with_illum=True))):
        t = timeit(make_rev(**g_kw), hist, res)
        out[f"{name}_s"] = round(t, 4)
        out[f"{name}_gcs_1sweep"] = round(B * nt * cells / t / 1e9, 2)

    tot = out["fwd_save16_s"] + out["rev_box_illum_bf16_s"]
    out["composite_gcs_fwd_adj"] = round(2 * B * nt * cells / tot / 1e9, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
