#!/usr/bin/env python
"""A/B the 3-D XLA scan's per-step scatter/gather against scatter-free
forms, on chip in one process.

tools/bench_3d_pieces.py measured the production saved-route pieces at
8.9 (fwd save) / 11.5 (fwd) / 3.55 (rev) Gcs/s 1-sweep against a 24.2
bare-sweep roofline (tools/bench_3d_roofline.py). The 2-D Pallas path
already replaced per-step scatters with a dense injection pattern
(``w_t * inj`` fuses into the update) and bulk MXU row assembly; this
probe measures the same ideas on the 3-D XLA scan:

  * fwd_scatter  — production form: per-step 8-corner scatter-add
  * fwd_dense    — unext = step(u, up) + src_t * inj (dense volume)
  * rev_scatter  — production adjoint: per-step receiver scatter-add
  * rev_slab     — residual as a per-step static (nx, 2, 2) slab add
                   (receivers between two y/z-planes), bulk-assembled
                   with one MXU matmul up front

Usage: python tools/bench_3d_fusion.py
"""
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(n=64, tn=500.0, nsrc=2):
    import jax
    import jax.numpy as jnp
    from devito_fwi_tpu.models.presets import demo_model
    from devito_fwi_tpu import AcquisitionGeometry
    from devito_fwi_tpu.ops.interp import interp_table
    from devito_fwi_tpu.ops.acoustic import (_prep, _make_lap, _scatter_add,
                                             _gather)
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
    vp, damp = jnp.asarray(model.vp), jnp.asarray(model.damp)
    wav = jnp.asarray(geom.src.data[:, 0])       # (nt,)
    dt = float(_solver_dt(geom))
    nt = geom.nt
    cells = int(np.prod(model.padded_shape))
    B = nsrc
    w, inv_h2, m, s2, hd, inv_mhd = _prep(vp, damp, dt, model.spacing, 8)
    lap = _make_lap(m, w, inv_h2, False, "OT2", s2)

    def step(u, up):
        return (s2 * lap(u) + (2.0 * m + hd) * u - m * up) * inv_mhd

    # batched source tables (B, 1, 8, 3) / (B, 1, 8)
    sI = jnp.asarray(s_idx)[:, None]
    sW = jnp.asarray(s_w)[:, None]
    rI, rW = jnp.asarray(r_idx), jnp.asarray(r_w)
    m_src = jax.vmap(lambda idx: _gather(m, idx))(sI)
    src_scale = sW * s2 / m_src                   # (B, 1, 8)

    # dense per-shot injection volume (B, *grid)
    def dense_inj(idx, scale):
        z = jnp.zeros(m.shape, jnp.float32)
        return _scatter_add(z, idx, scale)
    inj = jax.vmap(dense_inj)(sI, src_scale)

    fetch = jax.jit(lambda x: x.ravel()[0])

    def timeit(fn, *a, n_rep=5):
        float(fetch(fn(*a)))
        best = float("inf")
        for _ in range(n_rep):
            t0 = time.perf_counter()
            float(fetch(fn(*a)))
            best = min(best, time.perf_counter() - t0)
        return best

    out = {"padded": list(model.padded_shape), "nt": nt, "B": B}

    # ---- forward: scatter vs dense injection --------------------------
    @jax.jit
    def fwd_scatter():
        def per(idx, scale):
            def body(c, src_t):
                u, up = c
                un = step(u, up)
                un = _scatter_add(un, idx, src_t[None] * scale[0])
                return (un, u), None
            (u, _), _ = jax.lax.scan(
                body, (jnp.zeros(m.shape, jnp.float32),) * 2, wav)
            return u
        return jax.vmap(per)(sI, src_scale)

    @jax.jit
    def fwd_dense():
        def body(c, src_t):
            u, up = c
            un = step(u, up) + src_t * inj
            return (un, u), None
        (u, _), _ = jax.lax.scan(
            body, (jnp.zeros((B,) + m.shape, jnp.float32),) * 2, wav)
        return u

    for name, fn in (("fwd_scatter", fwd_scatter), ("fwd_dense", fwd_dense)):
        t = timeit(fn)
        out[f"{name}_s"] = round(t, 4)
        out[f"{name}_gcs"] = round(B * nt * cells / t / 1e9, 2)

    # ---- reverse-style sweep: receiver scatter vs static slab add ----
    # (adjoint propagation only — no history read / grad accumulate —
    # isolating the injection cost)
    res = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, nt, nrec)).astype(np.float32))
    m_rec = _gather(m, rI)
    rec_scale = rW * s2 / m_rec                  # (nrec, 8)

    @jax.jit
    def rev_scatter():
        def per(r_b):
            def body(c, rt):
                v, vn = c
                vp_ = step(v, vn)
                vp_ = _scatter_add(vp_, rI, rt[:, None] * rec_scale)
                return (vp_, v), None
            (v, _), _ = jax.lax.scan(
                body, (jnp.zeros(m.shape, jnp.float32),) * 2, r_b)
            return v
        return jax.vmap(per)(res)

    # bulk slab assembly: receivers sit between y-planes (y0, y0+1) and
    # z-planes (z0, z0+1); fold weights into V[(rec) -> (x, dy, dz)]
    xi, yi, zi = (np.asarray(r_idx)[:, :, 0], np.asarray(r_idx)[:, :, 1],
                  np.asarray(r_idx)[:, :, 2])
    y0, z0 = int(yi.min()), int(zi.min())
    nx = m.shape[0]
    Vn = np.zeros((nrec, nx * 2 * 2), np.float32)
    scale_np = np.asarray(rec_scale)
    for r in range(nrec):
        for c in range(8):
            q = (xi[r, c] * 2 + (yi[r, c] - y0)) * 2 + (zi[r, c] - z0)
            Vn[r, q] += scale_np[r, c]
    V = jnp.asarray(Vn)
    slabs = jnp.einsum("btr,rq->btq", res, V,
                       precision=jax.lax.Precision.HIGHEST
                       ).reshape(B, nt, nx, 2, 2)

    @jax.jit
    def rev_slab(slabs_a):
        def body(c, sl):
            v, vn = c
            vp_ = step(v, vn)
            vp_ = vp_.at[:, :, y0:y0 + 2, z0:z0 + 2].add(sl)
            return (vp_, v), None
        (v, _), _ = jax.lax.scan(
            body, (jnp.zeros((B,) + m.shape, jnp.float32),) * 2,
            jnp.moveaxis(slabs_a, 1, 0))
        return v

    t = timeit(rev_scatter)
    out["rev_scatter_s"] = round(t, 4)
    out["rev_scatter_gcs"] = round(B * nt * cells / t / 1e9, 2)
    t = timeit(rev_slab, slabs)
    out["rev_slab_s"] = round(t, 4)
    out["rev_slab_gcs"] = round(B * nt * cells / t / 1e9, 2)

    # parity: both reverse forms must produce identical fields
    d = float(jnp.max(jnp.abs(rev_slab(slabs) - rev_scatter())))
    out["rev_parity_max_abs"] = d

    # ---- anchors: bare sweep at THIS batch size, and the full reverse
    # (slab inject + history read + dt2 grad accumulate) ----------------
    @jax.jit
    def bare():
        def body(c, _):
            u, up = c
            return (step(u, up) + 1e-30, u), None
        (u, _), _ = jax.lax.scan(
            body, (jnp.zeros((B,) + m.shape, jnp.float32),) * 2, None,
            length=nt)
        return u

    t = timeit(bare)
    out["bare_s"] = round(t, 4)
    out["bare_gcs"] = round(B * nt * cells / t / 1e9, 2)

    hist = jnp.zeros((B, nt) + m.shape, jnp.float32)

    @jax.jit
    def rev_full(slabs_a, hist_a):
        def body(c, xs):
            v, vn, grad, u_hi, u_mid = c
            sl, t_ = xs
            u_lo = jax.lax.dynamic_index_in_dim(hist_a, t_, axis=1,
                                                keepdims=False)
            grad = grad - (u_hi - 2.0 * u_mid + u_lo) * v
            vp_ = step(v, vn)
            vp_ = vp_.at[:, :, y0:y0 + 2, z0:z0 + 2].add(sl)
            return (vp_, v, grad, u_mid, u_lo), None
        z = jnp.zeros((B,) + m.shape, jnp.float32)
        (v, _, grad, _, _), _ = jax.lax.scan(
            body, (z, z, z, hist_a[:, -1], hist_a[:, -2]),
            (jnp.moveaxis(slabs_a, 1, 0)[::-1],
             jnp.clip(jnp.arange(nt)[::-1] - 1, 0, nt - 1)))
        return grad

    t = timeit(rev_full, slabs, hist)
    out["rev_full_s"] = round(t, 4)
    out["rev_full_gcs"] = round(B * nt * cells / t / 1e9, 2)

    # bf16 history variant of the same full reverse
    hist16 = hist.astype(jnp.bfloat16)

    @jax.jit
    def rev_full16(slabs_a, hist_a):
        def body(c, xs):
            v, vn, grad, u_hi, u_mid = c
            sl, t_ = xs
            u_lo = jax.lax.dynamic_index_in_dim(hist_a, t_, axis=1,
                                                keepdims=False
                                                ).astype(jnp.float32)
            grad = grad - (u_hi - 2.0 * u_mid + u_lo) * v
            vp_ = step(v, vn)
            vp_ = vp_.at[:, :, y0:y0 + 2, z0:z0 + 2].add(sl)
            return (vp_, v, grad, u_mid, u_lo), None
        z = jnp.zeros((B,) + m.shape, jnp.float32)
        (v, _, grad, _, _), _ = jax.lax.scan(
            body, (z, z, z, hist_a[:, -1].astype(jnp.float32),
                   hist_a[:, -2].astype(jnp.float32)),
            (jnp.moveaxis(slabs_a, 1, 0)[::-1],
             jnp.clip(jnp.arange(nt)[::-1] - 1, 0, nt - 1)))
        return grad

    t = timeit(rev_full16, slabs, hist16)
    out["rev_full_bf16hist_s"] = round(t, 4)
    out["rev_full_bf16hist_gcs"] = round(B * nt * cells / t / 1e9, 2)

    # ---- pad-fused slab: un = step(...) + pad(sl) — the pad is an
    # expression XLA fuses into the update's output write (no .at[]
    # full-volume copy) ------------------------------------------------
    ny, nz = m.shape[1], m.shape[2]

    def pad_sl(sl):
        return jnp.pad(sl, ((0, 0), (0, 0), (y0, ny - y0 - 2),
                            (z0, nz - z0 - 2)))

    @jax.jit
    def rev_slab_pad(slabs_a):
        def body(c, sl):
            v, vn = c
            vp_ = step(v, vn) + pad_sl(sl)
            return (vp_, v), None
        (v, _), _ = jax.lax.scan(
            body, (jnp.zeros((B,) + m.shape, jnp.float32),) * 2,
            jnp.moveaxis(slabs_a, 1, 0))
        return v

    t = timeit(rev_slab_pad, slabs)
    out["rev_slab_pad_s"] = round(t, 4)
    out["rev_slab_pad_gcs"] = round(B * nt * cells / t / 1e9, 2)
    out["rev_pad_parity_max_abs"] = float(jnp.max(jnp.abs(
        rev_slab_pad(slabs) - rev_scatter())))

    @jax.jit
    def rev_full_pad16(slabs_a, hist_a):
        def body(c, xs):
            v, vn, grad, u_hi, u_mid = c
            sl, t_ = xs
            u_lo = jax.lax.dynamic_index_in_dim(hist_a, t_, axis=1,
                                                keepdims=False
                                                ).astype(jnp.float32)
            grad = grad - (u_hi - 2.0 * u_mid + u_lo) * v
            vp_ = step(v, vn) + pad_sl(sl)
            return (vp_, v, grad, u_mid, u_lo), None
        z = jnp.zeros((B,) + m.shape, jnp.float32)
        (v, _, grad, _, _), _ = jax.lax.scan(
            body, (z, z, z, hist_a[:, -1].astype(jnp.float32),
                   hist_a[:, -2].astype(jnp.float32)),
            (jnp.moveaxis(slabs_a, 1, 0)[::-1],
             jnp.clip(jnp.arange(nt)[::-1] - 1, 0, nt - 1)))
        return grad

    t = timeit(rev_full_pad16, slabs, hist16)
    out["rev_full_pad_bf16_s"] = round(t, 4)
    out["rev_full_pad_bf16_gcs"] = round(B * nt * cells / t / 1e9, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
