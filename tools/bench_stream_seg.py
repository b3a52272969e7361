"""One-process A/B of the streamed-gradient segment length on the chip.

The streamed kernels' 12-step segment cap was tuned when the d2u/dt2
history was f32; the bf16 default halves the double-buffered block, so
longer segments now fit the same VMEM and amortize the per-segment
grid/DMA overhead (113 segments on the Marmousi bench). Times the
streamed forward, the streamed reverse, and the full fused objective at
several `DEVITO_FWI_TPU_STREAM_SEG` caps in ONE process (cross-process
chip noise is ~20%; see CLAUDE.md).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "drivers"))

import numpy as np
import jax
import jax.numpy as jnp

from _marmousi_common import SMARMN, setup
from devito_fwi_tpu.fwi import (fm_multi, fwi_obj_multi, _batched_tables,
                                _solver_dt, _pallas_operands, _pallas_z0,
                                _traces_from_rows, _default_checkpoints)
from devito_fwi_tpu.misfit import least_square
from devito_fwi_tpu.ops import pallas_acoustic as pa
from devito_fwi_tpu.ops.acoustic import _ckpt_layout

_fetch = jax.jit(lambda x: jnp.asarray(x).ravel()[0])


def sync(x):
    return float(_fetch(x))


def best_of(fn, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


class Args:
    bathy = 1
    filter = 0
    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "model_data")


def main():
    models, geoms, vps, bathy_mask = setup(SMARMN, Args(), 29)
    geometry1, geometry0, geometry2 = geoms
    model = geometry0.model
    print("modeling obs...")
    obs = fm_multi(geometry1, save=False)
    dw = fm_multi(geometry2, save=False)

    nt = geometry0.nt
    nx_p, nz_p = model.padded_shape
    cells = nx_p * nz_p
    B = geometry0.nsrc
    cs = 2.0 * B * nt * cells

    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry0)
    s_idx, s_w = jnp.asarray(s_idx), jnp.asarray(s_w)
    r_idx, r_w = jnp.asarray(r_idx), jnp.asarray(r_w)
    src_wav = jnp.asarray(src_wav)
    vp, damp = jnp.asarray(model.vp), jnp.asarray(model.damp)
    dt = float(_solver_dt(geometry0))
    z0 = _pallas_z0(geometry0)
    hist_dtype = pa.stream_hist_dtype()

    res = None
    for cap in (12, 16, 24, 32):
        os.environ["DEVITO_FWI_TPU_STREAM_SEG"] = str(cap)
        nck = pa.pick_stream_checkpoints(nt, nx_p, nz_p,
                                         hist_dtype=hist_dtype)
        if nck is None:
            print(f"cap {cap}: does not fit VMEM per the model; skipping")
            continue
        nck = max(nck, _default_checkpoints(nt))
        nsteps, seg, nseg = _ckpt_layout(nt, nck)
        kw = dict(nt=nt, nx=nx_p, nz=nz_p, space_order=model.space_order,
                  spacing=model.spacing, z0=z0, n_checkpoints=nck,
                  fs=model.fs)
        m, mT, hdT, injT, wav_pad = jax.block_until_ready(_pallas_operands(
            vp, damp, src_wav, s_idx, s_w, dt, nt, nseg * seg))
        try:
            fwd = jax.jit(lambda: pa.forward_dt2_segments(
                mT, hdT, wav_pad, injT, dt, hist_dtype=hist_dtype, **kw)[0])
            jax.block_until_ready(fwd())
            t_fwd = best_of(lambda: fwd())

            rec_rows, hist, illumT = jax.block_until_ready(
                pa.forward_dt2_segments(mT, hdT, wav_pad, injT, dt,
                                        hist_dtype=hist_dtype, **kw))
            if res is None:
                rec = _traces_from_rows(rec_rows, r_idx, r_w, z0, nt,
                                        nsteps, vp.dtype)
                res = rec - jnp.stack([jnp.asarray(o.data) for o in obs])
            rows = jax.block_until_ready(pa.residual_rows(
                res, r_idx, r_w, m, dt * dt, z0, nsteps, seg, nseg))
            rev = jax.jit(lambda h, r: pa.gradient_stream_segments(
                mT, hdT, h, r, dt, **kw))
            jax.block_until_ready(rev(hist, rows))
            t_rev = best_of(lambda: rev(hist, rows))
            del hist, rows, rec_rows, illumT

            def full():
                f, g, r = fwi_obj_multi(geometry0, obs, least_square, dw,
                                        bathy_mask, True, calc_grad=True)
                return jnp.float32(f)
            full()
            t_full = best_of(full)
            print(f"cap {cap:2d} (seg={seg:2d} nseg={nseg:3d}): "
                  f"fwd {t_fwd*1e3:6.1f} ms ({B*nt*cells/t_fwd/1e9:4.1f}) "
                  f"rev {t_rev*1e3:6.1f} ms ({B*nt*cells/t_rev/1e9:4.1f}) "
                  f"full {t_full*1e3:6.1f} ms ({cs/t_full/1e9:4.1f} Gcs/s)")
        except Exception as e:  # Mosaic VMEM OOM etc.
            print(f"cap {cap} (seg={seg}): FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}")
            break


if __name__ == "__main__":
    main()
