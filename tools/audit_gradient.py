"""HBM-traffic / roofline audit of the streamed-history FWI gradient.

Decomposes the Marmousi 29-shot L2 gradient (the bench.py primary
metric, ~32 Gcell-steps/s fwd+adjoint against the repo's measured
55 Gcs/s single-sweep VPU roofline) into its pieces, each timed on the
real chip in ONE process:

  1. full fused objective (calc_grad=True)        [the bench number]
  2. streamed forward alone (dt2 write + rec rows + illum)
  3. streamed reverse alone (dt2 read + grad accumulate + res inject)
  4. bare forward (rec rows only — no dt2 write, no illum)
  5. recompute-path gradient (3 sweeps, no history traffic)
  6. glue = 1 - 2 - 3 (receiver assembly, misfit, residual rows,
     illumination fix, crop)

and prints the implied per-step HBM bytes vs the chip's bandwidth.
Timings per CLAUDE.md: data-dependent chaining inside one jit where
possible, scalar fetch, best-of-N.
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
    cs = 2.0 * B * nt * cells            # fwd+adjoint cell-steps

    # 1. full objective
    def full():
        f, g, r = fwi_obj_multi(geometry0, obs, least_square, dw,
                                bathy_mask, True, calc_grad=True)
        return jnp.float32(f)
    t0 = time.perf_counter(); full()
    print(f"compile: {time.perf_counter()-t0:.1f}s")
    t_full = best_of(full)
    print(f"1. full objective:        {t_full*1e3:7.1f} ms   "
          f"{cs/t_full/1e9:5.1f} Gcs/s")

    # kernel operands
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry0)
    s_idx, s_w = jnp.asarray(s_idx), jnp.asarray(s_w)
    r_idx, r_w = jnp.asarray(r_idx), jnp.asarray(r_w)
    src_wav = jnp.asarray(src_wav)
    vp, damp = jnp.asarray(model.vp), jnp.asarray(model.damp)
    dt = float(_solver_dt(geometry0))
    z0 = _pallas_z0(geometry0)
    hist_dtype = pa.stream_hist_dtype()
    nck = pa.pick_stream_checkpoints(nt, nx_p, nz_p, hist_dtype=hist_dtype)
    if nck is None:
        print("streamed path does not apply at this grid size "
              "(pick_stream_checkpoints returned None); nothing to audit")
        return
    nck = max(nck, _default_checkpoints(nt))
    nsteps, seg, nseg = _ckpt_layout(nt, nck)
    m, mT, hdT, injT, wav_pad = jax.block_until_ready(_pallas_operands(
        vp, damp, src_wav, s_idx, s_w, dt, nt, nseg * seg))
    kw = dict(nt=nt, nx=nx_p, nz=nz_p, space_order=model.space_order,
              spacing=model.spacing, z0=z0, n_checkpoints=nck, fs=model.fs)
    print(f"hist_dtype={hist_dtype} nck={nck} seg={seg} nseg={nseg} "
          f"grid {nx_p}x{nz_p} nt={nt} B={B}")

    # 2. streamed forward alone
    fwd = jax.jit(lambda: pa.forward_dt2_segments(
        mT, hdT, wav_pad, injT, dt, hist_dtype=hist_dtype, **kw)[0])
    jax.block_until_ready(fwd())
    t_fwd = best_of(lambda: fwd())
    print(f"2. streamed forward:      {t_fwd*1e3:7.1f} ms   "
          f"(sweep roofline ref: {B*nt*cells/t_fwd/1e9:.1f} Gcs/s 1-sweep)")

    # keep one live history for the reverse timing
    rec_rows, hist, illumT = jax.block_until_ready(pa.forward_dt2_segments(
        mT, hdT, wav_pad, injT, dt, hist_dtype=hist_dtype, **kw))
    rec = _traces_from_rows(rec_rows, r_idx, r_w, z0, nt, nsteps, vp.dtype)
    res = rec - jnp.stack([jnp.asarray(o.data) for o in obs])
    rows = jax.block_until_ready(pa.residual_rows(
        res, r_idx, r_w, m, dt * dt, z0, nsteps, seg, nseg))

    # 3. streamed reverse alone — hist/rows MUST be jit arguments, not
    # closure captures: captured device arrays are lowered as program
    # CONSTANTS (5.7 GB here), which the axon tunnel round-trips at
    # minutes per compile
    rev = jax.jit(lambda h, r: pa.gradient_stream_segments(
        mT, hdT, h, r, dt, **kw))
    jax.block_until_ready(rev(hist, rows))
    t_rev = best_of(lambda: rev(hist, rows))
    print(f"3. streamed reverse:      {t_rev*1e3:7.1f} ms   "
          f"({B*nt*cells/t_rev/1e9:.1f} Gcs/s 1-sweep)")

    # 4. bare forward (rec rows only)
    bare = jax.jit(lambda: pa.forward_rec_segments(
        mT, hdT, wav_pad, injT, dt, **kw))
    jax.block_until_ready(bare())
    t_bare = best_of(lambda: bare())
    print(f"4. bare forward:          {t_bare*1e3:7.1f} ms   "
          f"({B*nt*cells/t_bare/1e9:.1f} Gcs/s 1-sweep)")

    # 5. recompute-path gradient (forward ckpt + 2-sweep reverse)
    nck_r = pa.pick_n_checkpoints(nt, nx_p, nz_p)
    if nck_r is None:
        print("5. recompute path does not fit VMEM at this grid size; "
              "skipping")
        return
    nck_r = max(nck_r, _default_checkpoints(nt))
    nsteps_r, seg_r, nseg_r = _ckpt_layout(nt, nck_r)
    kwr = dict(kw); kwr["n_checkpoints"] = nck_r
    _, mT2, hdT2, injT2, wav_pad2 = _pallas_operands(
        vp, damp, src_wav, s_idx, s_w, dt, nt, nseg_r * seg_r)
    rec2, starts2, il2 = jax.block_until_ready(pa.forward_ckpt_segments(
        mT2, hdT2, wav_pad2, injT2, dt, **kwr))
    rows2 = jax.block_until_ready(pa.residual_rows(
        res, r_idx, r_w, m, dt * dt, z0, nsteps_r, seg_r, nseg_r))
    rec5 = jax.jit(lambda st, r: pa.gradient_segments(
        mT2, hdT2, wav_pad2, injT2, st, r, dt, **kwr))
    jax.block_until_ready(rec5(starts2, rows2))
    t_rec = best_of(lambda: rec5(starts2, rows2))
    print(f"5. recompute reverse:     {t_rec*1e3:7.1f} ms   "
          f"(2 sweeps: {2*B*nt*cells/t_rec/1e9:.1f} Gcs/s)")

    # 6. glue by subtraction
    glue = t_full - t_fwd - t_rev
    print(f"6. glue (assembly/misfit):{glue*1e3:7.1f} ms   "
          f"({100*glue/t_full:.0f}% of full)")

    # traffic model
    itemsize = jnp.dtype(hist_dtype).itemsize
    field_b = pa._padded_field_bytes(nx_p, nz_p, itemsize)
    hist_gb = B * (nt - 2) * field_b / 2**30
    bw_fwd = hist_gb / t_fwd
    bw_rev = hist_gb / t_rev
    print(f"\ndt2 history: {hist_gb:.2f} GB total "
          f"({field_b/2**20:.2f} MB/field {hist_dtype})")
    print(f"history-stream bandwidth: write {bw_fwd:.0f} GB/s, "
          f"read {bw_rev:.0f} GB/s  (HBM ~775 GB/s+DMA overlap)")
    print(f"fwd vs bare forward: +{(t_fwd-t_bare)*1e3:.1f} ms for the "
          f"dt2-write+illum ({100*(t_fwd-t_bare)/t_fwd:.0f}% of fwd)")
    ideal = t_bare * 2
    print(f"\nideal 2-bare-sweep time {ideal*1e3:.1f} ms -> "
          f"{cs/ideal/1e9:.1f} Gcs/s ceiling; measured full "
          f"{cs/t_full/1e9:.1f}; streamed fwd+rev alone "
          f"{cs/(t_fwd+t_rev)/1e9:.1f}")


if __name__ == "__main__":
    main()
