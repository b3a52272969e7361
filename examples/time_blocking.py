"""Time blocking + wavefield compression for the FWI gradient.

Runnable analog of the reference tutorial
``seismic/tutorials/12_time_blocking.ipynb``, which prototypes DUG-style
time blocking: the forward wavefield is written out in time blocks
(optionally compressed with blosc) and read back during the adjoint
sweep, and correctness is established by comparing against the
save-all-time-steps gradient.

The TPU-native framework does the same thing at two levels, and this
example measures both against the all-saved reference on a small circle
model:

1. **Segment checkpointing** (``ops/acoustic.forward_ckpt`` +
   ``gradient_from_ckpt``): the forward saves only segment-boundary
   state pairs and the adjoint recomputes each block — the time-blocking
   memory trade, no serialization needed because recompute beats HBM
   round trips on TPU.
2. **Streamed compressed history** (``ops/pallas_acoustic
   .forward_dt2_segments(hist_dtype="bfloat16")`` +
   ``gradient_stream_segments``): the Pallas forward streams the
   d2u/dt2 history to HBM block by block (double-buffered DMA out of
   VMEM — the direct analog of the notebook's serialization), and bf16
   halves the traffic — the compression. The adjoint consumes the
   blocks in reverse with no recompute sweep.

The notebook's acceptance test is "differences at machine epsilon" for
lossless blocking and small bounded error under compression; asserted
here as <=1e-5 (relative, f32) for checkpointing and <=1% for the bf16
history.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from devito_fwi_tpu.models.presets import demo_model
from devito_fwi_tpu.models.geometry import AcquisitionGeometry
from devito_fwi_tpu.fwi import (_batched_tables, _solver_dt,
                                _pallas_operands)
from devito_fwi_tpu.ops import acoustic as ac
from devito_fwi_tpu.ops import pallas_acoustic as pa
from devito_fwi_tpu.ops.acoustic import _ckpt_layout


def main():
    shape, spacing, nbl = (61, 61), (10., 10.), 10
    model = demo_model("circle-isotropic", vp_circle=3.2,
                       vp_background=2.8, r=12, origin=(0., 0.),
                       shape=shape, spacing=spacing, space_order=4,
                       nbl=nbl, dt=1.2)
    nsrc, nrec = 2, 31
    src = np.stack([np.linspace(100, 500, nsrc), np.full(nsrc, 20.)], 1)
    rec = np.stack([np.linspace(0, 600, nrec), np.full(nrec, 30.)], 1)
    geom = AcquisitionGeometry(model, rec, src, 0., 280., f0=0.010,
                               src_type="Ricker")
    s_idx, s_w, r_idx, r_w, wav = map(jnp.asarray,
                                      _batched_tables(geom))
    vp, damp = jnp.asarray(model.vp), jnp.asarray(model.damp)
    dt, nt, nck = float(_solver_dt(geom)), geom.nt, 7
    statics = dict(nt=nt, spacing=model.spacing, space_order=4,
                   kernel="OT2", fs=False)
    cells = int(np.prod(model.padded_shape))

    # --- reference: save every time step, gradient from the full field
    recs, u_save = jax.vmap(lambda a, b: ac.forward(
        vp, damp, wav, a, b, r_idx, r_w, dt, save=True,
        **statics))(s_idx, s_w)
    rng = np.random.RandomState(0)
    res = jnp.asarray((np.asarray(recs) * 0.1 + 0.01 * rng.randn(
        *recs.shape)).astype(np.float32))
    g_full = np.asarray(jax.vmap(lambda u, r: ac.gradient(
        vp, damp, u, r, r_idx, r_w, dt, **statics)[0])(u_save, res))
    mb_full = nt * cells * 4 / 2**20
    print(f"all-saved wavefield:   {mb_full:8.1f} MB/shot   (reference)")

    # --- 1. time blocking via segment checkpointing (lossless)
    _, seg_starts, _ = jax.vmap(lambda a, b: ac.forward_ckpt(
        vp, damp, wav, a, b, r_idx, r_w, dt, n_checkpoints=nck,
        **statics))(s_idx, s_w)
    g_ckpt = np.asarray(jax.vmap(lambda a, b, sg, r: ac.gradient_from_ckpt(
        vp, damp, wav, a, b, sg, r, r_idx, r_w, dt, n_checkpoints=nck,
        **statics)[0])(s_idx, s_w, seg_starts, res))
    nseg = _ckpt_layout(nt, nck)[2]
    mb_ckpt = nseg * 2 * cells * 4 / 2**20
    scale = np.abs(g_full).max()
    d_ckpt = np.abs(g_ckpt - g_full).max() / scale
    print(f"segment checkpoints:   {mb_ckpt:8.1f} MB/shot   "
          f"max rel grad diff {d_ckpt:.2e}")
    assert d_ckpt < 1e-5, d_ckpt

    # --- 2. streamed history, f32 and bf16-compressed (Pallas kernels,
    # interpreter mode off-TPU; identical code runs compiled on chip)
    nsteps, seg, nseg = _ckpt_layout(nt, nck)
    nx, nz = model.padded_shape
    z0 = int(np.asarray(r_idx)[..., 1].min())
    m, mT, hdT, injT, wav_pad = _pallas_operands(
        vp, damp, wav, s_idx, s_w, dt, nt, nseg * seg)
    rows = pa.residual_rows(res, r_idx, r_w, m, dt * dt, z0, nsteps,
                            seg, nseg)
    for hist_dtype, tol in (("float32", 1e-5), ("bfloat16", 1e-2)):
        _, dt2, _ = pa.forward_dt2_segments(
            mT, hdT, wav_pad, injT, dt, nt=nt, nx=nx, nz=nz,
            space_order=4, spacing=model.spacing, z0=z0,
            n_checkpoints=nck, fs=False, hist_dtype=hist_dtype,
            interpret=True)
        g = np.swapaxes(np.asarray(pa.gradient_stream_segments(
            mT, hdT, dt2, rows, dt, nt=nt, nx=nx, nz=nz, space_order=4,
            spacing=model.spacing, z0=z0, n_checkpoints=nck, fs=False,
            interpret=True)), -1, -2)
        # crop the Pallas-padded field back to the XLA padded shape
        g = g[:, :g_full.shape[1], :g_full.shape[2]]
        mb = (nt - 2) * cells * jnp.dtype(hist_dtype).itemsize / 2**20
        d = np.abs(g - g_full).max() / scale
        tag = "compressed " if hist_dtype == "bfloat16" else "streamed  "
        print(f"{tag} {hist_dtype}: {mb:8.1f} MB/shot   "
              f"max rel grad diff {d:.2e}")
        assert d < tol, (hist_dtype, d)
    print("ok")


if __name__ == "__main__":
    main()
