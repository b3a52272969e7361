"""TTI Pallas segment kernels: interpreter-mode parity vs the XLA
checkpointed pair (ops.tti.forward_ckpt / jacobian_adjoint_from_ckpt),
which is itself pinned to the saved-path jacobian_adjoint at 1e-12."""
import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from devito_fwi_tpu.models.presets import demo_model
from devito_fwi_tpu.models.geometry import AcquisitionGeometry
from devito_fwi_tpu.ops.interp import interp_table

tti = importlib.import_module("devito_fwi_tpu.ops.tti")
pt = importlib.import_module("devito_fwi_tpu.ops.pallas_tti")


def test_tti_pallas_gradient_matches_xla_interpret(monkeypatch):
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    model = demo_model("layers-tti", shape=(60, 50), spacing=(10., 10.),
                       nbl=10, space_order=4, dtype=np.float32)
    nsrc, nrec = 2, 40
    srcs = np.empty((nsrc, 2))
    srcs[:, 0] = np.linspace(100, 400, nsrc)
    srcs[:, 1] = 20.0
    rec = np.empty((nrec, 2))
    rec[:, 0] = np.linspace(0, model.domain_size[0], nrec)
    rec[:, 1] = 20.0
    geom = AcquisitionGeometry(model, rec, srcs, 0.0, 250.0, f0=0.012,
                               src_type="Ricker")
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    assert pt.tti_supported(model, r_idx)
    s_idx_b = jnp.asarray(s_idx)[:, None]
    s_w_b = jnp.asarray(s_w)[:, None]
    r_idx_j, r_w_j = jnp.asarray(r_idx), jnp.asarray(r_w)
    args = (jnp.asarray(model.vp), jnp.asarray(model.damp),
            jnp.asarray(model.epsilon), jnp.asarray(model.delta),
            jnp.asarray(model.theta), None)
    wav = jnp.asarray(geom.src.data[:, :1])
    dt = float(model.critical_dt)
    nck = 7
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4,
              n_checkpoints=nck)

    # XLA reference: per-shot ckpt forward + gradient with res = rec
    def per(a, b):
        rec0, starts = tti.forward_ckpt(*args, wav, a, b, r_idx_j, r_w_j,
                                        dt, **kw)
        g, _ = tti.jacobian_adjoint_from_ckpt(
            *args, wav, a, b, starts, rec0 * 0.3, r_idx_j, r_w_j, dt,
            **kw)
        return g, rec0

    g_ref, rec_ref = jax.vmap(per)(s_idx_b, s_w_b)

    # Pallas path: same computation with obs = 0.7 * rec (res = 0.3 rec)
    g_p = pt.tti_gradient_batched_pallas(
        args[0], args[1], args[2], args[3], args[4], wav, s_idx_b, s_w_b,
        r_idx_j, r_w_j, rec_ref * 0.7, dt, nt=geom.nt,
        spacing=model.spacing, space_order=4, n_checkpoints=nck,
        interpret=True)

    ref = np.asarray(g_ref)
    scale = np.abs(ref).max()
    d = np.abs(np.asarray(g_p) - ref).max()
    assert d < 2e-5 * scale, d / scale


def test_tti_streamed_matches_recompute_interpret(monkeypatch):
    """The streamed-history TTI gradient (forward_dt2_pallas +
    gradient_stream_pallas, f32 history) matches the checkpoint+recompute
    pair exactly — same update formula, same accumulation order, only
    the history transport differs."""
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    model = demo_model("layers-tti", shape=(50, 40), spacing=(10., 10.),
                       nbl=10, space_order=4, dtype=np.float32)
    nsrc, nrec = 2, 30
    srcs = np.empty((nsrc, 2))
    srcs[:, 0] = np.linspace(100, 350, nsrc)
    srcs[:, 1] = 20.0
    rec = np.empty((nrec, 2))
    rec[:, 0] = np.linspace(0, model.domain_size[0], nrec)
    rec[:, 1] = 20.0
    geom = AcquisitionGeometry(model, rec, srcs, 0.0, 200.0, f0=0.012,
                               src_type="Ricker")
    s_idx, s_w = interp_table(geom.src_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    r_idx, r_w = interp_table(geom.rec_positions, model.origin_pml,
                              model.spacing, dtype=np.float32)
    s_idx_b = jnp.asarray(s_idx)[:, None]
    s_w_b = jnp.asarray(s_w)[:, None]
    args = (jnp.asarray(model.vp), jnp.asarray(model.damp),
            jnp.asarray(model.epsilon), jnp.asarray(model.delta),
            jnp.asarray(model.theta))
    wav = jnp.asarray(geom.src.data[:, :1])
    dt = float(model.critical_dt)
    kw = dict(nt=geom.nt, spacing=model.spacing, space_order=4,
              n_checkpoints=6, interpret=True)
    # synthetic observed data: zeros, so res = rec (nonzero everywhere)
    obs = jnp.zeros((nsrc, geom.nt, nrec), jnp.float32)

    g_re = pt.tti_gradient_batched_pallas(
        *args, wav, s_idx_b, s_w_b, jnp.asarray(r_idx),
        jnp.asarray(r_w), obs, dt, stream=False, **kw)
    g_st = pt.tti_gradient_batched_pallas(
        *args, wav, s_idx_b, s_w_b, jnp.asarray(r_idx),
        jnp.asarray(r_w), obs, dt, stream=True, **kw)

    ref = np.asarray(g_re)
    d = np.abs(np.asarray(g_st) - ref).max()
    assert d <= 1e-6 * np.abs(ref).max(), d / np.abs(ref).max()


def test_tti_stream_budget_helpers():
    """pick_stream_checkpoints_tti / stream_max_shots_tti size the TWO
    double-buffered history blocks: a huge grid must decline, a small
    one must stream, and the bf16 history must nearly double the shot
    cap (the 16-row bf16 sublane padding shaves it below exactly 2x)."""
    assert pt.pick_stream_checkpoints_tti(500, 160, 120) is not None
    assert pt.pick_stream_checkpoints_tti(500, 4000, 4000) is None
    f32 = pt.stream_max_shots_tti(1000, 300, 200, hist_dtype="float32")
    bf16 = pt.stream_max_shots_tti(1000, 300, 200, hist_dtype="bfloat16")
    assert f32 >= 1 and bf16 >= int(1.7 * f32)


def test_solver_gradient_checkpointed_routes_pallas(monkeypatch):
    """AnisotropicWaveSolver.gradient_checkpointed takes the Pallas
    segment-kernel path when enabled (default on TPU; forced here via
    the interpreter) and matches the XLA checkpointed pair."""
    from devito_fwi_tpu.models.geometry import setup_geometry
    from devito_fwi_tpu.ops.tti_wavesolver import AnisotropicWaveSolver

    model = demo_model("layers-tti", shape=(40, 36), spacing=(15., 15.),
                       nbl=10, space_order=4, dtype=np.float32)
    geometry = setup_geometry(model, 200.0)
    solver = AnisotropicWaveSolver(model, geometry, space_order=4)
    rec, _, _, _ = solver.forward()
    rec.data[:] = 0.3 * rec.data  # synthetic residual

    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_TTI", "0")
    g_xla, _ = solver.gradient_checkpointed(rec, n_checkpoints=6)

    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_TTI", "1")
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    g_pal, _ = solver.gradient_checkpointed(rec, n_checkpoints=6)

    scale = np.abs(np.asarray(g_xla)).max()
    d = np.abs(np.asarray(g_pal) - np.asarray(g_xla)).max()
    assert d < 2e-5 * scale, d / scale
