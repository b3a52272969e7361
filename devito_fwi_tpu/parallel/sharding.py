"""Shot parallelism over the TPU device mesh.

This is the TPU-native replacement for the reference's dask.distributed
task layer (``fwi.py:83-102, 207-234``): instead of pickling geometry
objects to workers, submitting one future per shot and summing results on
the client, shots become a sharded leading array axis on a 1-D
``jax.sharding.Mesh`` axis ``'shots'``; each device runs its local shots
through the same fused objective program, and the scalar/gradient/
illumination reductions are ``psum`` collectives over ICI.

Shot counts that don't divide the device count are padded with dummy
shots whose contributions are masked by a validity weight.
"""
from __future__ import annotations

import os
from functools import lru_cache as _lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import acoustic as _ac

__all__ = ["shot_mesh", "fm_multi_sharded", "fwi_obj_sharded",
           "tti_fwi_obj_sharded", "viscoacoustic_fm_sharded",
           "elastic_fwi_obj_sharded", "domain_mesh",
           "forward_domain_sharded", "gradient_domain_sharded",
           "hier_mesh", "fwi_obj_sharded2d"]


# per-device shot cap for the chunked objectives (mirrors the single-
# chip fused path's shot_chunk=32); tests shrink it to exercise chunking
_PER_DEV_CAP = 32


def shot_mesh(devices=None):
    """1-D mesh over all (or the given) devices with axis name 'shots'."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices, ("shots",))


def _pad_shots(arrs, nsrc, ndev, dtype=np.float32):
    """Pad leading shot axis to a multiple of ndev; returns padded arrays
    and a validity weight vector."""
    pad = (-nsrc) % ndev
    out = []
    for a in arrs:
        if pad:
            a = jnp.concatenate([a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
        out.append(a)
    valid = jnp.concatenate([jnp.ones(nsrc, dtype=dtype),
                             jnp.zeros(pad, dtype=dtype)])
    return out, valid


def _shot_records(rec_all, geometry, dtype):
    """Wrap an (nsrc, nt, nrec) gather stack into PointSource records."""
    from ..models.sources import PointSource
    shots = []
    for i in range(geometry.nsrc):
        shot = PointSource(name="rec", time_range=geometry.time_axis,
                           coordinates=geometry.rec_positions, dtype=dtype)
        shot.data[:] = rec_all[i]
        shots.append(shot)
    return shots


def fm_multi_sharded(geometry, save=False, mesh=None):
    """All-shot forward modeling sharded over the device mesh. Returns a
    list of PointSource shot records (like ``fwi.fm_multi``). Supported
    geometries run each shard through the Pallas segment kernel."""
    from ..fwi import _batched_tables, _solver_dt
    from ..models.sources import PointSource

    model = geometry.model
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    damp = model.damp if isinstance(model.damp, np.ndarray) \
        else model.dtype(0.0)
    from ..fwi import _model_vp_device
    vp = _model_vp_device(model)
    dt = _solver_dt(geometry)
    mesh = mesh or shot_mesh()
    ndev = mesh.devices.size
    (s_idx_p, s_w_p), valid = _pad_shots(
        [jnp.asarray(s_idx), jnp.asarray(s_w)], geometry.nsrc, ndev, model.dtype)

    from ..fwi import _default_checkpoints, _pallas_route
    z0, nck, _, _, _ = _pallas_route(
        geometry, _default_checkpoints(geometry.nt), "OT2",
        calc_grad=False)
    if z0 is not None:
        from ..fwi import _pallas_operands, _traces_from_rows
        from ..ops import pallas_acoustic as _pa
        from ..ops.acoustic import _ckpt_layout
        nx, nz = model.padded_shape
        if nck is not None:
            nsteps, seg, nseg = _ckpt_layout(geometry.nt, nck)
            r_idx_j, r_w_j = jnp.asarray(r_idx), jnp.asarray(r_w)
            src_wav_j = jnp.asarray(src_wav)
            dtf, nt = float(dt), geometry.nt

            @partial(shard_map, mesh=mesh, check_vma=False,
                     in_specs=(P("shots"), P("shots")),
                     out_specs=P("shots"))
            def run_pl(si, sw):
                _, mT, hdT, injT, wav_pad = _pallas_operands(
                    vp, damp, src_wav_j, si, sw, dtf, nt, nseg * seg)
                rows = _pa.forward_rec_segments(
                    mT, hdT, wav_pad, injT, dtf, nt=nt, nx=nx, nz=nz,
                    space_order=model.space_order, spacing=model.spacing,
                    z0=z0, n_checkpoints=nck, fs=model.fs)
                return _traces_from_rows(rows, r_idx_j, r_w_j, z0, nt,
                                         nsteps, vp.dtype)

            return _shot_records(
                np.asarray(run_pl(s_idx_p, s_w_p))[:geometry.nsrc],
                geometry, model.dtype)

    fwd = partial(_ac.forward, nt=geometry.nt, spacing=model.spacing,
                  space_order=model.space_order, kernel="OT2", fs=model.fs,
                  save=False)

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P("shots"), P("shots")), out_specs=P("shots"))
    def run(si, sw):
        rec, _ = jax.vmap(lambda a, b: fwd(vp, damp, src_wav, a, b, r_idx,
                                           r_w, dt))(si, sw)
        return rec

    return _shot_records(np.asarray(run(s_idx_p, s_w_p))[:geometry.nsrc],
                         geometry, model.dtype)


def fwi_obj_sharded(geometry, obs, misfit_func, direct_wave=None, mask=None,
                    precond=True, calc_grad=False, mesh=None,
                    resample_dt=None):
    """Sharded multi-shot objective: per-device shot batches + psum
    reduction of (fval, grad, illum) — replaces the reference's
    futures-result sum loop (``fwi.py:223-232``). Host-side misfits (the
    native C++ BFM, custom numpy callables, trace resampling) take the
    split propagate-sharded / misfit-on-host path."""
    from ..fwi import (_batched_tables, _solver_dt, _misfit_jax,
                       _fix_illum_jax, _pads, _crop)

    misfit_jax = _misfit_jax(misfit_func)
    if misfit_jax is None or resample_dt not in (None, geometry.dt):
        return _fwi_obj_sharded_host(geometry, obs, misfit_func,
                                     direct_wave, mask, precond, calc_grad,
                                     mesh, resample_dt)
    if getattr(misfit_func, "method", None) == "2d" and \
            getattr(misfit_func, "bfm_backend", None) == "native":
        return _fwi_obj_sharded_host(geometry, obs, misfit_func,
                                     direct_wave, mask, precond, calc_grad,
                                     mesh, resample_dt)

    model = geometry.model
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    damp = model.damp if isinstance(model.damp, np.ndarray) \
        else model.dtype(0.0)
    from ..fwi import _model_vp_device
    vp = _model_vp_device(model)
    dt = _solver_dt(geometry)
    pads = _pads(model)
    static = dict(nt=geometry.nt, spacing=model.spacing,
                  space_order=model.space_order, kernel="OT2", fs=model.fs)
    spacing, shape = model.spacing, model.shape
    rec_positions = jnp.asarray(geometry.rec_positions,
                                dtype=model.dtype)

    mesh = mesh or shot_mesh()
    ndev = mesh.devices.size
    obs_stack = jnp.stack([jnp.asarray(o.data) for o in obs])
    if direct_wave is not None:
        dw_stack = jnp.stack([jnp.asarray(d.data) for d in direct_wave])
    else:
        dw_stack = jnp.zeros_like(obs_stack[:, :1, :1])
    (s_idx_p, s_w_p, obs_p, dw_p, sp_p), valid = _pad_shots(
        [jnp.asarray(s_idx), jnp.asarray(s_w), obs_stack, dw_stack,
         jnp.asarray(geometry.src_positions, dtype=model.dtype)],
        geometry.nsrc, ndev, model.dtype)

    from ..fwi import _default_checkpoints, _pallas_route
    nck = _default_checkpoints(geometry.nt)

    # Pallas fast path per shard: the same gated VMEM segment kernels as
    # the single-chip fused objective run inside shard_map on each
    # device's shot block (pallas_call is a per-device program, so the
    # only collective is the existing psum). Validated on the virtual
    # CPU mesh via DEVITO_FWI_TPU_PALLAS_INTERPRET=1.
    # One shared route computation (fwi._pallas_route) for all chunks.
    route = _pallas_route(geometry, nck, static["kernel"], calc_grad)
    z0, _, _, _, cap = route

    # chunk the (padded) shot axis so the per-device checkpoint /
    # history buffers stay bounded at large surveys (the single-chip
    # fused path chunks at shot_chunk=32 and the host path at
    # per_dev_cap=32; the device-misfit paths used to vmap ALL local
    # shots at once). Each chunk is a whole multiple of ndev; the
    # streamed-history HBM budget (route cap) shrinks it further so
    # large local blocks keep the 2-sweep streamed kernels instead of
    # dropping to the 3-sweep recompute.
    nsrc_p = int(s_idx_p.shape[0])
    per_dev = _PER_DEV_CAP if cap is None else max(1, min(_PER_DEV_CAP,
                                                          cap))
    chunk_len = min(nsrc_p, ndev * per_dev)

    def _chunks(*arrs):
        for lo in range(0, nsrc_p, chunk_len):
            hi = min(lo + chunk_len, nsrc_p)
            yield tuple(a[lo:hi] for a in arrs)

    if z0 is not None:
        fval, grad, illum = 0.0, None, None
        ok = True
        for ck in _chunks(s_idx_p, s_w_p, obs_p, dw_p, sp_p, valid):
            out = _fwi_obj_sharded_pallas(
                geometry, misfit_jax, calc_grad, mesh, ndev, route, vp,
                damp, src_wav, *ck[:5], ck[5], r_idx, r_w,
                float(dt), static, pads, shape, spacing, rec_positions)
            if out is None:          # kernels don't fit: XLA fallback
                ok = False
                break
            fval += float(out[0])
            g_c = np.array(out[1], dtype=np.float64)
            il_c = np.array(out[2], dtype=np.float64)
            grad = g_c if grad is None else grad + g_c
            illum = il_c if illum is None else illum + il_c
        if ok:
            if calc_grad:
                if precond:
                    grad /= np.sqrt(illum + 1e-30)
                if mask is not None:
                    grad *= mask
            return fval, grad

    def per_shot(si, sw, obs_i, dw_i, sp, w):
        # segment-checkpointed gradient (same memory-lean path as the
        # single-chip fused objective — full-save wavefields OOM at
        # production sizes)
        if calc_grad:
            rec, seg_starts, illum_pad = _ac.forward_ckpt(
                vp, damp, src_wav, si, sw, r_idx, r_w, dt,
                n_checkpoints=nck, **static)
        else:
            rec, _ = _ac.forward(vp, damp, src_wav, si, sw, r_idx, r_w, dt,
                                 save=False, **static)
        syn = rec - dw_i
        obs_c = obs_i - dw_i
        fval, res = misfit_jax(syn, obs_c)
        if not calc_grad:
            return fval * w, jnp.zeros(shape, vp.dtype), \
                jnp.zeros(shape, vp.dtype)
        grad, _ = _ac.gradient_from_ckpt(vp, damp, src_wav, si, sw,
                                         seg_starts, res, r_idx, r_w, dt,
                                         n_checkpoints=nck, **static)
        crop = _crop(grad, pads, shape)
        crop = _fix_illum_jax(crop, sp, rec_positions, spacing, shape)
        illum = _crop(illum_pad, pads, shape)
        illum = _fix_illum_jax(illum, sp, rec_positions, spacing, shape)
        return fval * w, crop * w, illum * w

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P("shots"), P("shots"), P("shots"), P("shots"),
                       P("shots"), P("shots")),
             out_specs=(P(), P(), P()))
    def run(si, sw, ob, dw, sp, w):
        f, g, il = jax.vmap(per_shot)(si, sw, ob, dw, sp, w)
        f = jax.lax.psum(jnp.sum(f), "shots")
        g = jax.lax.psum(jnp.sum(g, axis=0), "shots")
        il = jax.lax.psum(jnp.sum(il, axis=0), "shots")
        return f, g, il

    fval, grad, illum = 0.0, None, None
    for ck in _chunks(s_idx_p, s_w_p, obs_p, dw_p, sp_p, valid):
        f_c, g_c, il_c = run(*ck)
        fval += float(f_c)
        g_c = np.array(g_c, dtype=np.float64)
        il_c = np.array(il_c, dtype=np.float64)
        grad = g_c if grad is None else grad + g_c
        illum = il_c if illum is None else illum + il_c
    if calc_grad:
        if precond:
            grad /= np.sqrt(illum + 1e-30)
        if mask is not None:
            grad *= mask
    return fval, grad


def _fwi_obj_sharded_pallas(geometry, misfit_jax, calc_grad, mesh, ndev,
                            route, vp, damp, src_wav, s_idx_p, s_w_p,
                            obs_p, dw_p, sp_p, valid, r_idx, r_w, dtf,
                            static, pads, shape, spacing, rec_positions):
    """Per-shard Pallas body of ``fwi_obj_sharded``: each device runs its
    local shot block through the VMEM segment kernels (streamed-history
    gradient when the per-shard d2u/dt2 history fits HBM), then psums the
    (fval, grad, illum) triple over the 'shots' axis. Returns device
    arrays, or None when the kernels don't fit (caller falls back to the
    XLA scan path)."""
    from ..ops import pallas_acoustic as _pa
    from ..ops.acoustic import _ckpt_layout
    from ..fwi import (_pallas_operands, _traces_from_rows, _fix_illum_jax,
                       _crop, _default_checkpoints, _pallas_route)

    model = geometry.model
    nx, nz = model.padded_shape
    nt, fs, so = static["nt"], static["fs"], static["space_order"]
    # route computed ONCE by the caller (fwi._pallas_route); the caller
    # also chunks the shot axis to the streamed-history HBM budget, but
    # guard against an oversized local block anyway (shards cannot
    # chunk, so drop to the checkpoint-recompute kernels)
    z0, nck, stream, hist_dtype, cap = route
    if nck is None:
        return None
    Bp = s_idx_p.shape[0] // ndev
    if stream and cap is not None and Bp > cap:
        _, nck, stream, hist_dtype, _ = _pallas_route(
            geometry, _default_checkpoints(nt), "OT2", False)
    nsteps, seg, nseg = _ckpt_layout(nt, nck)
    r_idx_j = jnp.asarray(r_idx)
    r_w_j = jnp.asarray(r_w)
    src_wav_j = jnp.asarray(src_wav)
    kkw = dict(nt=nt, nx=nx, nz=nz, space_order=so, spacing=spacing,
               z0=z0, n_checkpoints=nck, fs=fs)

    def body(si, sw, ob, dw, sp, w):
        m, mT, hdT, injT, wav_pad = _pallas_operands(
            vp, damp, src_wav_j, si, sw, dtf, nt, nseg * seg)
        if not calc_grad:
            rec_rows = _pa.forward_rec_segments(mT, hdT, wav_pad, injT,
                                                dtf, **kkw)
            rec = _traces_from_rows(rec_rows, r_idx_j, r_w_j, z0, nt,
                                    nsteps, vp.dtype)
            fvals, _ = jax.vmap(misfit_jax)(rec - dw, ob - dw)
            f = jax.lax.psum(jnp.sum(fvals * w), "shots")
            zero = jnp.zeros(shape, vp.dtype)
            return f, zero, zero
        if stream:
            rec_rows, hist, illumT = _pa.forward_dt2_segments(
                mT, hdT, wav_pad, injT, dtf, hist_dtype=hist_dtype, **kkw)
        else:
            rec_rows, hist, illumT = _pa.forward_ckpt_segments(
                mT, hdT, wav_pad, injT, dtf, **kkw)
        rec = _traces_from_rows(rec_rows, r_idx_j, r_w_j, z0, nt, nsteps,
                                vp.dtype)
        fvals, res = jax.vmap(misfit_jax)(rec - dw, ob - dw)
        rows = _pa.residual_rows(res, r_idx_j, r_w_j, m, dtf * dtf, z0,
                                 nsteps, seg, nseg)
        if stream:
            gradT = _pa.gradient_stream_segments(mT, hdT, hist, rows, dtf,
                                                 **kkw)
        else:
            gradT = _pa.gradient_segments(mT, hdT, wav_pad, injT, hist,
                                          rows, dtf, **kkw)
        grad = jnp.swapaxes(gradT, -1, -2)
        illum = jnp.swapaxes(illumT, -1, -2)

        def fix(g, spos):
            return _fix_illum_jax(_crop(g, pads, shape), spos,
                                  rec_positions, spacing, shape)

        crop = jax.vmap(fix)(grad, sp)
        ilc = jax.vmap(fix)(illum, sp)
        f = jax.lax.psum(jnp.sum(fvals * w), "shots")
        g = jax.lax.psum(jnp.sum(crop * w[:, None, None], axis=0), "shots")
        il = jax.lax.psum(jnp.sum(ilc * w[:, None, None], axis=0), "shots")
        return f, g, il

    run = shard_map(body, mesh=mesh, check_vma=False,
                    in_specs=(P("shots"), P("shots"), P("shots"),
                              P("shots"), P("shots"), P("shots")),
                    out_specs=(P(), P(), P()))
    return run(s_idx_p, s_w_p, obs_p, dw_p, sp_p, valid)


def _fwi_obj_sharded_host(geometry, obs, misfit_func, direct_wave, mask,
                          precond, calc_grad, mesh, resample_dt):
    """Sharded objective for non-traceable misfits: the propagation and
    adjoint stay sharded over the shots mesh (checkpoint buffers never
    leave their device); only the receiver gathers round-trip to the host,
    where the misfit fans out through ``qWasserstein.batch`` (native BFM
    -> one OpenMP C call, the mpibfm2d analog). This closes the
    reference's dask-parallelized-W2 capability (``fwi.py:207-234``) that
    the traceable-only sharded path could not serve.

    Supported geometries run each shard through the same Pallas cores as
    the single-chip host path (``_pallas_fwd_core``/``_pallas_grad_core``
    — VMEM segment kernels, streamed-history gradient when the per-shard
    d2u/dt2 history fits); shots are chunked so the per-device
    checkpoint/history buffer stays bounded for large surveys."""
    from ..fwi import (_batched_tables, _solver_dt, _fix_illum_jax,
                       _default_checkpoints, _host_misfit_chunk, _pads,
                       _crop, _pallas_fwd_core, _pallas_grad_core)

    model = geometry.model
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    damp = model.damp if isinstance(model.damp, np.ndarray) \
        else model.dtype(0.0)
    from ..fwi import _model_vp_device
    vp = _model_vp_device(model)
    dt = _solver_dt(geometry)
    dtf = float(dt)
    pads = _pads(model)
    nck = _default_checkpoints(geometry.nt)
    static = dict(nt=geometry.nt, spacing=model.spacing,
                  space_order=model.space_order, kernel="OT2", fs=model.fs)
    spacing, shape = model.spacing, model.shape
    rec_positions = jnp.asarray(geometry.rec_positions,
                                dtype=model.dtype)

    mesh = mesh or shot_mesh()
    ndev = mesh.devices.size
    nsrc = geometry.nsrc

    # Pallas gating — the shared fwi._pallas_route helper (this block
    # used to be a hand copy of the single-chip gating and had drifted)
    from ..fwi import _pallas_route
    z0, pallas_nck, stream, hist_dtype, cap = _pallas_route(
        geometry, nck, static["kernel"], calc_grad)
    per_dev_cap = _PER_DEV_CAP if cap is None else cap
    pallas_statics = dict(
        nt=static["nt"], spacing=static["spacing"],
        space_order=static["space_order"], n_checkpoints=pallas_nck,
        z0=z0, fs=static["fs"]) if z0 is not None else None

    s_idx_j, s_w_j = jnp.asarray(s_idx), jnp.asarray(s_w)
    r_idx_j, r_w_j = jnp.asarray(r_idx), jnp.asarray(r_w)
    src_wav_j = jnp.asarray(src_wav)
    src_pos = jnp.asarray(geometry.src_positions, dtype=model.dtype)

    if z0 is not None:
        @partial(shard_map, mesh=mesh, check_vma=False,
                 in_specs=(P("shots"), P("shots")),
                 out_specs=(P("shots"), P("shots"), P("shots")))
        def run_fwd(si, sw):
            rec, hist, illumT = _pallas_fwd_core(
                vp, damp, src_wav_j, si, sw, r_idx_j, r_w_j, dtf,
                calc_grad=calc_grad, stream=stream, hist_dtype=hist_dtype,
                **pallas_statics)
            if not calc_grad:
                z = jnp.zeros((si.shape[0], 1, 1), vp.dtype)
                return rec, z, z
            return rec, hist, illumT

        @partial(shard_map, mesh=mesh, check_vma=False,
                 in_specs=(P("shots"),) * 6,
                 out_specs=(P(), P()))
        def run_grad(si, sw, hist, res, ilT, sp):
            crop, ilc = _pallas_grad_core(
                vp, damp, src_wav_j, si, sw, hist, res, r_idx_j, r_w_j,
                ilT, sp, rec_positions, dtf, stream=stream, pads=pads,
                shape=shape, **pallas_statics)
            g = jax.lax.psum(jnp.sum(crop, axis=0), "shots")
            il = jax.lax.psum(jnp.sum(ilc, axis=0), "shots")
            return g, il
    else:
        @partial(shard_map, mesh=mesh, check_vma=False,
                 in_specs=(P("shots"), P("shots")),
                 out_specs=(P("shots"), P("shots"), P("shots")))
        def run_fwd(si, sw):
            def per(si_i, sw_i):
                if calc_grad:
                    return _ac.forward_ckpt(vp, damp, src_wav, si_i, sw_i,
                                            r_idx, r_w, dt,
                                            n_checkpoints=nck, **static)
                rec, _ = _ac.forward(vp, damp, src_wav, si_i, sw_i, r_idx,
                                     r_w, dt, save=False, **static)
                nseg = _ac._ckpt_layout(geometry.nt, nck)[2]
                zck = jnp.zeros((nseg, 2) + vp.shape, vp.dtype)
                return rec, zck, jnp.zeros_like(vp)
            return jax.vmap(per)(si, sw)

        @partial(shard_map, mesh=mesh, check_vma=False,
                 in_specs=(P("shots"),) * 6,
                 out_specs=(P(), P()))
        def run_grad(si, sw, sg, res, il, sp):
            def per(si_i, sw_i, sg_i, r_i, il_i, sp_i):
                g, _ = _ac.gradient_from_ckpt(vp, damp, src_wav, si_i,
                                              sw_i, sg_i, r_i, r_idx, r_w,
                                              dt, n_checkpoints=nck,
                                              **static)
                crop = _fix_illum_jax(_crop(g, pads, shape), sp_i,
                                      rec_positions, spacing, shape)
                il_c = _fix_illum_jax(_crop(il_i, pads, shape), sp_i,
                                      rec_positions, spacing, shape)
                return crop, il_c
            g, il = jax.vmap(per)(si, sw, sg, res, il, sp)
            g = jax.lax.psum(jnp.sum(g, axis=0), "shots")
            il = jax.lax.psum(jnp.sum(il, axis=0), "shots")
            return g, il

    # chunk shots so the per-device checkpoint/history buffer stays
    # bounded (every chunk is padded to the same length — one compile)
    chunk = min(nsrc, ndev * per_dev_cap)
    chunk += (-chunk) % ndev

    fval = 0.0
    grad = np.zeros(shape, dtype=np.float64)
    illum = np.zeros(shape, dtype=np.float64)
    for lo in range(0, nsrc, chunk):
        hi = min(lo + chunk, nsrc)
        n_c = hi - lo

        def padc(a):
            pad = chunk - n_c
            if pad:
                a = jnp.concatenate(
                    [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0)
            return a

        si_p, sw_p, sp_p = (padc(s_idx_j[lo:hi]), padc(s_w_j[lo:hi]),
                            padc(src_pos[lo:hi]))
        recs, hist_p, illum_p = run_fwd(si_p, sw_p)
        rec_host = np.asarray(recs)[:n_c]

        fval_c, res_chunk = _host_misfit_chunk(geometry, rec_host, obs,
                                               misfit_func, direct_wave,
                                               resample_dt, lo, hi)
        fval += fval_c

        if calc_grad:
            res_stack = jnp.asarray(np.stack(res_chunk))
            pad = chunk - n_c
            if pad:
                # padded shots replay the last real shot with a zero
                # residual -> zero gradient/illum contribution
                res_stack = jnp.concatenate(
                    [res_stack, jnp.zeros((pad,) + res_stack.shape[1:],
                                          res_stack.dtype)])
                vmask = jnp.concatenate(
                    [jnp.ones(n_c, illum_p.dtype),
                     jnp.zeros(pad, illum_p.dtype)])
                illum_p = illum_p * vmask[:, None, None]
            g, il = run_grad(si_p, sw_p, hist_p, res_stack, illum_p, sp_p)
            grad += np.asarray(g, dtype=np.float64)
            illum += np.asarray(il, dtype=np.float64)
        # keep at most ONE streamed dt2 history alive per device
        # (CLAUDE.md): drop this chunk's buffers before the next chunk's
        # run_fwd allocates the next one
        recs = hist_p = illum_p = None
    if calc_grad:
        if precond:
            grad /= np.sqrt(illum + 1e-30)
        if mask is not None:
            grad *= mask
    return fval, grad


# ---------------------------------------------------------------------------
# spatial domain decomposition (the Devito-MPI halo-exchange analog;
# reference seismic/inversion/inversion_utils.py:11-20 acknowledges MPI
# parallel grids). On TPU the grid is sharded over mesh axes and XLA's
# SPMD partitioner inserts the halo exchanges (collective-permutes) for
# the stencil pads/shifts automatically — no explicit communication code.
# ---------------------------------------------------------------------------

def domain_mesh(axis_sizes, devices=None, axis_names=("dx", "dz")):
    """N-D mesh over the spatial grid axes, e.g. ``domain_mesh((2, 4))``."""
    devices = np.array(devices if devices is not None else jax.devices())
    n = int(np.prod(axis_sizes))
    if n > devices.size:
        raise ValueError(
            f"domain_mesh: axis_sizes {tuple(axis_sizes)} needs {n} "
            f"devices, only {devices.size} available")
    return Mesh(devices[:n].reshape(axis_sizes), axis_names[:len(axis_sizes)])


def forward_domain_sharded(geometry, mesh=None, axis_sizes=None, shot=0):
    """Single-shot acoustic forward with the spatial grid sharded over the
    device mesh. Returns the receiver gather (host numpy).

    The stencil code is unchanged — placing vp/damp with a NamedSharding
    makes GSPMD partition the whole scanned program and exchange halos
    over ICI, which is the TPU-native equivalent of devito's MPI domain
    decomposition."""
    from ..fwi import _batched_tables, _solver_dt

    model = geometry.model
    if mesh is None:
        mesh = domain_mesh(axis_sizes or (len(jax.devices()), 1))
    vp, damp, _ = _domain_sharded_fields(model, mesh)
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    dt = _solver_dt(geometry)
    rec, _ = _ac.forward(vp, damp, jnp.asarray(src_wav),
                         jnp.asarray(s_idx[shot]), jnp.asarray(s_w[shot]),
                         jnp.asarray(r_idx), jnp.asarray(r_w), dt,
                         nt=geometry.nt, spacing=model.spacing,
                         space_order=model.space_order, kernel="OT2",
                         fs=model.fs, save=False)
    return np.asarray(rec)


def _domain_sharded_fields(model, mesh):
    """(vp, damp, pads) device_put with a NamedSharding over the spatial
    mesh. Grid dims are edge-padded to multiples of the mesh axes; the
    appended cells extend the absorbing boundary, so the physics inside
    the domain is unchanged to float rounding."""
    from jax.sharding import NamedSharding

    ndim = len(model.padded_shape)
    # mesh axes map onto the LEADING grid dims; trailing dims (e.g. z of
    # a 3-D grid under a 2-D ('dx','dy') mesh) stay replicated/unsharded
    names = list(mesh.axis_names) + [None] * (ndim - len(mesh.axis_names))
    spec = P(*names[:ndim])
    sharding = NamedSharding(mesh, spec)
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    pads = [(0, (-n) % sizes.get(ax, 1)) if ax is not None else (0, 0)
            for n, ax in zip(model.padded_shape, names[:ndim])]
    vp = jax.device_put(jnp.asarray(np.pad(model.vp, pads, mode="edge")),
                        sharding)
    if isinstance(model.damp, np.ndarray):
        damp = jax.device_put(
            jnp.asarray(np.pad(model.damp, pads, mode="edge")), sharding)
    else:
        damp = model.dtype(0.0)
    return vp, damp, pads


def hier_mesh(axis_sizes, devices=None):
    """2-D hierarchical mesh ``('shots', 'dx')`` — shots on the outer axis
    (DCN-friendly: only one psum of scalars/gradients at the end), the
    spatial grid's leading dim on the inner axis (halo exchanges every
    stencil step, so it should ride ICI)."""
    devices = np.array(devices if devices is not None else jax.devices())
    n = int(np.prod(axis_sizes))
    if n > devices.size:
        raise ValueError(
            f"hier_mesh: axis_sizes {tuple(axis_sizes)} needs {n} devices, "
            f"only {devices.size} available")
    return Mesh(devices[:n].reshape(axis_sizes), ("shots", "dx"))


def fwi_obj_sharded2d(geometry, obs, misfit_func, direct_wave=None,
                      mask=None, precond=True, calc_grad=False, mesh=None,
                      axis_sizes=None):
    """Hierarchical multi-shot FWI objective: shots sharded over the
    'shots' mesh axis AND the spatial grid sharded over the 'dx' axis,
    in one jitted program (pure GSPMD — no shard_map). This composes the
    dask-replacement (shot parallelism) with the devito-MPI replacement
    (domain decomposition) the way a large 3-D survey would run on a pod:
    each shot's wavefield lives on a 'dx' device column, halo exchanges
    ride ICI, and the cross-shot gradient reduction is a single psum
    inserted by the partitioner for the ``sum`` over the shot axis.

    Requires a traceable (device) misfit. Returns (fval, grad) like
    ``fwi_obj_sharded``."""
    from jax.sharding import NamedSharding
    from ..fwi import (_batched_tables, _solver_dt, _misfit_jax,
                       _fix_illum_jax, _pads, _crop, _default_checkpoints)

    misfit_jax = _misfit_jax(misfit_func)
    if misfit_jax is None:
        raise ValueError("fwi_obj_sharded2d needs a traceable misfit; use "
                         "fwi_obj_sharded for host-side misfits")
    model = geometry.model
    if mesh is None:
        ndev = len(jax.devices())
        # single device: degenerate 1x1 mesh (the old (1, 2) default
        # crashed reshaping a length-1 device array)
        mesh = hier_mesh(axis_sizes or ((max(1, ndev // 2), 2)
                                        if ndev >= 2 else (1, 1)))
    S, D = mesh.devices.shape

    # grid leading dim padded to a multiple of the 'dx' axis and sharded;
    # replicated over 'shots'
    n0 = model.padded_shape[0]
    gpads = [((0, (-n0) % D) if d == 0 else (0, 0))
             for d in range(len(model.padded_shape))]
    grid_sh = NamedSharding(mesh, P("dx"))
    vp = jax.device_put(jnp.asarray(np.pad(model.vp, gpads, mode="edge")),
                        grid_sh)
    if isinstance(model.damp, np.ndarray):
        damp = jax.device_put(
            jnp.asarray(np.pad(model.damp, gpads, mode="edge")), grid_sh)
    else:
        damp = model.dtype(0.0)

    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    dt = _solver_dt(geometry)
    pads = _pads(model)
    nck = _default_checkpoints(geometry.nt)
    static = dict(nt=geometry.nt, spacing=model.spacing,
                  space_order=model.space_order, kernel="OT2", fs=model.fs)
    shape = model.shape
    spacing = model.spacing

    obs_stack = jnp.stack([jnp.asarray(o.data) for o in obs])
    if direct_wave is not None:
        dw_stack = jnp.stack([jnp.asarray(d.data) for d in direct_wave])
    else:
        dw_stack = jnp.zeros_like(obs_stack)
    (s_idx_p, s_w_p, obs_p, dw_p, sp_p), valid = _pad_shots(
        [jnp.asarray(s_idx), jnp.asarray(s_w), obs_stack, dw_stack,
         jnp.asarray(geometry.src_positions, dtype=model.dtype)],
        geometry.nsrc, S, model.dtype)
    shot_sh = NamedSharding(mesh, P("shots"))
    s_idx_p, s_w_p, obs_p, dw_p, sp_p, valid = (
        jax.device_put(a, shot_sh)
        for a in (s_idx_p, s_w_p, obs_p, dw_p, sp_p, valid))
    rec_positions = jnp.asarray(geometry.rec_positions,
                                dtype=model.dtype)
    r_idx, r_w = jnp.asarray(r_idx), jnp.asarray(r_w)
    src_wav = jnp.asarray(src_wav)

    @partial(jax.jit, static_argnames=("calc_grad",))
    def run(vp, damp, src_wav, si, sw, r_idx, r_w, ob, dw, sp, w, rec_pos,
            calc_grad):
        def per_shot(si_i, sw_i, obs_i, dw_i, sp_i, w_i):
            if calc_grad:
                rec, seg_starts, illum_pad = _ac.forward_ckpt(
                    vp, damp, src_wav, si_i, sw_i, r_idx, r_w, dt,
                    n_checkpoints=nck, **static)
            else:
                rec, _ = _ac.forward(vp, damp, src_wav, si_i, sw_i, r_idx,
                                     r_w, dt, save=False, **static)
            syn = rec - dw_i
            obs_c = obs_i - dw_i
            fval, res = misfit_jax(syn, obs_c)
            if not calc_grad:
                return (fval * w_i, jnp.zeros(shape, vp.dtype),
                        jnp.zeros(shape, vp.dtype))
            grad, _ = _ac.gradient_from_ckpt(
                vp, damp, src_wav, si_i, sw_i, seg_starts, res, r_idx, r_w,
                dt, n_checkpoints=nck, **static)
            crop = _crop(grad, pads, shape)
            crop = _fix_illum_jax(crop, sp_i, rec_pos, spacing, shape)
            illum = _crop(illum_pad, pads, shape)
            illum = _fix_illum_jax(illum, sp_i, rec_pos, spacing, shape)
            return fval * w_i, crop * w_i, illum * w_i

        f, g, il = jax.vmap(per_shot)(si, sw, ob, dw, sp, w)
        # the shot-axis sums lower to psum over 'shots'
        return jnp.sum(f), jnp.sum(g, axis=0), jnp.sum(il, axis=0)

    fval, grad, illum = run(vp, damp, src_wav, s_idx_p, s_w_p, r_idx, r_w,
                            obs_p, dw_p, sp_p, valid, rec_positions,
                            calc_grad=calc_grad)
    fval = float(fval)
    grad = np.array(grad, dtype=np.float64)
    illum = np.array(illum, dtype=np.float64)
    if calc_grad:
        if precond:
            grad /= np.sqrt(illum + 1e-30)
        if mask is not None:
            grad *= mask
    return fval, grad


def gradient_domain_sharded(geometry, residual, mesh=None, axis_sizes=None,
                            shot=0, n_checkpoints=None):
    """Single-shot segment-checkpointed FWI gradient with the spatial grid
    sharded over the device mesh — the reverse-sweep analog of
    ``forward_domain_sharded`` and the full equivalent of devito's
    MPI-parallel gradient path
    (``seismic/inversion/inversion_utils.py:7-25``).

    vp/damp (and hence every wavefield slice, checkpoint buffer and the
    gradient accumulator of the scanned forward + reverse programs) carry
    a NamedSharding; GSPMD partitions both sweeps and exchanges stencil
    halos over ICI. `residual` is the adjoint source (nt, nrec). Returns
    the gradient on the padded grid, cropped to the model's padded shape,
    as host numpy."""
    from ..fwi import _batched_tables, _solver_dt, _default_checkpoints

    model = geometry.model
    if mesh is None:
        mesh = domain_mesh(axis_sizes or (len(jax.devices()), 1))
    vp, damp, pads = _domain_sharded_fields(model, mesh)

    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    dt = _solver_dt(geometry)
    nck = n_checkpoints or _default_checkpoints(geometry.nt)
    static = dict(nt=geometry.nt, spacing=model.spacing,
                  space_order=model.space_order, kernel="OT2", fs=model.fs,
                  n_checkpoints=nck)
    _, seg_starts, _ = _ac.forward_ckpt(
        vp, damp, jnp.asarray(src_wav), jnp.asarray(s_idx[shot]),
        jnp.asarray(s_w[shot]), jnp.asarray(r_idx), jnp.asarray(r_w), dt,
        **static)
    grad, _ = _ac.gradient_from_ckpt(
        vp, damp, jnp.asarray(src_wav), jnp.asarray(s_idx[shot]),
        jnp.asarray(s_w[shot]), seg_starts, jnp.asarray(residual),
        jnp.asarray(r_idx), jnp.asarray(r_w), dt, **static)
    g = np.asarray(grad)
    slc = tuple(slice(0, n) for n in model.padded_shape)
    return g[slc]


# ---------------------------------------------------------------------------
# TTI sharded multi-shot gradient (BASELINE.json config 5: "TTI +
# viscoacoustic propagators, multi-shot batch sharded over TPU mesh")
# ---------------------------------------------------------------------------

def tti_fwi_obj_sharded(geometry, obs, misfit_func=None, direct_wave=None,
                        mask=None, precond=True, calc_grad=False, mesh=None,
                        n_checkpoints=16):
    """Sharded TTI multi-shot objective/gradient: each device runs its
    local shot block through the segment-checkpointed TTI pair
    (``ops.tti.forward_ckpt`` + ``jacobian_adjoint_from_ckpt``), then the
    (fval, grad, illum) triple psums over the 'shots' axis — the same
    dask-replacement pattern as the acoustic ``fwi_obj_sharded``
    (reference role ``fwi.py:207-234``, which has no TTI counterpart).

    `geometry.model` must carry epsilon/delta/theta (and phi in 3-D);
    `obs` is the (u+v) gather list or an (nsrc, nt, nrec) stack. Returns
    (fval, grad) with grad cropped, illumination-fixed per shot,
    preconditioned and masked like the acoustic path."""
    from ..fwi import (_batched_tables, _solver_dt, _misfit_jax,
                       _fix_illum_jax, _pads, _crop)
    from ..ops import tti as _tti

    misfit_jax = _misfit_jax(misfit_func)
    if misfit_jax is None:
        raise NotImplementedError(
            "tti_fwi_obj_sharded needs a jittable misfit (least_square "
            "or a misfit exposing .jax)")
    model = geometry.model
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    from ..fwi import _model_vp_device
    vp = _model_vp_device(model)
    damp = jnp.asarray(model.damp) if isinstance(model.damp, np.ndarray) \
        else model.dtype(0.0)
    epsilon = jnp.asarray(model.epsilon)
    delta = jnp.asarray(model.delta)
    theta = jnp.asarray(model.theta)
    # a CONSTANT azimuth is stored as a plain scalar, not an ndarray —
    # dropping it to None would silently rotate with phi=0 (review r4)
    phi = None
    if model.dim == 3:
        p = getattr(model, "phi", None)
        if p is not None and not (np.ndim(p) == 0 and float(p) == 0.0):
            phi = jnp.asarray(p)
    dt = float(_solver_dt(geometry))
    pads, shape, spacing = _pads(model), model.shape, model.spacing
    static = dict(nt=geometry.nt, spacing=spacing,
                  space_order=model.space_order,
                  n_checkpoints=n_checkpoints)
    rec_positions = jnp.asarray(geometry.rec_positions,
                                dtype=model.dtype)
    r_idx, r_w = jnp.asarray(r_idx), jnp.asarray(r_w)
    src_wav = jnp.asarray(src_wav)

    mesh = mesh or shot_mesh()
    ndev = mesh.devices.size
    if hasattr(obs, "shape"):
        obs_stack = jnp.asarray(obs)
    else:
        obs_stack = jnp.stack([jnp.asarray(o.data) for o in obs])
    if direct_wave is not None:
        if hasattr(direct_wave, "shape"):
            dw_stack = jnp.asarray(direct_wave)
        else:
            dw_stack = jnp.stack([jnp.asarray(d.data)
                                  for d in direct_wave])
    else:
        dw_stack = jnp.zeros_like(obs_stack[:, :1, :1])
    (s_idx_p, s_w_p, obs_p, dw_p, sp_p), valid = _pad_shots(
        [jnp.asarray(s_idx), jnp.asarray(s_w), obs_stack, dw_stack,
         jnp.asarray(geometry.src_positions, dtype=model.dtype)],
        geometry.nsrc, ndev, model.dtype)

    def per_shot(si, sw, obs_i, dw_i, sp, w):
        if calc_grad:
            rec, seg_starts, illum_pad = _tti.forward_ckpt(
                vp, damp, epsilon, delta, theta, phi, src_wav, si, sw,
                r_idx, r_w, dt, with_illum=True, **static)
        else:
            rec, _ = _tti.forward_ckpt(
                vp, damp, epsilon, delta, theta, phi, src_wav, si, sw,
                r_idx, r_w, dt, **static)
        syn = rec - dw_i
        obs_c = obs_i - dw_i
        fval, res = misfit_jax(syn, obs_c)
        if not calc_grad:
            z = jnp.zeros(shape, vp.dtype)
            return fval * w, z, z
        grad, _ = _tti.jacobian_adjoint_from_ckpt(
            vp, damp, epsilon, delta, theta, phi, src_wav, si, sw,
            seg_starts, res.astype(vp.dtype), r_idx, r_w, dt, **static)
        crop = _crop(grad, pads, shape)
        crop = _fix_illum_jax(crop, sp, rec_positions, spacing, shape)
        illum = _crop(illum_pad, pads, shape)
        illum = _fix_illum_jax(illum, sp, rec_positions, spacing, shape)
        return fval * w, crop * w, illum * w

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P("shots"), P("shots"), P("shots"), P("shots"),
                       P("shots"), P("shots")),
             out_specs=(P(), P(), P()))
    def run(si, sw, ob, dw, sp, w):
        f, g, il = jax.vmap(per_shot)(si, sw, ob, dw, sp, w)
        f = jax.lax.psum(jnp.sum(f), "shots")
        g = jax.lax.psum(jnp.sum(g, axis=0), "shots")
        il = jax.lax.psum(jnp.sum(il, axis=0), "shots")
        return f, g, il

    nsrc_p = int(s_idx_p.shape[0])
    chunk_len = min(nsrc_p, ndev * _PER_DEV_CAP)
    fval, grad, illum = 0.0, None, None
    for lo in range(0, nsrc_p, chunk_len):
        hi = min(lo + chunk_len, nsrc_p)
        f_c, g_c, il_c = run(s_idx_p[lo:hi], s_w_p[lo:hi], obs_p[lo:hi],
                             dw_p[lo:hi], sp_p[lo:hi], valid[lo:hi])
        fval += float(f_c)
        if calc_grad:
            g_c = np.array(g_c, dtype=np.float64)
            il_c = np.array(il_c, dtype=np.float64)
            grad = g_c if grad is None else grad + g_c
            illum = il_c if illum is None else illum + il_c
    if calc_grad:
        if precond:
            grad /= np.sqrt(illum + 1e-30)
        if mask is not None:
            grad *= mask
    return fval, grad


def viscoacoustic_fm_sharded(geometry, kernel="sls", time_order=2,
                             mesh=None):
    """Viscoacoustic multi-shot forward modeling sharded over the shots
    mesh (the remaining propagator of BASELINE.json config 5's "TTI +
    viscoacoustic ... sharded over TPU mesh"; the reference runs these
    shots serially). Returns an (nsrc, nt, nrec) gather stack."""
    from ..fwi import _batched_tables, _solver_dt
    from ..ops import viscoacoustic as _va

    model = geometry.model
    model._initialize_bcs(bcs="mask")
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    from ..fwi import _model_vp_device
    vp = _model_vp_device(model)
    b = jnp.asarray(model.b) if isinstance(model.b, np.ndarray) \
        else model.dtype(model.b)
    qp = jnp.asarray(model.qp)
    damp = jnp.asarray(model.damp) if isinstance(model.damp, np.ndarray) \
        else model.dtype(1.0)
    dt = float(_solver_dt(geometry))
    r_idx_j, r_w_j = jnp.asarray(r_idx), jnp.asarray(r_w)
    src_wav = jnp.asarray(src_wav)
    static = dict(kernel=kernel, time_order=time_order, nt=geometry.nt,
                  spacing=model.spacing, space_order=model.space_order)

    mesh = mesh or shot_mesh()
    ndev = mesh.devices.size
    (s_idx_p, s_w_p), _ = _pad_shots(
        [jnp.asarray(s_idx), jnp.asarray(s_w)], geometry.nsrc, ndev,
        model.dtype)

    @partial(shard_map, mesh=mesh, check_vma=False,
             in_specs=(P("shots"), P("shots")), out_specs=P("shots"))
    def run(si, sw):
        def per(si_i, sw_i):
            rec, _ = _va.forward(vp, b, qp, damp, src_wav, si_i, sw_i,
                                 r_idx_j, r_w_j, dt, geometry.f0,
                                 save=False, **static)
            return rec
        return jax.vmap(per)(si, sw)

    rec_all = np.asarray(run(s_idx_p, s_w_p))[:geometry.nsrc]
    return rec_all


def elastic_fwi_obj_sharded(geometry, obs, misfit_func=None,
                            direct_wave=None, mask=None, precond=True,
                            calc_grad=False, mesh=None, n_checkpoints=0,
                            vp=None, vs=None, rho=None):
    """Shot-sharded elastic objective/gradient: each device runs its
    local shots through the vjp of the two-level-rematted velocity-
    stress scan (``elastic_fwi._elastic_shots_obj``'s per-shot body),
    psum-reducing (fval, gvp, gvs, grho, illum) over the 'shots' axis.
    Returns (fval, {"vp","vs","rho"} gradient dict) matching
    ``elastic_fwi.elastic_fwi_obj_multi`` conventions."""
    from ..fwi import (_batched_tables, _misfit_jax, _fix_illum_jax,
                       _pads, _crop)
    from ..elastic_fwi import _damp_field, model_vp_vs_rho
    from ..ops import staggered as _st

    misfit_jax = _misfit_jax(misfit_func)
    if misfit_jax is None:
        raise NotImplementedError(
            "elastic_fwi_obj_sharded needs a jittable misfit")
    model = geometry.model
    model._initialize_bcs(bcs="mask")
    mvp, mvs, mrho = model_vp_vs_rho(model)
    pads, shape, spacing = _pads(model), model.shape, model.spacing
    crop_slc = tuple(slice(lo, lo + n)
                     for (lo, _), n in zip(model.padsizes, shape))

    def param(user, fallback):
        if user is None:
            return np.asarray(fallback)[crop_slc]
        user = np.asarray(user, dtype=model.dtype)
        return user if user.shape == shape else user[crop_slc]

    vp = jnp.asarray(param(vp, mvp))
    vs = jnp.asarray(param(vs, mvs))
    rho = jnp.asarray(param(rho, mrho))
    damp = jnp.asarray(_damp_field(model))
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    # model dtype, like every other sharded path — f64 positions (x64
    # CPU meshes) would otherwise promote the shard_map body's
    # grads/illum
    rec_pos = jnp.asarray(geometry.rec_positions, dtype=model.dtype)
    r_idx, r_w = jnp.asarray(r_idx), jnp.asarray(r_w)
    src_wav = jnp.asarray(src_wav)
    dt = float(model.critical_dt)
    nt = geometry.nt
    so = model.space_order
    nck = n_checkpoints

    mesh = mesh or shot_mesh()
    ndev = mesh.devices.size
    if hasattr(obs, "shape"):
        obs_stack = jnp.asarray(obs)
    else:
        obs_stack = jnp.stack([jnp.asarray(o.data) for o in obs])
    if direct_wave is None:
        dw_stack = jnp.zeros_like(obs_stack)
    elif hasattr(direct_wave, "shape"):
        dw_stack = jnp.asarray(direct_wave)
    else:
        dw_stack = jnp.stack([jnp.asarray(d.data) for d in direct_wave])
    (s_idx_p, s_w_p, obs_p, dw_p, sp_p), valid = _pad_shots(
        [jnp.asarray(s_idx), jnp.asarray(s_w), obs_stack, dw_stack,
         jnp.asarray(geometry.src_positions, dtype=model.dtype)],
        geometry.nsrc, ndev, model.dtype)

    run = _elastic_sharded_runner(mesh, dt, nt, spacing, so, nck, pads,
                                  shape, misfit_jax, bool(calc_grad))

    nsrc_p = int(s_idx_p.shape[0])
    chunk_len = min(nsrc_p, ndev * 4)
    fval, gsum, ilsum = 0.0, None, None
    for lo in range(0, nsrc_p, chunk_len):
        hi = min(lo + chunk_len, nsrc_p)
        f_c, g_c, il_c = run(vp, vs, rho, damp, src_wav, r_idx, r_w,
                             rec_pos, s_idx_p[lo:hi], s_w_p[lo:hi],
                             obs_p[lo:hi], dw_p[lo:hi], sp_p[lo:hi],
                             valid[lo:hi])
        fval += float(f_c)
        if calc_grad:
            g_c = tuple(np.asarray(x, np.float64) for x in g_c)
            gsum = g_c if gsum is None else \
                tuple(a + b for a, b in zip(gsum, g_c))
            il_c = np.asarray(il_c, np.float64)
            ilsum = il_c if ilsum is None else ilsum + il_c
    if not calc_grad:
        return fval, None
    out = {}
    for name, g in zip(("vp", "vs", "rho"), gsum):
        if precond:
            g = g / np.sqrt(ilsum + 1e-30)
        if mask is not None:
            g = g * mask
        out[name] = g
    return fval, out


@_lru_cache(maxsize=16)
def _elastic_sharded_runner(mesh, dt, nt, spacing, space_order,
                            n_checkpoints, pads, shape, misfit_jax,
                            calc_grad):
    """Cached, jitted shard_map runner for the elastic sharded
    objective. All fields enter as replicated ARGUMENTS (a per-call
    closure would recompile every invocation and bake grid-sized arrays
    into the program as constants, which round-trip the tunnel at
    compile time — CLAUDE.md); the per-shot body is the SAME
    ``elastic_fwi._elastic_fwd_factory`` closure as the single-chip
    chunk objective (one place for the per-shot convention)."""
    from ..fwi import _fix_illum_jax
    from ..elastic_fwi import _elastic_fwd_factory

    def body(vp, vs, rho, damp, src_wav, r_idx, r_w, rec_pos,
             si_b, sw_b, ob_b, dw_b, sp_b, w_b):
        fwd_factory = _elastic_fwd_factory(
            damp, src_wav, r_idx, r_w, dt, nt=nt, spacing=spacing,
            space_order=space_order, n_checkpoints=n_checkpoints,
            pads=pads, shape=shape)

        def fix(g, sp):
            return _fix_illum_jax(g, sp, rec_pos, spacing, shape)

        def per_shot(si, sw, obs_i, dw_i, sp, w):
            fwd = fwd_factory(si, sw)
            if calc_grad:
                (rec1, illum), vjp = jax.vjp(fwd, vp, vs, rho)
            else:
                rec1, illum = fwd(vp, vs, rho)
            f, res = misfit_jax(rec1 - dw_i, obs_i - dw_i)
            if not calc_grad:
                z = jnp.zeros(shape, vp.dtype)
                return f * w, (z, z, z), z
            grads = vjp((res.astype(vp.dtype), jnp.zeros_like(illum)))
            return (f * w, tuple(fix(g, sp) * w for g in grads),
                    fix(illum, sp) * w)

        f, g, il = jax.vmap(per_shot)(si_b, sw_b, ob_b, dw_b, sp_b, w_b)
        f = jax.lax.psum(jnp.sum(f), "shots")
        g = tuple(jax.lax.psum(jnp.sum(x, axis=0), "shots") for x in g)
        il = jax.lax.psum(jnp.sum(il, axis=0), "shots")
        return f, g, il

    sm = shard_map(body, mesh=mesh, check_vma=False,
                   in_specs=(P(),) * 8 + (P("shots"),) * 6,
                   out_specs=(P(), (P(), P(), P()), P()))
    # jit: an eagerly-evaluated closed_call (the unjitted rematted
    # elastic body) inside shard_map is unsupported
    return jax.jit(sm)


def viscoacoustic_fwi_obj_sharded(geometry, obs, misfit_func=None,
                                  direct_wave=None, mask=None,
                                  precond=True, calc_grad=False,
                                  kernel="sls", time_order=2, mesh=None,
                                  n_checkpoints=0, vp=None, qp=None):
    """Shot-sharded viscoacoustic objective/GRADIENT (round 5; the r4
    tree had only the sharded forward): each device runs its local
    shots through the hand-written sls/2 saved-history adjoint
    (``ops/visco_grad.py``) when it applies, else the vjp of the
    rematted scan, psum-reducing (fval, g_vp, g_qp, illum) over the
    'shots' axis. Returns (fval, {"vp","qp"} dict) matching
    ``visco_fwi.visco_fwi_obj_multi`` conventions."""
    from ..fwi import _batched_tables, _misfit_jax, _pads
    from ..visco_fwi import _field

    misfit_jax = _misfit_jax(misfit_func)
    if misfit_jax is None:
        raise NotImplementedError(
            "viscoacoustic_fwi_obj_sharded needs a jittable misfit")
    model = geometry.model
    model._initialize_bcs(bcs="mask")
    pads, shape, spacing = _pads(model), model.shape, model.spacing
    crop_slc = tuple(slice(lo, lo + n)
                     for (lo, _), n in zip(model.padsizes, shape))

    def param(user, fallback):
        if user is None:
            return np.asarray(fallback)[crop_slc]
        user = np.asarray(user, dtype=model.dtype)
        return user if user.shape == shape else user[crop_slc]

    vp = jnp.asarray(param(vp, _field(model, "vp")))
    qp = jnp.asarray(param(qp, _field(model, "qp")))
    b = jnp.asarray(_field(model, "b", 1.0))
    damp = jnp.asarray(_field(model, "damp", 1.0))
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    rec_pos = jnp.asarray(geometry.rec_positions, dtype=model.dtype)
    r_idx, r_w = jnp.asarray(r_idx), jnp.asarray(r_w)
    src_wav = jnp.asarray(src_wav)
    dt = float(model.critical_dt)

    grad_route = "saved" if (kernel, time_order) == ("sls", 2) else "vjp"
    hist_dtype = None
    if model.dtype == np.float32:
        from ..ops.pallas_acoustic import stream_hist_dtype
        hist_dtype = stream_hist_dtype()

    mesh = mesh or shot_mesh()
    ndev = mesh.devices.size
    obs_stack = jnp.asarray(obs) if hasattr(obs, "shape") else \
        jnp.stack([jnp.asarray(o.data) for o in obs])
    if direct_wave is None:
        dw_stack = jnp.zeros_like(obs_stack)
    else:
        dw_stack = jnp.asarray(direct_wave) \
            if hasattr(direct_wave, "shape") else \
            jnp.stack([jnp.asarray(d.data) for d in direct_wave])
    (s_idx_p, s_w_p, obs_p, dw_p, sp_p), valid = _pad_shots(
        [jnp.asarray(s_idx), jnp.asarray(s_w), obs_stack, dw_stack,
         jnp.asarray(geometry.src_positions, dtype=model.dtype)],
        geometry.nsrc, ndev, model.dtype)

    run = _visco_sharded_runner(mesh, dt, float(geometry.f0),
                                geometry.nt, spacing, model.space_order,
                                n_checkpoints, kernel, time_order, pads,
                                shape, misfit_jax, bool(calc_grad),
                                grad_route, hist_dtype)

    nsrc_p = int(s_idx_p.shape[0])
    chunk_len = min(nsrc_p, ndev * 4)
    fval, gsum, ilsum = 0.0, None, None
    for lo in range(0, nsrc_p, chunk_len):
        hi = min(lo + chunk_len, nsrc_p)
        f_c, g_c, il_c = run(vp, qp, b, damp, src_wav, r_idx, r_w,
                             rec_pos, s_idx_p[lo:hi], s_w_p[lo:hi],
                             obs_p[lo:hi], dw_p[lo:hi], sp_p[lo:hi],
                             valid[lo:hi])
        fval += float(f_c)
        if calc_grad:
            g_c = tuple(np.asarray(x, np.float64) for x in g_c)
            gsum = g_c if gsum is None else \
                tuple(a + c for a, c in zip(gsum, g_c))
            il_c = np.asarray(il_c, np.float64)
            ilsum = il_c if ilsum is None else ilsum + il_c
    if not calc_grad:
        return fval, None
    out = {}
    for name, g in zip(("vp", "qp"), gsum):
        if precond:
            g = g / np.sqrt(ilsum + 1e-30)
        if mask is not None:
            g = g * mask
        out[name] = g
    return fval, out


@_lru_cache(maxsize=16)
def _visco_sharded_runner(mesh, dt, f0, nt, spacing, space_order,
                          n_checkpoints, kernel, time_order, pads, shape,
                          misfit_jax, calc_grad, grad_route, hist_dtype):
    """Cached, jitted shard_map runner for the viscoacoustic sharded
    objective (replicated-argument discipline — see
    ``_elastic_sharded_runner``)."""
    from ..fwi import _crop, _fix_illum_jax
    from ..ops import viscoacoustic as _va
    from ..ops import visco_grad as _vg
    from ..ops.staggered_grad import pad_fold

    def body(vp, qp, b, damp, src_wav, r_idx, r_w, rec_pos,
             si_b, sw_b, ob_b, dw_b, sp_b, w_b):

        def fix(g, sp):
            return _fix_illum_jax(g, sp, rec_pos, spacing, shape)

        def per_shot(si, sw, obs_i, dw_i, sp, w):
            if calc_grad and grad_route == "saved":
                vpp = jnp.pad(vp, pads, mode="edge")
                qpp = jnp.pad(qp, pads, mode="edge")
                f, (g_vp, g_qp), illum, _res = \
                    _vg.visco_sls2_value_and_grad(
                        vpp, b, qpp, damp, src_wav, si, sw, r_idx, r_w,
                        obs_i, dw_i, dt, f0, misfit_jax, nt=nt,
                        spacing=spacing, space_order=space_order,
                        hist_dtype=hist_dtype)
                grads = (pad_fold(g_vp, pads), pad_fold(g_qp, pads))
                illum = _crop(illum, pads, shape)
                return (f * w, tuple(fix(g, sp) * w for g in grads),
                        fix(illum, sp) * w)

            def fwd(vp_, qp_):
                vpp = jnp.pad(vp_, pads, mode="edge")
                qpp = jnp.pad(qp_, pads, mode="edge")
                rec, illum = _va.forward_seg(
                    vpp, b, qpp, damp, src_wav, si, sw, r_idx, r_w, dt,
                    f0, kernel=kernel, time_order=time_order, nt=nt,
                    spacing=spacing, space_order=space_order,
                    n_checkpoints=n_checkpoints)
                return rec, _crop(illum, pads, shape)

            if calc_grad:
                (rec, illum), vjp = jax.vjp(fwd, vp, qp)
            else:
                rec, illum = fwd(vp, qp)
            f, res = misfit_jax(rec - dw_i, obs_i - dw_i)
            if not calc_grad:
                z = jnp.zeros(shape, vp.dtype)
                return f * w, (z, z), z
            grads = vjp((res.astype(vp.dtype), jnp.zeros_like(illum)))
            return (f * w, tuple(fix(g, sp) * w for g in grads),
                    fix(illum, sp) * w)

        f, g, il = jax.vmap(per_shot)(si_b, sw_b, ob_b, dw_b, sp_b, w_b)
        f = jax.lax.psum(jnp.sum(f), "shots")
        g = tuple(jax.lax.psum(jnp.sum(x, axis=0), "shots") for x in g)
        il = jax.lax.psum(jnp.sum(il, axis=0), "shots")
        return f, g, il

    sm = shard_map(body, mesh=mesh, check_vma=False,
                   in_specs=(P(),) * 8 + (P("shots"),) * 6,
                   out_specs=(P(), (P(), P()), P()))
    return jax.jit(sm)


def viscoelastic_fwi_obj_sharded(geometry, obs, misfit_func=None,
                                 direct_wave=None, mask=None,
                                 precond=True, calc_grad=False,
                                 mesh=None, n_checkpoints=0):
    """Shot-sharded viscoelastic (vp, vs, rho, qp, qs) objective/
    gradient: vjp of the two-level-rematted SLS velocity-stress scan
    per local shot, psum over 'shots'. Observed data is the rec1
    (tau_zz) gather. Returns (fval, dict of the five gradients)."""
    from ..fwi import _batched_tables, _misfit_jax, _pads
    from ..elastic_fwi import _damp_field, model_vp_vs_rho
    from ..visco_fwi import _field

    misfit_jax = _misfit_jax(misfit_func)
    if misfit_jax is None:
        raise NotImplementedError(
            "viscoelastic_fwi_obj_sharded needs a jittable misfit")
    model = geometry.model
    model._initialize_bcs(bcs="mask")
    pads, shape, spacing = _pads(model), model.shape, model.spacing
    crop_slc = tuple(slice(lo, lo + n)
                     for (lo, _), n in zip(model.padsizes, shape))
    mvp, mvs, mrho = model_vp_vs_rho(model)
    vp = jnp.asarray(np.asarray(mvp)[crop_slc])
    vs = jnp.asarray(np.asarray(mvs)[crop_slc])
    rho = jnp.asarray(np.asarray(mrho)[crop_slc])
    qp = jnp.asarray(np.asarray(_field(model, "qp"))[crop_slc])
    qs = jnp.asarray(np.asarray(_field(model, "qs"))[crop_slc])
    damp = jnp.asarray(_damp_field(model))
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    rec_pos = jnp.asarray(geometry.rec_positions, dtype=model.dtype)
    r_idx, r_w = jnp.asarray(r_idx), jnp.asarray(r_w)
    src_wav = jnp.asarray(src_wav)
    dt = float(model.critical_dt)

    mesh = mesh or shot_mesh()
    ndev = mesh.devices.size
    obs_stack = jnp.asarray(obs) if hasattr(obs, "shape") else \
        jnp.stack([jnp.asarray(o.data) for o in obs])
    if direct_wave is None:
        dw_stack = jnp.zeros_like(obs_stack)
    else:
        dw_stack = jnp.asarray(direct_wave) \
            if hasattr(direct_wave, "shape") else \
            jnp.stack([jnp.asarray(d.data) for d in direct_wave])
    (s_idx_p, s_w_p, obs_p, dw_p, sp_p), valid = _pad_shots(
        [jnp.asarray(s_idx), jnp.asarray(s_w), obs_stack, dw_stack,
         jnp.asarray(geometry.src_positions, dtype=model.dtype)],
        geometry.nsrc, ndev, model.dtype)

    run = _viscoelastic_sharded_runner(
        mesh, dt, float(geometry.f0), geometry.nt, spacing,
        model.space_order, n_checkpoints, pads, shape, misfit_jax,
        bool(calc_grad))

    nsrc_p = int(s_idx_p.shape[0])
    chunk_len = min(nsrc_p, ndev * 2)
    fval, gsum, ilsum = 0.0, None, None
    for lo in range(0, nsrc_p, chunk_len):
        hi = min(lo + chunk_len, nsrc_p)
        f_c, g_c, il_c = run(vp, vs, rho, qp, qs, damp, src_wav, r_idx,
                             r_w, rec_pos, s_idx_p[lo:hi], s_w_p[lo:hi],
                             obs_p[lo:hi], dw_p[lo:hi], sp_p[lo:hi],
                             valid[lo:hi])
        fval += float(f_c)
        if calc_grad:
            g_c = tuple(np.asarray(x, np.float64) for x in g_c)
            gsum = g_c if gsum is None else \
                tuple(a + c for a, c in zip(gsum, g_c))
            il_c = np.asarray(il_c, np.float64)
            ilsum = il_c if ilsum is None else ilsum + il_c
    if not calc_grad:
        return fval, None
    out = {}
    for name, g in zip(("vp", "vs", "rho", "qp", "qs"), gsum):
        if precond:
            g = g / np.sqrt(ilsum + 1e-30)
        if mask is not None:
            g = g * mask
        out[name] = g
    return fval, out


@_lru_cache(maxsize=16)
def _viscoelastic_sharded_runner(mesh, dt, f0, nt, spacing, space_order,
                                 n_checkpoints, pads, shape, misfit_jax,
                                 calc_grad):
    """Cached, jitted shard_map runner for the viscoelastic sharded
    objective. The gradient runs the hand-written saved-history adjoint
    (``staggered_grad.viscoelastic_value_and_grad`` — exact vs vjp at
    f64 roundoff, tests/test_visco_grad.py)."""
    from ..fwi import _crop, _fix_illum_jax
    from ..ops import staggered as _st
    from ..ops import staggered_grad as _sg

    def body(vp, vs, rho, qp, qs, damp, src_wav, r_idx, r_w, rec_pos,
             si_b, sw_b, ob_b, dw_b, sp_b, w_b):

        def fix(g, sp):
            return _fix_illum_jax(g, sp, rec_pos, spacing, shape)

        def per_shot(si, sw, obs_i, dw_i, sp, w):
            if calc_grad:
                vpp = jnp.pad(vp, pads, mode="edge")
                vsp = jnp.pad(vs, pads, mode="edge")
                rhp = jnp.pad(rho, pads, mode="edge")
                qpp = jnp.pad(qp, pads, mode="edge")
                qsp = jnp.pad(qs, pads, mode="edge")
                f, grads, illum, _res = _sg.viscoelastic_value_and_grad(
                    vpp, vsp, rhp, qpp, qsp, damp, f0, src_wav, si, sw,
                    r_idx, r_w, obs_i, dw_i, dt, misfit_jax, nt=nt,
                    spacing=spacing, space_order=space_order)
                grads = tuple(_sg.pad_fold(g, pads) for g in grads)
                illum = _crop(illum, pads, shape)
                return (f * w, tuple(fix(g, sp) * w for g in grads),
                        fix(illum, sp) * w)

            vpp = jnp.pad(vp, pads, mode="edge")
            vsp = jnp.pad(vs, pads, mode="edge")
            rhp = jnp.pad(rho, pads, mode="edge")
            qpp = jnp.pad(qp, pads, mode="edge")
            qsp = jnp.pad(qs, pads, mode="edge")
            lam = rhp * (vpp * vpp - 2.0 * vsp * vsp)
            mu = rhp * vsp * vsp
            rec1, _, illum = _st.viscoelastic_forward_seg(
                lam, mu, 1.0 / rhp, qpp, qsp, damp, f0, src_wav,
                si, sw, r_idx, r_w, dt, nt=nt, spacing=spacing,
                space_order=space_order, n_checkpoints=n_checkpoints)
            f, res = misfit_jax(rec1 - dw_i, obs_i - dw_i)
            z = jnp.zeros(shape, vp.dtype)
            return f * w, (z, z, z, z, z), z

        f, g, il = jax.vmap(per_shot)(si_b, sw_b, ob_b, dw_b, sp_b, w_b)
        f = jax.lax.psum(jnp.sum(f), "shots")
        g = tuple(jax.lax.psum(jnp.sum(x, axis=0), "shots") for x in g)
        il = jax.lax.psum(jnp.sum(il, axis=0), "shots")
        return f, g, il

    sm = shard_map(body, mesh=mesh, check_vma=False,
                   in_specs=(P(),) * 10 + (P("shots"),) * 6,
                   out_specs=(P(), (P(),) * 5, P()))
    return jax.jit(sm)


def sa_fwi_obj_sharded(geometry, obs, misfit_func=None, direct_wave=None,
                       mask=None, precond=True, calc_grad=False,
                       mesh=None):
    """Shot-sharded SELF-ADJOINT objective/gradient: per local shot a
    save=True forward + the explicit ``jacobian_adjoint`` imaging
    condition (reference ``IsoJacobianAdjOperator``), psum over
    'shots'. The model must carry vp, b and a w/Q damp field
    (``self_adjoint.setup_w_over_q``). Returns (fval, g_vp) matching
    the acoustic ``fwi_obj_sharded`` shape conventions. The saved
    background wavefield costs nt x grid per in-flight shot — size the
    mesh chunking accordingly for large nt."""
    from ..fwi import _batched_tables, _misfit_jax, _pads
    from ..visco_fwi import _field

    misfit_jax = _misfit_jax(misfit_func)
    if misfit_jax is None:
        raise NotImplementedError(
            "sa_fwi_obj_sharded needs a jittable misfit")
    model = geometry.model
    pads, shape, spacing = _pads(model), model.shape, model.spacing
    vp = jnp.asarray(_field(model, "vp"))
    b = jnp.asarray(_field(model, "b", 1.0))
    woq = jnp.asarray(_field(model, "damp"))
    s_idx, s_w, r_idx, r_w, src_wav = _batched_tables(geometry)
    rec_pos = jnp.asarray(geometry.rec_positions, dtype=model.dtype)
    r_idx, r_w = jnp.asarray(r_idx), jnp.asarray(r_w)
    src_wav = jnp.asarray(src_wav)
    dt = float(model.critical_dt)

    mesh = mesh or shot_mesh()
    ndev = mesh.devices.size
    obs_stack = jnp.asarray(obs) if hasattr(obs, "shape") else \
        jnp.stack([jnp.asarray(o.data) for o in obs])
    if direct_wave is None:
        dw_stack = jnp.zeros_like(obs_stack)
    else:
        dw_stack = jnp.asarray(direct_wave) \
            if hasattr(direct_wave, "shape") else \
            jnp.stack([jnp.asarray(d.data) for d in direct_wave])
    (s_idx_p, s_w_p, obs_p, dw_p, sp_p), valid = _pad_shots(
        [jnp.asarray(s_idx), jnp.asarray(s_w), obs_stack, dw_stack,
         jnp.asarray(geometry.src_positions, dtype=model.dtype)],
        geometry.nsrc, ndev, model.dtype)

    run = _sa_sharded_runner(mesh, dt, geometry.nt, spacing,
                             model.space_order, pads, shape, misfit_jax,
                             bool(calc_grad))

    nsrc_p = int(s_idx_p.shape[0])
    chunk_len = min(nsrc_p, ndev)  # save=True wavefield: one per device
    fval, gsum, ilsum = 0.0, None, None
    for lo in range(0, nsrc_p, chunk_len):
        hi = min(lo + chunk_len, nsrc_p)
        f_c, g_c, il_c = run(vp, b, woq, src_wav, r_idx, r_w, rec_pos,
                             s_idx_p[lo:hi], s_w_p[lo:hi], obs_p[lo:hi],
                             dw_p[lo:hi], sp_p[lo:hi], valid[lo:hi])
        fval += float(f_c)
        if calc_grad:
            g_c = np.asarray(g_c, np.float64)
            gsum = g_c if gsum is None else gsum + g_c
            il_c = np.asarray(il_c, np.float64)
            ilsum = il_c if ilsum is None else ilsum + il_c
    if not calc_grad:
        return fval, None
    g = gsum
    if precond:
        g = g / np.sqrt(ilsum + 1e-30)
    if mask is not None:
        g = g * mask
    return fval, g


@_lru_cache(maxsize=16)
def _sa_sharded_runner(mesh, dt, nt, spacing, space_order, pads, shape,
                       misfit_jax, calc_grad):
    """Cached, jitted shard_map runner for the self-adjoint sharded
    objective."""
    from ..fwi import _crop, _fix_illum_jax
    from ..ops import self_adjoint as _sa

    def body(vp, b, woq, src_wav, r_idx, r_w, rec_pos,
             si_b, sw_b, ob_b, dw_b, sp_b, w_b):

        def fix(g, sp):
            return _fix_illum_jax(g, sp, rec_pos, spacing, shape)

        def per_shot(si, sw, obs_i, dw_i, sp, w):
            static = dict(nt=nt, spacing=spacing,
                          space_order=space_order)
            rec, u0 = _sa.forward(vp, b, woq, src_wav, si, sw, r_idx,
                                  r_w, dt, save=calc_grad, **static)
            f, res = misfit_jax(rec - dw_i, obs_i - dw_i)
            if not calc_grad:
                z = jnp.zeros(shape, vp.dtype)
                return f * w, z, z
            dm, _ = _sa.jacobian_adjoint(vp, b, woq, u0,
                                         res.astype(vp.dtype), r_idx,
                                         r_w, dt, **static)
            illum = jnp.sum(u0 * u0, axis=0)
            g = fix(_crop(dm, pads, shape), sp)
            il = fix(_crop(illum, pads, shape), sp)
            return f * w, g * w, il * w

        f, g, il = jax.vmap(per_shot)(si_b, sw_b, ob_b, dw_b, sp_b, w_b)
        f = jax.lax.psum(jnp.sum(f), "shots")
        g = jax.lax.psum(jnp.sum(g, axis=0), "shots")
        il = jax.lax.psum(jnp.sum(il, axis=0), "shots")
        return f, g, il

    sm = shard_map(body, mesh=mesh, check_vma=False,
                   in_specs=(P(),) * 7 + (P("shots"),) * 6,
                   out_specs=(P(), P(), P()))
    return jax.jit(sm)
