"""Interpreter-mode parity tests for the Pallas BFM kernels
(ops/pallas_bfm.py): the banded Legendre transform with certificate and
the local-base pushforward slab kernel must reproduce the XLA reference
paths exactly (same sums, f32)."""
import importlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

B = importlib.import_module("devito_fwi_tpu.misfit.bfm")
pb = importlib.import_module("devito_fwi_tpu.ops.pallas_bfm")


def test_legendre_banded_matches_full_and_certifies():
    rng = np.random.RandomState(0)
    n = 700
    s = jnp.asarray((np.arange(n) + 0.5) / n, jnp.float32)
    base = 0.5 * np.asarray(s) ** 2
    u_in = (base[None, :] + 5e-4 * rng.rand(37, n)).astype(np.float32)
    u_out = np.roll(u_in, 250, axis=-1).astype(np.float32)

    for u, expect_ok in ((u_in, True), (u_out, False)):
        full = B._legendre_last(jnp.asarray(u), s, 32_000_000)
        out, ok = pb.legendre_banded(jnp.asarray(u), 48, 16,
                                     interpret=True)
        assert bool(ok) == expect_ok
        if expect_ok:
            d = np.abs(np.asarray(out) - np.asarray(full)).max()
            assert d < 1e-6 * max(np.abs(np.asarray(full)).max(), 1e-30)


def test_legendre_fast_pallas_path_exact(monkeypatch):
    """_legendre_last_fast routed through the interpret-mode Pallas
    kernel == the full transform, certificate-pass and -fail cases."""
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.RandomState(1)
    n = 640
    s = jnp.asarray((np.arange(n) + 0.5) / n, jnp.float32)
    base = 0.5 * np.asarray(s) ** 2
    for shift in (0, 300):
        u = np.roll((base[None, None, :]
                     + 5e-4 * rng.rand(3, 11, n)).astype(np.float32),
                    shift, axis=-1)
        full = B._legendre_last(jnp.asarray(u), s, 32_000_000)
        fast = B._legendre_last_fast(jnp.asarray(u), s, 32_000_000)
        d = np.abs(np.asarray(fast) - np.asarray(full)).max()
        assert d < 1e-6 * max(np.abs(np.asarray(full)).max(), 1e-30)


def _subs(shift_rows=0):
    rng = np.random.default_rng(3)
    n1, n2, nsub, Bb = 24, 90, 2, 3
    mu = jnp.asarray(rng.uniform(0.2, 2.0, size=(Bb, n2, n1)),
                     jnp.float32)
    pot = rng.normal(size=(Bb, n2, n1)) * 1e-3
    from scipy.ndimage import gaussian_filter
    pot = np.stack([gaussian_filter(p, 4) for p in pot])
    xs = (np.arange(n1) + 0.5) / n1
    ys = (np.arange(n2) + 0.5) / n2
    quad = 0.5 * (xs[None, :] ** 2 + ys[:, None] ** 2)
    pot = jnp.asarray(pot + quad, jnp.float32)
    xMap, yMap = jax.vmap(lambda p: B._pushforward_map(p, n1, n2))(pot)
    out = jax.vmap(lambda m, xm, ym: B._pushforward_subsamples(
        m, xm, ym, n1, n2, nsub))(mu, xMap, yMap + shift_rows / n2)
    return tuple(jnp.asarray(a, jnp.float32)
                 if a.dtype.kind == "f" else a for a in out[:7]), n1, n2


@pytest.mark.parametrize("prep", ["nat", "blocked"])
@pytest.mark.parametrize("fold", ["vec", "loop"])
@pytest.mark.parametrize("shift", [0, 40])
def test_pallas_push_matches_scatter(shift, fold, prep, monkeypatch):
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    subs, n1, n2 = _subs(shift)
    rho_scat = B._scatter_pushforward_batch(subs, n1, n2)
    assert bool(B._local_band_ok(subs, G_local=24, margin=128,
                                 row_block=16))
    rho_pal = B._pallas_push(subs, n1, n2, G=24, dxmax=7, margin=128,
                             R=16, fold=fold, prep_mode=prep)
    np.testing.assert_allclose(np.asarray(rho_pal), np.asarray(rho_scat),
                               rtol=1e-5, atol=1e-7)


def test_bfm_batch_pallas_matches_scatter_end_to_end(monkeypatch):
    """Full bfm_jax_batch with the Pallas pushforward + Legendre
    (interpret mode) == the forced-scatter/full path."""
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("DEVITO_FWI_TPU_BFM_PUSH", "pallas")
    monkeypatch.setenv("DEVITO_FWI_TPU_BFM_LEGENDRE", "banded")
    rng = np.random.RandomState(1)
    n1, n2 = 28, 100
    t = np.arange(n2)[:, None]
    x = np.arange(n1)[None, :]

    def blob(t0, x0):
        return np.exp(-((t - t0) ** 2 / 80.0 + (x - x0) ** 2 / 40.0))

    mu = np.stack([blob(30, 10) + blob(70, 20),
                   blob(40, 14) + blob(85, 8)]).astype(np.float32) + 1e-3
    nu = np.stack([blob(45, 11) + blob(80, 19),
                   blob(38, 15) + blob(88, 9)]).astype(np.float32) + 1e-3
    l_fast, g_fast = B.bfm_jax_batch(jnp.asarray(mu), jnp.asarray(nu),
                                     num_steps=6, step_scale=1.0,
                                     dmax=127)
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "0")
    l_slow, g_slow = B.bfm_jax_batch(jnp.asarray(mu), jnp.asarray(nu),
                                     num_steps=6, step_scale=1.0,
                                     dmax=0)
    assert np.allclose(np.asarray(l_fast), np.asarray(l_slow),
                       rtol=1e-4, atol=1e-8)
    d = np.abs(np.asarray(g_fast) - np.asarray(g_slow)).max()
    assert d < 1e-4 * max(np.abs(np.asarray(g_slow)).max(), 1e-30)


def test_local_band_ok_rejects_active_dy_at_margin():
    """Regression: a block whose only active cell has dy == margin (the
    inactive-cell fill value) must NOT classify as empty — the banded
    path would compute base 0 and silently drop its mass. Emptiness now
    derives from the activity mask itself."""
    Bb, Q, n2s, n1s = 1, 1, 140, 8
    margin = 128
    z = jnp.zeros((Bb, Q, n2s, n1s), jnp.float32)
    zi = jnp.zeros((Bb, Q, n2s, n1s), jnp.int32)
    mass = z.at[0, 0, 0, 0].set(1.0)
    yI = zi.at[0, 0, 0, 0].set(margin)       # dy = yI - row = 128
    yO = yI + 1
    c = jnp.broadcast_to(jnp.arange(n1s, dtype=jnp.int32),
                         (Bb, Q, n2s, n1s))
    subs = (c, c, z, yI, yO, z, mass)
    assert not bool(B._local_band_ok(subs, G_local=32, margin=margin,
                                     row_block=32))
    # sanity: the same block with zero mass is genuinely empty -> ok
    subs0 = (c, c, z, yI, yO, z, z)
    assert bool(B._local_band_ok(subs0, G_local=32, margin=margin,
                                 row_block=32))


def test_pallas_push_lane_multiple_of_128(monkeypatch):
    """Regression: with n1 % 128 == 0 the slab lanes must still cover
    the +dxmax-shifted targets — the crop used to clamp short (121
    columns instead of 128) and right-edge mass fell off the slab."""
    monkeypatch.setenv("DEVITO_FWI_TPU_PALLAS_INTERPRET", "1")
    rng = np.random.default_rng(7)
    Bb, Q, n2s, n1s = 2, 1, 40, 128
    mass = jnp.asarray(rng.uniform(0.1, 1.0, (Bb, Q, n2s, n1s)),
                       jnp.float32)
    c = jnp.broadcast_to(jnp.arange(n1s, dtype=jnp.int32),
                         (Bb, Q, n2s, n1s))
    r = jnp.broadcast_to(jnp.arange(n2s, dtype=jnp.int32)[:, None],
                         (Bb, Q, n2s, n1s))
    xI = jnp.minimum(c + 3, n1s - 1)          # right-edge targets
    xO = jnp.minimum(xI + 1, n1s - 1)
    yI = jnp.minimum(r + 2, n2s - 1)
    yO = jnp.minimum(yI + 1, n2s - 1)
    xf = jnp.full(mass.shape, 0.3, jnp.float32)
    yf = jnp.full(mass.shape, 0.4, jnp.float32)
    subs = (xI, xO, xf, yI, yO, yf, mass)
    assert bool(B._dx_inband_predicate(subs, 7))
    assert bool(B._local_band_ok(subs, G_local=24, margin=128,
                                 row_block=16))
    rho_scat = B._scatter_pushforward_batch(subs, n1s, n2s)
    rho_pal = B._pallas_push(subs, n1s, n2s, G=24, dxmax=7, margin=128,
                             R=16)
    assert rho_pal.shape == (Bb, n2s, n1s)
    np.testing.assert_allclose(np.asarray(rho_pal), np.asarray(rho_scat),
                               rtol=1e-5, atol=1e-6)
