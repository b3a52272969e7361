"""Pallas VMEM-resident acoustic kernel: numerics parity vs the XLA scan
(interpret mode on CPU; the real-TPU benchmark and parity check are
documented in ops/pallas_acoustic.py: 21.5 vs 17.9 Gcell-steps/s, 2e-6
relative trace agreement at Marmousi scale)."""
import numpy as np
import pytest

from devito_fwi_tpu import SeismicModel, AcquisitionGeometry
from devito_fwi_tpu.fwi import fm_multi, _batched_tables
from devito_fwi_tpu.ops import pallas_acoustic as pa


@pytest.mark.skipif(not pa.available(), reason="pallas unavailable")
def test_pallas_forward_matches_xla_interpret(monkeypatch):
    import jax.numpy as jnp
    shape = (61, 41)
    v = np.full(shape, 2.0, np.float32)
    v[:, 20:] = 2.5
    model = SeismicModel(origin=(0., 0.), spacing=(10., 10.), shape=shape,
                         space_order=8, vp=v, nbl=10, bcs="damp",
                         dtype=np.float32)
    nsrc = 3
    src = np.stack([np.linspace(50, 550, nsrc), np.full(nsrc, 20.0)], axis=1)
    rec = np.stack([np.linspace(10, 590, 31), np.full(31, 25.0)], axis=1)
    geom = AcquisitionGeometry(model, rec, src, 0., 300., f0=0.012,
                               src_type="Ricker")
    assert pa.geometry_supported(geom)
    obs = fm_multi(geom)
    ref = np.stack([o.data for o in obs])

    # run forward_traces with the kernel in interpreter mode
    orig = pa.forward_rows

    def rows_interp(*args, **kw):
        kw["interpret"] = True
        return orig(*args, **kw)

    monkeypatch.setattr(pa, "forward_rows", rows_interp)
    tr = pa.forward_traces(geom)
    scale = np.abs(ref).max()
    assert np.abs(tr - ref).max() < 1e-5 * scale
