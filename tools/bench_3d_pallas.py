"""On-chip A/B of the 3-D streaming Pallas route (pallas_acoustic3d)
against the XLA saved-history route on the bench config-5 workload
(layers preset, 64^3+nbl=16, so=8, 4 shots): gradient parity + wall
clock. One process per variant is WRONG here (route gates read env at
trace time and jit caches key on function identity) — instead both
variants run in THIS process by toggling DEVITO_FWI_TPU_PALLAS3D
before first trace of each path, which works because the two routes
are different jitted functions.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

variant = os.environ.get("BENCH3D_VARIANT", "both")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from devito_fwi_tpu.models.presets import demo_model  # noqa: E402
from devito_fwi_tpu import AcquisitionGeometry  # noqa: E402
from devito_fwi_tpu.fwi import fm_multi, fwi_obj_multi, _pallas3_route  # noqa: E402
from devito_fwi_tpu.misfit import least_square  # noqa: E402


def main():
    kw = dict(shape=(64, 64, 64), spacing=(15., 15., 15.), space_order=8,
              nbl=16, dt=1.5)
    model1 = demo_model("layers-isotropic", nlayers=3, **kw)
    model0 = demo_model("layers-isotropic", nlayers=1, **kw)
    nsrc, nrec = 4, 48
    ext = model1.domain_size[0]
    src = np.stack([np.linspace(0, ext, nsrc), np.full(nsrc, ext / 2),
                    np.full(nsrc, 30.0)], 1)
    rec = np.stack([np.linspace(0, ext, nrec), np.full(nrec, ext / 2),
                    np.full(nrec, 30.0)], 1)
    g1 = AcquisitionGeometry(model1, rec, src, 0.0, 500.0, f0=0.012,
                             src_type="Ricker")
    g0 = AcquisitionGeometry(model0, rec, src, 0.0, 500.0, f0=0.012,
                             src_type="Ricker")
    info, cap = _pallas3_route(g0, "OT2", calc_grad=True)
    print("route:", info, "cap:", cap)
    obs = fm_multi(g1)

    cells = int(np.prod(g0.model.padded_shape)) * (g0.nt - 2) * nsrc

    def run(tag):
        t0 = time.perf_counter()
        f, g, _ = fwi_obj_multi(g0, obs, least_square, None, None, True,
                                calc_grad=True)
        t_cold = time.perf_counter() - t0
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            f, g, _ = fwi_obj_multi(g0, obs, least_square, None, None,
                                    True, calc_grad=True)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"{tag}: f={f:.6e}  grad |min|max = {g.min():.4e} "
              f"{g.max():.4e}  t={t:.3f}s ({cells/t/1e9:.2f} Gcs/s; "
              f"cold {t_cold:.1f}s)")
        return f, np.asarray(g).reshape(g0.model.shape)

    out = {}
    if variant in ("both", "pallas"):
        assert info is not None, "3-D Pallas route did not engage"
        out["pallas"] = run("pallas3d-stream")
    if variant in ("both", "xla"):
        os.environ["DEVITO_FWI_TPU_PALLAS3D"] = "0"
        try:
            out["xla"] = run("xla-saved    ")
        finally:
            os.environ.pop("DEVITO_FWI_TPU_PALLAS3D")
    if len(out) == 2:
        fp, gp = out["pallas"]
        fx, gx = out["xla"]
        scale = np.abs(gx).max()
        # f32 FWI gradients are cancellation-noise dominated near
        # sources (CLAUDE.md): compare interior cells too
        d = np.abs(gp - gx).max()
        inner = (slice(4, -4),) * 3
        di = np.abs(gp[inner] - gx[inner]).max()
        si = np.abs(gx[inner]).max()
        print(f"f rel diff {abs(fp-fx)/abs(fx):.2e}; grad max rel "
              f"{d/scale:.2e} (interior {di/si:.2e})")


if __name__ == "__main__":
    main()
