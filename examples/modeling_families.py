#!/usr/bin/env python
"""Forward modeling across all six physics families.

One-stop example mirroring the reference's per-family example scripts
(``seismic/{acoustic,tti,elastic,viscoelastic,viscoacoustic,self_adjoint}/
*_example.py``): builds the same demo models, runs each forward solver,
and prints the receiver norms (which match the reference golden values
where they exist — see tests/test_physics_families.py).

Usage: python examples/modeling_families.py [-nd 2] [-tn 500]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from devito_fwi_tpu import (demo_model, setup_geometry,  # noqa: E402
                            seismic_args, AcousticWaveSolver,
                            AnisotropicWaveSolver, ElasticWaveSolver,
                            ViscoelasticWaveSolver, ViscoacousticWaveSolver,
                            acoustic_sa_setup)


def run_family(name, make):
    rec = make()
    print("%-22s |rec| = %12.6f" % (name, np.linalg.norm(rec)))
    assert np.isfinite(rec).all()


def main():
    args = seismic_args("Forward modeling across physics families")
    args = args.parse_args()
    ndim = min(args.ndim, 2) if args.shape == (51, 51, 51) else args.ndim
    shape = tuple([50] * ndim)
    spacing = tuple([20.0] * ndim)
    tn = args.tn if args.tn > 0 else 1000.0
    so = args.space_order

    def acoustic():
        model = demo_model("layers-isotropic", shape=shape, spacing=spacing,
                           space_order=so, nbl=40)
        geom = setup_geometry(model, tn)
        rec, _, summary = AcousticWaveSolver(model, geom,
                                             space_order=so).forward()
        print("  acoustic perf:", summary)
        return rec.data

    def tti():
        model = demo_model("layers-tti", shape=shape, spacing=spacing,
                           space_order=max(so, 4), nbl=10)
        geom = setup_geometry(model, tn / 2)
        rec, _, _, _ = AnisotropicWaveSolver(
            model, geom, space_order=max(so, 4)).forward()
        return rec.data

    def elastic():
        model = demo_model("layers-elastic", shape=shape, spacing=spacing,
                           space_order=so, nbl=40)
        geom = setup_geometry(model, tn)
        rec1, rec2, _, _, _ = ElasticWaveSolver(model, geom,
                                                space_order=so).forward()
        return rec1.data

    def viscoelastic():
        model = demo_model("layers-viscoelastic", shape=shape,
                           spacing=spacing, space_order=so, nbl=40)
        geom = setup_geometry(model, tn)
        rec1, _, _, _, _ = ViscoelasticWaveSolver(model, geom,
                                                  space_order=so).forward()
        return rec1.data

    def viscoacoustic():
        model = demo_model("layers-viscoacoustic", shape=shape,
                           spacing=spacing, space_order=so, nbl=40)
        geom = setup_geometry(model, tn)
        rec, _, _, _ = ViscoacousticWaveSolver(model, geom, space_order=so,
                                               kernel="sls",
                                               time_order=2).forward()
        return rec.data

    def self_adjoint():
        solver = acoustic_sa_setup(shape=shape, spacing=spacing, tn=tn / 2,
                                   space_order=max(so, 8), nbl=10)
        rec, _, _ = solver.forward()
        return rec.data

    run_family("acoustic (OT2)", acoustic)
    run_family("TTI (centered)", tti)
    run_family("elastic", elastic)
    run_family("viscoelastic (SLS)", viscoelastic)
    run_family("viscoacoustic (sls-2)", viscoacoustic)
    run_family("self-adjoint w/Q", self_adjoint)
    print("all families finite")


if __name__ == "__main__":
    main()
