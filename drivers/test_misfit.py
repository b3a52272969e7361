#!/usr/bin/env python
"""Misfit smoke driver (reference ``test_misfit.py``): compares W2-1d vs
W2-2d loss/gradient on saved shot gathers (or synthetic Ricker wavelets
when no gathers are available) and dumps the gradients."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from devito_fwi_tpu.misfit import qWasserstein  # noqa: E402


def wavelet(dt, n, freq, delay):
    t = (np.arange(0, n) - delay) * dt
    tmp = np.pi * np.pi * freq * freq * t * t
    return ((1. - 2. * tmp) * np.exp(-tmp)).reshape(n, 1)


w1d = qWasserstein(trans_type="linear", gamma=1.01, method="1d")
w2d = qWasserstein(trans_type="linear", gamma=1.01, method="2d",
                   num_steps=10, step_scale=1.)

if __name__ == "__main__":
    shape = (410, 101)
    if os.path.exists("./result/syn1"):
        data1 = np.fromfile("./result/syn1", dtype=np.float32).reshape(shape)
        data2 = np.fromfile("./result/obs1", dtype=np.float32).reshape(shape)
    else:
        print("no saved gathers; using synthetic shifted Ricker wavelets")
        ntr = shape[1]
        data1 = np.tile(wavelet(0.001, shape[0], 5, 120), (1, ntr))
        data2 = np.tile(wavelet(0.001, shape[0], 5, 200), (1, ntr))

    loss1, grad1 = w1d(data1, data2)
    loss2, grad2 = w2d(data1, data2)
    print("W2-1d loss %.6e   W2-2d loss %.6e" % (loss1, loss2))
    os.makedirs("./result", exist_ok=True)
    grad1.astype(np.float32).tofile("./result/grad1d")
    grad2.astype(np.float32).tofile("./result/grad2d")
