"""Butterworth band filters (reference ``seismic/filter/filter.py``).

The reference vendors ObsPy's scipy-based filters plus a SciPy-0.16
``_sosfilt`` backport; modern scipy has everything, so this is a direct
thin implementation with the same signatures and semantics (corner
clamping at Nyquist, zerophase = forward-backward application).
"""
from __future__ import annotations

import warnings

import numpy as np
from scipy.signal import iirfilter, sosfilt, zpk2sos, hilbert

__all__ = ["bandpass", "bandstop", "lowpass", "highpass", "envelope"]


def bandpass(data, freqmin, freqmax, df, corners=4, zerophase=False, axis=-1):
    fe = 0.5 * df
    low = freqmin / fe
    high = freqmax / fe
    if high - 1.0 > -1e-6:
        warnings.warn("Selected high corner frequency (%s) of bandpass is at "
                      "or above Nyquist (%s). Applying a high-pass instead."
                      % (freqmax, fe))
        return highpass(data, freq=freqmin, df=df, corners=corners,
                        zerophase=zerophase, axis=axis)
    if low > 1:
        raise ValueError("Selected low corner frequency is above Nyquist.")
    z, p, k = iirfilter(corners, [low, high], btype="band", ftype="butter",
                        output="zpk")
    sos = zpk2sos(z, p, k)
    if zerophase:
        firstpass = sosfilt(sos, data, axis=axis)
        return np.flip(sosfilt(sos, np.flip(firstpass, axis=axis), axis=axis),
                       axis=axis)
    return sosfilt(sos, data, axis=axis)


def bandstop(data, freqmin, freqmax, df, corners=4, zerophase=False, axis=-1):
    fe = 0.5 * df
    low = freqmin / fe
    high = freqmax / fe
    if high > 1:
        high = 1.0
        warnings.warn("Selected high corner frequency is above Nyquist. "
                      "Setting Nyquist as high corner.")
    if low > 1:
        raise ValueError("Selected low corner frequency is above Nyquist.")
    z, p, k = iirfilter(corners, [low, high], btype="bandstop",
                        ftype="butter", output="zpk")
    sos = zpk2sos(z, p, k)
    if zerophase:
        firstpass = sosfilt(sos, data, axis=axis)
        return np.flip(sosfilt(sos, np.flip(firstpass, axis=axis), axis=axis),
                       axis=axis)
    return sosfilt(sos, data, axis=axis)


def lowpass(data, freq, df, corners=4, zerophase=False, axis=-1):
    fe = 0.5 * df
    f = freq / fe
    if f > 1:
        f = 1.0
        warnings.warn("Selected corner frequency is above Nyquist. Setting "
                      "Nyquist as high corner.")
    z, p, k = iirfilter(corners, f, btype="lowpass", ftype="butter",
                        output="zpk")
    sos = zpk2sos(z, p, k)
    if zerophase:
        firstpass = sosfilt(sos, data, axis=axis)
        return np.flip(sosfilt(sos, np.flip(firstpass, axis=axis), axis=axis),
                       axis=axis)
    return sosfilt(sos, data, axis=axis)


def highpass(data, freq, df, corners=4, zerophase=False, axis=-1):
    fe = 0.5 * df
    f = freq / fe
    if f > 1:
        raise ValueError("Selected corner frequency is above Nyquist.")
    z, p, k = iirfilter(corners, f, btype="highpass", ftype="butter",
                        output="zpk")
    sos = zpk2sos(z, p, k)
    if zerophase:
        firstpass = sosfilt(sos, data, axis=axis)
        return np.flip(sosfilt(sos, np.flip(firstpass, axis=axis), axis=axis),
                       axis=axis)
    return sosfilt(sos, data, axis=axis)


def envelope(data):
    return abs(hilbert(data))
