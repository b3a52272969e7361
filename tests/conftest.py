"""Test configuration: run on CPU with 8 virtual devices and float64 enabled.

Multi-chip sharding paths are validated on a virtual 8-device CPU mesh, and
the adjoint/linearization tests need float64 (the reference runs them in f64
on CPU too — seismic/self_adjoint/test_wavesolver_iso.py).

Note: some environments pre-import jax from sitecustomize and force a TPU
platform via jax.config (overriding JAX_PLATFORMS env), so we set the
config explicitly after import.

DEVITO_FWI_TPU_ONCHIP_TESTS=1 keeps the session's real TPU backend (and
f32) instead: only the tests in test_tpu_onchip.py do real work there —
run `DEVITO_FWI_TPU_ONCHIP_TESTS=1 pytest tests/test_tpu_onchip.py -m slow`.
"""
import os

_ONCHIP = os.environ.get("DEVITO_FWI_TPU_ONCHIP_TESTS", "0") == "1"

if not _ONCHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ONCHIP:
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    jax.config.update("jax_enable_x64", True)

    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert len(jax.devices()) == 8, jax.devices()
