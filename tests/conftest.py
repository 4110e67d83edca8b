"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The sandbox environment force-registers an experimental TPU platform ("axon")
via sitecustomize and sets JAX_PLATFORMS=axon, so merely setting
JAX_PLATFORMS=cpu is not enough — we also pin jax's default device to the
first virtual CPU device after import. Flags must be set before jax
initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu,axon" if os.environ.get("JAX_PLATFORMS") == "axon" else "cpu"
os.environ["VIEWCRAFTER_ATTN_IMPL"] = "xla"  # arrays live on CPU in tests
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

try:
    _cpus = jax.local_devices(backend="cpu")
    jax.config.update("jax_default_device", _cpus[0])
except RuntimeError:
    _cpus = jax.devices()

def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: full-scale parity tests (minutes each); always run in CI"
    )
    config.addinivalue_line(
        "markers",
        "smoke: fast compile-light tier (<2 min cold on the 1-core box): "
        "run with `pytest -m smoke` for a quick regression signal",
    )


# Modules whose tests are host-math or tiny-compile only; auto-marked `smoke`.
# Keep this list to modules that stay under ~2 min COLD in total.
_SMOKE_MODULES = {
    "test_schedule",       # schedule arrays bit-match: pure numpy
    "test_geometry",       # trajectory/transforms: tiny jit programs
    "test_io",             # image/video/PLY round-trips: host-side
    "test_tokenizer_golden",
    "test_metrics",        # PSNR/SSIM (LPIPS path is tiny)
    "test_cli_launchers",  # flag parsing + script flag parity
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SMOKE_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.smoke)


jax.config.update("jax_default_matmul_precision", "highest")
# single-core CI box: persistent compile cache makes re-runs cheap
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
