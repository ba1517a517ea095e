import os

# Must be set before jax initializes: simulate a small TPU pod on CPU
# (SURVEY.md §4 tier-2 pattern — the CPU-DDP equivalent for GSPMD).
# Device count is configurable; default 2 because CI boxes may have 1 core
# and XLA spins a thread pool per virtual device. The driver's
# dryrun_multichip validates 8-way sharding separately.
_N = os.environ.get("TORCHOK_TEST_DEVICES", "2")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
# tests build tasks from recipes that declare pretrained: true without a
# weight cache present — allow random init everywhere except the tests that
# pin the hard-fail contract (they delenv this; tests/test_pretrained_e2e.py)
os.environ.setdefault("TORCHOK_PRETRAINED_ALLOW_RANDOM", "1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + f" --xla_force_host_platform_device_count={_N}"

import jax  # noqa: E402

# The env var alone is not honored when a TPU platform plugin is installed;
# the config update reliably pins tests to the simulated-CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/torchok_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def multi_devices():
    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("multiple simulated devices unavailable")
    return devices
