import os
import sys

# Tests run on CPU with 8 virtual devices so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4 test strategy).
#
# The axon environment pre-registers a TPU PJRT plugin from sitecustomize at
# interpreter start, so setting JAX_PLATFORMS via os.environ here is too
# late to be read from the env — but jax.config.update("jax_platforms") works
# as long as no backend has been initialized yet, and XLA_FLAGS is read when
# the CPU client is created (lazily, below is early enough).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pytest_configure(config):
    # Fail loudly if the CPU mesh isn't actually available: the whole suite's
    # sharding coverage claim depends on it.
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8, jax.devices()


def pytest_sessionstart(session):
    # keep tests hermetic: never write outputs/ or params.txt from suites,
    # and keep AOT export artifacts out of the user's cache (tests that
    # exercise the artifact path monkeypatch their own tmp dir)
    import tempfile

    from forge_tpu.runtime import aot
    from forge_tpu.runtime.options import opts

    aot.AOT_DIR = tempfile.mkdtemp(prefix="forge_aot_test_")
    opts.set("samples_save", False, run_onchange=False)
    opts.set("save_write_params_txt", False, run_onchange=False)
