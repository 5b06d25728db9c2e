"""Test configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding logic is
exercised without TPU hardware (the driver separately dry-runs the multichip
path). Must set env vars before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# Force CPU with 8 virtual devices. The environment may pre-import jax (via a
# sitecustomize) with JAX_PLATFORMS pointing at a single-client remote TPU, so
# the env var alone is captured too early — set the config directly before any
# backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: full-model CPU compiles dominate test time;
# cache them across test modules and pytest invocations.
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(scope="session")
def tool():
    """Path to the native rough_map_node binary, building it on first use."""
    import subprocess

    from mmfn_tpu.mapping.rough_map import default_tool_path

    path = default_tool_path()
    if not os.path.exists(path):
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        try:
            subprocess.run([os.path.join(root, "scripts", "build_native.sh")],
                           check=True, capture_output=True)
        except subprocess.CalledProcessError as e:
            # a broken BUILD must fail loudly (with the compiler output),
            # not silently skip every closed-loop integration test
            raise RuntimeError(
                f"native build failed:\n{(e.stderr or b'').decode()[-2000:]}")
        except Exception as e:
            pytest.skip(f"native toolchain unavailable: {e}")
    return path


def clean_subprocess_env():
    """Subprocess env: CPU jax, and no axon/TPU relay registration (the
    sitecustomize dials a single-client relay and can block). The one shared
    recipe — CLAUDE.md points here for ad-hoc subprocess tests."""
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("PALLAS_AXON", "AXON_", "TPU_"))}
    env["JAX_PLATFORMS"] = "cpu"
    return env


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy full-config parity / subprocess-mesh tests; default dev "
        "lane is -m 'not slow' (~10 min), run the FULL suite before shipping")
