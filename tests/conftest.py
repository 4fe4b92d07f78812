"""Test configuration: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers a tunneled single-chip TPU backend
(slow host transfers); unit tests run on CPU — JAX executes identical code
there — and multi-chip sharding tests use 8 virtual CPU devices, the same
way the reference smoke-tested its server mode with local processes
(SURVEY.md section 4.5).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

DATA_DIR = "/root/reference/data"


@pytest.fixture(scope="session")
def image_640():
    from hessgpu_tpu.io_image import load_image
    return load_image(os.path.join(DATA_DIR, "640-1.jpg"))


@pytest.fixture(scope="session")
def gray_small(image_640):
    """A small grayscale crop for fast pipeline tests."""
    from hessgpu_tpu.ops.resize import rgb_to_gray, to_float
    import jax.numpy as jnp
    g = rgb_to_gray(to_float(jnp.asarray(image_640)))
    return np.asarray(g)[200:360, 280:480]  # textured region, not sky


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of execution order
    return np.random.RandomState(42)
