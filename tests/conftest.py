"""Test configuration: CPU backend, 8 virtual devices, x64 enabled.

Multi-device sharding is tested without TPUs via
``--xla_force_host_platform_device_count=8`` (SURVEY section 4); x64 is
enabled so fp64 parity tests against the loop oracle are exact.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
# The axon TPU plugin ignores JAX_PLATFORMS=cpu; route computation to the
# host CPU devices explicitly so tests are hermetic and fp64-exact.
jax.config.update("jax_default_device", jax.devices("cpu")[0])

import pytest  # noqa: E402


@pytest.fixture
def tiny_params():
    from fdtd_tpu.params import Mode, Params

    return Params(
        length=0.01,
        width=0.01,
        height=0.01,
        spatial_step=0.001,
        time_step=1e-12,
        simulation_time=2e-11,
        sampling_rate=5,
        mode=Mode.VALIDATION,
        dtype="float64",
    )


@pytest.fixture
def default_params():
    """The reference's shipped params.txt scene (50^3 grid)."""
    from fdtd_tpu.params import parse_params_text

    text = "0.05 0.05 0.05 0.001 0.0000000000006 0.00000000012 2 0"
    return parse_params_text(text, dtype="float64")
