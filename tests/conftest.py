"""Test configuration.

Tests run on a virtual 8-device CPU mesh (multi-chip sharding is validated
the way the reference validates GPU against CPU — N-device results must
match 1-device results), with float64 enabled for oracle parity with the
reference's tolerances (degrid atol 1e-14 / rtol 1e-13 etc.; see
BASELINE.md).

Environment must be set before jax is first imported.
"""

import os

# Force CPU for tests (the ambient environment may pin a TPU platform);
# override with SKA_SDP_FUNC_TPU_TEST_PLATFORM=tpu to run on hardware.
os.environ["JAX_PLATFORMS"] = os.environ.get(
    "SKA_SDP_FUNC_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The ambient sitecustomize may have re-pinned the TPU platform after the
# env assignment above; the config update wins.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_enable_x64", True)
