"""Test configuration: force a virtual 8-device CPU mesh (SURVEY.md §4.3).

Sharding/halo logic is tested on a faked multi-device CPU backend so CI needs
no TPU pod; the driver separately dry-runs the multi-chip path.
"""

import os

# The ambient environment pins JAX_PLATFORMS to the TPU tunnel (and may even
# pre-import jax via sitecustomize); unit tests run on CPU with virtual devices
# (override with PADT_TEST_PLATFORM=tpu to force real-chip tests).
_platform = os.environ.get("PADT_TEST_PLATFORM", "cpu")
if _platform == "tpu" and os.environ.get("PALLAS_AXON_POOL_IPS"):
    # The dev chip rides the axon PJRT plugin (platform name 'axon', device
    # kind TPU); a real pod/libtpu host keeps the plain 'tpu' name.
    _platform = "axon"
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
