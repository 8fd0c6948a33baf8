"""Test configuration — force an 8-virtual-device CPU platform.

Multi-device federated/sharding tests run on a fake 8-device CPU mesh
(the TPU-world equivalent of a fake distributed backend; see SURVEY.md §4).
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
