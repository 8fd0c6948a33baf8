"""Test configuration — force an 8-virtual-device CPU platform.

Multi-device federated/sharding tests run on a fake 8-device CPU mesh
(the TPU-world equivalent of a fake distributed backend; see SURVEY.md §4).

Note: this host's sitecustomize imports jax at interpreter start to register
the axon TPU backend, so jax.config has already captured JAX_PLATFORMS=axon —
we must override via jax.config, not just os.environ.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (already imported by sitecustomize — reconfigure)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "highest")
