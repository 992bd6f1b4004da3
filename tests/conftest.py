"""Test config: force CPU with 8 virtual devices so multi-chip sharding logic
is exercised without TPU hardware.

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin
("axon") and force-sets ``jax_platforms="axon,cpu"`` at interpreter start,
*overriding* the JAX_PLATFORMS env var.  We must override it back via
jax.config after import — before any jax operation runs — or every test op
round-trips through the TPU tunnel (slow and flaky).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
