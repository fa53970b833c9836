"""Test env: force CPU with 8 virtual devices so mesh/sharding code paths run
without TPU hardware (the JAX-native equivalent of multi-process testing the
reference never had — see SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Determinism + quieter logs
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

# The environment's sitecustomize may have already initialized the jax config
# with a hardware platform; config.update before first backend use wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
