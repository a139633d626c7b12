"""Test configuration: force CPU JAX with an 8-device virtual mesh so
multi-chip sharding paths are exercised without TPU hardware (the strategy
SURVEY.md §4 prescribes; the reference had no test suite at all)."""

import os

# Force CPU even if the shell pre-set JAX_PLATFORMS (e.g. to the TPU tunnel):
# parity tests compare against float32 torch oracles and must not run with
# TPU default (bf16-ish) matmul precision.  NOTE: this interpreter pre-imports
# jax at startup, so setting env vars here is too late for jax's own config
# parsing — use jax.config.update, which works as long as no backend has been
# initialized yet.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
