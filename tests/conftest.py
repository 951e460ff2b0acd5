"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` per the project environment notes.
Must run before jax initializes its backends.
"""

import os

# NOTE: sitecustomize.py (baked into the image) registers and initializes the
# tunneled-TPU ("axon") jax backend at interpreter startup, BEFORE this file
# runs — so plain env-var edits here are too late.  jax.config.update() after
# import does switch the execution platform, and the CPU client is created
# lazily, so XLA_FLAGS set here still shapes the virtual 8-device CPU mesh.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("MOLA_TPU_TESTS", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
