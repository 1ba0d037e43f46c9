"""Test configuration.

Tests run on CPU with 8 virtual devices so sharding/mesh tests work without
TPU hardware (SURVEY.md §4: multi-host testing via
xla_force_host_platform_device_count).

This image boots every interpreter through /root/.axon_site/sitecustomize.py,
which registers a tunneled TPU ('axon') backend and pins JAX_PLATFORMS=axon.
Backend *initialization* is lazy, so overriding the platform list before the
first JAX operation keeps tests off the (slow, single-chip) tunnel entirely.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
