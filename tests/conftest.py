"""Test configuration: force an 8-device virtual CPU mesh.

NOTE: jax may already be imported at interpreter startup in this image, so
JAX_PLATFORMS set via os.environ is ignored; use jax.config.update, which
takes effect any time before backend initialization. XLA_FLAGS is read by the
XLA client at creation (first computation), so setting it here still works.

Multi-chip sharding logic is validated on host CPU via
``xla_force_host_platform_device_count`` (the standard JAX fake-backend
trick); real-TPU benchmarking happens in bench.py, not tests.
"""

import os

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax

jax.config.update('jax_platforms', 'cpu')
