"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding logic is exercised without TPU hardware via
`--xla_force_host_platform_device_count=8`, the standard JAX answer to
"multi-node without a cluster" (the reference has no such story — it only
tests distributed behavior by actually launching torchrun,
reference: scripts/launch_sd3_train.sh:10).
"""

import os
import sys

# Must happen before anything imports jax. Tests always run on CPU (the
# session env may point JAX at the real TPU; benches use that, tests don't).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The session environment force-prepends the 'axon' TPU plugin to
# jax_platforms regardless of JAX_PLATFORMS; override after import, before
# backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the suite is compile-dominated on CPU. One
# shared implementation (tpdm_tpu/utils/cache.py) keys the dir by a
# host-ISA fingerprint — XLA:CPU AOT results from a host with different
# vector features load but can miscompute.
from tpdm_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache("/tmp/tpdm_jax_cache", min_secs=0.5)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() >= 8, jax.devices()
