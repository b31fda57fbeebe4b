"""Test harness: force an 8-device virtual CPU platform.

Multi-chip sharding semantics (pjit data parallelism, all-gather NT-Xent,
synchronized batch norm) are validated on a virtual 8-device CPU mesh — the
standard JAX trick for testing collectives without TPU hardware.

Env vars alone are not enough here: pytest plugins (jaxtyping) import jax
before this conftest runs, baking env-derived config defaults in. The
jax.config.update calls below still work at that point because the backend
itself is initialized lazily on first device use.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
