"""Test configuration: force a simulated 8-device CPU backend so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md section 4's
"genuine upgrade the reference lacks").

Note: env-var platform selection (JAX_PLATFORMS) can be overridden by
site-installed PJRT plugins, so we use jax.config, which must run before
any backend initialises — hence this lives at the top of conftest.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)
