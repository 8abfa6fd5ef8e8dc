"""Test env: force CPU with 8 virtual devices so mesh/pjit/collective tests
run without TPU hardware (SURVEY.md §4.4).

The image's sitecustomize pins JAX_PLATFORMS=axon (the TPU tunnel), so the
env var alone is not enough — the jax config must be updated before any
backend initialization (conftest imports before all test modules)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
