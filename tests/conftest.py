"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the reference's unit-test philosophy (pure-math unit tests + fakes,
`tests/test_all.py`) and adds what it lacks (SURVEY.md §4): brute-force recall
oracles and multi-chip sharding tests on a virtual CPU mesh.
"""

import os

# Must happen before jax import anywhere. Force-set (the environment ships
# with JAX_PLATFORMS=axon pointing at the real TPU; unit tests run on a
# virtual 8-device CPU mesh).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The environment's sitecustomize registers the axon TPU plugin at interpreter
# startup (before this file runs), so the env var alone is not enough — the
# config update below is what actually forces the CPU backend.
import jax

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _isolate_cwd(tmp_path, monkeypatch):
    """Run every test from a throwaway cwd: config defaults are relative
    ('./data/...'), so a test that builds an app without overriding every
    data_dir must never auto-persist into the repo checkout."""
    monkeypatch.chdir(tmp_path)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture()
def tmp_data_dir(tmp_path):
    return str(tmp_path)
