"""Pytest config: run all tests on a virtual 8-device CPU mesh.

The axon sitecustomize force-selects the TPU platform and imports jax at
interpreter start, so the env-var route is dead; switching the platform via
jax.config before any array op works (see .claude/skills/verify/SKILL.md).
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF = "/root/reference"
SCENES_G = f"{REF}/scenes/gaussians"
SCENES_S = f"{REF}/scenes/spheres"
RENDERS = f"{REF}/tests/renders"


@pytest.fixture(scope="session")
def ref_paths():
    return {"gaussians": SCENES_G, "spheres": SCENES_S, "renders": RENDERS}


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
