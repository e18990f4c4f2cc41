"""Test configuration: force CPU backend with 8 virtual devices.

The container pins JAX_PLATFORMS=axon (one real TPU chip through a
tunnel) via sitecustomize; tests run on CPU for speed and determinism,
with 8 virtual devices so sharding/collective tests exercise a real
multi-device mesh (SURVEY.md §4 item 4).  Must run before any JAX
backend initialization.
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "golden", "data")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop jitted executables between modules.

    The full suite accumulates hundreds of XLA:CPU executables in one
    process; past a threshold the CPU backend segfaults inside
    backend_compile_and_load (reproduced deterministically at test #65
    with jax 0.9.0 — neither half of the suite alone crashes, so the
    trigger is cumulative code memory, not any single program).
    Per-module cache clearing keeps the live-executable count bounded.
    """
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def golden_small():
    """200x160 golden pack (full stage dumps, 2 octaves)."""
    return np.load(os.path.join(GOLDEN_DIR, "synth_200x160.npz"))


@pytest.fixture(scope="session")
def golden_mid():
    """256x200 golden pack (full stage dumps, 3 octaves)."""
    return np.load(os.path.join(GOLDEN_DIR, "synth_256x200.npz"))


def parse_sift_bytes(raw: np.ndarray):
    """Parse a golden sift_file byte array -> (u, v, ellipse, desc)."""
    toks = bytes(raw).decode().split()
    dim, n = int(toks[0]), int(toks[1])
    body = np.asarray(toks[2:], np.float64).reshape(n, 5 + dim)
    return body[:, 0], body[:, 1], body[:, 2:5], body[:, 5:]
