"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes a backend.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in flags:
    # On a 1-core host, XLA:CPU's in-process collectives can take >40 s to
    # reach a rendezvous; the default 40 s termination timeout then aborts
    # the interpreter. Raising it helps SLOW rendezvous (pure-psum DP tests)
    # but is NOT sufficient for the dp/tp all-to-all program in a warm pytest
    # process — that one truly deadlocks and must stay in a fresh subprocess
    # (tests/_dp_tp_body.py; see CLAUDE.md).
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=900")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The axon sitecustomize registers the TPU backend unconditionally; force the
# CPU platform explicitly so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)


def random_pose(rs: np.random.RandomState, t_scale: float = 0.5) -> np.ndarray:
    """Random SE(3) with a proper rotation."""
    A = rs.randn(3, 3)
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    T = np.eye(4)
    T[:3, :3] = Q
    T[:3, 3] = rs.randn(3) * t_scale
    return T


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: subprocess-driven CLI tests (minutes on 1 core)")
