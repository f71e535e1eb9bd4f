"""CLI-level multi-device proof (VERDICT r2 next #6).

The function-level sharding equalities live in tests/test_pipeline.py and
tests/_dp_tp_body.py; this drives ``run_test.py`` / ``run_train.py``
THEMSELVES over an 8-virtual-device CPU mesh in a fresh subprocess (see
tests/_cli_multichip_body.py for why) and asserts the artifacts match the
single-device runs.  Reference analog: run_train.py:60-76 (DDP entry).
"""
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_cli_multichip(tmp_path):
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # body sets its own 8-device flags
    r = subprocess.run(
        [sys.executable, "-m", "tests._cli_multichip_body", str(tmp_path)],
        capture_output=True, text=True, timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\n\nstderr:\n{r.stderr}"
    assert "CLI_MULTICHIP_OK" in r.stdout
    assert "8-device mesh == single-device" in r.stdout
    assert "8-way DP resume OK" in r.stdout
