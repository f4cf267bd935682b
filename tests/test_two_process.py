"""Two-process jax.distributed validation (slow; spawns subprocesses)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_cpu_matches_single_process(tmp_path):
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "two_process_cpu_test.py")],
        cwd=REPO, timeout=900,
    ).returncode
    assert rc == 0
