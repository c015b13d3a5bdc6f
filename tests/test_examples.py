"""Every shipped example runs end-to-end (--cpu --quick) and reports success.

The examples are the user-facing entry documentation (README 'examples'
list); this keeps them from rotting as the API evolves. Marked slow: each is
a fresh-process run (JIT compile from cold).
"""

import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")

# (script, substring that must appear in a successful run's stdout)
CASES = [
    ("basic_registration.py", "transform RMSE vs GT"),
    ("lidar_plane_icp.py", "transform RMSE vs GT"),
    ("global_registration.py", "global + ICP refine"),
    ("large_scale_pipeline.py", "transform RMSE vs GT"),
    ("ndt_map_tracking.py", "all scans tracked"),
    ("odometry_slam.py", "fused map"),
]


@pytest.mark.slow
@pytest.mark.parametrize("script,needle", CASES,
                         ids=[c[0] for c in CASES])
def test_example_runs(script, needle):
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES_DIR, script),
         "--cpu", "--quick"],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}")
    assert needle in proc.stdout, (
        f"{script} stdout lacks {needle!r}:\n{proc.stdout}")
