"""Keep the runnable tutorial examples green: each asserts its own
golden numbers internally (notebook parity), so a subprocess exit code
is the whole test. Slow-marked — run with ``-m slow``."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("script", [
    "examples/staggered_acoustic.py",
    "examples/time_update.py",
    "examples/time_blocking.py",
])
def test_example_runs(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run([sys.executable, os.path.join(REPO, script)],
                         env=env, capture_output=True, text=True,
                         timeout=1200, cwd=REPO)
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
