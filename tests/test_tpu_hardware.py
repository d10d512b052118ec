"""Hardware-flagged Pallas tests (opt-in: RUN_TPU_TESTS=1).

The default suite runs everything on the CPU backend (conftest.py forces it
before jax initializes), so Mosaic compilation of the Pallas kernels is
never exercised in CI.  This target runs `scripts/tpu_smoke.py` in a fresh
subprocess WITHOUT the CPU forcing, catching Mosaic/layout regressions on
real hardware before bench.py does.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.environ.get("RUN_TPU_TESTS"),
                    reason="set RUN_TPU_TESTS=1 with a TPU attached")
def test_pallas_kernels_on_hardware():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_smoke.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "tpu_smoke ok" in proc.stdout
