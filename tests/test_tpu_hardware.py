"""Hardware Pallas tests — AUTO-ENABLED when a TPU backend is attached.

The default suite runs everything on the CPU backend (conftest.py forces it
before jax initializes), so Mosaic compilation of the Pallas kernels is
never exercised in-process.  This target runs `scripts/tpu_smoke.py` (one
tile-kernel and one ladder-kernel compile+execute vs the brute oracle) in a
fresh subprocess WITHOUT the CPU forcing.  The smoke script itself detects
whether a TPU/axon backend is present (exit code 2 when not), so on a TPU
rig the test ALWAYS runs and a Mosaic regression fails the suite — not just
bench.py (VERDICT r04 item 5) — while CPU-only CI skips gracefully.

Set RUN_TPU_TESTS=1 to turn the no-TPU skip into a hard failure (for rigs
where a missing TPU means the tunnel broke).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pallas_kernels_on_hardware():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_smoke.py")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=900)
    if proc.returncode == 2 and not os.environ.get("RUN_TPU_TESTS"):
        pytest.skip(f"no TPU backend attached: {proc.stderr.strip()}")
    assert proc.returncode == 0, (proc.stdout, proc.stderr)
    assert "tpu_smoke ok" in proc.stdout
