"""The examples/ inverse-problem scripts stay runnable (short-step smoke).

Each example's `main(steps, backend)` must build its workload, take a few
optimizer steps and reduce (or at least compute) its loss without error —
the full convergence numbers quoted in README come from the default step
counts and are not re-verified here.
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "examples"))


def _run(module_name, steps=3):
    import importlib
    mod = importlib.import_module(module_name)
    return mod.main(steps=steps)


def test_fit_brdf_smoke():
    ratio = _run("fit_brdf")
    assert np.isfinite(ratio)


def test_fit_pose_smoke():
    err = _run("fit_pose")
    assert np.isfinite(err)


def test_fit_geometry_smoke():
    ratio = _run("fit_geometry")
    assert np.isfinite(ratio)
